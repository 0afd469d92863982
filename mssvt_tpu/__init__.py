"""MsSVT-TPU: a TPU-native (JAX/XLA/Pallas) 3D object detection framework.

A from-scratch rebuild of the capabilities of dscdyc/MsSVT (a fork of
OpenPCDet v0.5.2 with the Mixed-scale Sparse Voxel Transformer backbone),
re-designed TPU-first:

- static-shape padded sparse voxel tensors instead of dynamic (N, C) tensors
- sorted-key binary-search indices instead of GPU atomicCAS hash tables
- segment-sum / scatter gradients instead of atomicAdd (deterministic)
- jit-compiled, MXU-batched window attention instead of per-window CUDA loops
- jax.sharding data parallelism instead of DDP/NCCL
"""

from .version import __version__

__all__ = ["__version__"]

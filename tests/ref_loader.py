"""Load PURE-TORCH modules of the reference snapshot as parity oracles.

The reference at /root/reference is PyTorch + compiled CUDA extensions; its
pure-python modules (losses, box coders, the MixedScaleAttention module, the
MsSVT block definitions) import the compiled wrappers only for *runtime* use,
so they can be executed on CPU once those wrappers — and a couple of absent
third-party packages — are stubbed out in ``sys.modules``.

Mechanism: a synthetic top-level package ``refpcdet`` whose ``__path__``
points at ``/root/reference/pcdet``. Submodules then load through the normal
import machinery (namespace packages: the reference ships no __init__.py in
its subpackages), executing the REAL reference source files, with relative
imports resolving inside ``refpcdet`` — never touching the reference's own
top-level ``pcdet/__init__.py`` (which shells out to git).

This makes the tests' oracle the actual reference source, not a hand-written
replica (VERDICT r2 item 5).
"""

from __future__ import annotations

import contextlib
import importlib
import sys
import types

REF_ROOT = "/root/reference/pcdet"


def _stub_module(name: str, **attrs) -> types.ModuleType:
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _ensure_refpcdet():
    if "refpcdet" in sys.modules:
        return
    pkg = types.ModuleType("refpcdet")
    pkg.__path__ = [REF_ROOT]
    pkg.__package__ = "refpcdet"
    sys.modules["refpcdet"] = pkg

    # Path-only package shells: these reference subpackages have __init__.py
    # files that eagerly import the full model zoo (spconv, CUDA wrappers).
    # Bypassing them keeps imports scoped to the single oracle file under
    # test; leaf modules still execute their real source.
    for sub in ("models", "models.backbones_3d", "models.detectors",
                "models.dense_heads", "models.roi_heads",
                "models.backbones_2d", "models.backbones_2d.map_to_bev"):
        shell = types.ModuleType(f"refpcdet.{sub}")
        shell.__path__ = [f"{REF_ROOT}/{sub.replace('.', '/')}"]
        shell.__package__ = f"refpcdet.{sub}"
        sys.modules[f"refpcdet.{sub}"] = shell

    # --- compiled-extension wrappers the pure modules import but don't need
    # at module-exec time
    _stub_module("refpcdet.ops.mssvt.mssvt_ops")
    _stub_module("refpcdet.ops.pointnet2.pointnet2_batch.pointnet2_utils")
    _stub_module("refpcdet.ops.roiaware_pool3d.roiaware_pool3d_utils")
    _stub_module("refpcdet.ops.iou3d_nms.iou3d_nms_utils")

    # --- absent third-party packages
    if "SharedArray" not in sys.modules:
        _stub_module("SharedArray")
    if "timm" not in sys.modules:
        import torch

        class _DropPath(torch.nn.Module):
            """timm DropPath stand-in: identity in eval (rate only matters
            in train mode, which the oracles never use)."""

            def __init__(self, drop_prob=0.0):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):
                return x

        _stub_module("timm")
        _stub_module("timm.models")
        _stub_module("timm.models.layers", DropPath=_DropPath)


@contextlib.contextmanager
def cpu_cuda_shim():
    """Run reference code that hardcodes device='cuda' / .cuda() on CPU.

    The MsSVT block's query-table builder pins its (tiny, init-time) offset
    tables to CUDA (ref: mssvt_backbone.py:77-82); this shim strips those
    placements so the REAL builder executes on CPU for table-parity tests.
    """
    import torch

    orig_tensor = torch.tensor
    orig_cuda = torch.Tensor.cuda

    def tensor(*a, **k):
        if isinstance(k.get("device"), str) and k["device"].startswith("cuda"):
            k = dict(k)
            k.pop("device")
        return orig_tensor(*a, **k)

    torch.tensor = tensor
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        yield
    finally:
        torch.tensor = orig_tensor
        torch.Tensor.cuda = orig_cuda


def load_ref(dotted: str):
    """Import e.g. 'utils.box_coder_utils' from the reference snapshot.

    Returns the executed module object whose source is the REAL file at
    /root/reference/pcdet/<dotted path>.py.
    """
    _ensure_refpcdet()
    return importlib.import_module(f"refpcdet.{dotted}")

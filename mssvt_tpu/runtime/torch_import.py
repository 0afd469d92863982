"""Torch-checkpoint importer: reference state_dict -> flax variables.

The reference saves ``checkpoint_state = {epoch, it, model_state, version}``
(ref: tools/train_utils/train_utils.py:146-180) with torch module naming from
``Detector3DTemplate``'s topology (``vfe``, ``backbone_3d``,
``map_to_bev_module``, ``backbone_2d``, ``dense_head``, ...; ref:
detector3d_template.py:23-50). This module maps those keys onto the flax
param/batch_stats tree of the TPU rebuild, with the layout transforms each
layer type needs:

- ``nn.Linear``  weight (out, in)            -> Dense kernel (in, out)
- ``nn.Conv2d``  weight (out, in, kh, kw)    -> Conv kernel (kh, kw, in, out)
- ``nn.Conv1d``  k=1 weight (out, in, 1)     -> Dense kernel (in, out)
- ``nn.ConvTranspose2d`` (in, out, kh, kw)   -> ConvTranspose kernel
  (kh, kw, in, out) with BOTH spatial axes flipped (verified numerically
  against torch; flax's conv_transpose does not flip the kernel)
- BatchNorm weight/bias/running_mean/running_var -> scale/bias + batch_stats
- LayerNorm weight/bias -> scale/bias

Shape-tolerant like the reference loader (ref: detector3d_template.py:330-359):
unmatched or shape-mismatched entries keep their flax initialization and are
reported, so partially-compatible checkpoints load the way they do upstream.

One genuine layout divergence is handled here rather than in the model: the
rebuild's BEV densify is z-major ((B, H, W, D*C), see SparseVoxels.bev)
while the reference reshapes (B, C, D, H, W) -> (B, C*D, H, W) channel-major
(ref: height_compression.py:41-45). The FIRST conv consuming the BEV tensor
gets its input channels permuted accordingly.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np


def _t_linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _t_conv2d(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _t_conv1d_k1(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w[:, :, 0].T)


def _t_deconv2d(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1)[::-1, ::-1])


def bev_channel_perm(num_bev: int, depth: int) -> np.ndarray:
    """perm[j] = torch input channel feeding flax input channel j.

    Flax BEV channel j = z * C + c (z-major); torch channel i = c * D + z.
    """
    c_dim = num_bev // depth
    j = np.arange(num_bev)
    z, c = j // c_dim, j % c_dim
    return c * depth + z


# ---------------------------------------------------------------------- #
# flax path -> (torch key, transform) rules for the MsSVT CenterPoint stack
# ---------------------------------------------------------------------- #

def _map_backbone_3d(parts: List[str]) -> Tuple[str, Any]:
    # parts like ['blocks_0', 'ms_attn', 'to_q_1', 'kernel']
    m = re.match(r"blocks_(\d+)$", parts[0])
    if not m:
        return None, None  # input_proj has no torch counterpart
    i = m.group(1)
    base = f"backbone_3d.backbone.{i}"
    rest = parts[1:]
    leaf = rest[-1]
    if rest[0] == "ms_attn":
        g = re.match(r"(to_q|to_kv|proj)_(\d+)$", rest[1])
        name = {"to_q": "to_qs", "to_kv": "to_kvs", "proj": "projs"}[g.group(1)]
        key = f"{base}.ms_attn.{name}.{g.group(2)}." + (
            "weight" if leaf == "kernel" else "bias")
        return key, (_t_linear if leaf == "kernel" else None)
    if rest[0] in ("norm1", "norm2"):
        key = f"{base}.{rest[0]}." + ("weight" if leaf == "scale" else "bias")
        return key, None
    if rest[0] in ("linear1", "linear2", "out_linear"):
        key = f"{base}.{rest[0]}." + ("weight" if leaf == "kernel" else "bias")
        return key, (_t_linear if leaf == "kernel" else None)
    if rest[0] == "pos_proj":
        idx = {"proj0": 0, "proj1": 2}[rest[1]]  # Sequential: Conv1d,ReLU,...
        key = f"{base}.pos_proj.{idx}." + (
            "weight" if leaf == "kernel" else "bias")
        return key, (_t_conv1d_k1 if leaf == "kernel" else None)
    return None, None


def _map_backbone_2d(parts: List[str], collection: str) -> Tuple[str, Any]:
    leaf = parts[-1]
    m = re.match(r"block(\d+)_conv(\d+)$", parts[0])
    if m:
        i, k = int(m.group(1)), int(m.group(2))
        # Sequential: [ZeroPad, Conv, BN, ReLU] + [Conv, BN, ReLU] * n
        idx = 1 if k == 0 else 1 + 3 * k
        return f"backbone_2d.blocks.{i}.{idx}.weight", _t_conv2d
    m = re.match(r"block(\d+)_bn(\d+)$", parts[0])
    if m:
        i, k = int(m.group(1)), int(m.group(2))
        idx = (1 if k == 0 else 1 + 3 * k) + 1
        return (f"backbone_2d.blocks.{i}.{idx}." + _bn_leaf(leaf, collection),
                None)
    m = re.match(r"deblock(?:(\d+)|_extra)_(conv|bn)$", parts[0])
    if m:
        i = m.group(1)
        # the extra deblock (upsample_strides longer than layer_nums) is the
        # last entry of the torch ModuleList
        i = i if i is not None else "LAST"
        if m.group(2) == "conv":
            return f"backbone_2d.deblocks.{i}.0.weight", _t_deconv2d
        return f"backbone_2d.deblocks.{i}.1." + _bn_leaf(leaf, collection), None
    return None, None


def _bn_leaf(leaf: str, collection: str) -> str:
    if collection == "batch_stats":
        return {"mean": "running_mean", "var": "running_var"}[leaf]
    return {"scale": "weight", "bias": "bias"}[leaf]


def _map_map_to_bev(parts: List[str], collection: str) -> Tuple[str, Any]:
    leaf = parts[-1]
    m = re.match(r"compress_conv_(\d+)$", parts[0])
    if m:
        # ModuleList flat: [Conv, BN, ReLU] * n -> conv i at 3*i
        return (f"map_to_bev_module.compress_layers.{3 * int(m.group(1))}"
                ".weight", _t_conv2d)
    m = re.match(r"compress_bn_(\d+)$", parts[0])
    if m:
        return (f"map_to_bev_module.compress_layers."
                f"{3 * int(m.group(1)) + 1}." + _bn_leaf(leaf, collection),
                None)
    return None, None


def _map_dense_head(parts: List[str], collection: str) -> Tuple[str, Any]:
    leaf = parts[-1]
    if parts[0] == "shared_conv":
        return "dense_head.shared_conv.0.weight", _t_conv2d
    if parts[0] == "shared_bn":
        return ("dense_head.shared_conv.1." + _bn_leaf(leaf, collection), None)
    m = re.match(r"head_(\d+)$", parts[0])
    if m and len(parts) >= 3:
        h = m.group(1)
        sub = parts[1]
        g = re.match(r"(.+)_(conv|bn)(\d+)$", sub)
        if g:
            name, kind, k = g.group(1), g.group(2), int(g.group(3))
            if kind == "conv":
                return (f"dense_head.heads_list.{h}.{name}.{k}.0.weight",
                        _t_conv2d)
            return (f"dense_head.heads_list.{h}.{name}.{k}.1."
                    + _bn_leaf(leaf, collection), None)
        g = re.match(r"(.+)_out$", sub)
        if g:
            name = g.group(1)
            return (f"dense_head.heads_list.{h}.{name}.LAST." + (
                "weight" if leaf == "kernel" else "bias"),
                _t_conv2d if leaf == "kernel" else None)
    return None, None


def flax_to_torch_key(path: Tuple[str, ...]) -> Tuple[str, Any]:
    """(collection, module, ...) flax path -> (torch key pattern, transform).

    Returned keys may contain the placeholder ``LAST`` for a trailing
    Sequential/ModuleList index resolved against the actual state dict.
    """
    collection, top, parts = path[0], path[1], list(path[2:])
    if top == "backbone_3d":
        return _map_backbone_3d(parts)
    if top == "backbone_2d":
        return _map_backbone_2d(parts, collection)
    if top == "map_to_bev":
        return _map_map_to_bev(parts, collection)
    if top == "dense_head":
        return _map_dense_head(parts, collection)
    return None, None


def _resolve_last(key: str, state: Dict[str, np.ndarray]) -> str:
    """Resolve a single ``LAST`` placeholder against existing torch keys."""
    if "LAST" not in key:
        return key
    prefix, suffix = key.split(".LAST.", 1)
    best = -1
    pat = re.compile(re.escape(prefix) + r"\.(\d+)\.")
    for k in state:
        m = pat.match(k)
        if m:
            best = max(best, int(m.group(1)))
    return f"{prefix}.{best}.{suffix}" if best >= 0 else key


def convert_state_dict(
    state: Dict[str, np.ndarray],
    variables: Dict[str, Any],
    bev_depth: int = 0,
) -> Tuple[Dict[str, Any], Dict[str, List[str]]]:
    """Map a reference ``model_state`` dict onto flax ``variables``.

    Args:
        state: torch key -> numpy array (call ``.numpy()`` upstream).
        variables: the flax {params, batch_stats} tree to fill (unchanged
            entries keep their initialization — shape-tolerant partial load,
            like ref detector3d_template.py:330-359).
        bev_depth: z-depth of the final sparse tensor; when > 0 the first
            BEV-consuming conv's input channels are permuted from the
            reference's channel-major to the rebuild's z-major layout.

    Returns:
        (new_variables, report) with report keys 'loaded', 'missing'
        (flax leaves with no torch source), 'shape_mismatch', 'unused'
        (torch keys never consumed).
    """
    import jax

    flat = _flatten(variables)
    has_compress = any(
        len(p) > 2 and p[1] == "map_to_bev" and p[2] == "compress_conv_0"
        for p in flat)
    first_bev = (("map_to_bev", "compress_conv_0") if has_compress
                 else ("backbone_2d", "block0_conv0"))
    report = {"loaded": [], "missing": [], "shape_mismatch": [], "unused": []}
    used = set()
    out = {}
    for path, leaf in flat.items():
        key, tf = flax_to_torch_key(path)
        val = None
        if key is not None:
            key = _resolve_last(key, state)
            if key in state:
                val = np.asarray(state[key])
                if tf is not None:
                    val = tf(val)
                if (bev_depth > 0 and path[-1] == "kernel"
                        and path[1:3] == first_bev):
                    perm = bev_channel_perm(val.shape[2], bev_depth)
                    val = val[:, :, perm, :]
        if val is None:
            report["missing"].append("/".join(path))
            out[path] = leaf
        elif tuple(val.shape) != tuple(np.shape(leaf)):
            report["shape_mismatch"].append(
                f"{'/'.join(path)}: flax{tuple(np.shape(leaf))} "
                f"torch{tuple(val.shape)} ({key})")
            out[path] = leaf
        else:
            report["loaded"].append("/".join(path))
            used.add(key)
            out[path] = jax.numpy.asarray(val, dtype=leaf.dtype)
    report["unused"] = sorted(
        k for k in state if k not in used and "num_batches_tracked" not in k)
    return _unflatten(out), report


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (str(k),)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat):
    root: Dict[str, Any] = {}
    for path, leaf in flat.items():
        node = root
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf
    return root

"""FULL-BLOCK / multi-block numeric parity vs the reference source.

The strongest accuracy proxy available offline (VERDICT r3 item 5): the
reference's own ``MixedScaleSparseTransformerBlock`` /
``MixedScaleSparseTransformerCompressBlock`` (loaded from /root/reference via
``ref_loader``) run end-to-end on CPU with exact-semantics CPU oracles of the
CUDA kernels (``ref_cpu_ops``), against our flax blocks under
``convert_state_dict``-imported reference weights.

Scene note: every occupied window carries its CENTER voxel. Without it, the
reference's ``(gathered_float + 0.1).int()`` trick maps FPS picks of empty
buffer slots to batch-local row 0 (a real voxel) instead of -1
(ref: mssvt_backbone.py:252-258) — the documented ref-compat divergence
covered by ``test_fps_pad_keys_ref_compat`` scenarios once implemented; here
the center voxel guarantees FPS never prefers an empty (0,0,0) slot, so both
implementations pick identical key sets and outputs must match numerically.

Arithmetic note: voxel_size 0.5 and half-integer ranges keep every metric
coordinate, squared distance, and 3-NN weight denominator EXACT in float32,
so distance ties resolve identically in the oracle's diff-form and our
expansion-form d2 (see three_interp_weights_planes).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp

from ref_cpu_ops import install_ref_cpu_ops
from ref_loader import cpu_cuda_shim, load_ref

F32 = jax.default_matmul_precision("float32")

SHAPE = (12, 12, 8)  # x, y, z
VOXEL = (0.5, 0.5, 0.5)
PCR = (-3.0, -3.0, -2.0, 3.0, 3.0, 2.0)
C = 16


def _state_np(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def make_scene(rng, n=90, batch=2, shape=SHAPE, win1=(3, 3, 2)):
    """Random voxels, batch-major, PLUS the center voxel of every occupied
    window (see module docstring)."""
    x_max, y_max, z_max = shape
    wx, wy, wz = win1
    rows = set()
    while len(rows) < n:
        rows.add((
            int(rng.integers(0, batch)), int(rng.integers(0, z_max)),
            int(rng.integers(0, y_max)), int(rng.integers(0, x_max))))
    for b, z, y, x in list(rows):
        rows.add((b, (z // wz) * wz + wz // 2, (y // wy) * wy + wy // 2,
                  (x // wx) * wx + wx // 2))
    coords = np.asarray(sorted(rows), np.int32)  # batch-major
    feats = rng.standard_normal((len(coords), C)).astype(np.float32)
    return coords, feats


def _make_ref_sparse(mu, coords, feats):
    return mu.SparseTensor(
        features=torch.from_numpy(feats.copy()),
        indices=torch.from_numpy(coords.astype(np.int32)),
        spatial_shape=list(SHAPE),
        voxel_size=list(VOXEL),
        point_cloud_range=list(PCR),
        batch_size=int(coords[:, 0].max()) + 1,
        hash_size=100003,
    )


def _make_our_sparse(coords, feats, cap=160, spatial_shape=SHAPE,
                     voxel_size=VOXEL, batch_size=2):
    from mssvt_tpu.core.sparse import SparseVoxels

    v = len(coords)
    pad = np.full((cap, 4), -1, np.int32)
    pad[:v] = coords
    valid = np.arange(cap) < v
    f = np.zeros((cap, C), np.float32)
    f[:v] = feats
    return SparseVoxels.create(
        features=jnp.asarray(f), coords=jnp.asarray(pad),
        valid=jnp.asarray(valid), batch_size=batch_size,
        spatial_shape=spatial_shape, voxel_size=voxel_size,
        point_cloud_range=PCR, with_index=False)


def _import_block_weights(model, variables, ref_block, sp, block_idx=0):
    from mssvt_tpu.runtime.torch_import import convert_state_dict

    wrapped = {k: {"backbone_3d": {f"blocks_{block_idx}": v}}
               for k, v in variables.items()}
    state = {f"backbone_3d.backbone.{block_idx}.{k}": v
             for k, v in _state_np(ref_block).items()}
    new_vars, report = convert_state_dict(state, wrapped)
    assert not report["missing"] and not report["unused"], report
    return {k: v["backbone_3d"][f"blocks_{block_idx}"]
            for k, v in new_vars.items()}


def _ref_two_scale_block(bb, cbs_pattern=1, key_num_sample=6,
                         max_num_win2=24, win1=(3, 3, 2), win2=(9, 9, 4),
                         heads=(2, 2), in_c=C):
    with cpu_cuda_shim():
        blk = bb.MixedScaleSparseTransformerBlock(
            cfg=None, in_channels=in_c, ff_channels=2 * in_c,
            out_channels=in_c, num_heads=list(heads), dropout=0.0,
            drop_path=0.0, window_size=[list(win1), list(win2)],
            max_num_win2=max_num_win2, cbs_pattern=cbs_pattern,
            key_num_sample=key_num_sample)
    blk.eval()
    return blk


def _ref_parts(ref_blk):
    """The reference block's ACTUAL query tables as hashable nested tuples.

    Within equal-Chebyshev shells the ref order comes from an unstable
    torch.sort — an input baked into checkpoints, threaded into our blocks
    via ``table_parts`` (ops/window.py build_query_tables)."""
    return tuple(sorted(
        (k, tuple(map(tuple, v.cpu().numpy().tolist())))
        for k, v in ref_blk.vox_query_table.items()))


def _our_two_scale_block(cbs_pattern=1, key_num_sample=6, max_num_win2=24,
                         win1=(3, 3, 2), win2=(9, 9, 4), heads=(2, 2),
                         in_c=C, max_windows=40, table_parts=None):
    from mssvt_tpu.models.backbones_3d.mssvt import MsSVTBlock

    return MsSVTBlock(
        in_channels=in_c, ff_channels=2 * in_c, out_channels=in_c,
        num_heads=heads, window_size=(win1, win2), max_windows=max_windows,
        max_num_win2=max_num_win2, cbs_pattern=cbs_pattern,
        key_num_sample=key_num_sample, table_parts=table_parts)


def _compare_by_coord(ref_coords, ref_feats, our_sp, atol, label):
    got = np.asarray(our_sp.features)
    coords = np.asarray(our_sp.coords)
    valid = np.asarray(our_sp.valid)
    ours = {tuple(c): got[i] for i, c in enumerate(coords) if valid[i]}
    assert len(ours) == len(ref_coords), (label, len(ours), len(ref_coords))
    worst = 0.0
    for c, want in zip(ref_coords, ref_feats):
        g = ours[tuple(c)]
        worst = max(worst, float(np.abs(g - want).max()))
        np.testing.assert_allclose(g, want, atol=atol, err_msg=f"{label} {c}")
    return worst


@pytest.mark.parametrize("cbs_pattern", [1, 0, 2])
def test_full_block_parity_vs_reference_source(cbs_pattern):
    """One full MsSVT block — window partition, two-scale gather, FPS keys,
    pos-MLP, mixed-scale attention, 3-NN interpolation, write-back, FFN —
    matches the reference source end to end (all three chessboard
    patterns)."""
    install_ref_cpu_ops()
    mu = load_ref("models.model_utils.mssvt_utils")
    bb = load_ref("models.backbones_3d.mssvt_backbone")

    rng = np.random.default_rng(11 + cbs_pattern)
    coords, feats = make_scene(rng)

    ref_blk = _ref_two_scale_block(bb, cbs_pattern=cbs_pattern)
    sp_ref = _make_ref_sparse(mu, coords, feats)
    with torch.no_grad():
        out_ref = ref_blk(sp_ref).features.numpy()

    model = _our_two_scale_block(cbs_pattern=cbs_pattern,
                                 table_parts=_ref_parts(ref_blk))
    sp = _make_our_sparse(coords, feats)
    with F32:
        variables = model.init(jax.random.PRNGKey(0), sp, deterministic=True)
    params = _import_block_weights(model, variables, ref_blk, sp)
    with F32:
        out = model.apply(params, sp, deterministic=True)
    _compare_by_coord(coords, out_ref, out, atol=2e-4,
                      label=f"block(cbs={cbs_pattern})")


def test_compress_block_parity_vs_reference_source():
    """One compress (downsample) block: window-level queries via max-pool,
    deep pos-MLP on keys, single-scale attention, FFN, and the voxel-set
    replacement (windows become the new voxels)."""
    install_ref_cpu_ops()
    mu = load_ref("models.model_utils.mssvt_utils")
    bb = load_ref("models.backbones_3d.mssvt_backbone")

    rng = np.random.default_rng(5)
    coords, feats = make_scene(rng, win1=(2, 2, 2))

    with cpu_cuda_shim():
        ref_blk = bb.MixedScaleSparseTransformerCompressBlock(
            cfg=None, in_channels=C, ff_channels=2 * C, out_channels=C,
            num_heads=[4], dropout=0.0, drop_path=0.0,
            window_size=[[2, 2, 2]])
    ref_blk.eval()
    sp_ref = _make_ref_sparse(mu, coords, feats)
    with torch.no_grad():
        out_sp = ref_blk(sp_ref)
        out_ref = out_sp.features.numpy()
        ref_win = out_sp.indices.numpy()

    from mssvt_tpu.models.backbones_3d.mssvt import MsSVTCompressBlock

    model = MsSVTCompressBlock(
        in_channels=C, ff_channels=2 * C, out_channels=C, num_heads=(4,),
        window_size=((2, 2, 2),), max_windows=60,
        table_parts=_ref_parts(ref_blk))
    sp = _make_our_sparse(coords, feats)
    with F32:
        variables = model.init(jax.random.PRNGKey(0), sp, deterministic=True)
    params = _import_block_weights(model, variables, ref_blk, sp)
    with F32:
        out = model.apply(params, sp, deterministic=True)
    assert out.spatial_shape == (6, 6, 4)
    assert out.voxel_size == (1.0, 1.0, 1.0)
    _compare_by_coord(ref_win, out_ref, out, atol=2e-4, label="compress")


def test_three_block_backbone_parity_vs_reference_source():
    """Block(odd) → CompressBlock → Block(even) chained — the mssvt.yaml
    interleaving at miniature scale, including the resolution change and the
    derived even-query path — against the chained reference blocks."""
    install_ref_cpu_ops()
    mu = load_ref("models.model_utils.mssvt_utils")
    bb = load_ref("models.backbones_3d.mssvt_backbone")

    rng = np.random.default_rng(29)
    coords, feats = make_scene(rng, n=110, win1=(3, 3, 2))

    ref_b0 = _ref_two_scale_block(bb, cbs_pattern=1)
    with cpu_cuda_shim():
        ref_b1 = bb.MixedScaleSparseTransformerCompressBlock(
            cfg=None, in_channels=C, ff_channels=2 * C, out_channels=C,
            num_heads=[4], dropout=0.0, drop_path=0.0,
            window_size=[[2, 2, 2]])
    ref_b2 = _ref_two_scale_block(bb, cbs_pattern=0, win1=(3, 3, 2),
                                  win2=(9, 9, 4))
    ref_b1.eval(), ref_b2.eval()

    sp_ref = _make_ref_sparse(mu, coords, feats)
    with torch.no_grad():
        sp_ref = ref_b0(sp_ref)
        sp_ref = ref_b1(sp_ref)
        # compress rebuilt the hash table for the new (6, 6, 4) grid via the
        # oracle's get_non_empty_window_center map
        sp_ref = ref_b2(sp_ref)
        out_ref = sp_ref.features.numpy()
        ref_idx = sp_ref.indices.numpy()

    from mssvt_tpu.models.backbones_3d.mssvt import MsSVTCompressBlock

    b0 = _our_two_scale_block(cbs_pattern=1, table_parts=_ref_parts(ref_b0))
    b1 = MsSVTCompressBlock(
        in_channels=C, ff_channels=2 * C, out_channels=C, num_heads=(4,),
        window_size=((2, 2, 2),), max_windows=80,
        table_parts=_ref_parts(ref_b1))
    b2 = _our_two_scale_block(cbs_pattern=0, max_windows=40,
                              table_parts=_ref_parts(ref_b2))

    sp = _make_our_sparse(coords, feats, cap=200)
    with F32:
        v0 = b0.init(jax.random.PRNGKey(0), sp, deterministic=True)
    p0 = _import_block_weights(b0, v0, ref_b0, sp)
    with F32:
        s1 = b0.apply(p0, sp, deterministic=True)
        v1 = b1.init(jax.random.PRNGKey(0), s1, deterministic=True)
    p1 = _import_block_weights(b1, v1, ref_b1, s1, block_idx=1)
    with F32:
        s2 = b1.apply(p1, s1, deterministic=True)
        v2 = b2.init(jax.random.PRNGKey(0), s2, deterministic=True)
    p2 = _import_block_weights(b2, v2, ref_b2, s2, block_idx=2)
    with F32:
        s3 = b2.apply(p2, s2, deterministic=True)

    _compare_by_coord(ref_idx, out_ref, s3, atol=5e-4, label="backbone3")


def test_pad_key_ref_compat_parity():
    """SPARSE scene with NO center-voxel guarantee: FPS picks empty (0,0,0)
    buffer slots, which the reference's ``(float + 0.1).int()`` turns into
    batch-local row 0 keys (ref: mssvt_backbone.py:252-258). Our
    ``ref_compat_keys`` path must reproduce that numerically."""
    install_ref_cpu_ops()
    mu = load_ref("models.model_utils.mssvt_utils")
    bb = load_ref("models.backbones_3d.mssvt_backbone")

    rng = np.random.default_rng(77)
    # few voxels, edge-clustered: windows miss their centers
    rows = set()
    while len(rows) < 40:
        rows.add((int(rng.integers(0, 2)), int(rng.integers(0, 8)),
                  int(rng.integers(0, 12)), int(rng.integers(0, 12))))
    coords = np.asarray(sorted(rows), np.int32)
    feats = rng.standard_normal((len(coords), C)).astype(np.float32)

    ref_blk = _ref_two_scale_block(bb, cbs_pattern=1)
    sp_ref = _make_ref_sparse(mu, coords, feats)
    with torch.no_grad():
        out_ref = ref_blk(sp_ref).features.numpy()

    model = _our_two_scale_block(cbs_pattern=1,
                                 table_parts=_ref_parts(ref_blk))
    sp = _make_our_sparse(coords, feats, cap=64)
    with F32:
        variables = model.init(jax.random.PRNGKey(0), sp, deterministic=True)
    params = _import_block_weights(model, variables, ref_blk, sp)
    with F32:
        out = model.apply(params, sp, deterministic=True)
    _compare_by_coord(coords, out_ref, out, atol=2e-4, label="pad-keys")

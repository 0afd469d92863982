"""Mixed-scale Sparse Voxel Transformer backbone (flax, TPU-native).

Behavioral rebuild of the reference backbone
(ref: pcdet/models/backbones_3d/mssvt_backbone.py):

- ``MsSVTBlock`` ≙ ``MixedScaleSparseTransformerBlock`` (:11-346)
- ``MsSVTCompressBlock`` ≙ ``MixedScaleSparseTransformerCompressBlock`` (:349-398)
- ``MixedScaleSparseTransformer`` ≙ the registered backbone (:401-472)

TPU-native re-design highlights (see ops/window.py, ops/sampling.py):
- dynamic (N, C) tensors + hash table → static-capacity SparseVoxels +
  sorted-key index; the reference's per-batch python loops (with_bs_cnt
  :124-130, scatter-back :313-336) collapse into single vectorized
  gathers/scatters with global row indices.
- the scatter-back "grad bug" workaround (:315-317) disappears: functional
  updates have no aliasing.
- attention runs as (num_windows, heads, nq, nk) batched einsums on the MXU.

Capacity semantics: each block has a static ``max_windows`` (the reference
hardcodes 90000, :56) and fixed per-buffer gather capacities; overflowing
windows/voxels are dropped exactly like the reference's fixed-size CUDA
buffers.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

import os

from ...core.sparse import SparseVoxels
from ...ops.pallas_ffn import fused_residual_ffn
from ...ops.pallas_fill import PACK5_ZERO
from ...ops.sampling import (
    farthest_point_sample_planes_select,
    gather_along_batch,
    group_features,
    group_features_paired,
    three_interp_weights_planes,
    writeback_inverse_paired,
)
from ...ops.window import build_query_tables, gather_window_voxels, window_partition


def _unpack_planes(p: jnp.ndarray):
    """Packed 5-bit-biased offsets -> three int32 component planes."""
    return ((p >> 10) & 31) - 16, ((p >> 5) & 31) - 16, (p & 31) - 16
from ..model_utils.attention import MixedScaleAttention, _use_fused_kernel
from ..model_utils.layers import DropPath, PosProjection


def _window_metric_centers(win_coords, voxel_size, win_size, point_cloud_range):
    """Metric centers of windows ((idx + 0.5) * win_metric_size + pc_min).

    Equivalent of ``with_coords`` applied to window indices with the
    window-scaled voxel size (ref: mssvt_backbone.py:214-215,269).
    """
    ws = jnp.asarray(
        [voxel_size[i] * win_size[i] for i in range(3)], jnp.float32
    )
    mins = jnp.asarray(point_cloud_range[:3], jnp.float32)
    xyz = win_coords[:, [3, 2, 1]].astype(jnp.float32)
    return (xyz + 0.5) * ws + mins


def _writeback_inverse(upd_fea, inv, shortcut, ind=None):
    """Inverse write-back: each voxel row-gathers its updated feature from
    its (window, slot) address; dropped/unassigned voxels keep the shortcut.
    Module-level so the ablation harness can stub it.

    With ``ind`` (the win1 buffer's (NW, cap) row table — the inverse map's
    forward image) the op runs under a custom VJP whose backward is a row
    GATHER at ``ind`` instead of a (V,)-descriptor row scatter (see
    ops/sampling.py writeback_inverse_paired)."""
    if ind is not None:
        return writeback_inverse_paired(
            upd_fea, shortcut, ind, inv["win_row"], inv["slot"], inv["valid"])
    nw_b, n1b, c = upd_fea.shape
    pos = jnp.clip(inv["win_row"] * n1b + inv["slot"], 0, nw_b * n1b - 1)
    # mode="clip" (pos is pre-clipped): avoids jnp.take's fill-mode select
    # sweep over the (V, C) gathered slab
    rows = jnp.take(upd_fea.reshape(-1, c), pos, axis=0, mode="clip")
    return jnp.where(inv["valid"][:, None],
                     rows.astype(shortcut.dtype), shortcut)


class MsSVTBlock(nn.Module):
    """One mixed-scale window-attention stage (resolution-preserving)."""

    in_channels: int
    ff_channels: int
    out_channels: int
    num_heads: Sequence[int]
    window_size: Sequence[Sequence[int]]  # [win1] or [win1, win2]
    max_windows: int  # per-sample cap; scaled by batch_size at call time
    max_num_win1: Optional[int] = None
    max_num_win2: Optional[int] = None
    cbs_mode: str = "odd_even"
    cbs_pattern: int = 1  # 0=even, 1=odd, 2=all-win1 queries (ref :220-234)
    key_num_sample: int = 32
    use_feature_interpolation: bool = True
    dropout: float = 0.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32
    # Reference pad-key semantics (see the FPS key selection below): FPS
    # picks of EMPTY buffer slots become real keys carrying the batch's
    # first voxel (the ref's ``(float + 0.1).int()`` maps -1 to 0, so its
    # own k_ind<0 mask is dead code — ref: mssvt_backbone.py:252-258).
    # Default ON for checkpoint parity; False masks those keys instead
    # (strictly cleaner when training from scratch).
    ref_compat_keys: bool = True
    # optional checkpoint-side query-table order (nested tuples, see
    # ops/window.py build_query_tables ``parts``): the reference's
    # within-shell cell order comes from an unstable torch.sort and is baked
    # into trained checkpoints — pass it here when importing one
    table_parts: Any = None

    def setup(self):
        assert len(self.window_size) == 2, "MsSVTBlock needs two window scales"
        self.win1 = tuple(int(s) for s in self.window_size[0])
        self.win2 = tuple(int(s) for s in self.window_size[1])
        parts = (None if self.table_parts is None else
                 {k: np.asarray(v, np.int32)
                  for k, v in dict(self.table_parts).items()})
        self.tables = build_query_tables(self.win1, self.win2, self.cbs_mode,
                                         parts=parts)
        # default capacities = full window volume (ref :65-68)
        self.cap1 = int(np.prod(self.win1)) if self.max_num_win1 is None else self.max_num_win1
        self.cap2 = int(np.prod(self.win2)) if self.max_num_win2 is None else self.max_num_win2

        self.norm1 = nn.LayerNorm(dtype=self.dtype)
        self.norm2 = nn.LayerNorm(dtype=self.dtype)
        self.ms_attn = MixedScaleAttention(
            embed_dim=self.in_channels, num_heads=tuple(self.num_heads),
            dropout=self.dropout, dtype=self.dtype,
        )
        self.pos_proj = PosProjection(self.in_channels, deep=False, dtype=self.dtype)
        self.linear1 = nn.Dense(self.ff_channels, dtype=self.dtype)
        self.linear2 = nn.Dense(self.in_channels, dtype=self.dtype)
        self.dropout1 = nn.Dropout(self.dropout)
        self.droppath = DropPath(self.drop_path)
        if self.out_channels != self.in_channels:
            self.out_linear = nn.Dense(self.out_channels, dtype=self.dtype)

    def __call__(self, sp: SparseVoxels, deterministic: bool = True) -> SparseVoxels:
        shortcut = sp.features  # (V, C)
        x = self.norm1(shortcut)

        # return_ranks: voxel→window-row, free from the dedup cumsum — the
        # inverse map then skips its cell_rows table + (V,) row gather
        # (xplane: 2.4 ms/step per two-scale block at Waymo scale)
        win_coords, win_valid, _, num_win, vrow = window_partition(
            sp.coords, sp.valid, sp.spatial_shape, self.win1,
            self.max_windows * sp.batch_size, batch_size=sp.batch_size,
            return_ranks=True,
        )
        # live-window count for the kernels' data-dependent tail skip (valid
        # windows are a sorted prefix of the static capacity)
        nv = jnp.minimum(num_win, self.max_windows * sp.batch_size)
        q_name = {0: "even", 1: "odd", 2: "win1"}[self.cbs_pattern]
        need = ("win1", "win2") if q_name == "win1" else (q_name, "win1", "win2")
        g = gather_window_voxels(
            win_coords, win_valid, sp.coords, sp.valid, sp.spatial_shape,
            self.win1, self.tables, max_num_win1=self.cap1,
            max_num_win2=self.cap2, batch_size=sp.batch_size,
            buffers=need, return_inverse=self.use_feature_interpolation,
            num_valid=nv, voxel_win_row=vrow,
        )
        q = g[q_name]
        win1b, win2b = g["win1"], g["win2"]

        # --- FPS key selection per scale (ref :247-258). Both scales ride
        # ONE sequential FPS loop: the win1 buffer is padded to the win2
        # capacity (PACK5_ZERO rows = zero coords, the existing padding
        # convention, masked afterwards) and stacked along the window axis —
        # halving the number of latency-bound sequential iterations.
        # Coordinates travel as PACKED single-channel ints unpacked into
        # per-component (NW, cap) PLANES: a trailing length-3 axis runs every
        # elementwise op at 3/128 lane utilization (measured ~5x slower).
        n1, n2 = win1b["ind"].shape[1], win2b["ind"].shape[1]
        if n1 < n2:
            pad_ind = jnp.pad(win1b["ind"], ((0, 0), (0, n2 - n1)),
                              constant_values=-1)
            pad_p = jnp.pad(win1b["coordp"], ((0, 0), (0, n2 - n1)),
                            constant_values=PACK5_ZERO)
        else:
            pad_ind, pad_p = win1b["ind"], win1b["coordp"]
        both_ind = jnp.concatenate([pad_ind, win2b["ind"]], axis=0)
        both_p = jnp.concatenate([pad_p, win2b["coordp"]], axis=0)
        bx, by, bz = _unpack_planes(both_p)
        # FPS also emits the picked coordinate planes and the picked buffer
        # rows (exact in f32): the selections fall out of the kernel's
        # one-hot reductions, replacing three (2NW, ks) take_along_axis
        # gathers of coords/indices after the fact
        fps, (sx, sy, sz, sind) = farthest_point_sample_planes_select(
            bx.astype(jnp.float32), by.astype(jnp.float32),
            bz.astype(jnp.float32), (both_ind,), self.key_num_sample,
            num_valid=nv, nw_half=win1b["ind"].shape[0])
        # mask repeated selections of slot 0 (ref :248-252)
        fps_mask = (fps == 0).at[:, 0].set(False)
        k_ind = sind.astype(jnp.int32)  # exact: rows < 2**24
        nw = win1b["ind"].shape[0]
        if self.ref_compat_keys:
            # Reference pad-key semantics: the ref converts the FPS-gathered
            # buffer values with ``(float + 0.1).int()``, which maps empty
            # slots' -1 to batch-local row **0** — NOT back to -1 — so its
            # ``k_ind < 0`` mask never fires and FPS picks of empty (0,0,0)
            # buffer slots become REAL keys carrying the batch's first
            # voxel's feature and coordinates (ref: mssvt_backbone.py:
            # 252-258). Checkpoints are trained with those keys; replicate:
            # key mask = FPS slot-0 repeats only, pad picks re-routed to the
            # batch's first global row.
            pad_key = k_ind < 0  # (2NW, ks) FPS picked an empty slot
            b_w = jnp.clip(win_coords[:, 0], 0, sp.batch_size - 1)  # (NW,)
            # first global row of each batch (coords are batch-major; -1
            # padded rows never match)
            bstart = jnp.stack([
                jnp.argmax(sp.coords[:, 0] == b).astype(jnp.int32)
                for b in range(sp.batch_size)])  # (B,)
            row0 = bstart[b_w]  # (NW,)
            row02 = jnp.concatenate([row0, row0])[:, None]  # (2NW, 1)
            k_ind = jnp.where(pad_key, row02, k_ind)
            k_mask = fps_mask
            pad1, pad2 = pad_key[:nw], pad_key[nw:]
        else:
            k_mask = fps_mask | (k_ind < 0)
            pad1 = pad2 = row0 = None
        k_ind1, k_ind2 = k_ind[:nw], k_ind[nw:]
        k_mask1, k_mask2 = k_mask[:nw], k_mask[nw:]
        # fps1 may point at the pad slots (masked via k_ind<0, or re-routed
        # to the pad row under ref_compat); clip so the local gathers from
        # the UNPADDED win1 buffers stay in bounds
        fps1 = jnp.minimum(fps[:nw], n1 - 1)

        # --- feature gathers (ref :260-268). The (NW, cap, C) win1-region
        # buffer is GATHER-built from the fill kernel's row table; win1 keys
        # reuse it via a LOCAL take_along_axis (fps indices address the
        # buffer), queries slice/gather it locally too, and all metric
        # coordinates are derived arithmetically from the gather buffers'
        # integer offsets — no voxel-table gather at all.
        # (A scatter-built alternative — V row descriptors through the
        # voxel→(window, slot) inverse map — was pruned after losing two
        # A/Bs: xplane-measured XLA row scatters run at ~72 ns/row vs
        # ~1.9 ns/row for row gathers on this chip; see git history.)
        inv = g.get("inv_win1") if self.use_feature_interpolation else None
        nq = q["ind"].shape[1]
        n1_cap = win1b["ind"].shape[1]
        q_prefix_ok = q_name in ("odd", "win1") and nq <= n1_cap
        if inv is not None:
            # paired form: identical forward gather, but the VJP is one
            # (V, C) row gather via the inverse map instead of an
            # NW*cap-descriptor scatter-add (ops/sampling.py)
            win1_fea = group_features_paired(
                x, win1b["ind"], inv["win_row"], inv["slot"], inv["valid"])
        else:
            win1_fea = group_features(x, win1b["ind"])  # (NW, n1, C)
        # assembled path: the local FPS take_along, q prefix/masking,
        # k1/k2 concat and pos-MLP add all happen inside the attention
        # module (in VMEM on the TPU fast path — see MixedScaleAttention)
        if q_prefix_ok:
            q_ext = None
        elif (q_name == "even" and "start" in q
              and self.tables.num_odd + self.tables.num_even <= n1_cap):
            # even cells are the win1-buffer run [odd_cnt, odd_cnt + nq):
            # a local one-hot take from win1_fea (exact: one nonzero per
            # row) whose VJP is a matmul — no global gather, no scatter
            pos_q = jnp.minimum(
                q["start"][:, None] + jnp.arange(nq, dtype=jnp.int32),
                n1_cap - 1)
            q_ext = gather_along_batch(win1_fea, pos_q) \
                * (~q["mask"])[..., None].astype(win1_fea.dtype)
        else:
            q_ext = group_features(x, q["ind"])
        k_fea2 = group_features(x, k_ind2)

        # metric center of a buffer slot = window-center voxel + offset,
        # all computed on per-component (NW, cap) planes
        vsx, vsy, vsz = (float(v_) for v_ in sp.voxel_size)
        minx, miny, minz = (float(v_) for v_ in sp.point_cloud_range[:3])
        wx, wy, wz = self.win1
        ctr_x = (win_coords[:, 3] * wx + wx // 2)[:, None]  # (NW, 1)
        ctr_y = (win_coords[:, 2] * wy + wy // 2)[:, None]
        ctr_z = (win_coords[:, 1] * wz + wz // 2)[:, None]

        def slot_metric_planes(p, empty_mask):
            ox, oy, oz = _unpack_planes(p)
            keep = (~empty_mask).astype(jnp.float32)
            mx = (((ctr_x + ox).astype(jnp.float32) + 0.5) * vsx + minx) * keep
            my = (((ctr_y + oy).astype(jnp.float32) + 0.5) * vsy + miny) * keep
            mz = (((ctr_z + oz).astype(jnp.float32) + 0.5) * vsz + minz) * keep
            return mx, my, mz

        def slot_metric_sel(ox, oy, oz, empty_mask):
            # same transform on ALREADY-UNPACKED f32 offset planes (the FPS
            # kernel's selected-coordinate outputs; masked lanes carry
            # arbitrary-but-finite values and are zeroed by ``keep``)
            keep = (~empty_mask).astype(jnp.float32)
            mx = ((ctr_x + ox + 0.5) * vsx + minx) * keep
            my = ((ctr_y + oy + 0.5) * vsy + miny) * keep
            mz = ((ctr_z + oz + 0.5) * vsz + minz) * keep
            return mx, my, mz

        q_m = slot_metric_planes(q["coordp"], q["mask"])
        win1_m = slot_metric_planes(win1b["coordp"], win1b["mask"])
        k_m1 = slot_metric_sel(sx[:nw], sy[:nw], sz[:nw], k_mask1)
        k_m2 = slot_metric_sel(sx[nw:], sy[nw:], sz[nw:], k_mask2)
        if self.ref_compat_keys:
            # pad-key coordinates = the batch's first voxel's metric center
            # (the ref gathers voxel_coord at the re-routed index, :265-268)
            c0 = jnp.take(sp.coords, bstart, axis=0)  # (B, 4)
            m0 = ((c0[:, 3].astype(jnp.float32) + 0.5) * vsx + minx,
                  (c0[:, 2].astype(jnp.float32) + 0.5) * vsy + miny,
                  (c0[:, 1].astype(jnp.float32) + 0.5) * vsz + minz)
            k_m1 = tuple(jnp.where(pad1, m[b_w][:, None], km)
                         for m, km in zip(m0, k_m1))
            k_m2 = tuple(jnp.where(pad2, m[b_w][:, None], km)
                         for m, km in zip(m0, k_m2))
        # window metric center planes (≡ _window_metric_centers)
        wcx = (win_coords[:, 3].astype(jnp.float32) + 0.5) * (vsx * wx) + minx
        wcy = (win_coords[:, 2].astype(jnp.float32) + 0.5) * (vsy * wy) + miny
        wcz = (win_coords[:, 1].astype(jnp.float32) + 0.5) * (vsz * wz) + minz

        # --- relative positions, masked to zero (ref :271-276); the 6-dim
        # pos-projection input is assembled with ONE stack at the end
        def rel_planes(m, empty_mask):
            keep = (~empty_mask).astype(jnp.float32)
            return ((m[0] - wcx[:, None]) * keep,
                    (m[1] - wcy[:, None]) * keep,
                    (m[2] - wcz[:, None]) * keep)

        q_rel = rel_planes(q_m, q["mask"])
        k_rel1 = rel_planes(k_m1, k_mask1)
        k_rel2 = rel_planes(k_m2, k_mask2)
        k_rel = tuple(jnp.concatenate([a, b], axis=1)
                      for a, b in zip(k_rel1, k_rel2))

        # --- position embeddings (ref :278-282), via the plane decomposition
        # (no (NW, cap, 6) stack, no K=6 matmul — that form measured
        # ~21 ms/frame by ablation). The pos MLP, concat and masking ride
        # inside the attention module; only the (NW, C) center half is
        # precomputed here.
        k_mask = jnp.concatenate([k_mask1, k_mask2], axis=1)  # (NW, 2*nk)
        attn_in = dict(assembled=dict(
            win1_fea=win1_fea, k2_fea=k_fea2, fps1=fps1,
            k_mask1=k_mask1, q_ext=q_ext,
            q_keep=(~q["mask"]).astype(jnp.float32),
            q_rel=q_rel, k_rel=k_rel,
            pos_base=self.pos_proj.base_from_centers(wcx, wcy, wcz),
            pos_w=self.pos_proj.rel_kernel(), nq=nq,
            num_valid=nv,
        ))
        if self.ref_compat_keys:
            # win1 pad picks carry the batch's first voxel's FEATURE row
            # (k2 pad picks already do — their global index was re-routed
            # before the k2 gather). The attention assembly adds
            # pad1 ⊗ pad_row to the k1 take; gradients to the first voxel
            # flow through pad_row's own (NW,)-row gather, keeping the
            # paired win1 VJP exact (empty-slot cotangents stay zero).
            attn_in["assembled"]["pad1"] = pad1
            attn_in["assembled"]["pad_row"] = jnp.take(
                x, row0, axis=0, mode="clip")  # (NW, C)

        # --- mixed-scale attention (ref :289-295) + 3-NN inverse-distance
        # propagation to all win1 voxels (ref :297-310). Parity note: like
        # the reference, the known set is NOT masked for padded query slots
        # (their coords gather to zeros); their features are query-masked to
        # ~0, so they dilute but do not corrupt.
        # (A fused-into-the-kernel interpolation epilogue was pruned after
        # losing its A/B by 5-15 ms/frame: the in-kernel W3 build serialized
        # into the kernel's critical path, whereas XLA overlaps the unfused
        # chain with neighboring work. See git history.)
        attn_fea = self.ms_attn(
            query_mask=q["mask"],
            key_masks=k_mask, deterministic=deterministic,
            **attn_in,
        )  # (NW, nq, C)
        if self.use_feature_interpolation:
            # dense W3 form: one (NW, n1, nq) matrix + one batched matmul
            # (vs the three_nn idx/weight + one-hot chain). A single-pass
            # Pallas variant (W3 built in VMEM) lost its A/B by 22 ms/frame
            # sync and was pruned — see git history (ops/pallas_interp.py).
            w3 = three_interp_weights_planes(
                win1_m[0], win1_m[1], win1_m[2],
                q_m[0], q_m[1], q_m[2], dtype=attn_fea.dtype)
            win1_fea = jnp.einsum(
                "bnm,bmc->bnc", w3, attn_fea,
                preferred_element_type=attn_fea.dtype)  # (NW, n1, C)
            upd_ind, upd_fea = win1b["ind"], win1_fea
        else:
            upd_ind, upd_fea = q["ind"], attn_fea

        # --- write back (replaces the per-batch loop, ref :313-336). Base
        # is the ORIGINAL features (ref clones sp_tensor.features, :317).
        # Preferred: INVERSE formulation — each voxel gathers its updated row
        # from (window, slot) (V row-descriptors instead of NW*cap scatter
        # descriptors, ~4x fewer at Waymo scale). Fallback: unique-index
        # scatter (each voxel appears at most once across the buffers).
        if inv is not None:
            updated = _writeback_inverse(upd_fea, inv, shortcut,
                                         ind=win1b["ind"])
        else:
            v = sp.max_voxels
            flat_ind = upd_ind.reshape(-1)
            n_upd = flat_ind.shape[0]
            safe = jnp.where(
                flat_ind >= 0, flat_ind,
                v + jnp.arange(n_upd, dtype=flat_ind.dtype),
            )
            updated = shortcut.at[safe].set(
                upd_fea.reshape(-1, upd_fea.shape[-1]).astype(shortcut.dtype),
                mode="drop", unique_indices=True,
            )

        # --- residual + FFN (ref :338-343). Deterministic fast path: one
        # row-tiled Pallas pass (XLA runs LN stats + two GEMM intermediates
        # + adds as separate full-tensor sweeps); droppath/dropout are
        # identity at eval so the fused form is exact.
        if _use_fused_kernel(nq=128, deterministic=deterministic):
            dt = self.dtype
            self.norm2(jnp.zeros((1, self.in_channels), dt))
            self.linear1(jnp.zeros((1, self.in_channels), dt))
            self.linear2(jnp.zeros((1, self.ff_channels), dt))
            pn = self.scope.get_variable("params", "norm2")
            p1 = self.scope.get_variable("params", "linear1")
            p2 = self.scope.get_variable("params", "linear2")
            new = fused_residual_ffn(
                updated + shortcut, pn["scale"], pn["bias"],
                p1["kernel"], p1["bias"], p2["kernel"], p2["bias"],
                interpret=os.environ.get("MSSVT_PALLAS") == "interpret",
            )
        else:
            new = self.droppath(updated, deterministic) + shortcut
            act = self.linear2(self.dropout1(
                nn.relu(self.linear1(self.norm2(new))),
                deterministic=deterministic))
            new = new + self.droppath(
                self.dropout1(act, deterministic=deterministic), deterministic)
        if self.out_channels != self.in_channels:
            new = self.out_linear(new)
        new = new * sp.valid[:, None]  # keep padding rows exactly zero
        return sp.with_features(new)


class MsSVTCompressBlock(nn.Module):
    """Downsampling stage: windows become the new voxels (ref :349-398)."""

    in_channels: int
    ff_channels: int
    out_channels: int
    num_heads: Sequence[int]
    window_size: Sequence[Sequence[int]]  # [win1] only
    max_windows: int  # per-sample cap; scaled by batch_size at call time
    max_num_win1: Optional[int] = None
    dropout: float = 0.0
    dtype: Any = jnp.float32
    table_parts: Any = None  # see MsSVTBlock.table_parts

    def setup(self):
        assert len(self.window_size) == 1, "CompressBlock is single-scale"
        self.win1 = tuple(int(s) for s in self.window_size[0])
        parts = (None if self.table_parts is None else
                 {k: np.asarray(v, np.int32)
                  for k, v in dict(self.table_parts).items()})
        self.tables = build_query_tables(self.win1, parts=parts)
        self.cap1 = int(np.prod(self.win1)) if self.max_num_win1 is None else self.max_num_win1

        self.norm1 = nn.LayerNorm(dtype=self.dtype)
        self.norm2 = nn.LayerNorm(dtype=self.dtype)
        self.ms_attn = MixedScaleAttention(
            embed_dim=self.in_channels, num_heads=tuple(self.num_heads),
            dropout=self.dropout, dtype=self.dtype,
        )
        self.pos_proj = PosProjection(self.in_channels, deep=True, dtype=self.dtype)
        self.linear1 = nn.Dense(self.ff_channels, dtype=self.dtype)
        self.linear2 = nn.Dense(self.in_channels, dtype=self.dtype)
        self.dropout1 = nn.Dropout(self.dropout)
        if self.out_channels != self.in_channels:
            self.out_linear = nn.Dense(self.out_channels, dtype=self.dtype)

    def __call__(self, sp: SparseVoxels, deterministic: bool = True) -> SparseVoxels:
        x = self.norm1(sp.features)

        # return_ranks: each voxel's row in the compacted window list — lets
        # the single-scale gather build its box table COMPACTLY per window
        # instead of over the dense cell grid (944 MB physical at Waymo
        # scale for this block; see ops/window.py compact branch)
        win_coords, win_valid, win_grid, num_win, vrow = window_partition(
            sp.coords, sp.valid, sp.spatial_shape, self.win1,
            self.max_windows * sp.batch_size, batch_size=sp.batch_size,
            return_ranks=True,
        )
        nv = jnp.minimum(num_win, self.max_windows * sp.batch_size)
        # training: also emit the voxel→(window, slot) inverse so the key
        # gather's VJP is a row gather, not an NW*cap scatter-add (the
        # inverse slabs cost extra fill-kernel outputs — skipped at eval)
        g = gather_window_voxels(
            win_coords, win_valid, sp.coords, sp.valid, sp.spatial_shape,
            self.win1, self.tables, max_num_win1=self.cap1,
            batch_size=sp.batch_size, return_inverse=not deterministic,
            num_valid=nv, voxel_win_row=vrow,
        )
        k = g["win1"]
        inv = g.get("inv_win1")
        if inv is not None:
            k_fea = group_features_paired(
                x, k["ind"], inv["win_row"], inv["slot"], inv["valid"])
        else:
            k_fea = group_features(x, k["ind"])  # (NW, ns, C)

        # key metric coordinates on per-component planes from the packed
        # gather offsets (== gathering sp.metric_centers() rows: empty slots
        # are zero either way, and slot metric = center voxel + offset).
        # A (NW, ns, 3)-trailing layout runs at 3/128 lane utilization.
        wx, wy, wz = self.win1
        vsx, vsy, vsz = (float(v_) for v_ in sp.voxel_size)
        minx, miny, minz = (float(v_) for v_ in sp.point_cloud_range[:3])
        ox, oy, oz = _unpack_planes(k["coordp"])
        keep = (~k["mask"]).astype(jnp.float32)
        ctr_x = (win_coords[:, 3] * wx + wx // 2)[:, None]
        ctr_y = (win_coords[:, 2] * wy + wy // 2)[:, None]
        ctr_z = (win_coords[:, 1] * wz + wz // 2)[:, None]
        mx = (((ctr_x + ox).astype(jnp.float32) + 0.5) * vsx + minx) * keep
        my = (((ctr_y + oy).astype(jnp.float32) + 0.5) * vsy + miny) * keep
        mz = (((ctr_z + oz).astype(jnp.float32) + 0.5) * vsz + minz) * keep
        # window metric center planes (≡ _window_metric_centers)
        qcx = (win_coords[:, 3].astype(jnp.float32) + 0.5) * (vsx * wx) + minx
        qcy = (win_coords[:, 2].astype(jnp.float32) + 0.5) * (vsy * wy) + miny
        qcz = (win_coords[:, 1].astype(jnp.float32) + 0.5) * (vsz * wz) + minz

        # query = max-pool over the window's gathered features (zero pads
        # included — reference parity, ref :370-371)
        q_fea = jnp.max(k_fea, axis=1, keepdims=True)  # (NW, 1, C)

        # position embedding on keys only; the reference does NOT zero-mask
        # relative coords here (ref :372-374). Plane decomposition: no
        # (NW, ns, 6) stack, no K=6 GEMM (see PosProjection.deep_from_planes).
        k_pos = self.pos_proj.deep_from_planes(
            mx - qcx[:, None], my - qcy[:, None], mz - qcz[:, None],
            qcx, qcy, qcz)
        k_fea = k_fea + k_pos

        # nq=1 stays on the XLA einsum path on purpose: padding queries to
        # the kernel's 8-row sublane tile to ride the fused kernel A/B'd
        # WORSE (sync 55.2 vs 53.4 ms/frame, 2026-08-19) — at nk=16 the
        # b3d kernel runs tiny per-window MXU instances while XLA's
        # token-wise (NW*ns, C) GEMM chain keeps the MXU dense.
        attn = self.ms_attn(
            query=q_fea, keys=k_fea, key_masks=k["mask"],
            deterministic=deterministic,
        )  # (NW, 1, C)
        new = attn[:, 0, :]

        act = self.linear2(self.dropout1(
            nn.relu(self.linear1(self.norm2(new))), deterministic=deterministic))
        new = new + self.dropout1(act, deterministic=deterministic)
        if self.out_channels != self.in_channels:
            new = self.out_linear(new)
        new = new * win_valid[:, None]

        new_voxel_size = tuple(
            sp.voxel_size[i] * self.win1[i] for i in range(3)
        )
        return SparseVoxels.create(
            features=new,
            coords=win_coords,
            valid=win_valid,
            batch_size=sp.batch_size,
            spatial_shape=win_grid,
            voxel_size=new_voxel_size,
            point_cloud_range=sp.point_cloud_range,
            with_index=sp.index is not None,
        )


class MixedScaleSparseTransformer(nn.Module):
    """The registered MsSVT backbone (ref :401-472).

    ``params_cfg`` is the list of per-block configs from MODEL.BACKBONE_3D
    .PARAMS (same schema as the reference: name, channels=[in, ff, out],
    num_heads, window_size, max_num_win1/2, cbs_mode, cbs_pattern,
    key_num_sample, use_feature_interpolation, plus our static max_num_wins).
    """

    params_cfg: Sequence[dict]
    dropout: float = 0.0
    dtype: Any = jnp.float32

    def setup(self):
        n = len(self.params_cfg)
        dpr = list(np.linspace(0.0, 0.3, max(n - 1, 1)))  # ref :414
        # Input embedding: VFE features (e.g. 5-dim MeanVFE output) →
        # first block channel width. The reference snapshot ships no config,
        # so how it bridged the 5→128 gap is unrecoverable; an explicit input
        # projection is the standard choice and keeps block widths MXU-sized.
        self.input_proj = nn.Dense(
            int(self.params_cfg[0]["channels"][0]), dtype=self.dtype,
            name="input_proj",
        )
        blocks = []
        for i, p in enumerate(self.params_cfg):
            in_c, ff_c, out_c = p["channels"]
            common = dict(
                in_channels=in_c, ff_channels=ff_c, out_channels=out_c,
                num_heads=tuple(p["num_heads"]),
                window_size=tuple(tuple(w) for w in p["window_size"]),
                max_windows=int(p.get("max_num_wins", 90000)),  # per sample (ref hardcodes 90000, :56)
                dropout=self.dropout, dtype=self.dtype,
            )
            if p["name"] == "MixedScaleSparseTransformerBlock":
                blocks.append(MsSVTBlock(
                    **common,
                    max_num_win1=p.get("max_num_win1"),
                    max_num_win2=p.get("max_num_win2"),
                    cbs_mode=p.get("cbs_mode", "odd_even"),
                    cbs_pattern=int(p.get("cbs_pattern", 1)),
                    key_num_sample=int(p.get("key_num_sample", 32)),
                    use_feature_interpolation=bool(p.get("use_feature_interpolation", True)),
                    ref_compat_keys=bool(p.get("ref_compat_keys", True)),
                    drop_path=float(dpr[i]) if i < len(dpr) else 0.0,
                ))
            elif p["name"] == "MixedScaleSparseTransformerCompressBlock":
                blocks.append(MsSVTCompressBlock(
                    **common, max_num_win1=p.get("max_num_win1"),
                ))
            else:
                raise NotImplementedError(p["name"])
        self.blocks = blocks

    def __call__(self, sp: SparseVoxels, deterministic: bool = True) -> SparseVoxels:
        feats = self.input_proj(sp.features) * sp.valid[:, None]
        sp = sp.with_features(feats)
        for block in self.blocks:
            sp = block(sp, deterministic=deterministic)
        return sp

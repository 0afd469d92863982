"""CPU oracle implementations of the reference's compiled CUDA ops.

Installed onto ``ref_loader``'s stub modules so the reference's PURE-PYTHON
model code (``mssvt_backbone.py``) executes end-to-end on CPU with the exact
kernel semantics:

- hash table stores BATCH-LOCAL voxel rows (ms_sparse_attention_gpu.cu:85-95);
- window dedup emits batch-major windows; within a batch the CUDA order is
  atomicAdd arrival (nondeterministic) — the oracle uses first-occurrence
  order, which is a valid arrival order (outputs are per-voxel, so window
  order cannot affect them);
- the two-scale gather walks the four query tables IN SEQUENCE (odd, even,
  rest-of-win1, win2-only), filling every eligible buffer to capacity
  (ms_sparse_attention_gpu.cu:193-350), with -1 index / 0 coord padding;
- ``grouping_operation`` skips negative indices, leaving zeros
  (group_features_gpu.cu:15-44);
- batch FPS starts at index 0, min-dist caches at 1e10, f32 distance math,
  ties to the lowest index (sampling_gpu.cu:101-185; n <= block threads, so
  the tree reduction's tie-break is lowest-tid = lowest index);
- ``three_nn`` returns **sqrt** of the three smallest squared distances,
  ascending, ties to the lower index (pointnet2_batch/pointnet2_utils.py:98).

This makes a full reference block / backbone runnable as a numeric oracle in
an environment with no CUDA, no dataset, and no released checkpoint.
"""

from __future__ import annotations

import sys

import numpy as np
import torch


def _np_int(t):
    return np.asarray(t.detach().cpu().numpy())


def build_hash_table(batch_size, hash_size, spatial_shape, voxel_indices,
                     v_bs_cnt):
    """Per-batch {linearized coord key -> batch-local row} maps."""
    x_max, y_max, z_max = (int(s) for s in spatial_shape)
    idx = _np_int(voxel_indices)
    cnts = _np_int(v_bs_cnt).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(cnts)])
    tables = [dict() for _ in range(int(batch_size))]
    for row, (b, z, y, x) in enumerate(idx):
        b, z, y, x = int(b), int(z), int(y), int(x)
        if not (0 <= x < x_max and 0 <= y < y_max and 0 <= z < z_max):
            continue
        key = x * y_max * z_max + y * z_max + z
        tables[b].setdefault(key, row - int(starts[b]))
    return {"tables": tables, "shape": (x_max, y_max, z_max)}


def get_non_empty_window_center(win_size, max_num_wins, batch_size, hash_size,
                                new_spatial_shape, voxel_indices):
    """Window dedup (ms_sparse_attention_gpu.cu:117-168): batch-major; the
    CUDA order WITHIN a batch is atomicAdd arrival — nondeterministic
    run-to-run on real hardware, so any order is a valid realization. The
    oracle uses the x-major sorted key order (matching our deterministic
    ``window_partition``): downstream, window order is observable ONLY
    through "batch-local row 0" after a compress block (the pad-key target
    of the ``(+0.1).int()`` trick), which on the real reference is therefore
    itself nondeterministic — the oracle's choice pins it to ours."""
    wx, wy, wz = (int(s) for s in win_size)
    gx, gy, gz = (int(s) for s in new_spatial_shape)
    idx = _np_int(voxel_indices)
    per_b = [set() for _ in range(int(batch_size))]
    for b, z, y, x in idx:
        cx, cy, cz = int(x) // wx, int(y) // wy, int(z) // wz
        if 0 <= cx < gx and 0 <= cy < gy and 0 <= cz < gz:
            per_b[int(b)].add((cx, cy, cz))
    rows = []
    tables = [dict() for _ in range(int(batch_size))]
    for b in range(int(batch_size)):
        ordered = sorted(per_b[b])[:int(max_num_wins)]  # x-major (x, y, z)
        for i, (cx, cy, cz) in enumerate(ordered):
            rows.append((b, cz, cy, cx))
            tables[b][cx * gy * gz + cy * gz + cz] = i
    win = torch.from_numpy(np.asarray(rows, np.int32).reshape(-1, 4))
    return win, {"tables": tables, "shape": (gx, gy, gz)}


def _gather_walk(spatial_shape, win_size, win_ind, dense_map, walk):
    """Shared probe loop. ``walk`` = [(query_table np (K,3), caps_fed)],
    caps_fed = list of (buffer_id, cap). Returns per-buffer (ind, coord)."""
    x_max, y_max, z_max = (int(s) for s in spatial_shape)
    wx, wy, wz = (int(s) for s in win_size)
    tabs = dense_map["tables"]
    wi = _np_int(win_ind)
    nw = len(wi)
    n_buf = max(j for _, fed in walk for j, _ in fed) + 1
    caps = {}
    for _, fed in walk:
        for j, cap in fed:
            caps[j] = int(cap)
    out_ind = [np.full((nw, caps[j]), -1, np.int32) for j in range(n_buf)]
    out_co = [np.zeros((nw, caps[j], 3), np.int32) for j in range(n_buf)]
    for w in range(nw):
        b, zz, yy, xx = (int(v) for v in wi[w])
        t = tabs[b]
        cx = xx * wx + wx // 2
        cy = yy * wy + wy // 2
        cz = zz * wz + wz // 2
        counts = [0] * n_buf
        for tbl, fed in walk:
            for ox, oy, oz in tbl:
                sx, sy, sz = cx + int(ox), cy + int(oy), cz + int(oz)
                if not (0 <= sx < x_max and 0 <= sy < y_max
                        and 0 <= sz < z_max):
                    continue
                v = t.get(sx * y_max * z_max + sy * z_max + sz)
                if v is None:
                    continue
                for j, cap in fed:
                    if counts[j] < cap:
                        out_ind[j][w, counts[j]] = v
                        out_co[j][w, counts[j]] = (ox, oy, oz)
                        counts[j] += 1
    return ([torch.from_numpy(a) for a in out_ind],
            [torch.from_numpy(a) for a in out_co])


def gather_two_window_voxels(spatial_shape, win_size, max_num_odd,
                             max_num_even, max_num_win1, max_num_win2,
                             vox_query_odd, vox_query_even, vox_query_win1,
                             vox_query_win2, win_indices, dense_map):
    walk = [
        (_np_int(vox_query_odd), [(0, max_num_odd), (2, max_num_win1),
                                  (3, max_num_win2)]),
        (_np_int(vox_query_even), [(1, max_num_even), (2, max_num_win1),
                                   (3, max_num_win2)]),
        (_np_int(vox_query_win1), [(2, max_num_win1), (3, max_num_win2)]),
        (_np_int(vox_query_win2), [(3, max_num_win2)]),
    ]
    inds, cos = _gather_walk(spatial_shape, win_size, win_indices, dense_map,
                             walk)
    return (inds[0], inds[1], inds[2], inds[3], cos[0], cos[1], cos[2],
            cos[3])


def gather_one_window_voxels(spatial_shape, win_size, max_num_win1,
                             vox_query_win1, win_indices, dense_map):
    walk = [(_np_int(vox_query_win1), [(0, max_num_win1)])]
    inds, cos = _gather_walk(spatial_shape, win_size, win_indices, dense_map,
                             walk)
    return inds[0], cos[0]


def grouping_operation(features, features_batch_cnt, idx, idx_batch_cnt):
    """(N, C) features, batch-local (M, ns) idx -> (M, C, ns); -1 skipped."""
    f = features.detach().cpu().numpy()
    ix = _np_int(idx).astype(np.int64)
    fc = _np_int(features_batch_cnt).astype(np.int64)
    kc = _np_int(idx_batch_cnt).astype(np.int64)
    f_start = np.concatenate([[0], np.cumsum(fc)])
    k_start = np.concatenate([[0], np.cumsum(kc)])
    m, ns = ix.shape
    c = f.shape[1]
    out = np.zeros((m, c, ns), f.dtype)
    for b in range(len(fc)):
        for w in range(int(k_start[b]), int(k_start[b + 1])):
            for s in range(ns):
                j = ix[w, s]
                if j >= 0:
                    out[w, :, s] = f[int(f_start[b]) + j]
    return torch.from_numpy(out)


def farthest_point_sample(xyz, npoint):
    """Batch FPS, CUDA semantics (sampling_gpu.cu:101-185), f32 math."""
    x = xyz.detach().cpu().numpy().astype(np.float32)
    bsz, n, _ = x.shape
    out = np.zeros((bsz, int(npoint)), np.int32)
    for b in range(bsz):
        temp = np.full(n, 1e10, np.float32)
        old = 0
        for j in range(1, int(npoint)):
            d = x[b] - x[b, old]
            d = (d[:, 0] * d[:, 0] + d[:, 1] * d[:, 1]
                 + d[:, 2] * d[:, 2]).astype(np.float32)
            temp = np.minimum(temp, d)
            old = int(np.argmax(temp))  # first max on ties
            out[b, j] = old
    return torch.from_numpy(out)


def gather_operation(features, idx):
    """(B, C, N) by (B, M) -> (B, C, M)."""
    ix = idx.long().unsqueeze(1).expand(-1, features.shape[1], -1)
    return torch.gather(features, 2, ix)


def three_nn(unknown, known):
    """(B, n, 3), (B, m, 3) -> (sqrt dist (B, n, 3), idx (B, n, 3))."""
    u = unknown.detach().cpu().numpy().astype(np.float32)
    k = known.detach().cpu().numpy().astype(np.float32)
    diff = u[:, :, None, :] - k[:, None, :, :]
    d2 = ((diff * diff).sum(-1)).astype(np.float32)
    order = np.argsort(d2, axis=-1, kind="stable")[..., :3]
    dist = np.sqrt(np.take_along_axis(d2, order, -1))
    return (torch.from_numpy(dist.astype(np.float32)),
            torch.from_numpy(order.astype(np.int32)))


def grouping_operation_batch(features, idx):
    """pointnet2_batch grouping: (B, C, N) by (B, np, ns) -> (B, C, np, ns)."""
    bsz, c, n = features.shape
    _, npnt, ns = idx.shape
    ix = idx.long().reshape(bsz, 1, npnt * ns).expand(-1, c, -1)
    out = torch.gather(features, 2, ix)
    return out.reshape(bsz, c, npnt, ns)


def install_ref_cpu_ops():
    """Populate ref_loader's stub modules with the CPU oracles."""
    import ref_loader

    ref_loader._ensure_refpcdet()
    mo = sys.modules["refpcdet.ops.mssvt.mssvt_ops"]
    mo.build_hash_table = build_hash_table
    mo.get_non_empty_window_center = get_non_empty_window_center
    mo.gather_two_window_voxels = gather_two_window_voxels
    mo.gather_one_window_voxels = gather_one_window_voxels
    mo.grouping_operation = grouping_operation

    pu = sys.modules["refpcdet.ops.pointnet2.pointnet2_batch.pointnet2_utils"]
    pu.farthest_point_sample = farthest_point_sample
    pu.furthest_point_sample = farthest_point_sample  # historical alias
    pu.gather_operation = gather_operation
    pu.three_nn = three_nn
    pu.grouping_operation = grouping_operation_batch

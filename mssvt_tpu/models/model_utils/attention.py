"""Mixed-scale head-group attention (flax).

Behavioral equivalent of ``MixedScaleAttention``
(ref: pcdet/models/model_utils/mssvt_utils.py:65-157): the embedding is split
into head groups (one per window scale); group i attends with its own Q/KV
projections over its own contiguous key slice (keys from different window
scales are concatenated along the token axis). Key padding uses the
reference's additive ``-100`` mask (not -inf) so fully-padded windows yield
uniform — then query-masked-to-zero — attention instead of NaNs
(ref: mssvt_utils.py:129-134).

Differences from the reference (intentional):
- batch-first only (we never use the seq-first layout internally).
- softmax is applied unconditionally; the reference skips it when no key mask
  is passed (mssvt_utils.py:129-134), but every live call site passes one.
- einsum-based batched matmuls: (num_windows, heads, nq, nk) batched attention
  maps directly onto the TPU MXU.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.pallas_attention import (
    fused_window_attention,
    fused_window_attention_assembled,
    fused_window_attention_assembled_train,
)

KEY_PAD_NEG = -100.0


def _use_fused_kernel(nq: int, deterministic: bool,
                      dropout: Optional[float] = None) -> bool:
    """Route to the Pallas kernel on TPU.

    The attention kernel has a custom VJP (Pallas backward with in-VMEM
    recompute, ops/pallas_attention.py), so training routes through it too —
    but only when ``dropout == 0.0``: the kernel carries no dropout, and with
    rate 0 the attn/proj Dropout layers are exact identities. Callers that
    fuse chains containing always-active stochastic layers (the FFN path has
    DropPath) pass ``dropout=None``, which keeps them deterministic-only.
    The einsum path also remains for tiny query counts (compress blocks have
    nq=1 — below the TPU sublane tile) and off-TPU. Tests force the kernel
    through the interpreter with MSSVT_PALLAS=interpret.
    """
    ok = deterministic or (dropout is not None and dropout == 0.0)
    mode = os.environ.get("MSSVT_PALLAS", "auto")
    if mode == "off":
        return False
    if mode == "interpret":
        return ok
    return ok and nq >= 8 and jax.default_backend() == "tpu"


class _GroupProj(nn.Module):
    """Per-group projection params in ``nn.Dense``'s checkpoint layout
    (kernel ``(in, out)``, bias ``(out,)``) — same tree path as a Dense
    submodule of the same name, so checkpoints are interchangeable. Returns
    the raw arrays so callers can fold them into block-diagonal kernels or
    run sliced half-width dots without dummy forwards or raw flax scope
    access (which breaks under nn.Partitioned / lifted transforms)."""

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.out_features), jnp.float32)
        bias = self.param(
            "bias", nn.initializers.zeros_init(),
            (self.out_features,), jnp.float32)
        return kernel, bias


class MixedScaleAttention(nn.Module):
    embed_dim: int
    num_heads: Sequence[int]  # one entry per scale group
    dropout: float = 0.0
    dtype: Any = jnp.float32

    def _folded_projections(self):
        """Fold the per-group q/kv/proj Dense params into single
        BLOCK-DIAGONAL (D, D) weights + (D,) biases for the fused kernels.
        Param layout is identical to the einsum path (same Dense submodules,
        created here on zero-size dummies); cross-group blocks are zero, so
        the math matches the reference's per-group slicing exactly."""
        d = self.embed_dim
        per_head = d // sum(self.num_heads)
        wq = jnp.zeros((d, d), jnp.float32)
        wk = jnp.zeros((d, d), jnp.float32)
        wv = jnp.zeros((d, d), jnp.float32)
        wp = jnp.zeros((d, d), jnp.float32)
        bq = jnp.zeros((d,), jnp.float32)
        bk = jnp.zeros((d,), jnp.float32)
        bv = jnp.zeros((d,), jnp.float32)
        bp = jnp.zeros((d,), jnp.float32)
        start = 0
        for i, h in enumerate(self.num_heads):
            sd = per_head * h
            kq, bq_i = _GroupProj(sd, sd, name=f"to_q_{i}")()
            kkv, bkv_i = _GroupProj(sd, 2 * sd, name=f"to_kv_{i}")()
            kp, bp_i = _GroupProj(sd, sd, name=f"proj_{i}")()
            sl = slice(start, start + sd)
            wq = wq.at[sl, sl].set(kq)
            bq = bq.at[sl].set(bq_i)
            wk = wk.at[sl, sl].set(kkv[:, :sd])
            bk = bk.at[sl].set(bkv_i[:sd])
            wv = wv.at[sl, sl].set(kkv[:, sd:])
            bv = bv.at[sl].set(bkv_i[sd:])
            wp = wp.at[sl, sl].set(kp)
            bp = bp.at[sl].set(bp_i)
            start += sd
        return (wq, bq, wk, bk, wv, bv, wp, bp)

    @nn.compact
    def __call__(
        self,
        query: Optional[jnp.ndarray] = None,  # (b, nq, C)
        keys: Optional[jnp.ndarray] = None,  # (b, tot_nk, C)
        query_mask: Optional[jnp.ndarray] = None,  # (b, nq) True = PAD
        key_masks: Optional[jnp.ndarray] = None,  # (b, tot_nk) True = PAD
        deterministic: bool = True,
        assembled: Optional[dict] = None,  # raw gather products (see below)
    ) -> jnp.ndarray:
        if assembled is not None:
            # K/Q assembly from raw gather products. Keys of ``assembled``:
            #   win1_fea (b, n1cap, C), k2_fea (b, nk2, C),
            #   fps1/k_mask1 (b, nk1), q_ext (b, nq, C) or None (prefix),
            #   q_keep (b, nq) f32, q_rel/k_rel 3-plane tuples,
            #   pos_base (b, C) pre-relu center half, pos_w (3, C), nq.
            # On the TPU inference fast path the assembly happens in VMEM
            # inside the assembled kernel (the outside concat/pos/mask
            # sweeps measured ~25 ms/step for block 1, xplane 2026-08-18);
            # everywhere else (CPU, training) it falls back
            # to the identical XLA formulation below and continues through
            # the existing fused/einsum paths.
            a = assembled
            nq_a = int(a["nq"])
            # training rides the assembled kernel too (custom VJP with the
            # in-VMEM assembly recompute — kills the ~30 ms/step of XLA-side
            # concat/pos/mask sweeps the train xplane showed) when the
            # ref-compat inputs it needs are present; dropout==0 keeps the
            # attn/proj Dropout layers exact identities
            train_kernel_ok = (
                not deterministic
                and a.get("pad1") is not None
                and a.get("num_valid") is not None
            )
            use_kernel = (
                (deterministic or train_kernel_ok)
                and _use_fused_kernel(nq_a, deterministic,
                                      dropout=self.dropout)
            )
            if use_kernel:
                proj = self._folded_projections()
                bias = jnp.where(key_masks, KEY_PAD_NEG, 0.0).astype(
                    jnp.float32)
                q_prefix = a.get("q_ext") is None
                q_ext = (a["q_ext"] if not q_prefix
                         else jnp.zeros((a["win1_fea"].shape[0], 1,
                                         self.embed_dim), self.dtype))
                # ref-compat pad keys: the take zeroes at pad1 (not at the
                # FPS-repeat mask) and the per-window pad_row is added back
                pad1 = a.get("pad1")
                pad_row = a.get("pad_row")
                zero_mask = a["k_mask1"] if pad1 is None else pad1
                attn_fn = (fused_window_attention_assembled if deterministic
                           else fused_window_attention_assembled_train)
                out = attn_fn(
                    a["win1_fea"], a["k2_fea"], a["fps1"], zero_mask,
                    q_ext, a["q_keep"], tuple(a["k_rel"]),
                    tuple(a["q_rel"]), a["pos_base"], a["pos_w"],
                    proj, bias, num_heads=tuple(self.num_heads),
                    scale=(self.embed_dim // sum(self.num_heads)) ** -0.5,
                    q_prefix=q_prefix, nq=nq_a,
                    pad_row=(None if pad_row is None
                             else pad_row.astype(self.dtype)),
                    num_valid=a.get("num_valid"),
                    interpret=os.environ.get("MSSVT_PALLAS") == "interpret",
                    compute_dtype=self.dtype,
                )
                if query_mask is not None:
                    out = out * (~query_mask)[..., None].astype(out.dtype)
                return out
            # XLA fallback assembly (bit-compatible formulation)
            from ...ops.sampling import gather_along_batch
            win1 = a["win1_fea"]
            pw = a["pos_w"].astype(self.dtype)
            base = a["pos_base"].astype(self.dtype)

            def pos(rel):
                rx, ry, rz = rel
                return nn.relu(rx[..., None].astype(self.dtype) * pw[0]
                               + ry[..., None].astype(self.dtype) * pw[1]
                               + rz[..., None].astype(self.dtype) * pw[2]
                               + base[:, None, :])

            if a.get("pad1") is not None:
                # ref-compat: zero the take at pad picks only (FPS-repeat
                # masked keys keep their real features, like the reference —
                # the -100 bias silences them) and add the per-window
                # first-voxel row at pad picks
                k1 = (gather_along_batch(win1, a["fps1"])
                      * (~a["pad1"])[..., None]
                      + a["pad1"][..., None].astype(win1.dtype)
                      * a["pad_row"][:, None, :].astype(win1.dtype))
            else:
                k1 = gather_along_batch(win1, a["fps1"]) \
                    * (~a["k_mask1"])[..., None]
            keys = (jnp.concatenate([k1, a["k2_fea"]], axis=1)
                    + pos(a["k_rel"]))
            if a.get("q_ext") is None:
                q_raw = win1[:, :nq_a] * a["q_keep"][..., None].astype(
                    win1.dtype)
            else:
                q_raw = a["q_ext"]
            query = q_raw + pos(a["q_rel"])

        b, nq, _ = query.shape
        _, tot_nk, _ = keys.shape
        groups = len(self.num_heads)
        tot_heads = sum(self.num_heads)
        assert self.embed_dim % tot_heads == 0, (self.embed_dim, tot_heads)
        per_head = self.embed_dim // tot_heads
        assert tot_nk % groups == 0
        nk = tot_nk // groups
        scale = per_head ** -0.5

        if _use_fused_kernel(nq, deterministic, dropout=self.dropout):
            # The per-group projections fold into single BLOCK-DIAGONAL
            # weight matrices applied to the UNSLICED tensors: the per-group
            # channel slices + pads + concats of the naive formulation
            # measured ~70 ms/frame of pure data movement at Waymo scale
            # (surgical ablation, tools/ablate_e2e.py). Param layout is
            # identical to the einsum path (same Dense submodules, created
            # here on zero-size dummies); cross-group blocks of the weights
            # are zero, so the math matches the reference's per-group slicing
            # exactly — off-group key/value channels carry garbage that the
            # kernel's static channel mask never reads.
            wq, bq, wk, bk, wv, bv, wp, bp = self._folded_projections()

            if key_masks is not None:
                bias = jnp.where(key_masks, KEY_PAD_NEG, 0.0).astype(jnp.float32)
            else:
                bias = jnp.zeros((b, tot_nk), jnp.float32)
            out = fused_window_attention(
                query, keys, (wq, bq, wk, bk, wv, bv, wp, bp), bias,
                num_heads=tuple(self.num_heads), scale=scale,
                interpret=os.environ.get("MSSVT_PALLAS") == "interpret",
                # thread the module dtype: fp32-configured models keep fp32
                # matmuls in-kernel (bf16 only when the model itself is bf16)
                compute_dtype=self.dtype,
            )
            if query_mask is not None:
                out = out * (~query_mask)[..., None].astype(out.dtype)
            return out

        outs = []
        start = 0
        for i, h in enumerate(self.num_heads):
            sd = per_head * h
            q = nn.Dense(sd, dtype=self.dtype, name=f"to_q_{i}")(
                query[..., start : start + sd]
            )
            # two half-width dots against slices of the SAME to_kv param
            # (layout/checkpoints unchanged): one 2*sd-wide dot + split
            # materializes and re-reads the (b, nk, 2*sd) kv tensor — a
            # top-level 1.05 GB HLO op at compress-block sizes — while the
            # sliced dots write k and v exactly once
            kern, bias = _GroupProj(sd, 2 * sd, name=f"to_kv_{i}")()
            keys_i = keys[:, i * nk : (i + 1) * nk, start : start + sd]
            kern = kern.astype(self.dtype)
            bias = bias.astype(self.dtype)
            keys_c = keys_i.astype(self.dtype)
            k = keys_c @ kern[:, :sd] + bias[:sd]
            v = keys_c @ kern[:, sd:] + bias[sd:]

            q = q.reshape(b, nq, h, per_head) * scale
            k = k.reshape(b, nk, h, per_head)
            v = v.reshape(b, nk, h, per_head)

            attn = jnp.einsum("bqhc,bkhc->bhqk", q, k)
            if key_masks is not None:
                km = key_masks[:, i * nk : (i + 1) * nk]
                attn = attn + jnp.where(km, KEY_PAD_NEG, 0.0)[:, None, None, :].astype(
                    attn.dtype
                )
            attn = nn.softmax(attn, axis=-1)
            attn = nn.Dropout(self.dropout, name=f"attn_drop_{i}")(
                attn, deterministic=deterministic
            )
            x = jnp.einsum("bhqk,bkhc->bqhc", attn, v).reshape(b, nq, sd)
            x = nn.Dense(sd, dtype=self.dtype, name=f"proj_{i}")(x)
            x = nn.Dropout(self.dropout, name=f"proj_drop_{i}")(
                x, deterministic=deterministic
            )
            outs.append(x)
            start += sd

        out = jnp.concatenate(outs, axis=-1)
        if query_mask is not None:
            out = out * (~query_mask)[..., None].astype(out.dtype)
        return out

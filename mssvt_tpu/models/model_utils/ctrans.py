"""CT3D's DETR-style refinement transformer (flax).

Behavioral rebuild of ref pcdet/models/model_utils/ctrans.py:40-348:

- :class:`CTransformer` ≙ ``Transformer`` (:40-80): encoder over the RoI's
  sampled points, decoder with learned queries.
- Encoder layers are post-norm torch ``TransformerEncoderLayer`` semantics
  (:146-203): self-attn(q=k=src+pos, v=src) → add+LN → FFN → add+LN.
- Decoder layers (:239-322) pair standard self-attention with CT3D's
  **channel-wise re-weighting cross-attention** (``MultiHeadedAttention`` +
  ``attention``, :207-236): scores are computed per (channel, key) — the
  key tensor scaled by the per-key total query affinity — softmaxed over
  keys, and each output channel takes its own convex combination of that
  channel's values; a per-head Linear then mixes the (dim) axis down to one
  sample. This is transcribed exactly (same einsum structure) rather than
  replaced with standard cross-attention, since checkpoints depend on it.

TPU notes: everything is batch-first (num_rois is the batch axis),
static-shape, and runs as plain batched einsums on the MXU — the sequence
lengths involved (256 points, 1 query) need no sparsity machinery.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn


class MLP(nn.Module):
    """Ref ct3d_head.py MLP: Linear stack with ReLU between layers."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype,
                                 name=f"layer{i}")(x))
        return nn.Dense(self.output_dim, dtype=self.dtype,
                        name=f"layer{self.num_layers - 1}")(x)


def _mha(q, k, v, wq, wk, wv, wo, num_heads):
    """torch nn.MultiheadAttention core (batch-first), no dropout."""
    b, nq, d = q.shape
    nk = k.shape[1]
    h = num_heads
    ph = d // h
    qh = (q @ wq[0] + wq[1]).reshape(b, nq, h, ph)
    kh = (k @ wk[0] + wk[1]).reshape(b, nk, h, ph)
    vh = (v @ wv[0] + wv[1]).reshape(b, nk, h, ph)
    attn = jnp.einsum("bqhc,bkhc->bhqk", qh * ph ** -0.5, kh)
    attn = nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhqk,bkhc->bqhc", attn, vh).reshape(b, nq, d)
    return out @ wo[0] + wo[1]


class _SelfAttention(nn.Module):
    """Standard multi-head self/cross attention (torch MHA semantics)."""

    d_model: int
    nhead: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        d = self.d_model
        dt = self.dtype
        mk = lambda name, o, i: (  # noqa: E731
            self.param(name + "_w", nn.initializers.xavier_uniform(), (i, o)),
            self.param(name + "_b", nn.initializers.zeros, (o,)),
        )
        wq, wk, wv = mk("q", d, d), mk("k", d, d), mk("v", d, d)
        wo = mk("out", d, d)
        cast = lambda p: tuple(x.astype(dt) for x in p)  # noqa: E731
        return _mha(q.astype(dt), k.astype(dt), v.astype(dt),
                    cast(wq), cast(wk), cast(wv), cast(wo), self.nhead)


class _ChannelWiseAttention(nn.Module):
    """CT3D decoder cross-attention (ref: ctrans.py:207-236), exact math.

    Inputs arrive channel-first ``(b, d_model, n)`` as in the reference;
    three 1x1-Conv projections (≡ Dense over the channel axis), then:

        scores_1[b,h,n,m] = sum_c q[b,c,h,n] k[b,c,h,m] / sqrt(dim)
        scores_2[b,c,h,m] = k[b,c,h,m] * sum_n scores_1[b,h,n,m]
        prob = softmax_m(scores_2)
        out[b,c,h,e] = sum_m prob[b,e,h,m] v[b,c,h,m]   (e ranges over dim)
        down_mlp: Linear(dim → 1) over the e axis → (b, c*h, 1)
    """

    d_model: int
    nhead: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q_cf, k_cf, v_cf):
        d, h = self.d_model, self.nhead
        dim = d // h
        dt = self.dtype

        def proj(name, x):
            # torch Conv1d(d, d, 1) on (b, d, n): out = W @ x + b
            w = self.param(f"{name}_w", nn.initializers.xavier_uniform(),
                           (d, d)).astype(dt)
            b_ = self.param(f"{name}_b", nn.initializers.zeros, (d,)).astype(dt)
            return jnp.einsum("oc,bcn->bon", w, x.astype(dt)) + b_[None, :, None]

        # reference projection order: proj[0]=query, proj[1]=key, proj[2]=value
        # each reshaped to (b, dim, heads, n)
        def split(x):
            b_, _, n = x.shape
            return x.reshape(b_, dim, h, n)

        q = split(proj("proj_q", q_cf))
        k = split(proj("proj_k", k_cf))
        v = split(proj("proj_v", v_cf))

        scores_1 = jnp.einsum("bdhn,bdhm->bhnm", q, k) / dim ** 0.5
        scores_2 = k * scores_1.sum(axis=2)[:, None, :, :]  # (b, dim, h, m)
        prob = nn.softmax(scores_2, axis=-1)
        out = jnp.einsum("behm,bdhm->bdhe", prob, v)  # (b, dim, h, dim)
        # down_mlp: single Linear(dim -> 1) (ref MLP num_layers=1: no relu)
        wd = self.param("down_w", nn.initializers.xavier_uniform(),
                        (dim, 1)).astype(dt)
        bd = self.param("down_b", nn.initializers.zeros, (1,)).astype(dt)
        x = out @ wd + bd  # (b, dim, h, 1)
        b_ = x.shape[0]
        return x.reshape(b_, dim * h, 1)  # channel-first (b, d_model, 1)


class _EncoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos):
        qk = src + pos
        src2 = _SelfAttention(self.d_model, self.nhead, self.dtype,
                              name="self_attn")(qk, qk, src)
        src = nn.LayerNorm(dtype=self.dtype, name="norm1")(src + src2)
        src2 = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(
            nn.relu(nn.Dense(self.dim_feedforward, dtype=self.dtype,
                             name="linear1")(src)))
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(src + src2)


class _DecoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos):
        qk = tgt + query_pos
        tgt2 = _SelfAttention(self.d_model, self.nhead, self.dtype,
                              name="self_attn")(qk, qk, tgt)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm1")(tgt + tgt2)
        # channel-wise cross attention on channel-first layouts
        # (ref permutes (n, b, c) -> (b, c, n); ours are batch-first already)
        q_cf = jnp.transpose(tgt + query_pos, (0, 2, 1))
        k_cf = jnp.transpose(memory + pos, (0, 2, 1))
        v_cf = jnp.transpose(memory, (0, 2, 1))
        t2_cf = _ChannelWiseAttention(self.d_model, self.nhead, self.dtype,
                                      name="multihead_attn")(q_cf, k_cf, v_cf)
        tgt2 = jnp.transpose(t2_cf, (0, 2, 1))  # (b, 1, d)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm2")(tgt + tgt2)
        tgt2 = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(
            nn.relu(nn.Dense(self.dim_feedforward, dtype=self.dtype,
                             name="linear1")(tgt)))
        return nn.LayerNorm(dtype=self.dtype, name="norm3")(tgt + tgt2)


class CTransformer(nn.Module):
    """Ref ``Transformer`` (ctrans.py:40-80), post-norm DETR variant.

    ``__call__(src, pos)``: src (b, n, d) RoI point tokens; returns the
    decoder output for the learned queries, (b, num_queries, d).
    The reference's num_queries for CT3D is 1.
    """

    d_model: int = 256
    nhead: int = 4
    num_encoder_layers: int = 3
    num_decoder_layers: int = 3
    dim_feedforward: int = 512
    num_queries: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos=None):
        b, n, d = src.shape
        if pos is None:
            # ref ct3d_head.py:181 passes pos = zeros_like(src)
            pos = jnp.zeros_like(src)
        memory = src
        for i in range(self.num_encoder_layers):
            memory = _EncoderLayer(d, self.nhead, self.dim_feedforward,
                                   self.dtype, name=f"enc{i}")(memory, pos)
        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.num_queries, d))
        qe = jnp.broadcast_to(query_embed[None].astype(memory.dtype),
                              (b, self.num_queries, d))
        tgt = jnp.zeros_like(qe)
        # reference decoder cross-attn pools to a single token per window
        # regardless of nq (the down_mlp output is (b, d, 1)); CT3D uses
        # num_queries=1 so tgt and the pooled token align 1:1
        for i in range(self.num_decoder_layers):
            tgt = _DecoderLayer(d, self.nhead, self.dim_feedforward,
                                self.dtype, name=f"dec{i}")(
                tgt, memory, pos, qe)
        return nn.LayerNorm(dtype=self.dtype, name="dec_norm")(tgt)

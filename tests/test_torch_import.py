"""Torch-checkpoint importer: output-level parity against real torch modules.

These tests build torch replicas of the reference's module structures (same
Sequential/ModuleList naming as pcdet — base_bev_backbone.py:28-75,
center_head.py:10-45, height_compression.py:16-27, mssvt_utils.py:65-157),
randomly initialize them, import their state_dict through
``convert_state_dict``, and assert the flax modules produce numerically
identical outputs. This pins every layout transform (Linear/Conv/
ConvTranspose/BN/LayerNorm/Conv1d) against torch ground truth — not just a
round-trip of our own mapping.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from flax import linen as nn

from mssvt_tpu.runtime.torch_import import (
    bev_channel_perm,
    convert_state_dict,
    flax_to_torch_key,
)

F32 = jax.default_matmul_precision("float32")


def _state_np(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _randomize_bn(module):
    """Give running stats non-trivial values so eval-mode BN is a real test."""
    for m in module.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.data = torch.randn_like(m.running_mean) * 0.3
            m.running_var.data = torch.rand_like(m.running_var) + 0.5
            m.weight.data = torch.randn_like(m.weight) * 0.2 + 1.0
            m.bias.data = torch.randn_like(m.bias) * 0.2


def test_bev_channel_perm_algebra():
    """perm maps the reference's (B,C,D,H,W)->(B,C*D,H,W) channel order onto
    our z-major (B,H,W,D*C) order: flax channel j reads torch channel perm[j]."""
    rng = np.random.default_rng(0)
    b, c, d, h, w = 2, 5, 3, 4, 4
    x5 = rng.normal(size=(b, c, d, h, w)).astype(np.float32)
    torch_bev = x5.reshape(b, c * d, h, w)  # ref reshape (channel-major)
    # our layout: (B, H, W, D*C) with channel j = z*C + cc
    ours = np.transpose(x5, (0, 3, 4, 2, 1)).reshape(b, h, w, d * c)
    perm = bev_channel_perm(c * d, d)
    np.testing.assert_array_equal(
        ours, np.transpose(torch_bev[:, perm], (0, 2, 3, 1)))


def test_backbone2d_output_parity():
    from mssvt_tpu.models.backbones_2d.base_bev_backbone import BaseBEVBackbone

    torch.manual_seed(0)
    c_in, filters, ups = 6, [8, 16], [8, 8]
    layer_nums, strides, up_strides = [1, 2], [1, 2], [1, 2]
    blocks, deblocks = torch.nn.ModuleList(), torch.nn.ModuleList()
    c = c_in
    for i, ln in enumerate(layer_nums):
        layers = [torch.nn.ZeroPad2d(1),
                  torch.nn.Conv2d(c, filters[i], 3, strides[i], bias=False),
                  torch.nn.BatchNorm2d(filters[i], eps=1e-3, momentum=0.01),
                  torch.nn.ReLU()]
        for _ in range(ln):
            layers += [torch.nn.Conv2d(filters[i], filters[i], 3, padding=1,
                                       bias=False),
                       torch.nn.BatchNorm2d(filters[i], eps=1e-3,
                                            momentum=0.01),
                       torch.nn.ReLU()]
        blocks.append(torch.nn.Sequential(*layers))
        s = up_strides[i]
        deblocks.append(torch.nn.Sequential(
            torch.nn.ConvTranspose2d(filters[i], ups[i], s, stride=s,
                                     bias=False),
            torch.nn.BatchNorm2d(ups[i], eps=1e-3, momentum=0.01),
            torch.nn.ReLU()))
        c = filters[i]
    ref = torch.nn.Module()
    ref.blocks, ref.deblocks = blocks, deblocks
    _randomize_bn(ref)
    ref.eval()

    x = np.random.default_rng(1).normal(size=(2, 8, 8, c_in)).astype(np.float32)
    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        ups_t = []
        for i in range(2):
            t = ref.blocks[i](t)
            ups_t.append(ref.deblocks[i](t))
        want = torch.cat(ups_t, dim=1).numpy().transpose(0, 2, 3, 1)

    model = BaseBEVBackbone(
        layer_nums=layer_nums, layer_strides=strides, num_filters=filters,
        upsample_strides=up_strides, num_upsample_filters=ups)
    with F32:
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    wrapped = {k: {"backbone_2d": v} for k, v in variables.items()}
    state = {f"backbone_2d.{k}": v for k, v in _state_np(ref).items()}
    new_vars, report = convert_state_dict(state, wrapped)
    assert not report["missing"], report["missing"]
    assert not report["shape_mismatch"], report["shape_mismatch"]
    assert not report["unused"], report["unused"]
    with F32:
        got = np.asarray(model.apply(
            {k: v["backbone_2d"] for k, v in new_vars.items()},
            jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


class _TorchMixedScaleAttention(torch.nn.Module):
    """Replica of the reference MixedScaleAttention (mssvt_utils.py:65-157)."""

    def __init__(self, embed_dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        tot = sum(num_heads)
        self.ph = embed_dim // tot
        self.scale_dims = [self.ph * h for h in num_heads]
        self.to_qs = torch.nn.ModuleList(
            [torch.nn.Linear(sd, sd) for sd in self.scale_dims])
        self.to_kvs = torch.nn.ModuleList(
            [torch.nn.Linear(sd, 2 * sd) for sd in self.scale_dims])
        self.projs = torch.nn.ModuleList(
            [torch.nn.Linear(sd, sd) for sd in self.scale_dims])

    def forward(self, query, keys, key_masks):
        b, nq, _ = query.shape
        nk = keys.shape[1] // len(self.num_heads)
        outs, start = [], 0
        for i, h in enumerate(self.num_heads):
            sd = self.scale_dims[i]
            q = self.to_qs[i](query[:, :, start:start + sd])
            q = q.reshape(b, nq, h, self.ph).permute(0, 2, 1, 3)
            kv = self.to_kvs[i](keys[:, i * nk:(i + 1) * nk, start:start + sd])
            kv = kv.reshape(b, nk, 2, h, self.ph).permute(2, 0, 3, 1, 4)
            k, v = kv[0], kv[1]
            attn = (q * self.ph ** -0.5) @ k.transpose(-2, -1)
            km = key_masks[:, i * nk:(i + 1) * nk]
            attn = attn + km.float().masked_fill(km, -100.0).view(b, 1, 1, nk)
            attn = attn.softmax(-1)
            x = (attn @ v).transpose(1, 2).reshape(b, nq, sd)
            outs.append(self.projs[i](x))
            start += sd
        return torch.cat(outs, dim=-1)


def test_attention_import_output_parity():
    from mssvt_tpu.models.model_utils.attention import MixedScaleAttention

    torch.manual_seed(2)
    d, heads, nw, nq, nk_tot = 16, (2, 2), 3, 5, 12
    ref = _TorchMixedScaleAttention(d, heads)
    ref.eval()
    rng = np.random.default_rng(3)
    q = rng.normal(size=(nw, nq, d)).astype(np.float32)
    k = rng.normal(size=(nw, nk_tot, d)).astype(np.float32)
    km = rng.random((nw, nk_tot)) < 0.3
    with torch.no_grad():
        want = ref(torch.from_numpy(q), torch.from_numpy(k),
                   torch.from_numpy(km)).numpy()

    model = MixedScaleAttention(embed_dim=d, num_heads=heads)
    with F32:
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(q),
                               jnp.asarray(k), None, jnp.asarray(km))
    wrapped = {k2: {"backbone_3d": {"blocks_0": {"ms_attn": v}}}
               for k2, v in variables.items()}
    state = {f"backbone_3d.backbone.0.ms_attn.{k2}": v
             for k2, v in _state_np(ref).items()}
    new_vars, report = convert_state_dict(state, wrapped)
    assert not report["missing"] and not report["unused"], report
    with F32:
        got = np.asarray(model.apply(
            {k2: v["backbone_3d"]["blocks_0"]["ms_attn"]
             for k2, v in new_vars.items()},
            jnp.asarray(q), jnp.asarray(k), None, jnp.asarray(km)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_block_linear_norm_posproj_mapping_roundtrip():
    """Name coverage for the MsSVT block leaves (linear1/2, norms, pos_proj):
    every leaf maps to a torch key of the right shape, and the Conv1d k=1
    transform is the Dense transpose."""
    paths = {
        ("params", "backbone_3d", "blocks_2", "linear1", "kernel"):
            ("backbone_3d.backbone.2.linear1.weight", (128, 64), (64, 128)),
        ("params", "backbone_3d", "blocks_2", "norm1", "scale"):
            ("backbone_3d.backbone.2.norm1.weight", (64,), (64,)),
        ("params", "backbone_3d", "blocks_2", "pos_proj", "proj0", "kernel"):
            ("backbone_3d.backbone.2.pos_proj.0.weight", (64, 6, 1), (6, 64)),
        ("params", "backbone_3d", "blocks_2", "pos_proj", "proj1", "kernel"):
            ("backbone_3d.backbone.2.pos_proj.2.weight", (64, 64, 1), (64, 64)),
        ("params", "backbone_3d", "blocks_0", "ms_attn", "to_kv_1", "bias"):
            ("backbone_3d.backbone.0.ms_attn.to_kvs.1.bias", (128,), (128,)),
    }
    rng = np.random.default_rng(0)
    for path, (want_key, tshape, fshape) in paths.items():
        key, tf = flax_to_torch_key(path)
        assert key == want_key, (path, key)
        val = rng.normal(size=tshape).astype(np.float32)
        out = tf(val) if tf is not None else val
        assert out.shape == fshape, (path, out.shape)
    # input_proj has no torch counterpart -> unmapped
    key, _ = flax_to_torch_key(("params", "backbone_3d", "input_proj",
                                "kernel"))
    assert key is None


def test_center_head_and_compress_parity():
    """SeparateHead conv stacks + HeightCompression compress stack (with the
    BEV channel permutation) against torch replicas."""
    from mssvt_tpu.models.backbones_2d.map_to_bev import HeightCompression
    from mssvt_tpu.core.sparse import SparseVoxels

    torch.manual_seed(4)
    nbev, depth = 12, 3  # C=4 per z-slice
    conv = []
    for _ in range(2):
        conv += [torch.nn.Conv2d(nbev, nbev, 3, padding=1, bias=False),
                 torch.nn.BatchNorm2d(nbev), torch.nn.ReLU()]
    ref = torch.nn.Module()
    ref.compress_layers = torch.nn.ModuleList(conv)
    _randomize_bn(ref)
    ref.eval()

    # a tiny sparse tensor; reference path: dense (B,C,D,H,W)->(B,C*D,H,W)
    rng = np.random.default_rng(5)
    gx, gy, gz, c = 6, 6, depth, nbev // depth
    coords = np.unique(np.stack([
        np.zeros(20, np.int64), rng.integers(0, gz, 20),
        rng.integers(0, gy, 20), rng.integers(0, gx, 20)], 1), axis=0)
    v = len(coords)
    cap = 32
    pad = np.full((cap, 4), -1, np.int32)
    pad[:v] = coords
    valid = np.arange(cap) < v
    feats = rng.normal(size=(cap, c)).astype(np.float32) * valid[:, None]

    dense = np.zeros((1, c, gz, gy, gx), np.float32)
    for row in range(v):
        b0, z0, y0, x0 = coords[row]
        dense[0, :, z0, y0, x0] = feats[row]
    with torch.no_grad():
        t = torch.from_numpy(dense.reshape(1, c * gz, gy, gx))
        for m in ref.compress_layers:
            t = m(t)
        want = t.numpy().transpose(0, 2, 3, 1)

    sp = SparseVoxels.create(
        features=jnp.asarray(feats), coords=jnp.asarray(pad),
        valid=jnp.asarray(valid), batch_size=1, spatial_shape=(gx, gy, gz),
        voxel_size=(1, 1, 1), point_cloud_range=(0, 0, 0, 6, 6, 3))
    model = HeightCompression(
        num_bev_features=nbev, compress_layer_nums=2,
        layer_strides=(1, 1), layer_dilations=(1, 1), layer_paddings=(1, 1))
    with F32:
        variables = model.init(jax.random.PRNGKey(0), sp)
    wrapped = {k: {"map_to_bev": v} for k, v in variables.items()}
    state = {f"map_to_bev_module.{k}": v for k, v in _state_np(ref).items()}
    new_vars, report = convert_state_dict(state, wrapped, bev_depth=depth)
    assert not report["missing"] and not report["unused"], report
    with F32:
        got = np.asarray(model.apply(
            {k: v["map_to_bev"] for k, v in new_vars.items()}, sp,
            train=False))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_separate_head_mapping():
    """dense_head naming: conv/bn/out tiers resolve to heads_list entries with
    the LAST placeholder picking the final Sequential index."""
    state_keys = [
        "dense_head.heads_list.0.center.0.0.weight",
        "dense_head.heads_list.0.center.0.1.weight",
        "dense_head.heads_list.0.center.1.weight",
        "dense_head.heads_list.0.center.1.bias",
        "dense_head.shared_conv.0.weight",
        "dense_head.shared_conv.1.weight",
    ]
    state = {k: np.zeros((2, 2, 3, 3), np.float32) for k in state_keys}
    key, tf = flax_to_torch_key(
        ("params", "dense_head", "head_0", "center_conv0", "kernel"))
    assert key == "dense_head.heads_list.0.center.0.0.weight"
    key, tf = flax_to_torch_key(
        ("params", "dense_head", "head_0", "center_out", "kernel"))
    from mssvt_tpu.runtime.torch_import import _resolve_last
    assert _resolve_last(key, state) == "dense_head.heads_list.0.center.1.weight"
    key, _ = flax_to_torch_key(
        ("batch_stats", "dense_head", "head_0", "center_bn0", "mean"))
    assert key == "dense_head.heads_list.0.center.0.1.running_mean"
    key, _ = flax_to_torch_key(
        ("params", "dense_head", "shared_bn", "scale"))
    assert key == "dense_head.shared_conv.1.weight"

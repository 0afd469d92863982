"""Registry-driven detector assembly: YAML NAME swaps select real modules.

The reference builds every sub-module by config NAME through per-family
registries (ref: detector3d_template.py:35-50); these tests assert the
rebuild honors the same contract — swapping BACKBONE_3D.NAME or
DENSE_HEAD.NAME in the config changes the constructed module and the model
still runs forward+loss.
"""

import jax
import numpy as np
import pytest

from mssvt_tpu.models import build_network
from mssvt_tpu.utils.edict import EasyDict

from test_second_pointpillar import (
    BATCH,
    GRID,
    MAX_VOXELS,
    make_batch,
    post_cfg,
    second_cfg,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _build_and_run(cfg, rng):
    model = build_network(
        model_cfg=cfg, num_class=1, class_names=["Car"],
        grid_size=GRID, voxel_size=(0.4, 0.4, 0.5), point_cloud_range=(
            0.0, -6.4, -2.0, 12.8, 6.4, 2.0),
        batch_size=BATCH, max_voxels=MAX_VOXELS, max_points_per_voxel=4,
    )
    batch = make_batch(rng)
    variables = jax.jit(
        lambda k0, k1, b: model.init(
            {"params": k0, "dropout": k1}, b, train=False)
    )(jax.random.PRNGKey(0), jax.random.PRNGKey(1), batch)
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(
        variables, batch)
    return model, variables, out


@pytest.mark.slow  # full-model CPU compile >15s
def test_swap_backbone3d_to_residual(rng):
    """SECOND config with BACKBONE_3D.NAME swapped to VoxelResBackBone8x:
    the NAME must actually select the residual variant."""
    cfg = second_cfg()
    cfg["BACKBONE_3D"]["NAME"] = "VoxelResBackBone8x"
    model, variables, out = _build_and_run(cfg, rng)
    from mssvt_tpu.models.backbones_3d.spconv_backbone import VoxelBackBone8x

    b3d = model.bind(variables).backbone_3d
    assert isinstance(b3d, VoxelBackBone8x) and b3d.residual
    assert np.isfinite(np.asarray(out["final_boxes"])).all()


def test_swap_dense_head_to_center_head(rng):
    """SECOND shell with DENSE_HEAD.NAME: CenterHead — head family dispatch
    (targets, loss, decode) must follow the NAME, not the shell."""
    cfg = second_cfg()
    cfg["DENSE_HEAD"] = {
        "NAME": "CenterHead",
        "CLASS_NAMES_EACH_HEAD": [["Car"]],
        "SHARED_CONV_CHANNEL": 16,
        "USE_BIAS_BEFORE_NORM": False,
        "NUM_HM_CONV": 2,
        "SEPARATE_HEAD_CFG": {
            "HEAD_ORDER": ["center", "center_z", "dim", "rot"],
            "HEAD_DICT": {
                "center": {"out_channels": 2, "num_conv": 2},
                "center_z": {"out_channels": 1, "num_conv": 2},
                "dim": {"out_channels": 3, "num_conv": 2},
                "rot": {"out_channels": 2, "num_conv": 2},
            },
        },
        "TARGET_ASSIGNER_CONFIG": {
            "FEATURE_MAP_STRIDE": 8, "NUM_MAX_OBJS": 8,
            "GAUSSIAN_OVERLAP": 0.1, "MIN_RADIUS": 2, "MAX_RADIUS": 8,
        },
        "LOSS_CONFIG": {"LOSS_WEIGHTS": {
            "cls_weight": 1.0, "loc_weight": 2.0, "code_weights": [1.0] * 8,
        }},
        "POST_PROCESSING": {
            "SCORE_THRESH": 0.1,
            "POST_CENTER_LIMIT_RANGE": [-20, -20, -10, 40, 20, 10],
            "MAX_OBJ_PER_SAMPLE": 16,
            "NMS_CONFIG": {"NMS_TYPE": "nms_gpu", "NMS_THRESH": 0.7,
                           "NMS_PRE_MAXSIZE": 32, "NMS_POST_MAXSIZE": 16},
        },
    }
    model, variables, out = _build_and_run(cfg, rng)
    from mssvt_tpu.models.dense_heads.center_head import CenterHead

    assert isinstance(model.bind(variables).dense_head, CenterHead)
    assert np.isfinite(np.asarray(out["final_boxes"])).all()

    batch = make_batch(rng)

    def loss_fn(params):
        o, _ = model.apply({**variables, "params": params}, batch, train=True,
                           rngs={"dropout": jax.random.PRNGKey(2)},
                           mutable=["batch_stats"])
        return o["loss"]

    loss = jax.jit(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))


def test_unknown_name_raises(rng):
    cfg = second_cfg()
    cfg["BACKBONE_3D"]["NAME"] = "NoSuchBackbone"
    with pytest.raises(KeyError):
        _build_and_run(cfg, rng)

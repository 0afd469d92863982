"""Anchor layout regression tests.

Round-1 advisor finding (ADVICE.md high): anchors were built
[class][size][rot][location]-major while conv predictions reshape
location-major, misaligning targets/loss/decode whenever
anchors_per_location > 1. These tests pin the location-major contract
(ref: anchor_head_template.py cat(dim=-3).view(-1, 7)).
"""

import jax.numpy as jnp
import numpy as np

from mssvt_tpu.models.dense_heads.anchor_head import (
    AnchorHeadSingle,
    generate_anchors,
)
from mssvt_tpu.utils.box_coder import ResidualCoder
from mssvt_tpu.utils.edict import EasyDict

GRID = (16, 16, 8)
PCR = (0.0, -6.4, -2.0, 12.8, 6.4, 2.0)
STRIDE = 2

CFGS = [
    {
        "class_name": "Car",
        "anchor_sizes": [[3.9, 1.6, 1.56]],
        "anchor_rotations": [0.0, 1.57],
        "anchor_bottom_heights": [-1.78],
        "align_center": False,
        "feature_map_stride": STRIDE,
        "matched_threshold": 0.6,
        "unmatched_threshold": 0.45,
    },
    {
        "class_name": "Pedestrian",
        "anchor_sizes": [[0.8, 0.6, 1.73]],
        "anchor_rotations": [0.0, 1.57],
        "anchor_bottom_heights": [-0.6],
        "align_center": False,
        "feature_map_stride": STRIDE,
        "matched_threshold": 0.5,
        "unmatched_threshold": 0.35,
    },
]


def test_anchors_location_major():
    anchors, counts = generate_anchors(CFGS, GRID, PCR, STRIDE)
    apl = sum(counts)  # 2 classes x 2 rotations = 4
    assert apl == 4
    nx, ny = GRID[0] // STRIDE, GRID[1] // STRIDE
    assert anchors.shape == (ny * nx * apl, 7)
    a = anchors.reshape(ny, nx, apl, 7)
    # every anchor in one cell shares (x, y)
    assert np.allclose(a[..., 0], a[..., 0:1, 0])
    assert np.allclose(a[..., 1], a[..., 0:1, 1])
    # within a cell: [class][rot] — Car rot0, Car rot90, Ped rot0, Ped rot90
    assert np.allclose(a[0, 0, :, 3], [3.9, 3.9, 0.8, 0.8])
    assert np.allclose(a[0, 0, :, 6], [0.0, 1.57, 0.0, 1.57])
    # cells row-major over (y, x): x varies fastest
    assert a[0, 1, 0, 0] > a[0, 0, 0, 0]
    assert np.isclose(a[0, 1, 0, 1], a[0, 0, 0, 1])
    assert a[1, 0, 0, 1] > a[0, 0, 0, 1]


def _head():
    cfg = EasyDict({
        "NAME": "AnchorHeadSingle",
        "USE_DIRECTION_CLASSIFIER": False,
        "ANCHOR_GENERATOR_CONFIG": CFGS,
        "LOSS_CONFIG": {"LOSS_WEIGHTS": {
            "cls_weight": 1.0, "loc_weight": 2.0, "code_weights": [1.0] * 7,
        }},
    })
    head = AnchorHeadSingle(
        model_cfg=cfg, input_channels=8, num_class=2,
        class_names=["Car", "Pedestrian"], grid_size=GRID,
        point_cloud_range=PCR,
    )
    import jax

    x = jnp.zeros((1, GRID[1] // STRIDE, GRID[0] // STRIDE, 8))
    variables = head.init(jax.random.PRNGKey(0), x)
    return head, variables, x


def test_pred_anchor_alignment_roundtrip():
    """A GT delta-encoded against anchor i must decode back at anchor i's
    location when written into the location-major prediction map."""
    head, variables, x = _head()
    import jax

    anchors = np.asarray(
        generate_anchors(CFGS, GRID, PCR, STRIDE)[0], np.float32)
    coder = ResidualCoder(code_size=7)

    ny, nx = GRID[1] // STRIDE, GRID[0] // STRIDE
    apl = 4
    # pick cell (y=2, x=5), slot 2 (Pedestrian rot 0)
    flat_i = (2 * nx + 5) * apl + 2
    anchor_i = anchors[flat_i]
    gt = anchor_i.copy()
    gt[:3] += [0.3, -0.2, 0.1]
    gt[3:6] *= 1.1

    delta = np.asarray(coder.encode(
        jnp.asarray(gt[None]), jnp.asarray(anchor_i[None])))[0]

    # write the delta into the conv-layout map at (y=2, x=5, slot 2)
    box_map = np.zeros((1, ny, nx, apl * 7), np.float32)
    box_map[0, 2, 5, 2 * 7:(2 + 1) * 7] = delta
    preds = {
        "box_preds": jnp.asarray(box_map.reshape(1, -1, 7)),
        "cls_preds": jnp.zeros((1, ny * nx * apl, 2)),
    }
    boxes, _ = head.apply(
        variables, preds, method=head.generate_predicted_boxes)
    decoded = np.asarray(boxes)[0, flat_i]
    np.testing.assert_allclose(decoded, gt, rtol=1e-4, atol=1e-4)
    # and every OTHER anchor decodes to exactly itself (zero deltas)
    others = np.delete(np.asarray(boxes)[0], flat_i, axis=0)
    ref = np.delete(anchors, flat_i, axis=0)
    np.testing.assert_allclose(others, ref, rtol=1e-4, atol=1e-4)


def test_assign_targets_hits_matching_slot():
    """A GT equal to a Car anchor must label that cell's Car slots, not the
    Pedestrian slots (catches class/threshold misalignment)."""
    head, variables, _ = _head()
    import jax

    anchors, _ = generate_anchors(CFGS, GRID, PCR, STRIDE)
    nx = GRID[0] // STRIDE
    apl = 4
    flat_i = (3 * nx + 4) * apl + 0  # Car rot0 slot at cell (3, 4)
    gt = np.zeros((1, 2, 8), np.float32)
    gt[0, 0, :7] = anchors[flat_i]
    gt[0, 0, 7] = 1  # class Car (1-indexed)

    targets = head.apply(
        variables, jnp.asarray(gt), method=head.assign_targets)
    labels = np.asarray(targets["box_cls_labels"])[0]
    assert labels[flat_i] == 1  # Car slot matched as Car
    # the Pedestrian slots of that cell must not be positive
    assert labels[flat_i + 2] <= 0
    assert labels[flat_i + 3] <= 0

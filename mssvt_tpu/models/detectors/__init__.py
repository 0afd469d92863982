from .caddn import CaDDN
from .centerpoint import CenterPoint
from .ct3d_3cat import CT3D3CAT
from .part_a2 import PartA2Net
from .point_rcnn import PointRCNN
from .pointpillar import PointPillar
from .pv_rcnn import PVRCNN
from .second_net import SECONDNet
from .second_net_iou import SECONDNetIoU
from .voxel_rcnn import VoxelRCNN

__all__ = {
    "CaDDN": CaDDN,
    "CenterPoint": CenterPoint,
    # ref registers CT3D_3CAT (detectors/__init__.py:12,26) but omits its ROI
    # head from the head registry — repaired here (see roi_heads/ct3d_head.py)
    "CT3D_3CAT": CT3D3CAT,
    "PartA2": PartA2Net,
    "PointPillar": PointPillar,
    "PointRCNN": PointRCNN,
    "PVRCNN": PVRCNN,
    # PV-RCNN++ = PVRCNN shell with SPC keypoint sampling + vector-pool SA
    # layers (ref: detectors/pv_rcnn_plusplus.py — proposals feed the PFE,
    # which our PVRCNN forward already does); select via PFE config.
    "PVRCNNPlusPlus": PVRCNN,
    "SECOND": SECONDNet,
    "SECONDNet": SECONDNet,
    "SECONDNetIoU": SECONDNetIoU,
    "VoxelRCNN": VoxelRCNN,
}


_DTYPE_NAMES = {
    "float32": "float32", "fp32": "float32",
    "bfloat16": "bfloat16", "bf16": "bfloat16",
    "float16": "bfloat16",  # fp16 has no TPU advantage; map to bf16
}


def build_detector(model_cfg, num_class, class_names, grid_size, voxel_size,
                   point_cloud_range, batch_size, max_voxels, max_points_per_voxel):
    """Registry-based detector construction (ref: detectors/__init__.py:30-35).

    ``MODEL.DTYPE: bfloat16`` enables the mixed-precision compute policy —
    the TPU-native analog of the reference's AMP autocast (ref:
    tools/train.py:152-156): module compute runs in bf16, params and losses
    stay fp32 (flax ``dtype=`` semantics).
    """
    import jax.numpy as jnp

    cls = __all__[model_cfg["NAME"]]
    dtype = jnp.dtype(_DTYPE_NAMES[str(model_cfg.get("DTYPE", "float32")).lower()])
    kwargs = {}
    # point-based detectors carry a raw-point capacity (static shape for the
    # (B, max_points, C) tensors the data pipeline pads to)
    if "max_points" in cls.__dataclass_fields__ and "MAX_POINTS" in model_cfg:
        kwargs["max_points"] = int(model_cfg["MAX_POINTS"])
    return cls(
        model_cfg=model_cfg,
        num_class=num_class,
        class_names=tuple(class_names),
        grid_size=tuple(int(g) for g in grid_size),
        voxel_size=tuple(float(v) for v in voxel_size),
        point_cloud_range=tuple(float(v) for v in point_cloud_range),
        batch_size=int(batch_size),
        max_voxels=int(max_voxels),
        max_points_per_voxel=int(max_points_per_voxel),
        dtype=dtype,
        **kwargs,
    )

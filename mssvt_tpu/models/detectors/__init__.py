from .centerpoint import CenterPoint
from .pointpillar import PointPillar
from .second_net import SECONDNet
from .second_net_iou import SECONDNetIoU

__all__ = {
    "CenterPoint": CenterPoint,
    "PointPillar": PointPillar,
    "SECOND": SECONDNet,
    "SECONDNet": SECONDNet,
    "SECONDNetIoU": SECONDNetIoU,
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
    )

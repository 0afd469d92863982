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


def build_detector(model_cfg, num_class, class_names, grid_size, voxel_size,
                   point_cloud_range, batch_size, max_voxels, max_points_per_voxel):
    """Registry-based detector construction (ref: detectors/__init__.py:30-35)."""
    cls = __all__[model_cfg["NAME"]]
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
    )

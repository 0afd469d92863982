"""Model API glue (ref: pcdet/models/__init__.py:16-52).

``build_network`` resolves the detector from the full config plus the static
capacities the data pipeline pads to. ``load_data_to_gpu`` has no equivalent:
jit-compiled functions take host numpy and XLA handles the transfer.
"""

from __future__ import annotations

from .detectors import build_detector


def build_network(model_cfg, num_class, class_names, grid_size, voxel_size,
                  point_cloud_range, batch_size, max_voxels, max_points_per_voxel):
    return build_detector(
        model_cfg=model_cfg,
        num_class=num_class,
        class_names=class_names,
        grid_size=grid_size,
        voxel_size=voxel_size,
        point_cloud_range=point_cloud_range,
        batch_size=batch_size,
        max_voxels=max_voxels,
        max_points_per_voxel=max_points_per_voxel,
    )

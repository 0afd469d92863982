from .dataset import DatasetTemplate
from .synthetic import SyntheticDataset


_DATASETS = {
    "SyntheticDataset": SyntheticDataset,
}


def register_dataset(name, cls):
    _DATASETS[name] = cls


def build_dataset(dataset_cfg, class_names, training, root_path=None, logger=None):
    """Dataset construction by registry name (ref: datasets/__init__.py:45-74).

    Dataloading itself is handled by :class:`mssvt_tpu.datasets.loader.Loader`.
    """
    # lazily register heavyweight datasets to keep import costs down
    name = dataset_cfg["DATASET"]
    if name not in _DATASETS:
        if name == "WaymoDataset":
            from .waymo import WaymoDataset

            register_dataset("WaymoDataset", WaymoDataset)
        elif name == "KittiDataset":
            from .kitti import KittiDataset

            register_dataset("KittiDataset", KittiDataset)
        elif name == "PandasetDataset":
            from .pandaset import PandasetDataset

            register_dataset("PandasetDataset", PandasetDataset)
        elif name == "LyftDataset":
            from .lyft import LyftDataset

            register_dataset("LyftDataset", LyftDataset)
    cls = _DATASETS[name]
    return cls(
        dataset_cfg=dataset_cfg, class_names=class_names, training=training,
        root_path=root_path, logger=logger,
    )

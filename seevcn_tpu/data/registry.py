"""Dataset registry (reference pcdet/datasets/__init__.py __all__ +
see/surface_completion/SEE_VCN.py __DATASETS__)."""
from __future__ import annotations

from .demo_dataset import DemoObjects
from .generic import (CustomDataset, LyftDataset, NuScenesDataset,
                      SCCustomDataset, SCLyftDataset, SCNuScenesDataset,
                      SCWaymoDataset, WaymoDataset)
from .kitti.dataset import KittiDataset, SCKittiDataset

DATASETS = {
    "KittiDataset": KittiDataset,
    "SCKittiDataset": SCKittiDataset,
    "LyftDataset": LyftDataset,
    "SCLyftDataset": SCLyftDataset,
    "NuScenesDataset": NuScenesDataset,
    "SCNuScenesDataset": SCNuScenesDataset,
    "WaymoDataset": WaymoDataset,
    "SCWaymoDataset": SCWaymoDataset,
    "CustomDataset": CustomDataset,
    "SCCustomDataset": SCCustomDataset,
}


def build_dataset(dataset_cfg, class_names, training: bool, root_path=None, **kw):
    return DATASETS[dataset_cfg.DATASET](dataset_cfg, class_names, training,
                                         root_path, **kw)

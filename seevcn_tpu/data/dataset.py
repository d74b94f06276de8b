"""Dataset template: host pipeline producing fixed-shape device batches.

Reference: detector3d/pcdet/datasets/dataset.py:103-257 (prepare_data +
collate_batch) and processor/{point_feature_encoder,data_processor}.py.
TPU-first differences: no host voxelization (the model voxelizes in-jit);
ragged points/boxes become fixed-capacity padded arrays + masks; shuffle /
range-mask stay host-side numpy (cheap), augmentation runs jitted on device
via data.augmentor.
"""
from __future__ import annotations

import numpy as np

from ..utils.config import Cfg
from .augmentor import GTDatabaseSampler, aug_list_from_cfg, augment_frame


class PointFeatureEncoder:
    """absolute_coordinates_encoding (processor/point_feature_encoder.py)."""

    def __init__(self, cfg):
        self.used = list(cfg.used_feature_list)
        self.src = list(cfg.get("src_feature_list", self.used))
        assert self.used[:3] == ["x", "y", "z"]

    @property
    def num_point_features(self):
        return len(self.used)

    def __call__(self, points: np.ndarray) -> np.ndarray:
        idx = [self.src.index(f) for f in self.used]
        return points[:, idx]


def mask_points_outside_range(points, pcr):
    m = ((points[:, 0] >= pcr[0]) & (points[:, 0] <= pcr[3])
         & (points[:, 1] >= pcr[1]) & (points[:, 1] <= pcr[4]))
    return points[m]


class DatasetTemplate:
    """Common prepare/collate; subclasses implement get_lidar / get_infos."""

    def __init__(self, dataset_cfg, class_names, training: bool,
                 root_path: str | None = None,
                 max_points: int = 150000, max_boxes: int = 64):
        self.dataset_cfg = dataset_cfg
        self.class_names = list(class_names)
        self.training = training
        self.root_path = root_path or dataset_cfg.get("DATA_PATH", ".")
        self.point_cloud_range = np.asarray(dataset_cfg.POINT_CLOUD_RANGE,
                                            np.float32)
        self.max_points = max_points
        self.max_boxes = max_boxes
        self._epoch = 0
        self.point_feature_encoder = PointFeatureEncoder(
            dataset_cfg.POINT_FEATURE_ENCODING) if \
            dataset_cfg.get("POINT_FEATURE_ENCODING") else None

        aug_cfg = dataset_cfg.get("DATA_AUGMENTOR", None)
        self.aug_list = aug_list_from_cfg(aug_cfg) if (training and aug_cfg) else ()
        self.gt_sampler = None
        if training and aug_cfg:
            for a in aug_cfg.get("AUG_CONFIG_LIST", []):
                if a["NAME"] == "gt_sampling" and "gt_sampling" not in \
                        aug_cfg.get("DISABLE_AUG_LIST", []):
                    try:
                        self.gt_sampler = GTDatabaseSampler(
                            self.root_path, a, self.class_names)
                    except FileNotFoundError:
                        self.gt_sampler = None
        self._shuffle = True
        for p in dataset_cfg.get("DATA_PROCESSOR", []):
            if p.NAME == "shuffle_points":
                se = p.get("SHUFFLE_ENABLED", {"train": True, "test": False})
                self._shuffle = bool(se["train"] if training else se["test"])
            elif p.NAME == "sample_points":
                # data_processor.py sample_points: cap the per-frame point
                # budget; our fixed-capacity pad/subsample realizes it
                n = p.get("NUM_POINTS", None)
                if isinstance(n, dict):
                    n = n["train"] if training else n["test"]
                if n:
                    self.max_points = min(self.max_points, int(n))
            # transform_points_to_voxels(_placeholder), mask_points_* and
            # downsample_depth_map/calculate_grid_size are realized by the
            # in-jit voxelizer / range mask / CaDDN input pipeline

        self.min_points_of_gt = int(dataset_cfg.get("MIN_POINTS_OF_GT", 0) or 0)
        self.shift_coor = dataset_cfg.get("SHIFT_COOR", None)

    # ------------------------------------------------------------------ #
    def set_epoch(self, epoch: int):
        """Folds the epoch into per-sample randomness (sweep selection
        etc.) so training sees fresh draws each epoch while eval stays
        reproducible. The train loop calls this at each epoch start."""
        self._epoch = int(epoch)

    def prepare_frame(self, points: np.ndarray, gt_boxes=None, gt_names=None,
                      rng_seed: int = 0):
        """points (N, C) + optional gt -> fixed-shape dict (numpy)."""
        if self.shift_coor is not None:
            points = points.copy()
            points[:, :3] += np.asarray(self.shift_coor, points.dtype)
            if gt_boxes is not None and len(gt_boxes):
                gt_boxes = gt_boxes.copy()
                gt_boxes[:, :3] += np.asarray(self.shift_coor, gt_boxes.dtype)

        if self.training and self.gt_sampler is not None and gt_boxes is not None:
            points, gt_boxes, gt_names = self.gt_sampler(points, gt_boxes, gt_names)

        if self.point_feature_encoder is not None:
            points = self.point_feature_encoder(points)
        points = mask_points_outside_range(points, self.point_cloud_range)

        rng = np.random.default_rng(rng_seed)
        if self._shuffle:
            points = points[rng.permutation(len(points))]

        # fixed-capacity pad / subsample
        p = np.zeros((self.max_points, points.shape[1]), np.float32)
        n = min(len(points), self.max_points)
        if len(points) > self.max_points:
            sel = rng.choice(len(points), self.max_points, replace=False)
            p[:] = points[sel]
        else:
            p[:n] = points[:n]
        valid = np.arange(self.max_points) < n

        out = {"points": p, "points_valid": valid}

        if gt_boxes is not None:
            gt_names = np.asarray(gt_names)
            keep = np.isin(gt_names, self.class_names)
            boxes = np.asarray(gt_boxes, np.float32)[keep]
            names = gt_names[keep]
            if self.training and self.min_points_of_gt and len(boxes):
                # drop gts with too few points (dataset.py:129-137)
                from ..geom.boxes import points_in_boxes_count
                import jax.numpy as jnp

                cnt = np.asarray(points_in_boxes_count(
                    jnp.asarray(points[:, :3], jnp.float32),
                    jnp.asarray(boxes[:, :7], jnp.float32)))
                boxes = boxes[cnt >= self.min_points_of_gt]
                names = names[cnt >= self.min_points_of_gt]
            cls_ids = np.array([self.class_names.index(nm) + 1 for nm in names],
                               np.float32).reshape(-1, 1)
            gb = np.zeros((self.max_boxes, 8), np.float32)
            m = min(len(boxes), self.max_boxes)
            if m:
                gb[:m, :7] = boxes[:m, :7]
                gb[:m, 7:] = cls_ids[:m]
            out["gt_boxes"] = gb
            out["gt_mask"] = np.arange(self.max_boxes) < m
        return out

    def augment_on_device(self, rng, batch):
        """Apply the jitted augmentation chain to a device batch dict."""
        import jax
        import jax.numpy as jnp

        if not self.aug_list:
            return batch
        rngs = jax.random.split(rng, batch["points"].shape[0])
        pts, pvalid, gbs, gmask = jax.vmap(
            lambda r, p, v, g, m: augment_frame(r, p, v, g, m,
                                                aug_list=self.aug_list)
        )(rngs, batch["points"], batch["points_valid"],
          batch["gt_boxes"][..., :7], batch["gt_mask"])
        batch = dict(batch)
        batch["points"] = pts
        batch["points_valid"] = pvalid
        batch["gt_mask"] = gmask
        if hasattr(batch["gt_boxes"], "at"):
            gb = batch["gt_boxes"].at[..., :7].set(gbs)
            # masked-out gts become zero rows (the padding convention)
            batch["gt_boxes"] = jnp.where(gmask[..., None], gb, 0.0)
        else:
            gb = np.concatenate([np.asarray(gbs),
                                 batch["gt_boxes"][..., 7:]], axis=-1)
            batch["gt_boxes"] = np.where(np.asarray(gmask)[..., None], gb, 0.0)
        return batch

    @staticmethod
    def collate(frames: list) -> dict:
        return {k: np.stack([f[k] for f in frames]) for k in frames[0]}

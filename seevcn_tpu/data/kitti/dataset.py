"""KITTI dataset + SEE-completed (SC) variant.

Reference: detector3d/pcdet/datasets/kitti/kitti_dataset.py (infos pkl,
.bin clouds, camera-frame prediction dicts, official eval dispatch) and
sc_kitti_dataset.py:20-88 (points loaded from completed .pcd written by the
SEE stage, SHIFT_COOR support). Consumes reference-generated
``kitti_infos_*.pkl`` verbatim.
"""
from __future__ import annotations

import copy
import os
import pickle

import numpy as np

from ...geom import boxes as box_utils
from ...geom.calibration import KittiCalibration
from ...geom.pcd_io import read_pcd
from ..dataset import DatasetTemplate
from .eval import get_official_eval_result


class KittiDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training: bool,
                 root_path=None, **kw):
        super().__init__(dataset_cfg, class_names, training, root_path, **kw)
        split_key = "train" if training else "test"
        self.split = dataset_cfg.get("DATA_SPLIT", {}).get(split_key, "val")
        self.root_split_path = os.path.join(
            self.root_path, "training" if self.split != "test" else "testing")
        self.infos = []
        info_paths = dataset_cfg.get("INFO_PATH", {}).get(split_key, [])
        for p in info_paths:
            full = p if os.path.isabs(p) else os.path.join(self.root_path, p)
            if os.path.exists(full):
                with open(full, "rb") as f:
                    self.infos.extend(pickle.load(f))

    def __len__(self):
        return len(self.infos)

    # ------------------------------------------------------------------ #
    def get_lidar(self, info) -> np.ndarray:
        idx = info["point_cloud"]["lidar_idx"]
        path = os.path.join(self.root_split_path, "velodyne", f"{idx}.bin")
        return np.fromfile(path, dtype=np.float32).reshape(-1, 4)

    def get_calib(self, info) -> KittiCalibration:
        if "calib" in info:
            c = info["calib"]
            return KittiCalibration({
                "P2": np.asarray(c["P2"])[:3, :4],
                "R0": np.asarray(c["R0_rect"])[:3, :3],
                "Tr_velo2cam": np.asarray(c["Tr_velo_to_cam"])[:3, :4]})
        idx = info["point_cloud"]["lidar_idx"]
        return KittiCalibration(os.path.join(self.root_split_path, "calib",
                                             f"{idx}.txt"))

    def get_gt(self, info):
        if "annos" not in info:
            return None, None
        annos = info["annos"]
        mask = annos["name"] != "DontCare"
        if "gt_boxes_lidar" in annos:
            boxes = annos["gt_boxes_lidar"]
        else:
            calib = self.get_calib(info)
            loc, dims, rots = (annos["location"][mask], annos["dimensions"][mask],
                               annos["rotation_y"][mask])
            cam = np.concatenate([loc, dims, rots[:, None]], axis=1)
            boxes = box_utils.boxes3d_kitti_camera_to_lidar(cam, calib)
            return boxes, annos["name"][mask]
        return boxes, annos["name"][mask]

    # camera-side items for CaDDN (kitti_dataset.py:68-99, 411-462) -------
    def get_image(self, idx) -> np.ndarray:
        """RGB float [0, 1] (get_image:68-82)."""
        import cv2

        img = cv2.imread(os.path.join(self.root_split_path, "image_2",
                                      f"{idx}.png"))
        return img[:, :, ::-1].astype(np.float32) / 255.0

    def get_depth_map(self, idx) -> np.ndarray:
        """Depth in meters from the uint16 KITTI depth PNG (value/256,
        get_depth_map:93-99)."""
        import cv2

        d = cv2.imread(os.path.join(self.root_split_path, "depth_2",
                                    f"{idx}.png"), cv2.IMREAD_UNCHANGED)
        return d.astype(np.float32) / 256.0

    @staticmethod
    def _pad_hw(arr, shape):
        """Bottom/right zero-pad to a static (H, W[, C]) for TPU batching
        (the reference pads in collate_batch via kornia pad)."""
        h, w = shape
        out = np.zeros((h, w) + arr.shape[2:], arr.dtype)
        ch, cw = min(h, arr.shape[0]), min(w, arr.shape[1])
        out[:ch, :cw] = arr[:ch, :cw]
        return out

    def __getitem__(self, index):
        info = self.infos[index]
        points = self.get_lidar(info)
        calib = None
        if self.dataset_cfg.get("FOV_POINTS_ONLY", False):
            calib = self.get_calib(info)
            img_shape = np.asarray(info.get("image", {}).get(
                "image_shape", (375, 1242)))
            uv, depth = calib.lidar_to_img(points[:, :3])
            fov = ((uv[:, 0] >= 0) & (uv[:, 0] < img_shape[1])
                   & (uv[:, 1] >= 0) & (uv[:, 1] < img_shape[0])
                   & (depth > 0))
            points = points[fov]
        boxes, names = self.get_gt(info)
        out = self.prepare_frame(points, boxes, names, rng_seed=index)
        out["frame_id"] = info["point_cloud"]["lidar_idx"]

        items = list(self.dataset_cfg.get("GET_ITEM_LIST", ["points"]))
        if "images" in items or "depth_maps" in items or \
                "calib_matricies" in items:
            idx = info["point_cloud"]["lidar_idx"]
            pad = tuple(self.dataset_cfg.get("IMAGE_PAD_SHAPE", (384, 1280)))
            if "images" in items:
                out["images"] = self._pad_hw(self.get_image(idx), pad)
            if "depth_maps" in items:
                out["depth_maps"] = self._pad_hw(self.get_depth_map(idx), pad)
            if "calib_matricies" in items:
                calib = calib or self.get_calib(info)
                v2c = np.eye(4, dtype=np.float32)
                v2c[:3, :4] = calib.V2C
                r0 = np.eye(4, dtype=np.float32)
                r0[:3, :3] = calib.R0
                out["trans_lidar_to_cam"] = (r0 @ v2c).astype(np.float32)
                out["trans_cam_to_img"] = calib.P2.astype(np.float32)
        return out

    # ------------------------------------------------------------------ #
    def generate_prediction_dicts(self, frame_indices, pred_dicts,
                                  class_names, output_path=None):
        """pred_dicts: list of per-frame dicts with numpy 'pred_boxes' (N,7),
        'pred_scores' (N,), 'pred_labels' (N,) — already mask-compacted.
        Mirrors kitti_dataset.py:277-364."""
        annos = []
        for fi, box_dict in zip(frame_indices, pred_dicts):
            info = self.infos[fi]
            calib = self.get_calib(info)
            image_shape = info.get("image", {}).get("image_shape", (375, 1242))

            boxes = np.asarray(box_dict["pred_boxes"], np.float64)
            scores = np.asarray(box_dict["pred_scores"], np.float64)
            labels = np.asarray(box_dict["pred_labels"], np.int64)

            if self.shift_coor is not None:
                boxes = boxes.copy()
                boxes[:, :3] -= np.asarray(self.shift_coor)

            test_cfg = self.dataset_cfg.get("TEST", None)
            if test_cfg and test_cfg.get("BOX_FILTER", {}).get("FOV_FILTER"):
                rect = calib.lidar_to_rect(boxes[:, :3])
                uv, depth = calib.rect_to_img(rect)
                m = 5
                fov = ((uv[:, 0] >= -m) & (uv[:, 0] < image_shape[1] + m)
                       & (uv[:, 1] >= -m) & (uv[:, 1] < image_shape[0] + m)
                       & (depth > 0))
                lim = test_cfg["BOX_FILTER"].get("LIMIT_RANGE")
                if lim is not None:
                    fov &= np.asarray(box_utils.mask_boxes_outside_range(
                        boxes[:, :7].astype(np.float32), lim))
                boxes, scores, labels = boxes[fov], scores[fov], labels[fov]

            n = len(boxes)
            pred = {"name": np.array(["Car"] * 0) if n == 0 else
                    np.array(class_names)[labels - 1],
                    "truncated": np.zeros(n), "occluded": np.zeros(n),
                    "score": scores, "boxes_lidar": boxes,
                    "frame_id": info["point_cloud"]["lidar_idx"]}
            if n:
                cam = box_utils.boxes3d_lidar_to_kitti_camera(boxes, calib)
                img_boxes = box_utils.boxes3d_kitti_camera_to_imageboxes(
                    cam, calib, image_shape=image_shape)
                pred["alpha"] = -np.arctan2(-boxes[:, 1], boxes[:, 0]) + cam[:, 6]
                pred["bbox"] = img_boxes
                pred["dimensions"] = cam[:, 3:6]
                pred["location"] = cam[:, 0:3]
                pred["rotation_y"] = cam[:, 6]
            else:
                pred.update({"alpha": np.zeros(0), "bbox": np.zeros((0, 4)),
                             "dimensions": np.zeros((0, 3)),
                             "location": np.zeros((0, 3)),
                             "rotation_y": np.zeros(0)})
            annos.append(pred)

            if output_path is not None:
                self._write_kitti_txt(pred, output_path)
        return annos

    @staticmethod
    def _write_kitti_txt(pred, output_path):
        os.makedirs(output_path, exist_ok=True)
        path = os.path.join(output_path, f"{pred['frame_id']}.txt")
        with open(path, "w") as f:
            for i in range(len(pred["bbox"])):
                b, d, l = pred["bbox"][i], pred["dimensions"][i], pred["location"][i]
                f.write("%s -1 -1 %.4f %.4f %.4f %.4f %.4f %.4f %.4f %.4f "
                        "%.4f %.4f %.4f %.4f %.4f\n"
                        % (pred["name"][i], pred["alpha"][i], b[0], b[1], b[2],
                           b[3], d[1], d[2], d[0], l[0], l[1], l[2],
                           pred["rotation_y"][i], pred["score"][i]))

    def evaluation(self, det_annos, class_names, **kw):
        if not self.infos or "annos" not in self.infos[0]:
            return None, {}
        gt_annos = [copy.deepcopy(info["annos"]) for info in self.infos]
        if self.min_points_of_gt:
            for annos in gt_annos:
                keep = annos.get("num_points_in_gt",
                                 np.full(len(annos["name"]), 1 << 30)) \
                    >= self.min_points_of_gt
                for key in list(annos.keys()):
                    v = annos[key]
                    if isinstance(v, np.ndarray) and len(v) == len(keep):
                        annos[key] = v[keep]
        return get_official_eval_result(gt_annos, det_annos,
                                        classes=tuple(class_names))


class SCKittiDataset(KittiDataset):
    """KITTI with SEE-completed clouds (sc_kitti_dataset.py:20-33): the
    frame's points come from the completed .pcd recorded in the infos."""

    def get_lidar(self, info) -> np.ndarray:
        rel = info.get("completed_lidar_path")
        if rel is None:
            tag = self.dataset_cfg.get("PROCESSED_DATA_TAG", "vcn")
            idx = info["point_cloud"]["lidar_idx"]
            rel = os.path.join(tag, f"{idx}.pcd")
        path = rel if os.path.isabs(rel) else os.path.join(self.root_split_path, rel)
        return read_pcd(path)


DATASETS = {"KittiDataset": KittiDataset, "SCKittiDataset": SCKittiDataset}

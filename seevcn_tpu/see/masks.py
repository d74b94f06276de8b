"""COCO-JSON instance-mask interface.

The SEE stage consumes 2D instance masks stored as COCO JSON per camera
(reference: see/detector2d/generate_masks.py:136-139 writes them;
see/.../datasets/*_objects.py loads them via pycocotools COCO). This module
re-implements the small subset used — annotation lookup per image, polygon
-> binary mask rasterization (cv2), polygon shrink — with no pycocotools
dependency, and stays byte-compatible with reference-generated JSON.
"""
from __future__ import annotations

import json

import numpy as np


class CocoMasks:
    """Minimal COCO reader: images / annotations with polygon segmentation."""

    def __init__(self, path_or_dict):
        if isinstance(path_or_dict, str):
            with open(path_or_dict) as f:
                d = json.load(f)
        else:
            d = path_or_dict
        self.images = {im["id"]: im for im in d.get("images", [])}
        self.anns = {}
        self.img_to_anns = {}
        for a in d.get("annotations", []):
            self.anns[a["id"]] = a
            self.img_to_anns.setdefault(a["image_id"], []).append(a)
        self.file_to_img = {im.get("file_name"): im for im in d.get("images", [])}

    def get_ann_ids(self, img_ids):
        if not isinstance(img_ids, (list, tuple)):
            img_ids = [img_ids]
        out = []
        for i in img_ids:
            out.extend(a["id"] for a in self.img_to_anns.get(i, []))
        return out

    def load_anns(self, ann_ids):
        return [self.anns[i] for i in ann_ids]

    # pycocotools-compatible aliases (reference calls getAnnIds/loadAnns/annToMask)
    def getAnnIds(self, imgIds):  # noqa: N802
        return self.get_ann_ids(imgIds)

    def loadAnns(self, ids):  # noqa: N802
        return self.load_anns(ids)

    def annToMask(self, ann):  # noqa: N802
        img = self.images[ann["image_id"]]
        return polygons_to_mask(ann["segmentation"], img["height"], img["width"])


def polygons_to_mask(segmentation, height: int, width: int) -> np.ndarray:
    """COCO polygon list [[x0,y0,x1,y1,...], ...] -> (H, W) uint8 mask."""
    import cv2

    mask = np.zeros((height, width), np.uint8)
    polys = [np.asarray(p, np.float64).reshape(-1, 2).round().astype(np.int32)
             for p in segmentation if len(p) >= 6]
    if polys:
        cv2.fillPoly(mask, polys, 1)
    return mask


def shrink_polygons(segmentation, shrink_percentage: float):
    """Scale each polygon toward its centroid by (1 - pct/100)
    (reference shared_utils.shrink_instance_masks)."""
    out = []
    s = 1.0 - shrink_percentage / 100.0
    for p in segmentation:
        pts = np.asarray(p, np.float64).reshape(-1, 2)
        c = pts.mean(axis=0)
        out.append(((pts - c) * s + c).reshape(-1).tolist())
    return out


def get_pts_in_mask(coco: CocoMasks, instances, imgfov: dict,
                    shrink_percentage: float = 0.0, use_bbox: bool = False) -> dict:
    """Assign in-FOV lidar points to each instance mask.

    imgfov: dict with 'pts_img' (N,2 int), 'pc_lidar' (N,3+), 'pc_cam'
    (N,3) or None, 'img_shape' (H,W) — the output of
    map_pointcloud_to_image (reference kitti_objects.py:153-176).

    Returns the reference's instance_pts dict (shared_utils.py:36-106).
    """
    pts_img = imgfov["pts_img"]
    pc_lidar = imgfov["pc_lidar"]
    pc_cam = imgfov.get("pc_cam")
    h, w = imgfov["img_shape"]

    uv_list, cam_list, lidar_list, labels = [], [], [], []
    for inst_orig in instances:
        inst = dict(inst_orig)
        if not inst.get("segmentation") and not use_bbox:
            continue
        if use_bbox:
            x0, y0, bw, bh = inst["bbox"]
            mask = np.zeros((h, w), np.uint8)
            mask[int(y0):int(y0 + bh), int(x0):int(x0 + bw)] = 1
        else:
            seg = inst["segmentation"]
            if shrink_percentage:
                seg = shrink_polygons(seg, shrink_percentage)
            img = coco.images.get(inst["image_id"], {"height": h, "width": w})
            mask = polygons_to_mask(seg, img.get("height", h), img.get("width", w))
            inst["bin_mask"] = mask

        u = np.clip(pts_img[:, 0], 0, mask.shape[1] - 1)
        v = np.clip(pts_img[:, 1], 0, mask.shape[0] - 1)
        sel = mask[v, u].astype(bool)
        if not sel.any():
            continue
        lidar_list.append(pc_lidar[sel])
        uv_list.append(pts_img[sel])
        if pc_cam is not None:
            cam_list.append(pc_cam[sel])
        labels.append(inst)

    return {"img_uv": uv_list, "cam_xyz": cam_list,
            "lidar_xyz": lidar_list, "img_labels": labels}

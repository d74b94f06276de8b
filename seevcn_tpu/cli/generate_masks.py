"""2D instance-mask generation CLI.

Reference: see/detector2d/generate_masks.py:67-141 — runs an mmdetection HTC
model per image and dumps COCO JSON masks per camera. The rebuild keeps the
exact COCO-JSON contract (so reference-generated masks are drop-in, and
masks generated here are drop-in for the reference) while making the 2D
model pluggable:

  * --backend jax[:ckpt.pkl] : the native flax Mask R-CNN
    (models/seg2d/maskrcnn.py), trained with models/seg2d trainer; runs
    on the TPU.
  * --backend torchvision : torchvision Mask R-CNN (CPU torch wheel); needs
    local weights (zero-egress deployments must pre-stage them via
    TORCH_HOME or --weights).
  * --backend import:pkg.mod:fn : any callable(image_bgr) -> list of dicts
    {mask (H,W) bool, bbox xywh, score, category_id}.
"""
from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np

CAR_CATEGORY_ID = 3  # COCO 'car' (generate_masks.py keeps COCO ids)


def mask_to_polygons(mask: np.ndarray):
    """Binary mask -> COCO polygon list (mask_utils.mask2polygon)."""
    import cv2

    contours, _ = cv2.findContours(mask.astype(np.uint8), cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
    polys = []
    for c in contours:
        c = c.reshape(-1, 2)
        if len(c) >= 3:
            polys.append(c.reshape(-1).astype(float).tolist())
    return polys


def detections_to_coco(per_image, out_path: str, score_thresh: float = 0.5):
    """per_image: list of (file_name, (H, W), detections)."""
    images, annotations = [], []
    ann_id = 1
    for img_id, (fname, (h, w), dets) in enumerate(per_image, start=1):
        images.append({"id": img_id, "file_name": fname,
                       "height": int(h), "width": int(w)})
        for d in dets:
            if d.get("score", 1.0) < score_thresh:
                continue
            segm = d.get("segmentation") or mask_to_polygons(d["mask"])
            if not segm:
                continue
            annotations.append({
                "id": ann_id, "image_id": img_id,
                "category_id": int(d.get("category_id", CAR_CATEGORY_ID)),
                "segmentation": segm,
                "bbox": [float(x) for x in d["bbox"]],
                "score": float(d.get("score", 1.0)), "iscrowd": 0})
            ann_id += 1
    coco = {"images": images, "annotations": annotations,
            "categories": [{"id": CAR_CATEGORY_ID, "name": "car"}]}
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(coco, f)
    return out_path


def _torchvision_backend(weights_path=None, score_thresh=0.5):
    import torch
    import torchvision

    if weights_path:
        model = torchvision.models.detection.maskrcnn_resnet50_fpn(weights=None)
        model.load_state_dict(torch.load(weights_path, map_location="cpu"))
    else:
        model = torchvision.models.detection.maskrcnn_resnet50_fpn(
            weights="DEFAULT")
    model.eval()

    def run(image_bgr):
        img = torch.from_numpy(image_bgr[:, :, ::-1].copy()).permute(2, 0, 1)
        img = img.float() / 255.0
        with torch.no_grad():
            out = model([img])[0]
        dets = []
        for i in range(len(out["scores"])):
            if int(out["labels"][i]) != CAR_CATEGORY_ID:
                continue
            x0, y0, x1, y1 = out["boxes"][i].tolist()
            dets.append({"mask": out["masks"][i, 0].numpy() > 0.5,
                         "bbox": [x0, y0, x1 - x0, y1 - y0],
                         "score": float(out["scores"][i]),
                         "category_id": CAR_CATEGORY_ID})
        return dets

    return run


def _import_backend(spec: str):
    mod_name, fn_name = spec.split(":", 1)
    import importlib

    return getattr(importlib.import_module(mod_name), fn_name)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--image_dir", required=True)
    p.add_argument("--out", required=True, help="output COCO json path")
    p.add_argument("--backend", default="torchvision")
    p.add_argument("--weights", default=None)
    p.add_argument("--score_thresh", type=float, default=0.5)
    p.add_argument("--ext", default="png,jpg")
    args = p.parse_args(argv)

    import cv2

    if args.backend == "torchvision":
        run = _torchvision_backend(args.weights, args.score_thresh)
    elif args.backend == "jax" or args.backend.startswith("jax:"):
        from ..models.seg2d.backend import JaxMaskRCNNBackend

        ckpt = args.backend[4:] if args.backend.startswith("jax:") else args.weights
        run = JaxMaskRCNNBackend(ckpt, score_thresh=args.score_thresh)
    elif args.backend.startswith("import:"):
        run = _import_backend(args.backend[len("import:"):])
    else:
        raise SystemExit(f"unknown backend {args.backend}")

    per_image = []
    paths = []
    for ext in args.ext.split(","):
        paths += glob.glob(os.path.join(args.image_dir, f"*.{ext}"))
    for path in sorted(paths):
        img = cv2.imread(path)
        dets = run(img)
        per_image.append((os.path.basename(path), img.shape[:2], dets))
        print(f"{os.path.basename(path)}: {len(dets)} cars")
    detections_to_coco(per_image, args.out, args.score_thresh)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

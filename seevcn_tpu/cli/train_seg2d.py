"""Train the native 2D instance-segmentation model (Mask R-CNN).

The reference pipeline uses a COCO-pretrained mmdetection HTC for the 2D
stage (see/detector2d/scripts/htc/kitti_masks.sh:10-11); no egress means no
pretrained download here, so this recipe trains from scratch — by default
on procedural synthetic driving scenes (models/seg2d/synthetic.py), or on a
COCO-format dataset directory (--coco_dir with annotations.json + images)
when one exists. Checkpoints load straight into
``generate_masks --backend jax:<ckpt>``.

Usage:
  python -m seevcn_tpu.cli.train_seg2d --steps 2000 --out seg2d.ckpt
  python -m seevcn_tpu.cli.train_seg2d --coco_dir data/coco --out seg2d.ckpt
"""
from __future__ import annotations

import argparse
import json
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="seg2d.ckpt")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--warmup_steps", type=int, default=200)
    p.add_argument("--image_size", type=int, nargs=2, default=(384, 512))
    p.add_argument("--size", choices=["tiny", "small", "base"], default="base",
                   help="backbone scale")
    p.add_argument("--coco_dir", default=None,
                   help="COCO-format dataset root (annotations.json + imgs); "
                        "default: synthetic scenes")
    p.add_argument("--eval_every", type=int, default=500)
    p.add_argument("--eval_scenes", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--cascade", type=int, default=1, choices=[1, 3],
                   help="cascade box-head stages (3 = HTC-class cascade "
                        "at IoU 0.5/0.6/0.7)")
    p.add_argument("--semantic", action="store_true",
                   help="HTC fused semantic branch (stride-8 seg loss + "
                        "ROI feature fusion)")
    p.add_argument("--mask_info_flow", action="store_true",
                   help="HTC per-stage mask heads with res-feat chaining "
                        "(needs --cascade 3)")
    p.add_argument("--hard", action="store_true",
                   help="far-instance/occlusion scene regime (train AND "
                        "eval); eval always reports far/near AP buckets")
    return p.parse_args(argv)


SIZES = {
    "tiny": dict(stage_sizes=(1, 1, 1, 1), stage_channels=(16, 32, 64, 64),
                 fpn_channels=32, box_hidden=128, mask_channels=32,
                 mask_convs=2),
    "small": dict(stage_sizes=(2, 2, 2, 2), stage_channels=(32, 64, 128, 128),
                  fpn_channels=64, box_hidden=256, mask_channels=64,
                  mask_convs=2),
    "base": dict(),  # Seg2DConfig defaults (ResNet-18-class)
}


def build_cfg(args):
    from ..models.seg2d.maskrcnn import Seg2DConfig

    return Seg2DConfig(image_size=tuple(args.image_size),
                       cascade_stages=getattr(args, "cascade", 1),
                       semantic_branch=getattr(args, "semantic", False),
                       mask_info_flow=getattr(args, "mask_info_flow", False),
                       **SIZES[args.size])


def synthetic_stream(cfg, batch, seed, hard=False):
    import numpy as np

    from ..models.seg2d.synthetic import synth_batch

    rng = np.random.RandomState(seed)
    while True:
        yield synth_batch(rng, cfg.image_size, batch, max_gt=cfg.max_gt,
                          hard=hard)


def coco_stream(cfg, batch, root, seed):
    """COCO-format directory loader: <root>/annotations.json with
    images[{file_name, id}], annotations[{image_id, bbox xywh, category_id,
    segmentation polygon}]. Rescales to cfg.image_size."""
    import numpy as np

    from ..see.masks import polygons_to_mask  # COCO polygon rasterizer

    with open(os.path.join(root, "annotations.json")) as f:
        coco = json.load(f)
    by_img = {}
    for a in coco["annotations"]:
        by_img.setdefault(a["image_id"], []).append(a)
    images = [im for im in coco["images"] if by_img.get(im["id"])]
    cat_ids = sorted({a["category_id"] for a in coco["annotations"]})
    cat_to_label = {c: i for i, c in enumerate(cat_ids)}
    h, w = cfg.image_size

    import cv2

    rng = np.random.RandomState(seed)
    while True:
        idxs = rng.randint(0, len(images), batch)
        imgs = np.zeros((batch, h, w, 3), np.float32)
        gtb = np.zeros((batch, cfg.max_gt, 4), np.float32)
        gtl = np.zeros((batch, cfg.max_gt), np.int32)
        gtv = np.zeros((batch, cfg.max_gt), bool)
        gtm = np.zeros((batch, cfg.max_gt, h, w), np.float32)
        for bi, ii in enumerate(idxs):
            im = images[ii]
            raw = cv2.imread(os.path.join(root, im["file_name"]))[..., ::-1]
            h0, w0 = raw.shape[:2]
            from ..models.seg2d.backend import IMAGENET_MEAN, IMAGENET_STD

            imgs[bi] = (cv2.resize(raw, (w, h)).astype(np.float32) / 255.0
                        - IMAGENET_MEAN) / IMAGENET_STD
            sx, sy = w / w0, h / h0
            for k, a in enumerate(by_img[im["id"]][:cfg.max_gt]):
                x, y, bw, bh = a["bbox"]
                gtb[bi, k] = [x * sx, y * sy, (x + bw) * sx, (y + bh) * sy]
                gtl[bi, k] = cat_to_label[a["category_id"]]
                gtv[bi, k] = True
                m = polygons_to_mask(a["segmentation"], h0, w0)
                gtm[bi, k] = cv2.resize(m.astype(np.float32), (w, h)) >= 0.5
        yield imgs, gtb, gtl, gtv, gtm


def evaluate(model, variables, cfg, n_scenes, seed, hard=False):
    """Held-out synthetic mask/box AP, plus far/near distance buckets.

    Buckets follow the COCO area-range protocol re-expressed as GT bbox
    pixel height (height ~ 1/distance under perspective; coco_eval
    height_range ignore semantics): far = height < h/8, near = rest. The
    far bucket is the regime the reference runs HTC at ~1400 px for
    (kitti_masks.sh:10-11).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models.seg2d.coco_eval import evaluate_instances
    from ..models.seg2d.synthetic import synth_scene

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    rng = np.random.RandomState(seed + 77777)
    h, w = cfg.image_size
    preds, gts = [], []
    for _ in range(n_scenes):
        img, boxes, labels, valid, masks = synth_scene(h, w, rng,
                                                       max_gt=cfg.max_gt,
                                                       hard=hard)
        out = fwd(variables, jnp.asarray(img[None]))
        db = np.asarray(out["det_boxes"][0])
        ds = np.asarray(out["det_scores"][0])
        dc = np.asarray(out["det_cls"][0])
        dm = np.asarray(out["det_masks"][0])
        keep = ds > 0.05
        full = np.zeros((int(keep.sum()), h, w), bool)
        import cv2

        for oi, i in enumerate(np.nonzero(keep)[0]):
            x1, y1, x2, y2 = db[i]
            bw = max(int(round(x2 - x1)), 1)
            bh = max(int(round(y2 - y1)), 1)
            patch = cv2.resize(dm[i], (bw, bh)) >= 0.5
            xi, yi = max(int(round(x1)), 0), max(int(round(y1)), 0)
            xe, ye = min(xi + bw, w), min(yi + bh, h)
            full[oi, yi:ye, xi:xe] = patch[:ye - yi, :xe - xi]
        preds.append({"masks": full, "boxes": db[keep], "scores": ds[keep],
                      "labels": dc[keep]})
        gts.append({"masks": masks[valid] >= 0.5, "boxes": boxes[valid],
                    "labels": labels[valid]})
    mask_ap = evaluate_instances(preds, gts, kind="mask")
    box_ap = evaluate_instances(preds, gts, kind="box")
    far_h = h / 8.0
    mask_far = evaluate_instances(preds, gts, kind="mask",
                                  height_range=(0.0, far_h))
    mask_near = evaluate_instances(preds, gts, kind="mask",
                                   height_range=(far_h, float("inf")))
    return {"mask_AP50": mask_ap["AP50"], "mask_AP": mask_ap["AP"],
            "box_AP50": box_ap["AP50"], "box_AP": box_ap["AP"],
            "mask_AP50_far": mask_far["AP50"],
            "mask_AP50_near": mask_near["AP50"]}


def train(args=None, cfg=None, stream=None, quiet=False):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ..models.seg2d.backend import (build_seg2d, init_seg2d,
                                        make_seg2d_train_step,
                                        save_seg2d_checkpoint)

    args = args or parse_args([])
    cfg = cfg or build_cfg(args)
    model, logic = build_seg2d(cfg)
    variables = init_seg2d(model)

    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, args.warmup_steps, max(args.steps, args.warmup_steps + 1))
    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     optax.adamw(sched, weight_decay=args.weight_decay))
    state = {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {}),
             "opt": tx.init(variables["params"]),
             "it": jnp.zeros((), jnp.int32)}
    step_fn = make_seg2d_train_step(model, tx)

    if stream is None:
        stream = coco_stream(cfg, args.batch_size, args.coco_dir, args.seed) \
            if args.coco_dir else \
            synthetic_stream(cfg, args.batch_size, args.seed,
                             hard=getattr(args, "hard", False))
    rng = jax.random.PRNGKey(args.seed)

    # wire compression (decoded on device by the step — see
    # make_seg2d_train_step): f16 images + bit-packed masks cut the
    # per-step host->device transfer ~7x; the step key is folded from a
    # device counter so rng uploads once
    rng = jax.device_put(rng)

    def pack(batch):
        imgs, boxes, labels, valid, masks = batch
        if masks.shape[-1] % 8 == 0:
            masks = np.packbits(masks >= 0.5, axis=-1, bitorder="little")
        return (imgs.astype(np.float16), boxes, labels, valid, masks)

    t0, metrics = time.time(), {}
    for it in range(args.steps):
        batch = pack(next(stream))
        state, metrics = step_fn(state, *(jnp.asarray(b) for b in batch),
                                 rng)
        if not quiet and (it % args.log_every == 0 or it == args.steps - 1):
            loss = float(metrics["loss"])
            print(f"step {it:5d} loss {loss:.4f} "
                  f"({(it + 1) / (time.time() - t0):.2f} it/s)", flush=True)
        if args.eval_every and it > 0 and (it + 1) % args.eval_every == 0:
            ev = evaluate(model, {"params": state["params"],
                                  "batch_stats": state["batch_stats"]},
                          cfg, args.eval_scenes, args.seed,
                          hard=getattr(args, "hard", False))
            if not quiet:
                print(f"step {it:5d} " + " ".join(
                    f"{k}={v:.3f}" for k, v in ev.items()), flush=True)
            if args.out:
                # checkpoint at every eval point so a long run killed
                # mid-flight still leaves a usable artifact
                save_seg2d_checkpoint(args.out, state, cfg)
                if not quiet:
                    print(f"saved {args.out} (step {it + 1})", flush=True)

    if args.out:
        save_seg2d_checkpoint(args.out, state, cfg)
        if not quiet:
            print(f"saved {args.out}")
    return state, model, cfg


def main(argv=None):
    args = parse_args(argv)
    state, model, cfg = train(args)
    ev = evaluate(model, {"params": state["params"],
                          "batch_stats": state["batch_stats"]},
                  cfg, args.eval_scenes, args.seed,
                  hard=getattr(args, "hard", False))
    print(json.dumps(ev))


if __name__ == "__main__":
    main()

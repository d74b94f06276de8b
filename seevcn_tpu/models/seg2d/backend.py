"""Inference backend + trainer glue for the native Mask R-CNN.

Plugs into cli/generate_masks.py (the reference's see/detector2d/
generate_masks.py:67-141 contract): ``run(image_bgr) -> [{mask, bbox,
score, category_id}]``. Weights come from a pickle checkpoint produced by
``train_seg2d`` / cli.train_seg2d; with no checkpoint the model runs with
random weights (useful only for smoke tests — this environment has no
egress for pretrained downloads).
"""
from __future__ import annotations

import os
import pickle
from functools import partial

import numpy as np

from .maskrcnn import MaskRCNN, MaskRCNNLogic, Seg2DConfig

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def build_seg2d(cfg: Seg2DConfig | None = None):
    cfg = cfg or Seg2DConfig()
    logic = MaskRCNNLogic(cfg)
    return MaskRCNN(cfg=cfg, logic=logic), logic


def init_seg2d(model, rng=None):
    import jax
    import jax.numpy as jnp

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    h, w = model.cfg.image_size
    img = jnp.zeros((1, h, w, 3), jnp.float32)
    return jax.jit(partial(model.init, train=False))({"params": rng}, img)


def make_seg2d_train_step(model, tx, packed_masks: bool | None = None):
    """Returns (state-dict, imgs, gts..., rng) -> (state-dict, metrics).

    Host->device transfer through the tunneled TPU backend is the
    bottleneck of this recipe (a float32 batch at 384x512 b8 is ~70 MB
    per step at single-digit MB/s), so the step accepts wire-compressed
    inputs and decodes ON DEVICE: float16 images (cast up to f32) and
    bit-packed uint8 masks (unpacked with shifts; np.packbits
    bitorder='little' layout). Full-precision inputs still work.

    ``packed_masks`` makes the wire format EXPLICIT (ADVICE r3: the old
    dtype/shape heuristic would silently bit-unpack a legitimate unpacked
    uint8 mask at 1/8 image width). None keeps the heuristic for
    backward compat; pass True/False when you know the format.

    The per-step RNG folds in a device step counter (state['it']) so
    callers pass one constant key instead of dispatching a fold_in per
    step."""
    import jax
    import jax.numpy as jnp
    import optax

    def step(state, images, gt_boxes, gt_labels, gt_valid, gt_masks, rng):
        if images.dtype != jnp.float32:
            images = images.astype(jnp.float32)
        unpack = packed_masks if packed_masks is not None else (
            gt_masks.dtype == jnp.uint8 and
            gt_masks.shape[-1] * 8 == images.shape[-2])
        if unpack:
            bits = (gt_masks[..., None] >>
                    jnp.arange(8, dtype=jnp.uint8)) & jnp.uint8(1)
            gt_masks = bits.reshape(*gt_masks.shape[:-1],
                                    gt_masks.shape[-1] * 8)
        gt_masks = gt_masks.astype(jnp.float32)
        if "it" in state:      # else the caller folds per-step themselves
            rng = jax.random.fold_in(rng, state["it"])

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state["batch_stats"]},
                images, gt_boxes, gt_labels, gt_valid, gt_masks,
                train=True, rng=rng, mutable=["batch_stats"])
            loss, tb = model.loss(out, gt_boxes, gt_labels, gt_valid,
                                  gt_masks, rng)
            return loss, (tb, mut["batch_stats"])

        (loss, (tb, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])
        updates, opt = tx.update(grads, state["opt"], state["params"])
        new = {"params": optax.apply_updates(state["params"], updates),
               "batch_stats": stats, "opt": opt}
        if "it" in state:
            new["it"] = state["it"] + 1
        return new, {"loss": loss, **tb}

    return jax.jit(step, donate_argnums=(0,))


class JaxMaskRCNNBackend:
    """callable(image_bgr) for cli/generate_masks.py --backend jax[:ckpt]."""

    def __init__(self, ckpt: str | None = None, cfg: Seg2DConfig | None = None,
                 score_thresh: float = 0.5):
        import jax

        self.model, self.logic = build_seg2d(cfg)
        self.cfg = self.model.cfg
        self.score_thresh = score_thresh
        if ckpt:
            with open(ckpt, "rb") as f:
                saved = pickle.load(f)
            if "cfg" in saved:
                self.cfg = saved["cfg"]
                self.model, self.logic = build_seg2d(self.cfg)
            self.variables = jax.device_put(
                {"params": saved["params"],
                 "batch_stats": saved.get("batch_stats", {})})
        else:
            self.variables = init_seg2d(self.model)
        self._fwd = jax.jit(partial(self.model.apply, train=False))

    def __call__(self, image_bgr: np.ndarray):
        import cv2
        import jax.numpy as jnp

        h0, w0 = image_bgr.shape[:2]
        ih, iw = self.cfg.image_size
        img = cv2.resize(image_bgr[..., ::-1], (iw, ih)).astype(np.float32)
        img = (img / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        out = self._fwd(self.variables, jnp.asarray(img[None]))
        boxes = np.asarray(out["det_boxes"][0])           # resized coords
        scores = np.asarray(out["det_scores"][0])
        cls = np.asarray(out["det_cls"][0])
        masks = np.asarray(out["det_masks"][0])           # (D, 28, 28)
        sx, sy = w0 / iw, h0 / ih
        dets = []
        for b, s, c, m in zip(boxes, scores, cls, masks):
            if s < self.score_thresh:
                continue
            x1, y1, x2, y2 = b[0] * sx, b[1] * sy, b[2] * sx, b[3] * sy
            bw, bh = max(int(round(x2 - x1)), 1), max(int(round(y2 - y1)), 1)
            full = np.zeros((h0, w0), bool)
            patch = cv2.resize(m, (bw, bh)) >= 0.5
            xi, yi = int(round(x1)), int(round(y1))
            xe, ye = min(xi + bw, w0), min(yi + bh, h0)
            xi, yi = max(xi, 0), max(yi, 0)
            full[yi:ye, xi:xe] = patch[:ye - yi, :xe - xi]
            dets.append({"mask": full,
                         "bbox": [float(x1), float(y1),
                                  float(x2 - x1), float(y2 - y1)],
                         "score": float(s),
                         "category_id": int(self.cfg.class_ids[int(c)])})
        return dets


def save_seg2d_checkpoint(path: str, state, cfg: Seg2DConfig):
    import jax

    # atomic: eval-point checkpointing overwrites the only artifact in
    # place; a kill mid-dump must not destroy it (tmp + os.replace)
    with open(path + ".tmp", "wb") as f:
        pickle.dump({"params": jax.device_get(state["params"]),
                     "batch_stats": jax.device_get(state["batch_stats"]),
                     "cfg": cfg}, f)
    os.replace(path + ".tmp", path)

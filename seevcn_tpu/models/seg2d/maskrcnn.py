"""Mask R-CNN in flax with fixed shapes throughout.

Reference behavior target: see/detector2d/generate_masks.py:67-141 (mmdet
HTC inference producing per-image instance masks + boxes + scores that are
serialized to COCO JSON). This is a from-scratch TPU-native design:

  * every stage is statically shaped (anchors, top-k proposal buffers,
    fixed ROI sample counts, fixed NMS output slots) so the whole model —
    training step included — jits once;
  * ROIAlign is a batched bilinear gather over all FPN levels combined with
    a one-hot level-assignment weight (no data-dependent control flow);
  * NMS reuses the greedy fixed-shape suppressor from ops/nms.py with
    axis-aligned IoU.

Two-stage layout (standard Mask R-CNN; Faster R-CNN + mask head):
ResNet-FPN (P2..P6) -> RPN -> proposals -> ROIAlign 7x7 -> box head
-> (train) sampled-ROI losses / (eval) decoded detections -> ROIAlign
14x14 on final boxes -> mask head -> 28x28 instance masks.

``cascade_stages=3`` adds HTC's defining structure — the cascade of box
heads at increasing IoU thresholds 0.5/0.6/0.7 with loss weights
1/0.5/0.25 (the reference's HTC config inherits cascade_rcnn's rcnn list;
mmdet htc/htc_r50_fpn_*.py) — each stage re-labels the previous stage's
refined boxes and inference ensembles the stages' class probabilities on
the final boxes. DCN stages (dcn_stages) cover HTC+DCN's deformable
backbone convs.

The other two HTC components are opt-in flags on Seg2DConfig:

  * ``semantic_branch`` — HTC's fused semantic-segmentation branch: all
    FPN levels are fused at the stride-8 grid, refined by convs, trained
    with a per-pixel cross-entropy at weight 0.2 (targets are the union
    of the instance masks), and the fused feature map is ROI-aligned and
    ADDED to every box/mask head's ROI features (mmdet HTCRoIHead's
    semantic_roi_extractor pattern).
  * ``mask_info_flow`` — per-cascade-stage mask heads where stage ``s``
    receives stage ``s-1``'s pre-upsample mask features through a 1x1
    transfer conv (mmdet HTCMaskHead res_feat chain). Training runs the
    prior heads feature-only on each stage's own ROIs (exactly mmdet's
    _mask_forward_train); inference averages all stages' mask
    probabilities on the final boxes.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...geom.boxes import boxes_iou_normal
from ...ops.nms import _greedy_suppress
from ..modules.common import DeformConv2d
from ..losses import binary_cross_entropy_with_logits, weighted_smooth_l1

# box-delta variance weights (Detectron defaults)
BOX_W = (10.0, 10.0, 5.0, 5.0)


# ---------------------------------------------------------------------------
# backbone
# ---------------------------------------------------------------------------
class BasicBlock(nn.Module):
    channels: int
    stride: int = 1
    dcn: bool = False    # deformable second conv (mmdet's with_dcn pattern)

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.channels, (3, 3), strides=self.stride,
                    use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(y)
        y = nn.relu(y)
        if self.dcn:
            y = DeformConv2d(self.channels, kernel_size=3)(y)
        else:
            y = nn.Conv(self.channels, (3, 3), use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.channels, (1, 1), strides=self.stride,
                               use_bias=False)(residual)
            residual = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9)(residual)
        return nn.relu(y + residual)


class ResNetFPN(nn.Module):
    """ResNet-18-style backbone + FPN. Returns P2..P6 (strides 4..64).

    ``dcn_stages`` marks stages whose blocks use a deformable second conv
    — (False, True, True, True) reproduces the reference HTC backbone's
    dconv_c3-c5 pattern (configs/htc/htc_x101_64x4d_fpn_dconv_c3-c5_*)."""
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    stage_channels: Sequence[int] = (64, 128, 256, 512)
    fpn_channels: int = 256
    dcn_stages: Sequence[bool] = (False, False, False, False)

    @nn.compact
    def __call__(self, images, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=2, use_bias=False, name="stem")(images)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        cs = []
        for i, (n, ch) in enumerate(zip(self.stage_sizes, self.stage_channels)):
            for j in range(n):
                x = BasicBlock(ch, stride=2 if (j == 0 and i > 0) else 1,
                               dcn=bool(self.dcn_stages[i]),
                               name=f"stage{i}_block{j}")(x, train)
            cs.append(x)                       # C2..C5, strides 4,8,16,32

        # top-down pathway
        laterals = [nn.Conv(self.fpn_channels, (1, 1), name=f"lat{i}")(c)
                    for i, c in enumerate(cs)]
        ps = [laterals[-1]]
        for lat in laterals[-2::-1]:
            up = jax.image.resize(ps[0], lat.shape, "nearest")
            ps.insert(0, lat + up)
        ps = [nn.Conv(self.fpn_channels, (3, 3), name=f"post{i}")(p)
              for i, p in enumerate(ps)]      # P2..P5
        p6 = nn.max_pool(ps[-1], (1, 1), strides=(2, 2))
        return ps + [p6]


class RPNHead(nn.Module):
    """Shared-conv RPN head applied to one level."""
    num_anchors: int

    @nn.compact
    def __call__(self, feat):
        x = nn.relu(nn.Conv(feat.shape[-1], (3, 3), name="conv")(feat))
        obj = nn.Conv(self.num_anchors, (1, 1), name="obj")(x)
        box = nn.Conv(self.num_anchors * 4, (1, 1), name="box")(x)
        b, h, w, _ = obj.shape
        return obj.reshape(b, -1), box.reshape(b, h * w * self.num_anchors, 4)


class BoxHead(nn.Module):
    num_classes: int      # foreground classes (background is implicit slot 0)
    hidden: int = 1024

    @nn.compact
    def __call__(self, roi_feats):            # (R, 7, 7, C)
        x = roi_feats.reshape(roi_feats.shape[0], -1)
        x = nn.relu(nn.Dense(self.hidden, name="fc1")(x))
        x = nn.relu(nn.Dense(self.hidden, name="fc2")(x))
        cls = nn.Dense(self.num_classes + 1, name="cls")(x)
        box = nn.Dense(self.num_classes * 4, name="box")(x)
        return cls, box.reshape(-1, self.num_classes, 4)


class MaskHead(nn.Module):
    """Mask head; with ``prev_feat`` it becomes HTC's info-flow head:
    the previous stage's pre-upsample feature enters through a 1x1
    transfer conv (mmdet HTCMaskHead.conv_res) before the conv stack.
    Returns (logits (R, 28, 28, K), pre-upsample feature (R, 14, 14, C))
    so the next stage can chain."""
    num_classes: int
    channels: int = 256
    n_convs: int = 4

    @nn.compact
    def __call__(self, roi_feats, prev_feat=None):   # (R, 14, 14, C)
        x = roi_feats
        if prev_feat is not None:
            x = x + nn.relu(nn.Conv(self.channels, (1, 1),
                                    name="res_conv")(prev_feat))
        for i in range(self.n_convs):
            x = nn.relu(nn.Conv(self.channels, (3, 3), name=f"conv{i}")(x))
        feat = x
        x = nn.relu(nn.ConvTranspose(self.channels, (2, 2), strides=(2, 2),
                                     name="up")(x))
        return nn.Conv(self.num_classes, (1, 1), name="logits")(x), feat


class SemanticHead(nn.Module):
    """HTC's fused semantic branch (mmdet FusedSemanticHead): every FPN
    level is 1x1-projected, resized to the stride-8 (P3) grid and summed;
    a small conv stack refines the fusion; outputs (a) per-pixel class
    logits trained at loss weight 0.2 against the union of instance
    masks, (b) the fused feature map that box/mask heads ROI-fuse."""
    num_classes: int
    channels: int = 256
    n_convs: int = 2

    @nn.compact
    def __call__(self, feats):                # list of (B, H_l, W_l, C)
        tgt = feats[1].shape                  # P3, stride 8
        x = 0.0
        for i, f in enumerate(feats):
            lat = nn.Conv(self.channels, (1, 1), name=f"lat{i}")(f)
            if lat.shape[1:3] != tgt[1:3]:
                lat = jax.image.resize(
                    lat, (lat.shape[0], tgt[1], tgt[2], self.channels),
                    "bilinear")
            x = x + lat
        for i in range(self.n_convs):
            x = nn.relu(nn.Conv(self.channels, (3, 3), name=f"conv{i}")(x))
        logits = nn.Conv(self.num_classes + 1, (1, 1), name="logits")(x)
        return logits, x


# ---------------------------------------------------------------------------
# anchors / box deltas
# ---------------------------------------------------------------------------
def generate_anchors_2d(image_size, strides=(4, 8, 16, 32, 64),
                        scales=(32, 64, 128, 256, 512),
                        ratios=(0.5, 1.0, 2.0)):
    """Per-level anchors (x1, y1, x2, y2) for a static image size. numpy."""
    h, w = image_size
    per_level = []
    for stride, scale in zip(strides, scales):
        fh, fw = -(-h // stride), -(-w // stride)
        ys = (np.arange(fh) + 0.5) * stride
        xs = (np.arange(fw) + 0.5) * stride
        cy, cx = np.meshgrid(ys, xs, indexing="ij")
        anchors = []
        for r in ratios:
            aw, ah = scale * np.sqrt(1.0 / r), scale * np.sqrt(r)
            anchors.append(np.stack([cx - aw / 2, cy - ah / 2,
                                     cx + aw / 2, cy + ah / 2], axis=-1))
        a = np.stack(anchors, axis=2).reshape(-1, 4)   # (fh*fw*A, 4)
        per_level.append(a.astype(np.float32))
    return per_level


def encode_deltas(boxes, anchors):
    """boxes/anchors (..., 4) xyxy -> weighted (dx, dy, dw, dh)."""
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = anchors[..., 0] + aw / 2
    ay = anchors[..., 1] + ah / 2
    bw = jnp.maximum(boxes[..., 2] - boxes[..., 0], 1e-3)
    bh = jnp.maximum(boxes[..., 3] - boxes[..., 1], 1e-3)
    bx = boxes[..., 0] + bw / 2
    by = boxes[..., 1] + bh / 2
    return jnp.stack([BOX_W[0] * (bx - ax) / jnp.maximum(aw, 1e-3),
                      BOX_W[1] * (by - ay) / jnp.maximum(ah, 1e-3),
                      BOX_W[2] * jnp.log(bw / jnp.maximum(aw, 1e-3)),
                      BOX_W[3] * jnp.log(bh / jnp.maximum(ah, 1e-3))], axis=-1)


def decode_deltas(deltas, anchors, image_size):
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = anchors[..., 0] + aw / 2
    ay = anchors[..., 1] + ah / 2
    bx = deltas[..., 0] / BOX_W[0] * aw + ax
    by = deltas[..., 1] / BOX_W[1] * ah + ay
    bw = jnp.exp(jnp.clip(deltas[..., 2] / BOX_W[2], -8, 4)) * aw
    bh = jnp.exp(jnp.clip(deltas[..., 3] / BOX_W[3], -8, 4)) * ah
    h, w = image_size
    return jnp.stack([jnp.clip(bx - bw / 2, 0, w - 1),
                      jnp.clip(by - bh / 2, 0, h - 1),
                      jnp.clip(bx + bw / 2, 0, w - 1),
                      jnp.clip(by + bh / 2, 0, h - 1)], axis=-1)


# ---------------------------------------------------------------------------
# ROIAlign over FPN levels
# ---------------------------------------------------------------------------
def _bilinear(fmap, xy):
    """fmap (H, W, C), xy (..., 2) -> (..., C). Zero outside."""
    h, w = fmap.shape[:2]
    x, y = xy[..., 0], xy[..., 1]
    x0, y0 = jnp.floor(x), jnp.floor(y)
    wx, wy = x - x0, y - y0

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = fmap[jnp.clip(yi, 0, h - 1).astype(jnp.int32),
                 jnp.clip(xi, 0, w - 1).astype(jnp.int32)]
        return jnp.where(inb[..., None], v, 0.0)

    top = tap(x0, y0) * (1 - wx[..., None]) + tap(x0 + 1, y0) * wx[..., None]
    bot = tap(x0, y0 + 1) * (1 - wx[..., None]) + tap(x0 + 1, y0 + 1) * wx[..., None]
    return top * (1 - wy[..., None]) + bot * wy[..., None]


def roi_align(feats, strides, rois, out_size: int):
    """Multi-level ROIAlign.

    feats: list of (H_l, W_l, C) single-image FPN maps (P2..P5).
    rois: (R, 4) xyxy in image pixels.
    Level assignment (FPN paper eq. 1) realized as a one-hot mixture so the
    gather stays statically shaped.
    """
    rw = jnp.maximum(rois[:, 2] - rois[:, 0], 1e-3)
    rh = jnp.maximum(rois[:, 3] - rois[:, 1], 1e-3)
    lvl = jnp.floor(4 + jnp.log2(jnp.sqrt(rw * rh) / 224.0))
    lvl = jnp.clip(lvl, 2, 5).astype(jnp.int32) - 2        # 0..3
    onehot = jax.nn.one_hot(lvl, len(feats))               # (R, L)

    # sampling grid: out_size x out_size cell centers
    steps = (jnp.arange(out_size) + 0.5) / out_size
    gx = rois[:, 0, None] + steps[None, :] * rw[:, None]   # (R, S)
    gy = rois[:, 1, None] + steps[None, :] * rh[:, None]
    grid = jnp.stack(jnp.broadcast_arrays(gx[:, None, :], gy[:, :, None]),
                     axis=-1)                              # (R, S, S, 2)

    out = 0.0
    for li, (fmap, stride) in enumerate(zip(feats, strides)):
        sampled = _bilinear(fmap, grid / stride - 0.5)     # (R, S, S, C)
        out = out + sampled * onehot[:, li, None, None, None]
    return out


def roi_align_single(fmap, stride, rois, out_size: int):
    """Single-level ROIAlign (no FPN level assignment) — used to fuse the
    semantic branch's stride-8 feature map into ROI features."""
    rw = jnp.maximum(rois[:, 2] - rois[:, 0], 1e-3)
    rh = jnp.maximum(rois[:, 3] - rois[:, 1], 1e-3)
    steps = (jnp.arange(out_size) + 0.5) / out_size
    gx = rois[:, 0, None] + steps[None, :] * rw[:, None]
    gy = rois[:, 1, None] + steps[None, :] * rh[:, None]
    grid = jnp.stack(jnp.broadcast_arrays(gx[:, None, :], gy[:, :, None]),
                     axis=-1)                              # (R, S, S, 2)
    return _bilinear(fmap, grid / stride - 0.5)


# ---------------------------------------------------------------------------
# logic (anchors, target assignment, proposals, losses) — host-built statics
# ---------------------------------------------------------------------------
@dataclass
class Seg2DConfig:
    image_size: tuple = (384, 512)            # static (H, W)
    num_classes: int = 1                      # foreground classes
    class_ids: tuple = (3,)                   # COCO category per class (car)
    max_gt: int = 16
    rpn_pos_iou: float = 0.7
    rpn_neg_iou: float = 0.3
    rpn_batch: int = 256
    rpn_fg_fraction: float = 0.5
    pre_nms_topk: int = 1024
    proposal_nms_thresh: float = 0.7
    num_proposals: int = 256
    roi_batch: int = 128
    roi_fg_fraction: float = 0.25
    roi_fg_iou: float = 0.5
    test_score_thresh: float = 0.05
    test_nms_thresh: float = 0.5
    max_detections: int = 64
    strides: tuple = (4, 8, 16, 32, 64)
    # architecture sizes (shrink for tests / scale up for quality)
    stage_sizes: tuple = (2, 2, 2, 2)
    stage_channels: tuple = (64, 128, 256, 512)
    fpn_channels: int = 256
    # dconv_c3-c5 = (False, True, True, True), as in the reference's HTC
    dcn_stages: tuple = (False, False, False, False)
    box_hidden: int = 1024
    mask_channels: int = 256
    mask_convs: int = 4
    # HTC-class cascade (reference runs HTC, whose core is the cascade
    # of box heads at increasing IoU thresholds; mmdet htc_*.py configs
    # use 3 stages at 0.5/0.6/0.7 with loss weights 1/0.5/0.25).
    # cascade_stages=1 keeps the plain Mask R-CNN behavior + checkpoints.
    cascade_stages: int = 1
    cascade_ious: tuple = (0.5, 0.6, 0.7)
    cascade_weights: tuple = (1.0, 0.5, 0.25)
    # HTC's other two components (both opt-in; defaults keep every
    # pre-existing checkpoint loadable):
    semantic_branch: bool = False          # fused stride-8 semantic head
    semantic_convs: int = 2
    semantic_loss_weight: float = 0.2      # mmdet htc semantic loss_seg
    mask_info_flow: bool = False           # per-stage mask heads + res_feat
    extra: dict = field(default_factory=dict)


class MaskRCNNLogic:
    """Static-shape target assignment / proposal / decode helpers."""

    def __init__(self, cfg: Seg2DConfig):
        self.cfg = cfg
        per_level = generate_anchors_2d(cfg.image_size, strides=cfg.strides)
        self.anchors = jnp.asarray(np.concatenate(per_level, axis=0))
        self.num_anchors_per_loc = 3

    # -- RPN ---------------------------------------------------------------
    def rpn_targets(self, gt_boxes, gt_valid, rng):
        """gt_boxes (G, 4), gt_valid (G,) -> per-anchor (labels, deltas, w)."""
        cfg = self.cfg
        iou = boxes_iou_normal(self.anchors, gt_boxes)      # (N, G)
        iou = jnp.where(gt_valid[None, :], iou, -1.0)
        best_gt = jnp.argmax(iou, axis=1)
        best_iou = jnp.max(iou, axis=1)
        pos = best_iou >= cfg.rpn_pos_iou
        # force-match: each gt's best anchor is positive
        gt_best_anchor = jnp.argmax(iou, axis=0)            # (G,)
        force = jnp.zeros(self.anchors.shape[0], bool).at[gt_best_anchor].set(
            gt_valid)
        pos = pos | force
        neg = (best_iou < cfg.rpn_neg_iou) & ~pos

        # subsample to rpn_batch with fg fraction
        n_fg = int(cfg.rpn_batch * cfg.rpn_fg_fraction)
        k1, k2 = jax.random.split(rng)
        fg_key = jnp.where(pos, jax.random.uniform(k1, pos.shape), -1.0)
        _, fg_idx = jax.lax.top_k(fg_key, n_fg)
        fg_sel = jnp.zeros_like(pos).at[fg_idx].set(True) & pos
        bg_key = jnp.where(neg, jax.random.uniform(k2, neg.shape), -1.0)
        _, bg_idx = jax.lax.top_k(bg_key, cfg.rpn_batch - n_fg)
        bg_sel = jnp.zeros_like(neg).at[bg_idx].set(True) & neg

        deltas = encode_deltas(gt_boxes[best_gt], self.anchors)
        labels = fg_sel.astype(jnp.float32)
        weights = (fg_sel | bg_sel).astype(jnp.float32)
        return labels, deltas, weights, fg_sel

    def proposals(self, rpn_obj, rpn_box, rng=None):
        """(N,), (N, 4) -> (num_proposals, 4), (num_proposals,) valid."""
        cfg = self.cfg
        scores, order = jax.lax.top_k(rpn_obj, cfg.pre_nms_topk)
        boxes = decode_deltas(rpn_box[order], self.anchors[order],
                              cfg.image_size)
        iou = boxes_iou_normal(boxes, boxes)
        keep = _greedy_suppress(iou, jnp.isfinite(scores),
                                cfg.proposal_nms_thresh)
        pos = jnp.arange(cfg.pre_nms_topk)
        compact = jnp.argsort(jnp.where(keep, pos, cfg.pre_nms_topk + pos))
        sel = compact[:cfg.num_proposals]
        return boxes[sel], keep[sel], jax.nn.sigmoid(scores[sel])

    # -- ROI sampling --------------------------------------------------------
    def sample_rois(self, proposals, prop_valid, gt_boxes, gt_labels,
                    gt_valid, rng):
        """Sample cfg.roi_batch rois; returns rois + per-roi targets."""
        cfg = self.cfg
        # append gts to the proposal set (standard trick: guarantees fg)
        boxes = jnp.concatenate([proposals, gt_boxes], axis=0)
        valid = jnp.concatenate([prop_valid, gt_valid], axis=0)
        iou = boxes_iou_normal(boxes, gt_boxes)
        iou = jnp.where(gt_valid[None, :], iou, -1.0)
        best_gt = jnp.argmax(iou, axis=1)
        best_iou = jnp.where(valid, jnp.max(iou, axis=1), -1.0)
        fg = best_iou >= cfg.roi_fg_iou
        bg = (best_iou >= 0.0) & ~fg

        n_fg = int(cfg.roi_batch * cfg.roi_fg_fraction)
        k1, k2 = jax.random.split(rng)
        fg_key = jnp.where(fg, jax.random.uniform(k1, fg.shape), -1.0)
        _, fg_idx = jax.lax.top_k(fg_key, n_fg)
        bg_key = jnp.where(bg, jax.random.uniform(k2, bg.shape), -1.0)
        _, bg_idx = jax.lax.top_k(bg_key, cfg.roi_batch - n_fg)
        idx = jnp.concatenate([fg_idx, bg_idx])
        is_fg = jnp.concatenate([fg[fg_idx], jnp.zeros(cfg.roi_batch - n_fg,
                                                       bool)])
        rois = boxes[idx]
        matched = best_gt[idx]
        # class labels: 0 = background, 1..K = foreground classes
        cls = jnp.where(is_fg, gt_labels[matched] + 1, 0)
        deltas = encode_deltas(gt_boxes[matched], rois)
        return rois, cls, deltas, is_fg, matched

    # -- cascade (HTC-class) --------------------------------------------------
    def assign_rois(self, rois, roi_valid, gt_boxes, gt_labels, gt_valid,
                    fg_iou: float):
        """Targets for GIVEN rois at a stage threshold (no re-sampling —
        cascade stages re-label the refined boxes, Cascade R-CNN §3.2)."""
        iou = boxes_iou_normal(rois, gt_boxes)
        iou = jnp.where(gt_valid[None, :], iou, -1.0)
        best_gt = jnp.argmax(iou, axis=1)
        best_iou = jnp.where(roi_valid, jnp.max(iou, axis=1), -1.0)
        is_fg = best_iou >= fg_iou
        cls = jnp.where(is_fg, gt_labels[best_gt] + 1, 0)
        deltas = encode_deltas(gt_boxes[best_gt], rois)
        return cls, deltas, is_fg, best_gt

    def refine_rois(self, rois, cls_logits, box_deltas):
        """Decode each roi with its argmax-foreground-class deltas -> the
        next cascade stage's input boxes (gradient-stopped, like
        proposals)."""
        probs = jax.nn.softmax(cls_logits, axis=-1)[:, 1:]   # (R, K)
        k = jnp.argmax(probs, axis=-1)
        sel = jax.nn.one_hot(k, self.cfg.num_classes)        # (R, K)
        deltas = (box_deltas * sel[..., None]).sum(axis=1)   # (R, 4)
        boxes = decode_deltas(deltas, rois, self.cfg.image_size)
        return jax.lax.stop_gradient(boxes)

    # -- losses ---------------------------------------------------------------
    def rpn_loss(self, rpn_obj, rpn_box, labels, deltas, weights, fg):
        cls = binary_cross_entropy_with_logits(rpn_obj, labels)
        cls = (cls * weights).sum() / jnp.maximum(weights.sum(), 1.0)
        reg = weighted_smooth_l1(rpn_box, deltas, fg.astype(jnp.float32),
                                 beta=1.0 / 9)
        reg = reg.sum() / jnp.maximum(fg.sum(), 1.0)
        return cls + reg, {"rpn_cls": cls, "rpn_reg": reg}

    def box_loss(self, cls_logits, box_deltas, cls_tgt, delta_tgt, is_fg):
        onehot = jax.nn.one_hot(cls_tgt, self.cfg.num_classes + 1)
        ce = -(jax.nn.log_softmax(cls_logits) * onehot).sum(-1)
        cls_loss = ce.mean()
        # class-specific regression of the target class
        sel = jax.nn.one_hot(cls_tgt - 1, self.cfg.num_classes)
        pred = (box_deltas * sel[..., None]).sum(axis=1)
        fg_w = is_fg.astype(jnp.float32)
        reg = weighted_smooth_l1(pred, delta_tgt, fg_w, beta=1.0)
        reg_loss = reg.sum() / jnp.maximum(fg_w.sum(), 1.0)
        return cls_loss + reg_loss, {"box_cls": cls_loss, "box_reg": reg_loss}

    def mask_targets(self, gt_masks, rois, matched, mask_size: int = 28):
        """Crop-resize matched gt masks to each roi. gt_masks (G, H, W)."""
        rw = jnp.maximum(rois[:, 2] - rois[:, 0], 1e-3)
        rh = jnp.maximum(rois[:, 3] - rois[:, 1], 1e-3)
        steps = (jnp.arange(mask_size) + 0.5) / mask_size
        gx = rois[:, 0, None] + steps[None, :] * rw[:, None]
        gy = rois[:, 1, None] + steps[None, :] * rh[:, None]
        grid = jnp.stack(jnp.broadcast_arrays(gx[:, None, :], gy[:, :, None]),
                         axis=-1)                          # (R, S, S, 2)
        m = jax.vmap(lambda g, mk: _bilinear(mk[..., None], g)[..., 0])(
            grid, gt_masks[matched])
        return (m >= 0.5).astype(jnp.float32)

    def mask_loss(self, mask_logits, mask_tgt, cls_tgt, is_fg):
        sel = jax.nn.one_hot(cls_tgt - 1, self.cfg.num_classes)  # (R, K)
        logit = (mask_logits * sel[:, None, None, :]).sum(-1)    # (R, S, S)
        bce = binary_cross_entropy_with_logits(logit, mask_tgt)
        fg_w = is_fg.astype(jnp.float32)[:, None, None]
        loss = (bce * fg_w).sum() / jnp.maximum(
            fg_w.sum() * bce.shape[1] * bce.shape[2], 1.0)
        return loss

    # -- inference decode -------------------------------------------------------
    def decode_detections(self, proposals, prop_valid, cls_logits, box_deltas):
        """Final per-class decode + NMS -> fixed (max_detections,) slots."""
        cfg = self.cfg
        probs = jax.nn.softmax(cls_logits, axis=-1)        # (R, K+1)
        dets_boxes, dets_scores, dets_cls = [], [], []
        for k in range(cfg.num_classes):
            boxes_k = decode_deltas(box_deltas[:, k], proposals,
                                    cfg.image_size)
            score_k = jnp.where(prop_valid, probs[:, k + 1], 0.0)
            iou = boxes_iou_normal(boxes_k, boxes_k)
            order = jnp.argsort(-score_k)
            keep = _greedy_suppress(iou[order][:, order],
                                    score_k[order] > cfg.test_score_thresh,
                                    cfg.test_nms_thresh)
            dets_boxes.append(boxes_k[order])
            dets_scores.append(jnp.where(keep, score_k[order], 0.0))
            dets_cls.append(jnp.full(order.shape, k, jnp.int32))
        boxes = jnp.concatenate(dets_boxes)
        scores = jnp.concatenate(dets_scores)
        cls = jnp.concatenate(dets_cls)
        top, idx = jax.lax.top_k(scores, cfg.max_detections)
        return boxes[idx], top, cls[idx]


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------
class MaskRCNN(nn.Module):
    cfg: Seg2DConfig
    logic: Any                     # MaskRCNNLogic (static, not a pytree)

    @nn.compact
    def __call__(self, images, gt_boxes=None, gt_labels=None, gt_valid=None,
                 gt_masks=None, train: bool = False, rng=None):
        cfg = self.cfg
        logic = self.logic
        feats = ResNetFPN(stage_sizes=cfg.stage_sizes,
                          stage_channels=cfg.stage_channels,
                          fpn_channels=cfg.fpn_channels,
                          dcn_stages=cfg.dcn_stages,
                          name="backbone")(images, train)   # P2..P6
        rpn = RPNHead(logic.num_anchors_per_loc, name="rpn")
        objs, boxes = zip(*[rpn(f) for f in feats])
        rpn_obj = jnp.concatenate(objs, axis=1)             # (B, N)
        rpn_box = jnp.concatenate(boxes, axis=1)            # (B, N, 4)

        b = images.shape[0]
        if rng is None:
            rng = jax.random.PRNGKey(0)
        out = {"rpn_obj": rpn_obj, "rpn_box": rpn_box}

        # stage 0 keeps the name "box_head" so plain Mask R-CNN checkpoints
        # load unchanged; cascade stages (HTC-class, cascade_stages=3)
        # append box_head_s1/box_head_s2
        # getattr: checkpoints pickled before the cascade fields existed
        # restore a Seg2DConfig without them (pickle round-trips __dict__)
        n_stage = max(int(getattr(cfg, "cascade_stages", 1)), 1)
        box_heads = [BoxHead(cfg.num_classes, hidden=cfg.box_hidden,
                             name="box_head" if s == 0 else f"box_head_s{s}")
                     for s in range(n_stage)]
        box_head = box_heads[0]
        # HTC mask info flow: one mask head PER cascade stage, chained
        # through their pre-upsample features; otherwise the single head.
        use_flow = bool(getattr(cfg, "mask_info_flow", False)) and n_stage > 1
        n_mask = n_stage if use_flow else 1
        mask_heads = [MaskHead(cfg.num_classes, channels=cfg.mask_channels,
                               n_convs=cfg.mask_convs,
                               name="mask_head" if s == 0
                               else f"mask_head_s{s}")
                      for s in range(n_mask)]
        mask_head = mask_heads[0]
        p25 = [f for f in feats[:4]]                        # P2..P5 per batch
        strides = cfg.strides[:4]

        # HTC semantic branch: fused stride-8 logits + feature; the
        # feature is ROI-fused (added) into every head's ROI features.
        use_sem = bool(getattr(cfg, "semantic_branch", False))
        if use_sem:
            sem_logits, sem_feat = SemanticHead(
                cfg.num_classes, channels=cfg.fpn_channels,
                n_convs=int(getattr(cfg, "semantic_convs", 2)),
                name="semantic_head")(feats)
            out["semantic_logits"] = sem_logits

        def align(i, rois_i, size):
            """ROIAlign on image i (+ semantic fusion when enabled)."""
            f = roi_align([p[i] for p in p25], strides, rois_i, size)
            if use_sem:
                f = f + roi_align_single(sem_feat[i], 8, rois_i, size)
            return f

        if train:
            rois_l, cls_l, dl, fg_l, match_l = [], [], [], [], []
            for i in range(b):
                ri = jax.random.fold_in(rng, i)
                prop, pvalid, _ = logic.proposals(
                    jax.lax.stop_gradient(rpn_obj[i]),
                    jax.lax.stop_gradient(rpn_box[i]))
                rois, cls, deltas, is_fg, matched = logic.sample_rois(
                    prop, pvalid, gt_boxes[i], gt_labels[i], gt_valid[i], ri)
                rois_l.append(rois); cls_l.append(cls); dl.append(deltas)
                fg_l.append(is_fg); match_l.append(matched)
            rois = jnp.stack(rois_l)
            out.update(rois=rois, roi_cls_tgt=jnp.stack(cls_l),
                       roi_delta_tgt=jnp.stack(dl), roi_fg=jnp.stack(fg_l),
                       roi_matched=jnp.stack(match_l))
            feats7 = jnp.stack([align(i, rois[i], 7) for i in range(b)])
            cls_logits, box_deltas = jax.vmap(box_head)(feats7)
            out.update(cls_logits=cls_logits, box_deltas=box_deltas)
            # cascade stages: refine the previous stage's boxes, re-label
            # at the stage's (higher) IoU threshold, run the stage head
            cur_rois, cur_cls, cur_del = rois, cls_logits, box_deltas
            for s in range(1, n_stage):
                r_l, c_l, d_l, f_l, m_l = [], [], [], [], []
                for i in range(b):
                    ref = logic.refine_rois(cur_rois[i], cur_cls[i],
                                            cur_del[i])
                    cls_t, del_t, fg_t, match_t = logic.assign_rois(
                        ref, jnp.ones(ref.shape[0], bool), gt_boxes[i],
                        gt_labels[i], gt_valid[i],
                        getattr(cfg, "cascade_ious", (0.5, 0.6, 0.7))[s])
                    r_l.append(ref); c_l.append(cls_t)
                    d_l.append(del_t); f_l.append(fg_t); m_l.append(match_t)
                s_rois = jnp.stack(r_l)
                f7 = jnp.stack([align(i, s_rois[i], 7) for i in range(b)])
                s_cls, s_del = jax.vmap(box_heads[s])(f7)
                out[f"cascade_s{s}"] = {
                    "cls_logits": s_cls, "box_deltas": s_del,
                    "cls_tgt": jnp.stack(c_l), "delta_tgt": jnp.stack(d_l),
                    "fg": jnp.stack(f_l), "rois": s_rois,
                    "matched": jnp.stack(m_l)}
                cur_rois, cur_cls, cur_del = s_rois, s_cls, s_del

            def _apply_mask(h, f14, prev):
                if prev is None:
                    return jax.vmap(lambda x: h(x))(f14)
                return jax.vmap(h)(f14, prev)

            # mask heads: stage s trains on stage-s ROIs; with info flow
            # the prior heads run feature-only on the SAME rois first
            # (mmdet HTCRoIHead._mask_forward_train res_feat chain)
            stage_rois = [rois] + [out[f"cascade_s{s}"]["rois"]
                                   for s in range(1, n_mask)]
            for s in range(n_mask):
                f14 = jnp.stack([align(i, stage_rois[s][i], 14)
                                 for i in range(b)])
                last = None
                for j in range(s):
                    last = _apply_mask(mask_heads[j], f14, last)[1]
                logits = _apply_mask(mask_heads[s], f14, last)[0]
                if s == 0:
                    out["mask_logits"] = logits
                else:
                    out[f"cascade_s{s}"]["mask_logits"] = logits
        else:
            det_boxes, det_scores, det_cls, det_masks = [], [], [], []
            for i in range(b):
                prop, pvalid, _ = logic.proposals(rpn_obj[i], rpn_box[i])
                f7 = align(i, prop, 7)
                cls_logits, box_deltas = box_head(f7)
                if n_stage > 1:
                    # cascade inference: refine through the stages, then
                    # score the FINAL boxes with all heads and average the
                    # class probabilities (Cascade R-CNN test ensemble)
                    cur = prop
                    for s in range(1, n_stage):
                        cur = logic.refine_rois(cur, cls_logits, box_deltas)
                        f7 = align(i, cur, 7)
                        cls_logits, box_deltas = box_heads[s](f7)
                    probs = [jax.nn.softmax(cls_logits, axis=-1)]
                    for s in range(n_stage - 1):
                        c_s, _ = box_heads[s](f7)
                        probs.append(jax.nn.softmax(c_s, axis=-1))
                    mean_p = sum(probs) / len(probs)
                    # softmax(log p) == p for a prob vector: reuse the
                    # plain decode with the ensembled scores
                    cls_logits = jnp.log(mean_p + 1e-9)
                    prop = cur
                bx, sc, cl = logic.decode_detections(prop, pvalid,
                                                     cls_logits, box_deltas)
                f14 = align(i, bx, 14)
                # info flow at test time: chain the stage heads on the
                # final boxes, average their mask probabilities (HTC's
                # mask test ensemble)
                sel = jax.nn.one_hot(cl, cfg.num_classes)
                last, mprob = None, []
                for s in range(n_mask):
                    mlog, last = mask_heads[s](f14, last)    # (D, 28, 28, K)
                    mprob.append(jax.nn.sigmoid(
                        (mlog * sel[:, None, None, :]).sum(-1)))
                masks = sum(mprob) / len(mprob)
                det_boxes.append(bx); det_scores.append(sc)
                det_cls.append(cl); det_masks.append(masks)
            out.update(det_boxes=jnp.stack(det_boxes),
                       det_scores=jnp.stack(det_scores),
                       det_cls=jnp.stack(det_cls),
                       det_masks=jnp.stack(det_masks))
        return out

    def loss(self, out, gt_boxes, gt_labels, gt_valid, gt_masks, rng):
        logic, b = self.logic, out["rpn_obj"].shape[0]
        cfg = self.cfg
        total, tb = 0.0, {}
        n_stage = max(int(getattr(cfg, "cascade_stages", 1)), 1)
        c_w = getattr(cfg, "cascade_weights", (1.0, 0.5, 0.25))
        w0 = c_w[0] if n_stage > 1 else 1.0
        use_flow = bool(getattr(cfg, "mask_info_flow", False)) and n_stage > 1
        n_mask = n_stage if use_flow else 1
        for i in range(b):
            labels, deltas, w, fg = logic.rpn_targets(
                gt_boxes[i], gt_valid[i], jax.random.fold_in(rng, 100 + i))
            li, tbi = logic.rpn_loss(out["rpn_obj"][i], out["rpn_box"][i],
                                     labels, deltas, w, fg)
            total = total + li / b
            bi, tbb = logic.box_loss(out["cls_logits"][i],
                                     out["box_deltas"][i],
                                     out["roi_cls_tgt"][i],
                                     out["roi_delta_tgt"][i], out["roi_fg"][i])
            total = total + w0 * bi / b
            # cascade stage losses at their HTC weights (1 / 0.5 / 0.25)
            for s in range(1, n_stage):
                cs = out[f"cascade_s{s}"]
                bs, tbs = logic.box_loss(cs["cls_logits"][i],
                                         cs["box_deltas"][i],
                                         cs["cls_tgt"][i],
                                         cs["delta_tgt"][i], cs["fg"][i])
                total = total + c_w[s] * bs / b
                for k, v in tbs.items():
                    tb[f"{k}_s{s}"] = tb.get(f"{k}_s{s}", 0.0) + v / b
            mt = logic.mask_targets(gt_masks[i], out["rois"][i],
                                    out["roi_matched"][i])
            ml = logic.mask_loss(out["mask_logits"][i], mt,
                                 out["roi_cls_tgt"][i], out["roi_fg"][i])
            total = total + (w0 if use_flow else 1.0) * ml / b
            # info-flow stage mask heads train on their own stage's rois
            # at the cascade loss weights (mmdet htc mask_head loss_mask)
            for s in range(1, n_mask):
                cs = out[f"cascade_s{s}"]
                mt_s = logic.mask_targets(gt_masks[i], cs["rois"][i],
                                          cs["matched"][i])
                ml_s = logic.mask_loss(cs["mask_logits"][i], mt_s,
                                       cs["cls_tgt"][i], cs["fg"][i])
                total = total + c_w[s] * ml_s / b
                tb[f"mask_s{s}"] = tb.get(f"mask_s{s}", 0.0) + ml_s / b
            for k, v in {**tbi, **tbb, "mask": ml}.items():
                tb[k] = tb.get(k, 0.0) + v / b
        # semantic branch: per-pixel CE at stride 8 against the union of
        # the instance masks (labels 1..K over background 0), weight 0.2
        if "semantic_logits" in out:
            sem = out["semantic_logits"]               # (B, h8, w8, K+1)
            lab = jnp.where(
                gt_valid[:, :, None, None],
                (gt_masks >= 0.5).astype(jnp.int32)
                * (gt_labels[:, :, None, None] + 1), 0)
            tgt = jnp.max(lab, axis=1).astype(jnp.float32)  # (B, H, W)
            tgt8 = jax.image.resize(
                tgt, (b, sem.shape[1], sem.shape[2]), "nearest")
            onehot = jax.nn.one_hot(tgt8.astype(jnp.int32),
                                    cfg.num_classes + 1)
            ce = -(jax.nn.log_softmax(sem) * onehot).sum(-1).mean()
            w_sem = float(getattr(cfg, "semantic_loss_weight", 0.2))
            total = total + w_sem * ce
            tb["semantic"] = ce
        return total, tb

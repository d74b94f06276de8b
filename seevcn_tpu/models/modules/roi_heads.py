"""ROI heads: proposal layer, BEV grid pooling, SECOND-IoU head.

Reference:
  * RoIHeadTemplate.proposal_layer (roi_head_template.py:45-102): per-frame
    NMS over decoded dense-head boxes -> fixed (B, num_rois) proposals.
  * SECONDHead (second_head.py:10-188): rotated 7x7 bilinear grid pooling
    from the BEV map (affine_grid+grid_sample in torch; here the rotated
    grid is computed in closed form and sampled with a gather-based bilinear
    kernel), shared FC + IoU regression head, BCE loss on roi-gt IoU.
  * ProposalTargetLayer (target_assigner/proposal_target_layer.py): fixed
    128-roi stratified subsample (fg/hard-bg/easy-bg) with raw_roi_iou
    class labels.

Fixed-shape deviations from the reference (documented, not behavioral in
expectation): subsampling uses priority-sort with random keys instead of
index-list concatenation; the zero-fg/zero-bg corner cases fall back to the
closest stratum instead of oversampling loops.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...geom.transforms import limit_period, rotate_points_along_z
from ...ops.iou3d import boxes_iou3d
from ...ops.nms import nms_bev
from ..losses import binary_cross_entropy_with_logits


# --------------------------------------------------------------------------- #
# proposal layer
# --------------------------------------------------------------------------- #

def proposal_layer(batch_cls_preds: jax.Array, batch_box_preds: jax.Array,
                   nms_config) -> dict:
    """(B, A, ncls), (B, A, 7+C) -> rois (B, R, 7+C), roi_scores (B, R),
    roi_labels (B, R) int32 (1-based), roi_mask (B, R).

    No gradients flow through proposals (reference @torch.no_grad,
    roi_head_template.py:45) — without this the NMS's pairwise rotated-IoU
    gets differentiated, exploding the backward graph (~2s/step observed).
    """
    batch_cls_preds = jax.lax.stop_gradient(batch_cls_preds)
    batch_box_preds = jax.lax.stop_gradient(batch_box_preds)
    # reference takes max over raw cls preds (sigmoid applied later)
    roi_score = jnp.max(batch_cls_preds, axis=-1)
    roi_label = jnp.argmax(batch_cls_preds, axis=-1)

    def one(boxes, score, label):
        idx, keep, kscores = nms_bev(
            boxes[:, :7], score,
            thresh=float(nms_config.NMS_THRESH),
            pre_maxsize=int(nms_config.NMS_PRE_MAXSIZE),
            post_maxsize=int(nms_config.NMS_POST_MAXSIZE))
        sel_boxes = jnp.where(keep[:, None], boxes[idx], 0.0)
        sel_scores = jnp.where(keep, score[idx], 0.0)
        sel_labels = jnp.where(keep, label[idx] + 1, 0)
        return sel_boxes, sel_scores, sel_labels.astype(jnp.int32), keep

    rois, roi_scores, roi_labels, roi_mask = jax.vmap(one)(
        batch_box_preds, roi_score, roi_label)
    return {"rois": rois, "roi_scores": roi_scores, "roi_labels": roi_labels,
            "roi_mask": roi_mask}


# --------------------------------------------------------------------------- #
# rotated BEV grid pooling (replaces affine_grid + grid_sample)
# --------------------------------------------------------------------------- #

def bilinear_sample(fmap: jax.Array, xy: jax.Array) -> jax.Array:
    """fmap (H, W, C), xy (..., 2) pixel coords (x, y) -> (..., C) with
    zero padding outside (torch grid_sample zeros/align_corners=True)."""
    h, w = fmap.shape[:2]
    x, y = xy[..., 0], xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        v = fmap[yi_c, xi_c]
        return jnp.where(inb[..., None], v, 0.0)

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)
    top = v00 * (1 - wx[..., None]) + v01 * wx[..., None]
    bot = v10 * (1 - wx[..., None]) + v11 * wx[..., None]
    return top * (1 - wy[..., None]) + bot * wy[..., None]


def roi_grid_pool_bev(bev: jax.Array, rois: jax.Array, grid_size: int,
                      point_cloud_range, voxel_size, downsample_ratio: int) -> jax.Array:
    """bev (B, H, W, C), rois (B, R, 7) -> (B, R, grid, grid, C).

    7x7 rotated grid per roi, bilinear-sampled — closed-form version of
    second_head.py:63-120 (same align_corners pixel mapping).
    """
    min_x = float(point_cloud_range[0])
    min_y = float(point_cloud_range[1])
    vx = float(voxel_size[0]) * downsample_ratio
    vy = float(voxel_size[1]) * downsample_ratio

    g = grid_size
    u = jnp.linspace(-1.0, 1.0, g)
    pu, pv = jnp.meshgrid(u, u, indexing="xy")  # (g, g): pu varies along cols

    def one_frame(fmap, frois):
        cx = (frois[:, 0] - min_x) / vx - 0.5  # pixel center coords
        cy = (frois[:, 1] - min_y) / vy - 0.5
        hx = frois[:, 3] / vx / 2
        hy = frois[:, 4] / vy / 2
        ca, sa = jnp.cos(frois[:, 6]), jnp.sin(frois[:, 6])
        # (R, g, g) sample coords
        xs = cx[:, None, None] + hx[:, None, None] * (ca[:, None, None] * pu - sa[:, None, None] * pv)
        ys = cy[:, None, None] + hy[:, None, None] * (sa[:, None, None] * pu + ca[:, None, None] * pv)
        return bilinear_sample(fmap, jnp.stack([xs, ys], axis=-1))

    return jax.vmap(one_frame)(bev, rois)


# --------------------------------------------------------------------------- #
# SECOND-IoU head
# --------------------------------------------------------------------------- #

class SECONDHead(nn.Module):
    """IoU-scoring rcnn head (second_head.py). Shared FC stack (Conv1d k=1 ->
    Dense) + IoU regressor; DP_RATIO dropout between shared layers."""
    shared_fc: Sequence[int] = (256, 256)
    iou_fc: Sequence[int] = (256, 256)
    dp_ratio: float = 0.3

    @nn.compact
    def __call__(self, pooled: jax.Array, train: bool = False):
        """pooled (B, R, g, g, C) -> rcnn_iou (B, R)."""
        b, r, g, _, c = pooled.shape
        # flatten in the reference's (C, g, g) channel-major order so the
        # shared_fc weights import 1:1
        x = pooled.transpose(0, 1, 4, 2, 3).reshape(b * r, c * g * g)
        for i, f in enumerate(self.shared_fc):
            x = nn.Dense(f, use_bias=False, name=f"shared_fc{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, name=f"shared_bn{i}")(x)
            x = nn.relu(x)
            if i != len(self.shared_fc) - 1 and self.dp_ratio > 0:
                x = nn.Dropout(self.dp_ratio, deterministic=not train)(x)
        for i, f in enumerate(self.iou_fc):
            x = nn.Dense(f, use_bias=False, name=f"iou_fc{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, name=f"iou_bn{i}")(x)
            x = nn.relu(x)
        x = nn.Dense(1, name="iou_out")(x)
        return x.reshape(b, r)


def get_max_iou_with_same_class(rois, roi_labels, gt_boxes, gt_labels, gt_valid):
    """(R, 7), (R,), (M, 7), (M,), (M,) -> per-roi max IoU vs same-class gt
    (proposal_target_layer.py:197-232)."""
    iou = boxes_iou3d(rois, gt_boxes)
    same = roi_labels[:, None] == gt_labels[None, :]
    iou = jnp.where(same & gt_valid[None, :], iou, 0.0)
    return iou.max(axis=1), iou.argmax(axis=1)


def sample_rois_for_rcnn(rng, rois, roi_labels, roi_scores, roi_mask,
                         gt_boxes, cfg):
    """Stratified fixed-shape subsample -> ROI_PER_IMAGE rois + labels.

    gt_boxes (M, 8) padded. Returns dict with rois (S, 7), rcnn_cls_labels
    (S,), reg_valid_mask (S,), roi_labels, gt_of_rois (S, 8).
    """
    s = int(cfg.ROI_PER_IMAGE)
    fg_per_image = int(np.round(cfg.FG_RATIO * s))
    fg_thresh = min(float(cfg.REG_FG_THRESH), float(cfg.CLS_FG_THRESH))

    gt = gt_boxes[:, :7]
    gt_labels = gt_boxes[:, -1].astype(jnp.int32)
    gt_valid = jnp.abs(gt_boxes).sum(axis=1) > 0

    max_iou, gt_assign = get_max_iou_with_same_class(
        rois[:, :7], roi_labels, gt, gt_labels, gt_valid)
    max_iou = jnp.where(roi_mask, max_iou, -1.0)

    fg = max_iou >= fg_thresh
    easy_bg = roi_mask & (max_iou < float(cfg.CLS_BG_THRESH_LO)) & (max_iou >= 0)
    hard_bg = roi_mask & (max_iou >= float(cfg.CLS_BG_THRESH_LO)) & (max_iou < float(cfg.REG_FG_THRESH))

    n_fg = fg.sum()
    take_fg = jnp.minimum(fg_per_image, n_fg)
    n_hard = hard_bg.sum()
    bg_needed = s - take_fg
    want_hard = jnp.floor(bg_needed * float(cfg.HARD_BG_RATIO)).astype(jnp.int32)
    take_hard = jnp.minimum(want_hard, n_hard)

    r = rois.shape[0]
    u = jax.random.uniform(rng, (r,))
    # rank within stratum via random priority
    def stratum_rank(m):
        key = jnp.where(m, u, 2.0)
        order = jnp.argsort(key)
        rank = jnp.zeros(r, jnp.int32).at[order].set(jnp.arange(r, dtype=jnp.int32))
        return rank

    sel_fg = fg & (stratum_rank(fg) < take_fg)
    sel_hard = hard_bg & (stratum_rank(hard_bg) < take_hard)
    # easy bg fills the remainder (falls back to hard bg if no easy exists)
    remaining = s - take_fg - (sel_hard.sum())
    sel_easy = easy_bg & (stratum_rank(easy_bg) < remaining)
    selected = sel_fg | sel_hard | sel_easy

    # compact: fg first, then bg, then unselected
    prio = jnp.where(sel_fg, 0, jnp.where(sel_hard | sel_easy, 1, 2))
    order = jnp.argsort(prio * 10.0 + u)
    sel_idx = order[:s]
    sel_valid = selected[sel_idx]

    out_rois = rois[sel_idx]
    out_iou = max_iou[sel_idx]
    out_labels = roi_labels[sel_idx]
    out_gt = gt_boxes[gt_assign[sel_idx]]

    reg_valid = (out_iou >= float(cfg.REG_FG_THRESH)) & sel_valid

    score_type = cfg.get("CLS_SCORE_TYPE", "raw_roi_iou")
    if score_type == "cls":
        cls_labels = (out_iou > float(cfg.CLS_FG_THRESH)).astype(jnp.float32)
        ignore = (out_iou > float(cfg.CLS_BG_THRESH)) & (out_iou < float(cfg.CLS_FG_THRESH))
        cls_labels = jnp.where(ignore, -1.0, cls_labels)
    elif score_type == "roi_iou":
        bg_t, fg_t = float(cfg.CLS_BG_THRESH), float(cfg.CLS_FG_THRESH)
        cls_labels = jnp.clip((out_iou - bg_t) / (fg_t - bg_t), 0.0, 1.0)
    else:  # raw_roi_iou
        cls_labels = jnp.clip(out_iou, 0.0, 1.0)
    cls_labels = jnp.where(sel_valid, cls_labels, -1.0)

    return {"rois": out_rois, "roi_labels": out_labels,
            "rcnn_cls_labels": cls_labels, "reg_valid_mask": reg_valid,
            "gt_of_rois": out_gt, "gt_iou_of_rois": out_iou,
            "roi_sample_mask": sel_valid}


def rcnn_iou_loss(rcnn_iou: jax.Array, rcnn_cls_labels: jax.Array,
                  loss_type: str = "BinaryCrossEntropy",
                  weight: float = 1.0) -> jax.Array:
    """second_head.py:163-188."""
    flat_pred = rcnn_iou.reshape(-1)
    flat_lab = rcnn_cls_labels.reshape(-1)
    if loss_type == "BinaryCrossEntropy":
        per = binary_cross_entropy_with_logits(flat_pred, jnp.clip(flat_lab, 0, 1))
    elif loss_type == "L2":
        per = (flat_pred - flat_lab) ** 2
    else:
        raise NotImplementedError(loss_type)
    valid = (flat_lab >= 0).astype(jnp.float32)
    return (per * valid).sum() / jnp.maximum(valid.sum(), 1.0) * weight

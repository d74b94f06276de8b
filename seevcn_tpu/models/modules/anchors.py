"""Anchor generation + axis-aligned target assignment, fixed shapes.

Reference:
  * AnchorGenerator (dense_heads/target_assigner/anchor_generator.py:17-60):
    grid anchors at every feature-map cell, per class sizes/rotations/heights,
    flattened (z, y, x, size, rot) — matching the conv-head channel layout.
  * AxisAlignedTargetAssigner (axis_aligned_target_assigner.py:36-210):
    per-class matched/unmatched IoU thresholds, force-match of each gt's best
    anchor, residual encoding for positives.

The assigner here is one fixed-shape jitted program over padded gt buffers:
padding gt rows (all zeros) produce zero IoU everywhere and are neutralized
by the same ``gt_to_anchor_max == 0 -> -1`` trick the reference uses.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...geom.boxes import boxes3d_nearest_bev_iou
from ...ops.iou3d import boxes_iou3d, boxes_iou_bev
from ...geom.transforms import limit_period
from .box_coder import ResidualCoder


def generate_anchors(anchor_generator_cfg, grid_size, point_cloud_range,
                     anchor_ndim: int = 7):
    """Host-side (numpy): returns (anchors (A, anchor_ndim) float32,
    num_anchors_per_location list). Multi-class anchors are concatenated on
    the per-location 'size' axis, matching the reference cat(dim=-3)."""
    pcr = np.asarray(point_cloud_range, dtype=np.float64)
    per_class = []
    num_per_loc = []
    for cfg in anchor_generator_cfg:
        stride = int(cfg["feature_map_stride"])
        gx, gy = int(grid_size[0]) // stride, int(grid_size[1]) // stride
        sizes = np.asarray(cfg["anchor_sizes"], dtype=np.float64)       # (S, 3)
        rots = np.asarray(cfg["anchor_rotations"], dtype=np.float64)    # (R,)
        heights = np.asarray(cfg["anchor_bottom_heights"], dtype=np.float64)  # (Z,)
        align = bool(cfg.get("align_center", False))
        num_per_loc.append(len(sizes) * len(rots) * len(heights))

        if align:
            xs = (pcr[3] - pcr[0]) / gx
            ys = (pcr[4] - pcr[1]) / gy
            xo, yo = xs / 2, ys / 2
        else:
            xs = (pcr[3] - pcr[0]) / (gx - 1)
            ys = (pcr[4] - pcr[1]) / (gy - 1)
            xo = yo = 0.0
        x_shifts = np.arange(pcr[0] + xo, pcr[3] + 1e-5, xs)
        y_shifts = np.arange(pcr[1] + yo, pcr[4] + 1e-5, ys)

        X, Y, Z = np.meshgrid(x_shifts, y_shifts, heights, indexing="ij")  # (gx, gy, gz)
        cent = np.stack([X, Y, Z], axis=-1)                                 # (gx, gy, gz, 3)
        a = np.broadcast_to(cent[:, :, :, None, None, :],
                            (*cent.shape[:3], len(sizes), len(rots), 3))
        s = np.broadcast_to(sizes[None, None, None, :, None, :], a.shape)
        r = np.broadcast_to(rots[None, None, None, None, :, None],
                            (*a.shape[:-1], 1))
        anchors = np.concatenate([a, s, r], axis=-1)        # (gx, gy, gz, S, R, 7)
        anchors = anchors.transpose(2, 1, 0, 3, 4, 5)       # (gz, gy, gx, S, R, 7)
        anchors[..., 2] += anchors[..., 5] / 2              # bottom -> center z
        per_class.append(anchors)

    cat = np.concatenate(per_class, axis=3)                  # stack classes on size axis
    flat = cat.reshape(-1, 7).astype(np.float32)
    if anchor_ndim != 7:
        flat = np.concatenate(
            [flat, np.zeros((len(flat), anchor_ndim - 7), np.float32)], axis=1)
    return flat, num_per_loc


class AxisAlignedTargetAssigner:
    """Fixed-shape anchor-gt assignment; jit-compiled per (A, M) shape."""

    def __init__(self, anchor_generator_cfg, target_cfg, class_names, box_coder,
                 match_height: bool = False):
        self.box_coder = box_coder
        self.match_height = match_height
        self.class_names = list(class_names)
        self.anchor_class_names = [c["class_name"] for c in anchor_generator_cfg]
        self.matched_thr = {c["class_name"]: float(c["matched_threshold"])
                            for c in anchor_generator_cfg}
        self.unmatched_thr = {c["class_name"]: float(c["unmatched_threshold"])
                              for c in anchor_generator_cfg}
        # class id (1-based in gt last column) for each anchor class
        self.anchor_class_ids = [self.class_names.index(n) + 1
                                 for n in self.anchor_class_names]

    def assign(self, anchors_per_class, gt_boxes):
        """anchors_per_class: list of (Ai, 7) device arrays (one per anchor
        class, flattened in (z,y,x,size,rot) order BEFORE class concat).
        gt_boxes (B, M, 8) [7 box + class_id], zero rows = padding.

        Returns dict of (B, A_total): box_cls_labels; (B, A_total, code):
        box_reg_targets; (B, A_total): reg_weights — with per-location class
        interleaving matching the reference cat(dim=-2)+view layout.
        """
        return _assign_batch(tuple(anchors_per_class), gt_boxes,
                             tuple(self.anchor_class_ids),
                             tuple(self.matched_thr[n] for n in self.anchor_class_names),
                             tuple(self.unmatched_thr[n] for n in self.anchor_class_names),
                             self.box_coder, self.match_height)


@partial(jax.jit, static_argnames=("class_ids", "matched", "unmatched", "coder",
                                   "match_height"))
def _assign_batch(anchors_tuple, gt_boxes, class_ids, matched, unmatched, coder,
                  match_height):
    def assign_one(gt):
        gt_cls = gt[:, -1].astype(jnp.int32)
        per = [
            _assign_single(a, gt[:, :7], gt_cls, cid, mt, ut, coder, match_height)
            for a, cid, mt, ut in zip(anchors_tuple, class_ids, matched, unmatched)
        ]
        if len(per) == 1:
            l, t, w = per[0]
            return l.reshape(-1), t.reshape(-1, t.shape[-1]), w.reshape(-1)
        # interleave per-location: each anchors array is (loc, per_loc_i, ...)
        # reference concatenates per class on the per-location axis
        labels = jnp.concatenate([p[0].reshape(p[0].shape[0], -1) for p in per], -1)
        targets = jnp.concatenate(
            [p[1].reshape(p[1].shape[0], -1, p[1].shape[-1]) for p in per], -2)
        weights = jnp.concatenate([p[2].reshape(p[2].shape[0], -1) for p in per], -1)
        return labels.reshape(-1), targets.reshape(-1, targets.shape[-1]), weights.reshape(-1)

    labels, targets, weights = jax.vmap(assign_one)(gt_boxes)
    return {"box_cls_labels": labels, "box_reg_targets": targets,
            "reg_weights": weights}


def _assign_single(anchors, gt, gt_cls, class_id, matched_thr, unmatched_thr,
                   coder, match_height):
    """anchors: (L, P, 7) or (A, 7). Returns labels/targets/weights with the
    leading anchor shape preserved."""
    a_shape = anchors.shape[:-1]
    a = anchors.reshape(-1, anchors.shape[-1])[:, :7]
    num_a = a.shape[0]

    cls_mask = (gt_cls == class_id) & (jnp.abs(gt).sum(axis=1) > 0)
    iou = boxes_iou3d(a, gt, row_chunk=8192) if match_height \
        else boxes3d_nearest_bev_iou(a, gt)
    iou = jnp.where(cls_mask[None, :], iou, 0.0)

    a2g_max = iou.max(axis=1)
    a2g_arg = iou.argmax(axis=1)
    g2a_max = iou.max(axis=0)
    g2a_max = jnp.where(g2a_max == 0, -1.0, g2a_max)

    # force-match: every anchor achieving a gt's best IoU
    force = (iou == g2a_max[None, :]) & cls_mask[None, :]
    force_any = force.any(axis=1)
    force_gt = jnp.argmax(force, axis=1)

    pos = a2g_max >= matched_thr
    neg = a2g_max < unmatched_thr

    labels = jnp.full((num_a,), -1, jnp.int32)
    labels = jnp.where(neg, 0, labels)
    labels = jnp.where(pos, gt_cls[a2g_arg], labels)
    labels = jnp.where(force_any, gt_cls[force_gt], labels)

    assigned_gt = jnp.where(force_any & ~pos, force_gt, a2g_arg)
    fg = labels > 0
    targets = coder.encode(gt[assigned_gt], a)
    targets = jnp.where(fg[:, None], targets, 0.0)
    weights = fg.astype(jnp.float32)
    return (labels.reshape(a_shape), targets.reshape(*a_shape, -1),
            weights.reshape(a_shape))


def get_direction_targets(anchors, reg_targets, dir_offset: float, num_bins: int):
    """(B, A, 7) anchors + residual targets -> (B, A) dir bin ids
    (anchor_head_template.py:146-160)."""
    rot_gt = reg_targets[..., 6] + anchors[..., 6]
    offset_rot = limit_period(rot_gt - dir_offset, 0, 2 * np.pi)
    bins = jnp.floor(offset_rot / (2 * np.pi / num_bins)).astype(jnp.int32)
    return jnp.clip(bins, 0, num_bins - 1)


class ATSSTargetAssigner:
    """Adaptive Training Sample Selection (arXiv:1912.02424); reference
    target_assigner/atss_target_assigner.py:7-142. Same fixed-shape interface
    as AxisAlignedTargetAssigner: per gt, take the TOPK nearest anchors by 3D
    center distance, threshold their IoUs at mean+std, require the anchor
    center inside the gt's BEV rectangle, then give each anchor its best-IoU
    gt (with each gt's global-argmax anchor force-matched)."""

    def __init__(self, topk, box_coder, match_height: bool = False):
        self.topk = int(topk)
        self.box_coder = box_coder
        self.match_height = bool(match_height)

    def assign(self, anchors_per_class, gt_boxes):
        anchors = anchors_per_class[0] if len(anchors_per_class) == 1 else \
            jnp.concatenate([a.reshape(-1, a.shape[-1])
                             for a in anchors_per_class], axis=0)
        return _atss_assign_batch(anchors, gt_boxes, self.topk,
                                  self.box_coder, self.match_height)


@partial(jax.jit, static_argnames=("topk", "coder", "match_height"))
def _atss_assign_batch(anchors, gt_boxes, topk, coder, match_height):
    a = anchors.reshape(-1, anchors.shape[-1])[:, :7]
    num_a = a.shape[0]

    def assign_one(gt_all):
        gt = gt_all[:, :7]
        gt_cls = gt_all[:, -1].astype(jnp.int32)
        valid = jnp.abs(gt_all).sum(axis=1) > 0
        num_gt = gt.shape[0]

        iou = boxes_iou3d(a, gt, row_chunk=8192) if match_height \
            else boxes_iou_bev(a, gt, row_chunk=8192)
        iou = jnp.where(valid[None, :], iou, 0.0)

        dist = jnp.linalg.norm(a[:, None, :3] - gt[None, :, :3], axis=-1)
        # topk NEAREST anchors per gt -> candidate mask (A, M)
        _, topk_idx = jax.lax.top_k(-dist.T, topk)          # (M, K)
        cand = jnp.zeros((num_gt, num_a), bool)
        cand = cand.at[jnp.arange(num_gt)[:, None], topk_idx].set(True).T

        cand_iou = jnp.take_along_axis(iou.T, topk_idx, axis=1)  # (M, K)
        mean = cand_iou.mean(axis=1)
        std = jnp.std(cand_iou, axis=1, ddof=1)             # torch .std()
        thr = mean + std + 1e-6                             # (M,)

        # anchor center inside gt BEV rectangle (reference checks x<->dx,
        # y<->dy in the gt's local frame after the its bugfixed swap)
        local = a[:, None, :3] - gt[None, :, :3]            # (A, M, 3)
        local = _rotate_pairs(local, gt[:, 6])
        inside = (jnp.abs(local[..., 0]) <= gt[None, :, 3] / 2) & \
                 (jnp.abs(local[..., 1]) <= gt[None, :, 4] / 2)

        is_pos = cand & (iou >= thr[None, :]) & inside & valid[None, :]

        neg_inf = jnp.float32(-1e9)
        iou_pos = jnp.where(is_pos, iou, neg_inf)           # (A, M)
        best_gt = jnp.argmax(iou_pos, axis=1)
        best_val = jnp.max(iou_pos, axis=1)

        # force-match each valid gt's argmax-iou anchor
        gt_best_anchor = jnp.argmax(iou, axis=0)            # (M,)
        gt_best_val = jnp.max(iou, axis=0)
        best_gt = best_gt.at[gt_best_anchor].set(
            jnp.where(valid, jnp.arange(num_gt), best_gt[gt_best_anchor]))
        best_val = best_val.at[gt_best_anchor].set(
            jnp.where(valid, gt_best_val, best_val[gt_best_anchor]))

        fg = best_val > neg_inf / 2
        labels = jnp.where(fg, gt_cls[best_gt], 0)
        targets = coder.encode(gt[best_gt], a)
        targets = jnp.where(fg[:, None], targets, 0.0)
        return labels, targets, fg.astype(jnp.float32)

    labels, targets, weights = jax.vmap(assign_one)(gt_boxes)
    return {"box_cls_labels": labels, "box_reg_targets": targets,
            "reg_weights": weights}


def _rotate_pairs(local, angles):
    """(A, M, 3) points rotated by -angles (M,) around z, pairwise."""
    c, s = jnp.cos(-angles), jnp.sin(-angles)               # (M,)
    x = local[..., 0] * c[None, :] - local[..., 1] * s[None, :]
    y = local[..., 0] * s[None, :] + local[..., 1] * c[None, :]
    return jnp.stack([x, y, local[..., 2]], axis=-1)

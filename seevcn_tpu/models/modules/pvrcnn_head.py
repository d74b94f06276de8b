"""PV-RCNN ROI head + keypoint foreground head.

Reference:
  * PointHeadSimple (dense_heads/point_head_simple.py): per-keypoint
    foreground classifier on pre-fusion VSA features; its sigmoid scores
    weight keypoint features during ROI grid pooling.
  * PVRCNNHead (roi_heads/pvrcnn_head.py:10-180): 6^3 grid points per roi,
    SA grouping of keypoints around grid points, shared FC, separate cls/reg
    branches; reg targets are ResidualCoder residuals in the roi-canonical
    frame, + corner-loss regularization (roi_head_template.py:136-232).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...geom.boxes import boxes_to_corners_3d
from ...geom.transforms import rotate_points_along_z
from ..losses import binary_cross_entropy_with_logits, weighted_smooth_l1
from .box_coder import ResidualCoder
from .pfe import SALayer


class PointHeadSimple(nn.Module):
    """Keypoint foreground scorer."""
    cls_fc: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, point_features, train: bool = False):
        b, k, c = point_features.shape
        x = point_features.reshape(b * k, c)
        for i, f in enumerate(self.cls_fc):
            x = nn.Dense(f, use_bias=False, name=f"fc{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, name=f"bn{i}")(x)
            x = nn.relu(x)
        logits = nn.Dense(1, name="cls_out")(x).reshape(b, k)
        return logits


def point_head_loss(logits, keypoints, gt_boxes, gt_mask, extra_width=(0.2, 0.2, 0.2)):
    """Focal-free BCE per reference PointHeadSimple (cls only); targets =
    keypoint inside (enlarged) gt box."""
    from ...geom.boxes import enlarge_box3d, points_in_boxes

    def one(kp, gb, gm):
        big = enlarge_box3d(gb[:, :7], extra_width)
        inside = points_in_boxes(kp, big) & gm[:, None]
        return inside.any(axis=0)

    targets = jax.vmap(one)(keypoints, gt_boxes, gt_mask)
    per = binary_cross_entropy_with_logits(logits, targets.astype(jnp.float32))
    pos = targets.sum()
    return per.sum() / jnp.maximum(pos, 1.0)


def roi_grid_points(rois: jax.Array, grid_size: int) -> jax.Array:
    """(R, 7) rois -> (R, G^3, 3) world-frame grid points (pvrcnn_head
    get_global_grid_points_of_roi): dense grid over the box volume."""
    g = grid_size
    idx = jnp.stack(jnp.meshgrid(jnp.arange(g), jnp.arange(g), jnp.arange(g),
                                 indexing="ij"), axis=-1).reshape(-1, 3)
    local = (idx.astype(jnp.float32) + 0.5) / g - 0.5          # (-0.5, 0.5)
    local = local[None] * rois[:, None, 3:6]                    # (R, G^3, 3)
    world = rotate_points_along_z(local, rois[:, 6]) + rois[:, None, :3]
    return world


class PVRCNNHead(nn.Module):
    roi_cfg: Any

    @nn.compact
    def __call__(self, rois, keypoints, keypoint_features, keypoint_scores,
                 train: bool = False):
        """rois (B, R, 7), keypoints (B, K, 3), keypoint_features (B, K, C),
        keypoint_scores (B, K) sigmoid weights -> (rcnn_cls (B, R),
        rcnn_reg (B, R, 7))."""
        cfg = self.roi_cfg
        g = int(cfg["ROI_GRID_POOL"]["GRID_SIZE"])
        layer = SALayer(tuple(float(r) for r in cfg["ROI_GRID_POOL"]["POOL_RADIUS"]),
                        tuple(int(n) for n in cfg["ROI_GRID_POOL"]["NSAMPLE"]),
                        tuple(tuple(m) for m in cfg["ROI_GRID_POOL"]["MLPS"]),
                        exact_ball_query=bool(cfg["ROI_GRID_POOL"].get(
                            "EXACT_BALL_QUERY", False)),
                        name="roi_grid_pool")
        weighted = keypoint_features * keypoint_scores[..., None]

        grids = jax.vmap(lambda frois: roi_grid_points(frois, g)
                         .reshape(-1, 3))(rois[..., :7])        # (B, R*G^3, 3)
        ones = jnp.ones(keypoints.shape[:2], bool)
        feats = layer(grids, keypoints, weighted, ones, train)
        pooled = feats.reshape(rois.shape[0], rois.shape[1], g ** 3, -1)
        b, r = pooled.shape[:2]
        x = pooled.reshape(b * r, -1)

        for i, f in enumerate(cfg["SHARED_FC"]):
            x = nn.Dense(f, use_bias=False, name=f"shared_fc{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, name=f"shared_bn{i}")(x)
            x = nn.relu(x)
            if i != len(cfg["SHARED_FC"]) - 1 and float(cfg["DP_RATIO"]) > 0:
                x = nn.Dropout(float(cfg["DP_RATIO"]), deterministic=not train)(x)

        def branch(x, fcs, out_dim, name):
            for i, f in enumerate(fcs):
                x = nn.Dense(f, use_bias=False, name=f"{name}_fc{i}")(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                 epsilon=1e-3, name=f"{name}_bn{i}")(x)
                x = nn.relu(x)
            return nn.Dense(out_dim, name=f"{name}_out")(x)

        rcnn_cls = branch(x, cfg["CLS_FC"], 1, "cls").reshape(b, r)
        rcnn_reg = branch(x, cfg["REG_FC"], 7, "reg").reshape(b, r, 7)
        return rcnn_cls, rcnn_reg


def canonical_gt_of_rois(rois, gt_of_rois):
    """gt boxes -> roi-canonical frame (roi_head_template.py:113-133),
    heading wrapped to (-pi/2, pi/2] with opposite-direction flip."""
    roi_ry = rois[..., 6] % (2 * np.pi)
    local = gt_of_rois[..., :7]
    centered = local.at[..., :3].add(-rois[..., :3])
    centered = centered.at[..., 6].add(-roi_ry)
    xyz = rotate_points_along_z(centered[..., None, :3].reshape(-1, 1, 3),
                                -roi_ry.reshape(-1)).reshape(*roi_ry.shape, 3)
    out = centered.at[..., :3].set(xyz)
    heading = out[..., 6] % (2 * np.pi)
    opposite = (heading > np.pi * 0.5) & (heading < np.pi * 1.5)
    heading = jnp.where(opposite, (heading + np.pi) % (2 * np.pi), heading)
    heading = jnp.where(heading > np.pi, heading - 2 * np.pi, heading)
    heading = jnp.clip(heading, -np.pi / 2, np.pi / 2)
    return out.at[..., 6].set(heading)


def pvrcnn_rcnn_loss(rcnn_cls, rcnn_reg, targets, loss_cfg, coder=None):
    """BCE cls on iou labels + canonical smooth-l1 reg + corner loss
    (roi_head_template.py:136-232)."""
    coder = coder or ResidualCoder()
    w = loss_cfg.LOSS_WEIGHTS
    cls_labels = targets["rcnn_cls_labels"]
    valid = (cls_labels >= 0).astype(jnp.float32)
    cls_per = binary_cross_entropy_with_logits(rcnn_cls,
                                               jnp.clip(cls_labels, 0, 1))
    cls_loss = (cls_per * valid).sum() / jnp.maximum(valid.sum(), 1.0)
    cls_loss = cls_loss * float(w["rcnn_cls_weight"])

    rois = targets["rois"]
    gt_canon = canonical_gt_of_rois(rois, targets["gt_of_rois"])
    # anchor = roi at origin with its own dims, heading 0
    anchor = jnp.concatenate([jnp.zeros_like(rois[..., :3]), rois[..., 3:6],
                              jnp.zeros_like(rois[..., 6:7])], axis=-1)
    reg_targets = coder.encode(gt_canon, anchor)
    fg = targets["reg_valid_mask"].astype(jnp.float32)
    reg_per = weighted_smooth_l1(rcnn_reg, reg_targets, fg,
                                 code_weights=w["code_weights"])
    reg_loss = reg_per.sum() / jnp.maximum(fg.sum(), 1.0)
    reg_loss = reg_loss * float(w["rcnn_reg_weight"])

    total = cls_loss + reg_loss
    tb = {"rcnn_loss_cls": cls_loss, "rcnn_loss_reg": reg_loss}

    if loss_cfg.get("CORNER_LOSS_REGULARIZATION", False):
        decoded = decode_rcnn_boxes(rois, rcnn_reg, coder)
        gt_src = targets["gt_of_rois"][..., :7]
        b, r = decoded.shape[:2]
        c_pred = boxes_to_corners_3d(decoded.reshape(-1, 7))
        c_gt = boxes_to_corners_3d(gt_src.reshape(-1, 7))
        gt_flip = gt_src.reshape(-1, 7).at[:, 6].add(np.pi)
        c_gt_f = boxes_to_corners_3d(gt_flip)
        d = jnp.minimum(jnp.linalg.norm(c_pred - c_gt, axis=-1),
                        jnp.linalg.norm(c_pred - c_gt_f, axis=-1)).mean(-1)
        corner = (d.reshape(b, r) * fg).sum() / jnp.maximum(fg.sum(), 1.0)
        corner = corner * float(w["rcnn_corner_weight"])
        tb["rcnn_loss_corner"] = corner
        total = total + corner
    tb["rcnn_loss"] = total
    return total, tb


def decode_rcnn_boxes(rois, rcnn_reg, coder=None):
    """Canonical residuals -> world boxes (roi_head_template
    generate_predicted_boxes)."""
    coder = coder or ResidualCoder()
    anchor = jnp.concatenate([jnp.zeros_like(rois[..., :3]), rois[..., 3:6],
                              jnp.zeros_like(rois[..., 6:7])], axis=-1)
    local = coder.decode(rcnn_reg, anchor)
    roi_ry = rois[..., 6]
    xyz = rotate_points_along_z(local[..., None, :3].reshape(-1, 1, 3),
                                roi_ry.reshape(-1)).reshape(*roi_ry.shape, 3)
    out = local.at[..., :3].set(xyz + rois[..., :3])
    return out.at[..., 6].add(roi_ry)

"""PointRCNN detector.

Reference: detectors/point_rcnn.py + dense_heads/point_head_box.py +
roi_heads/pointrcnn_head.py: PointNet2MSG per-point features ->
PointHeadBox (per-point foreground cls + PointResidualCoder box reg) ->
proposal NMS -> PointRCNNHead (roipoint pooling: canonical in-roi points +
features -> MLP -> cls/reg refinement).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...geom.boxes import enlarge_box3d, points_in_boxes
from ...geom.transforms import rotate_points_along_z
from ..losses import sigmoid_focal_loss, weighted_smooth_l1
from ..modules.pointnet2_backbone import PointNet2MSG, PointResidualCoder
from ..modules.pvrcnn_head import decode_rcnn_boxes, pvrcnn_rcnn_loss
from ..modules.roi_heads import proposal_layer, sample_rois_for_rcnn


class PointHeadBox(nn.Module):
    """Per-point classification + box regression (point_head_box.py)."""
    num_class: int
    cls_fc: tuple = (256, 256)
    reg_fc: tuple = (256, 256)
    code_size: int = 8

    @nn.compact
    def __call__(self, feats, train: bool = False):
        b, n, c = feats.shape
        x = feats.reshape(b * n, c)

        def branch(x, fcs, out_dim, name):
            for i, f in enumerate(fcs):
                x = nn.Dense(f, use_bias=False, name=f"{name}_fc{i}")(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                 epsilon=1e-3, name=f"{name}_bn{i}")(x)
                x = nn.relu(x)
            return nn.Dense(out_dim, name=f"{name}_out")(x)

        cls = branch(x, self.cls_fc, self.num_class, "cls").reshape(b, n, -1)
        reg = branch(x, self.reg_fc, self.code_size, "reg").reshape(b, n, -1)
        return cls, reg


class PointRCNNHead(nn.Module):
    """Refinement over pooled in-roi points (pointrcnn_head.py), with the
    canonical +depth-normalized point features and shared MLP."""
    num_sampled_points: int = 512
    depth_normalizer: float = 70.0
    xyz_up: tuple = (128, 128)
    cls_fc: tuple = (256, 256)
    reg_fc: tuple = (256, 256)

    @nn.compact
    def __call__(self, rois, points, point_feats, points_valid,
                 train: bool = False):
        """rois (B, R, 7), points (B, N, 3), point_feats (B, N, C)."""
        s = self.num_sampled_points

        def pool_one(frois, px, pf, pv):
            def per_roi(roi):
                inside = points_in_boxes(px, roi[None, :7])[0] & pv
                order = jnp.argsort(jnp.where(inside, 0, 1), stable=True)
                cnt = jnp.maximum(inside.sum(), 1)
                idx = order[jnp.arange(s) % jnp.minimum(cnt, px.shape[0])]
                local = rotate_points_along_z(
                    (px[idx] - roi[None, :3])[None], -roi[6:7])[0]
                depth = jnp.linalg.norm(px[idx], axis=1) / self.depth_normalizer - 0.5
                ok = inside.any()
                geo = jnp.concatenate([local, depth[:, None]], axis=1)
                return jnp.where(ok, 1.0, 0.0)[None] * geo, pf[idx], ok

            return jax.vmap(per_roi)(frois)

        geo, pooled_f, ok = jax.vmap(pool_one)(rois[..., :7], points,
                                               point_feats, points_valid)
        b, r = geo.shape[:2]
        # xyz up-projection then concat with semantic features (reference
        # xyz_up_layer + merge_down)
        x = geo.reshape(b * r * s, -1)
        for i, f in enumerate(self.xyz_up):
            x = nn.relu(nn.Dense(f, name=f"xyz_up{i}")(x))
        x = jnp.concatenate([x, pooled_f.reshape(b * r * s, -1)], axis=-1)
        x = nn.relu(nn.Dense(256, name="merge_down")(x))
        x = x.reshape(b * r, s, -1).max(axis=1)      # pool over points

        def branch(x, fcs, out_dim, name):
            for i, f in enumerate(fcs):
                x = nn.relu(nn.Dense(f, name=f"{name}_fc{i}")(x))
            return nn.Dense(out_dim, name=f"{name}_out")(x)

        rcnn_cls = branch(x, self.cls_fc, 1, "cls").reshape(b, r)
        rcnn_reg = branch(x, self.reg_fc, 7, "reg").reshape(b, r, 7)
        return rcnn_cls, rcnn_reg


class PointRCNN(nn.Module):
    cfg: Any  # DetectorConfig (head_logic unused)

    def _coder(self):
        bc = self.cfg.model_cfg.POINT_HEAD.TARGET_CONFIG.get(
            "BOX_CODER_CONFIG", {})
        return PointResidualCoder(use_mean_size=bool(bc.get("use_mean_size", True)),
                                  mean_size=bc.get("mean_size",
                                                   [[3.9, 1.6, 1.56]]))

    @nn.compact
    def __call__(self, points, points_valid, gt_boxes=None, train: bool = False,
                 rng=None):
        cfg = self.cfg
        mcfg = cfg.model_cfg
        bb = mcfg.BACKBONE_3D
        feats = PointNet2MSG(sa_cfg=bb.SA_CONFIG, fp_mlps=tuple(
            tuple(m) for m in bb.FP_MLPS), name="backbone_3d")(
                points, points_valid, train)

        ph = mcfg.POINT_HEAD
        point_cls, point_reg = PointHeadBox(
            num_class=cfg.num_class, cls_fc=tuple(ph.CLS_FC),
            reg_fc=tuple(ph.REG_FC), name="point_head")(feats, train)

        coder = self._coder()
        labels = jnp.argmax(point_cls, axis=-1) + 1
        batch_box_preds = coder.decode(point_reg, points[..., :3], labels)
        batch_cls_preds = point_cls

        out = {"point_cls": point_cls, "point_reg": point_reg,
               "batch_cls_preds": batch_cls_preds,
               "batch_box_preds": batch_box_preds,
               "_points": points, "_points_valid": points_valid}

        rcfg = mcfg.ROI_HEAD
        nms_cfg = rcfg.NMS_CONFIG["TRAIN" if train else "TEST"]
        cls_masked = jnp.where(points_valid[..., None], batch_cls_preds, -1e9)
        props = proposal_layer(cls_masked, batch_box_preds, nms_cfg)
        if train:
            assert gt_boxes is not None and rng is not None
            rngs = jax.random.split(rng, points.shape[0])
            targets = jax.vmap(
                lambda r, ro, rl, rs, rm, gt: sample_rois_for_rcnn(
                    r, ro, rl, rs, rm, gt, rcfg.TARGET_CONFIG)
            )(rngs, props["rois"], props["roi_labels"], props["roi_scores"],
              props["roi_mask"], gt_boxes)
            rois = targets["rois"]
            out["rcnn_targets"] = targets
        else:
            rois = props["rois"]
            out.update({"rois": rois, "roi_scores": props["roi_scores"],
                        "roi_labels": props["roi_labels"],
                        "roi_mask": props["roi_mask"]})

        pp = rcfg.ROI_POINT_POOL
        rcnn_cls, rcnn_reg = PointRCNNHead(
            num_sampled_points=int(pp.NUM_SAMPLED_POINTS),
            depth_normalizer=float(pp.get("DEPTH_NORMALIZER", 70.0)),
            xyz_up=tuple(rcfg.XYZ_UP_LAYER), cls_fc=tuple(rcfg.CLS_FC),
            reg_fc=tuple(rcfg.REG_FC), name="roi_head")(
                rois[..., :7], points[..., :3],
                jax.lax.stop_gradient(feats) if train else feats,
                points_valid, train)
        out["rcnn_cls"] = rcnn_cls
        out["rcnn_reg"] = rcnn_reg
        if not train:
            out["rois"] = decode_rcnn_boxes(rois[..., :7], rcnn_reg)
            out["rcnn_iou"] = rcnn_cls
        return out

    def loss(self, out, gt_boxes):
        points, points_valid = out["_points"], out["_points_valid"]
        cfg = self.cfg
        coder = self._coder()
        gt_mask = jnp.abs(gt_boxes).sum(-1) > 0

        def assign(px, pv, gb, gm):
            big = enlarge_box3d(gb[:, :7], (0.2, 0.2, 0.2))
            inside = points_in_boxes(px, big) & gm[:, None]
            fg = inside.any(axis=0) & pv
            box_id = jnp.argmax(inside, axis=0)
            cls = jnp.where(fg, gb[box_id, 7].astype(jnp.int32), 0)
            return cls, box_id, fg

        cls_t, box_id, fg = jax.vmap(assign)(points[..., :3], points_valid,
                                             gt_boxes, gt_mask)
        one_hot = jax.nn.one_hot(cls_t, cfg.num_class + 1)[..., 1:]
        w = points_valid.astype(jnp.float32)
        w = w / jnp.maximum(fg.sum(-1, keepdims=True), 1.0)
        cls_loss = sigmoid_focal_loss(out["point_cls"], one_hot, w).sum() \
            / points.shape[0]

        gt_of_point = jnp.take_along_axis(gt_boxes, box_id[..., None], axis=1)
        reg_t = coder.encode(gt_of_point[..., :7], points[..., :3],
                             gt_of_point[..., 7].astype(jnp.int32))
        reg_w = fg.astype(jnp.float32) / jnp.maximum(
            fg.sum(-1, keepdims=True), 1.0)
        reg_loss = weighted_smooth_l1(out["point_reg"], reg_t, reg_w).sum() \
            / points.shape[0]

        rcnn_loss, rtb = pvrcnn_rcnn_loss(
            out["rcnn_cls"], out["rcnn_reg"], out["rcnn_targets"],
            cfg.model_cfg.ROI_HEAD.LOSS_CONFIG)
        tb = {"point_loss_cls": cls_loss, "point_loss_box": reg_loss, **rtb}
        total = cls_loss + reg_loss + rcnn_loss
        tb["loss"] = total
        return total, tb

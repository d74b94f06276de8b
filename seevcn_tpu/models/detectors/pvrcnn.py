"""PV-RCNN detector (BASELINE config 4).

Reference topology (pv_rcnn.py:4-36 + pvrcnn.yaml):
  MeanVFE -> VoxelBackBone8x -> HeightCompression -> BaseBEVBackbone ->
  AnchorHeadSingle (RPN) + VoxelSetAbstraction (keypoints) ->
  PointHeadSimple -> PVRCNNHead (grid pooling over keypoints, box refine).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import sparse as SP
from ...ops.voxelize import voxelize_batch
from ..modules.backbone2d import BaseBEVBackbone
from ..modules.backbone3d import (VoxelBackBone8x,
                                  VoxelBackBone8xFocal,
                                  VoxelResBackBone8x)
from ..modules.dense_heads import AnchorHeadSingle
from ..modules.map_to_bev import height_compression_any
from ..modules.pfe import VoxelSetAbstraction
from ..modules.pvrcnn_head import (PVRCNNHead, PointHeadSimple,
                                   decode_rcnn_boxes, point_head_loss,
                                   pvrcnn_rcnn_loss)
from ..modules.roi_heads import proposal_layer, sample_rois_for_rcnn
from .second import DetectorConfig


def _run_backbone_multi_scale(cfg, st, batch_size: int, train: bool):
    """Run the 3D backbone in its configured execution mode and return
    (bb_out, multi_scale_3d as SparseTensors).

    Default mode is 'hybrid' (active-column stage 1 + zfold rest) — the
    fast MXU execution — with the four stage-boundary active sets
    extracted into fixed-capacity SparseTensor views for the coord
    consumers (VSA keypoint SA, ROI grid pooling); BACKBONE_3D.MODE:
    sparse opts back into the rulebook path end-to-end (exact index
    reuse, e.g. for inverse-conv decoders)."""
    mcfg = cfg.model_cfg
    bb_name = mcfg.BACKBONE_3D.NAME
    backbone = {"VoxelBackBone8x": VoxelBackBone8x,
                "VoxelResBackBone8x": VoxelResBackBone8x,
                "VoxelBackBone8xFocal": VoxelBackBone8xFocal}[bb_name]
    kw = {}
    if bb_name in ("VoxelBackBone8x", "VoxelResBackBone8x"):
        kw["mode"] = mcfg.BACKBONE_3D.get("MODE", "hybrid")
        kw["dtype"] = mcfg.BACKBONE_3D.get("DTYPE", "float32")
    bb_out = backbone(input_channels=cfg.num_point_features,
                      name="backbone_3d", **kw)(st, train)
    # Extraction capacity: a strided conv can EXPAND the active set (up
    # to 8 outputs per isolated input voxel at stride-2 k3), so the input
    # voxel count alone can silently drop actives (ADVICE r3). The
    # multiplier is config-plumbed; active counts are surfaced for audit.
    mult = float(mcfg.BACKBONE_3D.get("EXTRACT_CAPACITY_MULT", 1.5))
    capacity = int(round(st.features.shape[0] * mult))
    multi_scale = {
        name: SP.as_sparse(t, batch_size, capacity)
        for name, t in bb_out["multi_scale_3d_features"].items()}
    bb_out["extract_active_counts"] = {
        name: SP.active_count(t)
        for name, t in bb_out["multi_scale_3d_features"].items()}
    bb_out["extract_capacity"] = capacity
    return bb_out, multi_scale


class PVRCNN(nn.Module):
    cfg: Any  # DetectorConfig

    @nn.compact
    def __call__(self, points, points_valid, gt_boxes=None, train: bool = False,
                 rng=None):
        cfg = self.cfg
        mcfg = cfg.model_cfg

        feats, coords, mask = voxelize_batch(
            points, points_valid, point_cloud_range=cfg.point_cloud_range,
            voxel_size=cfg.voxel_size, max_voxels=cfg.max_voxels,
            max_points_per_voxel=cfg.max_points_per_voxel)
        nzyx = (int(cfg.grid_size[2]) + 1, int(cfg.grid_size[1]),
                int(cfg.grid_size[0]))
        st = SP.make_sparse_tensor(feats, coords, mask, nzyx, points.shape[0])
        bb_out, multi_scale = _run_backbone_multi_scale(
            cfg, st, points.shape[0], train)

        bev = height_compression_any(bb_out["encoded_spconv_tensor"])
        b2 = mcfg.BACKBONE_2D
        bev2d = BaseBEVBackbone(
            layer_nums=tuple(b2.LAYER_NUMS), layer_strides=tuple(b2.LAYER_STRIDES),
            num_filters=tuple(b2.NUM_FILTERS),
            upsample_strides=tuple(b2.get("UPSAMPLE_STRIDES", ())),
            num_upsample_filters=tuple(b2.get("NUM_UPSAMPLE_FILTERS", ())),
            name="backbone_2d")(bev, train)

        logic = cfg.head_logic
        head_out = AnchorHeadSingle(
            num_class=cfg.num_class,
            num_anchors_per_location=logic.num_anchors_per_location,
            code_size=logic.box_coder.code_size,
            num_dir_bins=logic.num_dir_bins, name="dense_head")(bev2d)
        batch_cls_preds, batch_box_preds = logic.predict_boxes(head_out)

        # --- VSA keypoints ----------------------------------------------------
        vsa = VoxelSetAbstraction(
            pfe_cfg=mcfg.PFE, point_cloud_range=tuple(cfg.point_cloud_range),
            voxel_size=tuple(cfg.voxel_size), name="pfe")
        vsa_out = vsa(points, points_valid, bev2d,
                      bev_stride=8, multi_scale_3d=multi_scale,
                      train=train)

        ph = mcfg.POINT_HEAD
        src = vsa_out["point_features_before_fusion"] \
            if ph.get("USE_POINT_FEATURES_BEFORE_FUSION") \
            else vsa_out["point_features"]
        point_logits = PointHeadSimple(cls_fc=tuple(ph.CLS_FC),
                                       name="point_head")(src, train)
        keypoint_scores = jax.nn.sigmoid(point_logits)

        out = {"head_out": head_out, "batch_cls_preds": batch_cls_preds,
               "batch_box_preds": batch_box_preds, "point_logits": point_logits,
               "keypoints": vsa_out["keypoints"]}

        rcfg = mcfg.ROI_HEAD
        nms_cfg = rcfg.NMS_CONFIG["TRAIN" if train else "TEST"]
        props = proposal_layer(batch_cls_preds, batch_box_preds, nms_cfg)
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

        kp = jax.lax.stop_gradient(vsa_out["keypoints"]) if train \
            else vsa_out["keypoints"]
        rcnn_cls, rcnn_reg = PVRCNNHead(roi_cfg=rcfg, name="roi_head")(
            rois[..., :7], kp, vsa_out["point_features"], keypoint_scores, train)
        out["rcnn_cls"] = rcnn_cls
        out["rcnn_reg"] = rcnn_reg

        if not train:
            refined = decode_rcnn_boxes(rois[..., :7], rcnn_reg)
            out["batch_box_preds_refined"] = refined
            out["rois"] = refined          # post_processing consumes refined boxes
            out["rcnn_iou"] = rcnn_cls     # cls score drives final NMS
        return out

    def loss(self, out, gt_boxes):
        cfg = self.cfg
        logic = cfg.head_logic
        targets = logic.assign_targets(gt_boxes)
        rpn_loss, tb = logic.loss(out["head_out"], targets)

        gt_mask = jnp.abs(gt_boxes).sum(-1) > 0
        pt_loss = point_head_loss(out["point_logits"], out["keypoints"],
                                  gt_boxes,
                                  gt_mask,
                                  tuple(cfg.model_cfg.POINT_HEAD.TARGET_CONFIG
                                        .get("GT_EXTRA_WIDTH", [0.2, 0.2, 0.2])))
        pt_loss = pt_loss * float(cfg.model_cfg.POINT_HEAD.LOSS_CONFIG
                                  .LOSS_WEIGHTS.get("point_cls_weight", 1.0))
        tb["point_loss_cls"] = pt_loss

        rcnn_loss, rtb = pvrcnn_rcnn_loss(out["rcnn_cls"], out["rcnn_reg"],
                                          out["rcnn_targets"],
                                          cfg.model_cfg.ROI_HEAD.LOSS_CONFIG)
        tb.update(rtb)
        return rpn_loss + pt_loss + rcnn_loss, tb


class PVRCNNPlusPlus(nn.Module):
    """PV-RCNN++ (pv_rcnn_plusplus.py): identical module set, but proposals
    are generated FIRST and keypoints are sampled proposal-centric — only
    points near a roi are FPS candidates. The reference's sectorized-FPS
    becomes masked FPS over the roi-neighborhood point set (same support,
    different tie-breaking order).
    """
    cfg: Any  # DetectorConfig

    @nn.compact
    def __call__(self, points, points_valid, gt_boxes=None, train: bool = False,
                 rng=None):
        from ...geom.boxes import points_in_boxes

        cfg = self.cfg
        mcfg = cfg.model_cfg

        feats, coords, mask = voxelize_batch(
            points, points_valid, point_cloud_range=cfg.point_cloud_range,
            voxel_size=cfg.voxel_size, max_voxels=cfg.max_voxels,
            max_points_per_voxel=cfg.max_points_per_voxel)
        nzyx = (int(cfg.grid_size[2]) + 1, int(cfg.grid_size[1]),
                int(cfg.grid_size[0]))
        st = SP.make_sparse_tensor(feats, coords, mask, nzyx, points.shape[0])
        bb_out, multi_scale = _run_backbone_multi_scale(
            cfg, st, points.shape[0], train)
        bev = height_compression_any(bb_out["encoded_spconv_tensor"])
        b2 = mcfg.BACKBONE_2D
        bev2d = BaseBEVBackbone(
            layer_nums=tuple(b2.LAYER_NUMS), layer_strides=tuple(b2.LAYER_STRIDES),
            num_filters=tuple(b2.NUM_FILTERS),
            upsample_strides=tuple(b2.get("UPSAMPLE_STRIDES", ())),
            num_upsample_filters=tuple(b2.get("NUM_UPSAMPLE_FILTERS", ())),
            name="backbone_2d")(bev, train)
        logic = cfg.head_logic
        head_out = AnchorHeadSingle(
            num_class=cfg.num_class,
            num_anchors_per_location=logic.num_anchors_per_location,
            code_size=logic.box_coder.code_size,
            num_dir_bins=logic.num_dir_bins, name="dense_head")(bev2d)
        batch_cls_preds, batch_box_preds = logic.predict_boxes(head_out)
        out = {"head_out": head_out, "batch_cls_preds": batch_cls_preds,
               "batch_box_preds": batch_box_preds}

        # --- proposals FIRST --------------------------------------------------
        rcfg = mcfg.ROI_HEAD
        nms_cfg = rcfg.NMS_CONFIG["TRAIN" if train else "TEST"]
        props = proposal_layer(batch_cls_preds, batch_box_preds, nms_cfg)
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

        roi_mask = targets["roi_sample_mask"] if train else props["roi_mask"]
        spc = mcfg.PFE.get("SAMPLE_METHOD", "FPS") == "SPC"
        if spc:
            # sectorized proposal-centric sampling runs inside the VSA
            # (sample_points_with_roi + sector_fps, voxel_set_abstraction.py
            # :78-122,206-224); no pre-restriction needed
            kp_valid = points_valid
        else:
            # FPS mode keeps the dilated-roi-box keypoint restriction
            radius = float(mcfg.PFE.get("ROI_NEIGHBOR_RADIUS", 2.4))

            def roi_neighbourhood(pts, v, frois):
                big = frois.at[:, 3:6].add(2 * radius)
                near = points_in_boxes(pts[:, :3], big[:, :7]).any(axis=0)
                return v & near

            kp_valid = jax.vmap(roi_neighbourhood)(points, points_valid,
                                                   rois[..., :7])
            # fall back to all points when no roi survives
            kp_valid = jnp.where(kp_valid.any(axis=1, keepdims=True),
                                 kp_valid, points_valid)

        vsa = VoxelSetAbstraction(
            pfe_cfg=mcfg.PFE, point_cloud_range=tuple(cfg.point_cloud_range),
            voxel_size=tuple(cfg.voxel_size), name="pfe")
        vsa_out = vsa(points, kp_valid, bev2d, bev_stride=8,
                      multi_scale_3d=multi_scale,
                      train=train,
                      rois=rois[..., :7] if spc else None,
                      roi_mask=roi_mask if spc else None)

        ph = mcfg.POINT_HEAD
        src = vsa_out["point_features_before_fusion"] \
            if ph.get("USE_POINT_FEATURES_BEFORE_FUSION") \
            else vsa_out["point_features"]
        point_logits = PointHeadSimple(cls_fc=tuple(ph.CLS_FC),
                                       name="point_head")(src, train)
        keypoint_scores = jax.nn.sigmoid(point_logits)
        out["point_logits"] = point_logits
        out["keypoints"] = vsa_out["keypoints"]

        kp = jax.lax.stop_gradient(vsa_out["keypoints"]) if train \
            else vsa_out["keypoints"]
        rcnn_cls, rcnn_reg = PVRCNNHead(roi_cfg=rcfg, name="roi_head")(
            rois[..., :7], kp, vsa_out["point_features"], keypoint_scores, train)
        out["rcnn_cls"] = rcnn_cls
        out["rcnn_reg"] = rcnn_reg
        if not train:
            out["rois"] = decode_rcnn_boxes(rois[..., :7], rcnn_reg)
            out["rcnn_iou"] = rcnn_cls
        return out

    loss = PVRCNN.loss

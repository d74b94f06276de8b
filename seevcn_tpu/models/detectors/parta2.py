"""Part-A2 detector.

Reference: detectors/PartA2_net.py + dense_heads/point_intra_part_head.py +
roi_heads/partA2_head.py: UNetV2 per-voxel features -> intra-object part
location head (seg + 3 part offsets in [0,1]) + anchor RPN on the encoded
tensor; the ROI head pools part/seg features over each roi's grid.

Deviation (documented): the reference's exact roiaware voxel-in-gridcell
pooling (roiaware_pool3d CUDA) is realized as radius grouping around the
roi grid points (same receptive field at GRID_SIZE-scale resolution).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...geom.boxes import points_in_boxes
from ...geom.transforms import rotate_points_along_z
from ...ops import sparse as SP
from ...ops.voxelize import voxelize_batch
from ..losses import binary_cross_entropy_with_logits
from ..modules.backbone2d import BaseBEVBackbone
from ..modules.dense_heads import AnchorHeadSingle
from ..modules.map_to_bev import height_compression_any

from ..modules.pvrcnn_head import decode_rcnn_boxes, pvrcnn_rcnn_loss
from ..modules.roi_heads import proposal_layer, sample_rois_for_rcnn
from ..modules.unet3d import UNetV2


class PartA2(nn.Module):
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

        bb = UNetV2(input_channels=cfg.num_point_features,
                    mode=mcfg.BACKBONE_3D.get("MODE", "hybrid"),
                    dtype=mcfg.BACKBONE_3D.get("DTYPE", "float32"),
                    name="backbone_3d")(st, train)
        pf: SP.SparseTensor = bb["point_features"]

        # --- intra-part head over stride-1 voxels --------------------------
        seg_logits = nn.Dense(1, name="seg_out")(pf.features)[:, 0]
        part_reg = nn.Dense(3, name="part_out")(pf.features)

        bev = height_compression_any(bb["encoded_spconv_tensor"])
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
               "batch_box_preds": batch_box_preds, "seg_logits": seg_logits,
               "part_reg": part_reg, "_voxel_tensor": pf}

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

        # --- roiaware pooling of [part(3), sigmoid(seg)(1), features] -------
        pcr = jnp.asarray(cfg.point_cloud_range)
        vs = jnp.asarray(cfg.voxel_size)
        centers = jnp.stack([
            (pf.coords[:, 3].astype(jnp.float32) + 0.5) * vs[0] + pcr[0],
            (pf.coords[:, 2].astype(jnp.float32) + 0.5) * vs[1] + pcr[1],
            (pf.coords[:, 1].astype(jnp.float32) + 0.5) * vs[2] + pcr[2],
        ], axis=1)
        pooled_feats = jnp.concatenate(
            [jax.nn.sigmoid(part_reg), jax.nn.sigmoid(seg_logits)[:, None],
             pf.features], axis=1)
        if train:
            pooled_feats = jax.lax.stop_gradient(pooled_feats)
        g = int(rcfg.ROI_GRID_POOL.get("GRID_SIZE", 12)) if "ROI_GRID_POOL" in \
            rcfg else 12
        # exact roiaware pooling (ops/roiaware.py; reference
        # roiaware_pool3d_kernel.cu): part/seg features avg-pooled, point
        # features max-pooled per grid cell — part_a2_head.py's
        # roiaware_pool3d_layer usage.
        from ...ops.roiaware import roiaware_pool3d_batch

        bsz = rois.shape[0]
        frame_masks = pf.mask[None] & (
            pf.coords[None, :, 0] == jnp.arange(bsz)[:, None])
        sup = jnp.broadcast_to(centers, (bsz,) + centers.shape)
        part_seg = pooled_feats[:, :4]
        sem = pooled_feats[:, 4:]
        pooled_part = roiaware_pool3d_batch(
            rois[..., :7], sup, jnp.broadcast_to(part_seg,
                                                 (bsz,) + part_seg.shape),
            frame_masks, grid_size=g, method="avg")
        pooled_sem = roiaware_pool3d_batch(
            rois[..., :7], sup, jnp.broadcast_to(sem, (bsz,) + sem.shape),
            frame_masks, grid_size=g, method="max")
        pooled = jnp.concatenate([pooled_part, pooled_sem], axis=-1)
        b, r = pooled.shape[:2]
        x = pooled.reshape(b * r, -1)

        def branch(x, fcs, name):
            for i, f in enumerate(fcs):
                x = nn.Dense(f, use_bias=False, name=f"{name}_fc{i}")(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                 epsilon=1e-3, name=f"{name}_bn{i}")(x)
                x = nn.relu(x)
            return x

        shared = branch(x, rcfg.SHARED_FC, "shared")
        rcnn_cls = nn.Dense(1, name="cls_out")(
            branch(shared, rcfg.CLS_FC, "cls")).reshape(b, r)
        rcnn_reg = nn.Dense(7, name="reg_out")(
            branch(shared, rcfg.REG_FC, "reg")).reshape(b, r, 7)
        out["rcnn_cls"] = rcnn_cls
        out["rcnn_reg"] = rcnn_reg
        if not train:
            out["rois"] = decode_rcnn_boxes(rois[..., :7], rcnn_reg)
            out["rcnn_iou"] = rcnn_cls
        return out

    def loss(self, out, gt_boxes):
        cfg = self.cfg
        logic = cfg.head_logic
        targets = logic.assign_targets(gt_boxes)
        rpn_loss, tb = logic.loss(out["head_out"], targets)

        # intra-part targets: voxel centers inside gt; part = relative
        # canonical position in [0,1]^3 (point_intra_part_head.py)
        pf: SP.SparseTensor = out["_voxel_tensor"]
        pcr = jnp.asarray(cfg.point_cloud_range)
        vs = jnp.asarray(cfg.voxel_size)
        centers = jnp.stack([
            (pf.coords[:, 3].astype(jnp.float32) + 0.5) * vs[0] + pcr[0],
            (pf.coords[:, 2].astype(jnp.float32) + 0.5) * vs[1] + pcr[1],
            (pf.coords[:, 1].astype(jnp.float32) + 0.5) * vs[2] + pcr[2],
        ], axis=1)

        gt_mask = jnp.abs(gt_boxes).sum(-1) > 0

        def per_voxel(bidx):
            gb = gt_boxes[bidx]
            inside = points_in_boxes(centers, gb[:, :7]) & gt_mask[bidx][:, None]
            inside = inside & (pf.coords[:, 0] == bidx)[None, :]
            fg = inside.any(axis=0)
            box_id = jnp.argmax(inside, axis=0)
            box = gb[box_id, :7]
            local = rotate_points_along_z(
                (centers - box[:, :3])[:, None, :], -box[:, 6])[:, 0]
            part = jnp.clip(local / jnp.maximum(box[:, 3:6], 1e-3) + 0.5, 0, 1)
            return fg, part

        fgs, parts = jax.vmap(per_voxel)(jnp.arange(gt_boxes.shape[0]))
        fg = fgs.any(axis=0) & pf.mask
        part_t = (parts * fgs[..., None]).sum(axis=0)

        seg_loss = binary_cross_entropy_with_logits(
            out["seg_logits"], fg.astype(jnp.float32))
        seg_loss = jnp.where(pf.mask, seg_loss, 0.0).sum() / \
            jnp.maximum(pf.mask.sum(), 1.0)
        part_bce = binary_cross_entropy_with_logits(out["part_reg"], part_t)
        part_loss = (part_bce.sum(-1) * fg).sum() / jnp.maximum(fg.sum(), 1.0)
        tb["seg_loss"] = seg_loss
        tb["part_loss"] = part_loss

        rcnn_loss, rtb = pvrcnn_rcnn_loss(out["rcnn_cls"], out["rcnn_reg"],
                                          out["rcnn_targets"],
                                          cfg.model_cfg.ROI_HEAD.LOSS_CONFIG)
        tb.update(rtb)
        return rpn_loss + seg_loss + part_loss + rcnn_loss, tb

"""Voxel R-CNN detector.

Reference: detectors/voxel_rcnn.py + roi_heads/voxel_rcnn_head.py: SECOND
trunk (sparse backbone + BEV + anchor head) with an ROI head that pools
multi-scale SPARSE voxel features around each roi's 6^3 grid points. The
reference's voxel_query CUDA kernel (pointnet2_stack/src/voxel_query_gpu.cu)
becomes the same masked ball query we use elsewhere, over voxel centers —
the neighbor sets are identical for radius <= query range.
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
from ..modules.pfe import SALayer
from ..modules.pvrcnn_head import (decode_rcnn_boxes, pvrcnn_rcnn_loss)
from ..modules.pvrcnn_head import roi_grid_points
from ..modules.roi_heads import proposal_layer, sample_rois_for_rcnn


class VoxelRCNNHead(nn.Module):
    roi_cfg: Any
    point_cloud_range: tuple
    voxel_size: tuple

    @nn.compact
    def __call__(self, rois, multi_scale_3d, train: bool = False):
        cfg = self.roi_cfg
        pool_cfg = cfg["ROI_GRID_POOL"]
        g = int(pool_cfg["GRID_SIZE"])
        pcr = jnp.asarray(self.point_cloud_range)
        vs = jnp.asarray(self.voxel_size)
        strides = {"x_conv1": 1, "x_conv2": 2, "x_conv3": 4, "x_conv4": 8}

        pooled_all = []
        for name in pool_cfg["FEATURES_SOURCE"]:
            st: SP.SparseTensor = multi_scale_3d[name]
            lc = pool_cfg["POOL_LAYERS"][name]
            ds = float(strides[name])
            centers = jnp.stack([
                (st.coords[:, 3].astype(jnp.float32) + 0.5) * vs[0] * ds + pcr[0],
                (st.coords[:, 2].astype(jnp.float32) + 0.5) * vs[1] * ds + pcr[1],
                (st.coords[:, 1].astype(jnp.float32) + 0.5) * vs[2] * ds + pcr[2],
            ], axis=1)
            feats = st.features
            if pool_cfg.get("PRE_MLP", False):
                c = feats.shape[-1]
                feats = nn.Dense(c, use_bias=False, name=f"pre_{name}")(feats)
                feats = nn.BatchNorm(use_running_average=not train,
                                     momentum=0.99, epsilon=1e-3,
                                     name=f"pre_bn_{name}")(feats)
                feats = nn.relu(feats)
                feats = jnp.where(st.mask[:, None], feats, 0.0)
            layer = SALayer(tuple(float(r) for r in lc["POOL_RADIUS"]),
                            tuple(int(n) for n in lc["NSAMPLE"]),
                            tuple(tuple(m) for m in lc["MLPS"]),
                            name=f"pool_{name}")

            bsz = rois.shape[0]
            grids = jax.vmap(lambda frois: roi_grid_points(frois, g)
                             .reshape(-1, 3))(rois[..., :7])
            frame_masks = st.mask[None] & (
                st.coords[None, :, 0] == jnp.arange(bsz)[:, None])
            sup = jnp.broadcast_to(centers, (bsz,) + centers.shape)
            fts = jnp.broadcast_to(feats, (bsz,) + feats.shape)
            out = layer(grids, sup, fts, frame_masks, train)
            pooled_all.append(out.reshape(bsz, rois.shape[1], g ** 3, -1))

        pooled = jnp.concatenate(pooled_all, axis=-1)      # (B, R, G^3, C)
        b, r = pooled.shape[:2]
        x = pooled.reshape(b * r, -1)

        def branch(x, fcs, name, dropout=False):
            for i, f in enumerate(fcs):
                x = nn.Dense(f, use_bias=False, name=f"{name}_fc{i}")(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                 epsilon=1e-3, name=f"{name}_bn{i}")(x)
                x = nn.relu(x)
                if dropout and i != len(fcs) - 1 and float(cfg["DP_RATIO"]) > 0:
                    x = nn.Dropout(float(cfg["DP_RATIO"]),
                                   deterministic=not train)(x)
            return x

        shared = branch(x, cfg["SHARED_FC"], "shared", dropout=True)
        cls = nn.Dense(1, name="cls_out")(
            branch(shared, cfg["CLS_FC"], "cls")).reshape(b, r)
        reg = nn.Dense(7, name="reg_out")(
            branch(shared, cfg["REG_FC"], "reg")).reshape(b, r, 7)
        return cls, reg


class VoxelRCNN(nn.Module):
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
        from .pvrcnn import _run_backbone_multi_scale
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

        ms = multi_scale
        if train:
            ms = {k: v._replace(features=jax.lax.stop_gradient(v.features))
                  for k, v in ms.items()}
        rcnn_cls, rcnn_reg = VoxelRCNNHead(
            roi_cfg=rcfg, point_cloud_range=tuple(cfg.point_cloud_range),
            voxel_size=tuple(cfg.voxel_size), name="roi_head")(
                rois[..., :7], ms, train)
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
        rcnn_loss, rtb = pvrcnn_rcnn_loss(out["rcnn_cls"], out["rcnn_reg"],
                                          out["rcnn_targets"],
                                          cfg.model_cfg.ROI_HEAD.LOSS_CONFIG)
        tb.update(rtb)
        return rpn_loss + rcnn_loss, tb

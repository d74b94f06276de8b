"""SECOND / SECOND-IoU / PointPillars detectors, assembled from reference
YAML configs.

Reference topology (detector3d_template.py:23-50 + second_net_iou.py):
  MeanVFE -> VoxelBackBone8x -> HeightCompression -> BaseBEVBackbone ->
  AnchorHeadSingle [-> SECONDHead IoU rcnn].

Everything device-side is one linen module over fixed-shape padded buffers:
input is (B, P, 3+C) padded points + validity, voxelization happens INSIDE
the jitted forward (no host voxelizer), and post-processing (NMS) is a
separate jitted function so eval composes forward+post on device.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import sparse as SP
from ...ops.nms import nms_bev
from ...ops.voxelize import grid_size as compute_grid_size
from ...ops.voxelize import voxelize_batch
from ..modules.backbone2d import BaseBEVBackbone
from ..modules.backbone3d import (VoxelBackBone8x,
                                  VoxelBackBone8xFocal,
                                  VoxelResBackBone8x)
from ..modules.dense_heads import (AnchorHeadLogic, AnchorHeadSingle,
                                   build_anchor_head)
from ..modules.map_to_bev import height_compression, pillar_scatter
from ..modules.roi_heads import (SECONDHead, proposal_layer, rcnn_iou_loss,
                                 roi_grid_pool_bev, sample_rois_for_rcnn)
from ..modules.vfe import DynamicPillarVFE
from ...parallel.mesh import constrain_bev


class DetectorConfig:
    """Static (trace-time) detector configuration derived from a reference
    pcdet YAML (MODEL + DATA_CONFIG blocks)."""

    def __init__(self, model_cfg, data_cfg, class_names, max_voxels=None):
        self.model_cfg = model_cfg
        self.class_names = list(class_names)
        self.num_class = len(self.class_names)
        self.point_cloud_range = [float(v) for v in data_cfg.POINT_CLOUD_RANGE]

        vox = [p for p in data_cfg.DATA_PROCESSOR
               if p.NAME in ("transform_points_to_voxels",
                             "transform_points_to_voxels_placeholder")][0]
        self.voxel_size = [float(v) for v in vox.VOXEL_SIZE]
        # placeholder blocks (dynamic-VFE configs) carry no voxel cap
        mv = vox.get("MAX_NUMBER_OF_VOXELS", 60000)
        self.max_voxels = int(max_voxels or (mv["test"] if isinstance(mv, dict) else mv))
        self.max_points_per_voxel = int(vox.get("MAX_POINTS_PER_VOXEL", 5))
        self.grid_size = compute_grid_size(self.point_cloud_range, self.voxel_size)

        feat_cfg = data_cfg.get("POINT_FEATURE_ENCODING", None)
        self.num_point_features = len(feat_cfg.used_feature_list) if feat_cfg else 4

        if model_cfg.DENSE_HEAD.get("NAME", "AnchorHeadSingle") == "CenterHead":
            self.head_logic = None  # center heads carry no anchor machinery
        else:
            self.head_logic = AnchorHeadLogic(
                model_cfg.DENSE_HEAD, self.num_class, self.class_names,
                self.grid_size, self.point_cloud_range)


class SECONDNetIoU(nn.Module):
    """SECOND + IoU rcnn head (the DA flagship, second_net_iou.py)."""
    cfg: Any  # DetectorConfig

    @nn.compact
    def __call__(self, points, points_valid, gt_boxes=None, train: bool = False,
                 rng=None):
        cfg = self.cfg
        mcfg = cfg.model_cfg

        # --- VFE (MeanVFE == voxelizer mean) + sparse backbone -------------
        feats, coords, mask = voxelize_batch(
            points, points_valid, point_cloud_range=cfg.point_cloud_range,
            voxel_size=cfg.voxel_size, max_voxels=cfg.max_voxels,
            max_points_per_voxel=cfg.max_points_per_voxel)
        nzyx = (int(cfg.grid_size[2]) + 1, int(cfg.grid_size[1]), int(cfg.grid_size[0]))
        st = SP.make_sparse_tensor(feats, coords, mask, nzyx, points.shape[0])

        bb_name = mcfg.BACKBONE_3D.NAME
        backbone = {"VoxelBackBone8x": VoxelBackBone8x,
                    "VoxelResBackBone8x": VoxelResBackBone8x,
                    "VoxelBackBone8xFocal": VoxelBackBone8xFocal}[bb_name]
        kw = {}
        if bb_name in ("VoxelBackBone8x", "VoxelResBackBone8x"):
            # dense-masked MXU execution by default (identical math; the
            # rulebook path is ~1.4 s of searchsorted per conv at eval
            # capacity — BACKBONE_3D.MODE: sparse opts back in);
            # DTYPE: bfloat16 halves dense HBM for training at capacity
            kw["mode"] = mcfg.BACKBONE_3D.get("MODE", "zfold")
            kw["dtype"] = mcfg.BACKBONE_3D.get("DTYPE", "float32")
            kw["remat"] = mcfg.BACKBONE_3D.get("REMAT", "layer")
        bb_out = backbone(input_channels=cfg.num_point_features,
                          name="backbone_3d", **kw)(st, train)

        # --- BEV ------------------------------------------------------------
        enc = bb_out["encoded_spconv_tensor"]
        if isinstance(enc, SP.ZFoldTensor):
            bev = SP.zfold_height_compression(enc)
        elif isinstance(enc, SP.DenseTensor):
            bev = SP.dense_height_compression(enc)
        else:
            bev = height_compression(enc)
        bev = constrain_bev(bev)
        b2 = mcfg.BACKBONE_2D
        bev2d = BaseBEVBackbone(
            layer_nums=tuple(b2.LAYER_NUMS), layer_strides=tuple(b2.LAYER_STRIDES),
            num_filters=tuple(b2.NUM_FILTERS),
            upsample_strides=tuple(b2.get("UPSAMPLE_STRIDES", ())),
            num_upsample_filters=tuple(b2.get("NUM_UPSAMPLE_FILTERS", ())),
            dtype=b2.get("DTYPE", None),
            name="backbone_2d")(bev, train)
        bev2d = constrain_bev(bev2d)

        # --- dense head -------------------------------------------------------
        logic = cfg.head_logic
        head_out = build_anchor_head(mcfg.DENSE_HEAD, logic, cfg.num_class,
                                     cfg.class_names,
                                     name="dense_head")(bev2d, train)

        batch_cls_preds, batch_box_preds = logic.predict_boxes(head_out)

        out = {"head_out": head_out,
               "batch_cls_preds": batch_cls_preds,
               "batch_box_preds": batch_box_preds,
               "spatial_features_2d": bev2d}
        if "focal_aux" in bb_out:
            out["focal_aux"] = bb_out["focal_aux"]

        # --- rcnn IoU head ---------------------------------------------------
        rcfg = mcfg.ROI_HEAD
        nms_cfg = rcfg.NMS_CONFIG["TRAIN" if train else "TEST"]
        props = proposal_layer(batch_cls_preds, batch_box_preds, nms_cfg)

        if train:
            assert gt_boxes is not None and rng is not None
            sample_rngs = jax.random.split(rng, points.shape[0])
            targets = jax.vmap(
                lambda r, ro, rl, rs, rm, gt: sample_rois_for_rcnn(
                    r, ro, rl, rs, rm, gt, rcfg.TARGET_CONFIG)
            )(sample_rngs, props["rois"], props["roi_labels"],
              props["roi_scores"], props["roi_mask"], gt_boxes)
            rois = targets["rois"]
            out["rcnn_targets"] = targets
        else:
            rois = props["rois"]
            out["rois"] = rois
            out["roi_scores"] = props["roi_scores"]
            out["roi_labels"] = props["roi_labels"]
            out["roi_mask"] = props["roi_mask"]

        pooled = roi_grid_pool_bev(
            bev2d, rois[..., :7], int(rcfg.ROI_GRID_POOL.GRID_SIZE),
            cfg.point_cloud_range, cfg.voxel_size,
            int(rcfg.ROI_GRID_POOL.DOWNSAMPLE_RATIO))
        # the reference detaches BEV features for the rcnn head
        pooled = jax.lax.stop_gradient(pooled) if train else pooled
        rcnn_iou = SECONDHead(
            shared_fc=tuple(rcfg.SHARED_FC), iou_fc=tuple(rcfg.IOU_FC),
            dp_ratio=float(rcfg.DP_RATIO), name="roi_head")(pooled, train)
        out["rcnn_iou"] = rcnn_iou
        return out

    def loss(self, out, gt_boxes):
        cfg = self.cfg
        logic = cfg.head_logic
        targets = logic.assign_targets(gt_boxes)
        rpn_loss, tb = logic.loss(out["head_out"], targets)
        rcnn = rcnn_iou_loss(
            out["rcnn_iou"], out["rcnn_targets"]["rcnn_cls_labels"],
            loss_type=cfg.model_cfg.ROI_HEAD.LOSS_CONFIG.IOU_LOSS,
            weight=float(cfg.model_cfg.ROI_HEAD.LOSS_CONFIG.LOSS_WEIGHTS["rcnn_iou_weight"]))
        tb["rcnn_loss_iou"] = rcnn
        total = rpn_loss + rcnn
        if "focal_aux" in out:
            fl = focal_importance_loss(out["focal_aux"], gt_boxes,
                                       cfg.point_cloud_range, cfg.voxel_size)
            tb["loss_box_of_pts"] = fl
            total = total + fl
        return total, tb


def focal_importance_loss(focal_aux, gt_boxes, pcr, vs):
    """Box-of-points BCE for FocalSparseConv importances (reference
    focal_sparse_conv.py loss_box_of_pts): a voxel should be important iff
    its center lies inside a gt box."""
    from ...geom.boxes import points_in_boxes

    pcr = jnp.asarray(pcr)
    vs = jnp.asarray(vs)
    total = 0.0
    for aux in focal_aux:
        imp = jnp.clip(aux["importance"], 1e-6, 1 - 1e-6)
        coords = aux["coords"]
        mask = aux["mask"]
        stride = float(aux["stride"])
        centers = jnp.stack([
            (coords[:, 3].astype(jnp.float32) + 0.5) * vs[0] * stride + pcr[0],
            (coords[:, 2].astype(jnp.float32) + 0.5) * vs[1] * stride + pcr[1],
            (coords[:, 1].astype(jnp.float32) + 0.5) * vs[2] * stride + pcr[2],
        ], axis=1)
        target = jnp.zeros(imp.shape[0], bool)
        for b in range(gt_boxes.shape[0]):
            gt_ok = jnp.abs(gt_boxes[b]).sum(axis=1) > 0
            inside = (points_in_boxes(centers, gt_boxes[b, :, :7]) &
                      gt_ok[:, None]).any(axis=0)
            target = jnp.where(coords[:, 0] == b, inside, target)
        t = target.astype(jnp.float32)
        bce = -(t * jnp.log(imp) + (1 - t) * jnp.log(1 - imp))
        w = mask.astype(jnp.float32)
        total = total + (bce * w).sum() / jnp.maximum(w.sum(), 1.0)
    return total / max(len(focal_aux), 1)


class SECONDNet(nn.Module):
    """Plain SECOND (second_net.py:4-34): dense head only."""
    cfg: Any

    @nn.compact
    def __call__(self, points, points_valid, gt_boxes=None, train: bool = False,
                 rng=None):
        cfg = self.cfg
        mcfg = cfg.model_cfg
        feats, coords, mask = voxelize_batch(
            points, points_valid, point_cloud_range=cfg.point_cloud_range,
            voxel_size=cfg.voxel_size, max_voxels=cfg.max_voxels,
            max_points_per_voxel=cfg.max_points_per_voxel)
        nzyx = (int(cfg.grid_size[2]) + 1, int(cfg.grid_size[1]), int(cfg.grid_size[0]))
        st = SP.make_sparse_tensor(feats, coords, mask, nzyx, points.shape[0])
        bb_name = mcfg.BACKBONE_3D.get("NAME", "VoxelBackBone8x")
        backbone = {"VoxelBackBone8x": VoxelBackBone8x,
                    "VoxelResBackBone8x": VoxelResBackBone8x,
                    "VoxelBackBone8xFocal": VoxelBackBone8xFocal}[bb_name]
        kw = {"mode": mcfg.BACKBONE_3D.get("MODE", "zfold"),
              "dtype": mcfg.BACKBONE_3D.get("DTYPE", "float32"),
              "remat": mcfg.BACKBONE_3D.get("REMAT", "layer")} \
            if bb_name in ("VoxelBackBone8x", "VoxelResBackBone8x") else {}
        bb_out = backbone(input_channels=cfg.num_point_features,
                          name="backbone_3d", **kw)(st, train)
        enc = bb_out["encoded_spconv_tensor"]
        if isinstance(enc, SP.ZFoldTensor):
            bev = SP.zfold_height_compression(enc)
        elif isinstance(enc, SP.DenseTensor):
            bev = SP.dense_height_compression(enc)
        else:
            bev = height_compression(enc)
        bev = constrain_bev(bev)
        b2 = mcfg.BACKBONE_2D
        bev2d = BaseBEVBackbone(
            layer_nums=tuple(b2.LAYER_NUMS), layer_strides=tuple(b2.LAYER_STRIDES),
            num_filters=tuple(b2.NUM_FILTERS),
            upsample_strides=tuple(b2.get("UPSAMPLE_STRIDES", ())),
            num_upsample_filters=tuple(b2.get("NUM_UPSAMPLE_FILTERS", ())),
            dtype=b2.get("DTYPE", None),
            name="backbone_2d")(bev, train)
        bev2d = constrain_bev(bev2d)
        logic = cfg.head_logic
        head_out = build_anchor_head(mcfg.DENSE_HEAD, logic, cfg.num_class,
                                     cfg.class_names,
                                     name="dense_head")(bev2d, train)
        batch_cls_preds, batch_box_preds = logic.predict_boxes(head_out)
        out = {"head_out": head_out, "batch_cls_preds": batch_cls_preds,
               "batch_box_preds": batch_box_preds,
               "spatial_features_2d": bev2d}
        if "focal_aux" in bb_out:
            out["focal_aux"] = bb_out["focal_aux"]
        return out

    def loss(self, out, gt_boxes):
        cfg = self.cfg
        logic = cfg.head_logic
        targets = logic.assign_targets(gt_boxes)
        total, tb = logic.loss(out["head_out"], targets)
        if "focal_aux" in out:
            fl = focal_importance_loss(out["focal_aux"], gt_boxes,
                                       cfg.point_cloud_range, cfg.voxel_size)
            tb["loss_box_of_pts"] = fl
            total = total + fl
        return total, tb


class PointPillar(nn.Module):
    """PointPillars (pointpillar.py): dynamic pillar VFE + scatter + 2D."""
    cfg: Any

    @nn.compact
    def __call__(self, points, points_valid, gt_boxes=None, train: bool = False,
                 rng=None):
        cfg = self.cfg
        mcfg = cfg.model_cfg
        from ...ops.voxelize import voxelize

        def per_frame(pts, v):
            return voxelize(pts, v, point_cloud_range=cfg.point_cloud_range,
                            voxel_size=cfg.voxel_size, max_voxels=cfg.max_voxels)

        res = jax.vmap(per_frame)(points, points_valid)
        b, vcap = res.features.shape[:2]

        vfe_cfg = mcfg.VFE
        vfe = DynamicPillarVFE(
            num_filters=tuple(vfe_cfg.get("NUM_FILTERS", [64])),
            voxel_size=tuple(cfg.voxel_size),
            point_cloud_range=tuple(cfg.point_cloud_range),
            use_absolute_xyz=bool(vfe_cfg.get("USE_ABSLOTE_XYZ",
                                              vfe_cfg.get("USE_ABSOLUTE_XYZ", True))),
            with_distance=bool(vfe_cfg.get("WITH_DISTANCE", False)),
            name="vfe")

        def frame_feats(pts, r):
            sorted_pts = pts[r.point_order]
            coords4 = jnp.concatenate(
                [jnp.zeros((vcap, 1), jnp.int32), r.coords], axis=1)
            return vfe(sorted_pts, r.point_voxel_id, r.features[:, :3], coords4,
                       vcap, train)

        pillar_feats = jax.vmap(frame_feats)(points, res)    # (B, V, C)
        bidx = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None], (b, vcap))
        coords = jnp.concatenate([
            bidx[..., None],
            res.coords.reshape(b, vcap, 3)], axis=-1).reshape(b * vcap, 4)
        canvas = pillar_scatter(pillar_feats.reshape(b * vcap, -1), coords,
                                res.mask.reshape(-1), b,
                                (int(cfg.grid_size[0]), int(cfg.grid_size[1])))

        b2 = mcfg.BACKBONE_2D
        bev2d = BaseBEVBackbone(
            layer_nums=tuple(b2.LAYER_NUMS), layer_strides=tuple(b2.LAYER_STRIDES),
            num_filters=tuple(b2.NUM_FILTERS),
            upsample_strides=tuple(b2.get("UPSAMPLE_STRIDES", ())),
            num_upsample_filters=tuple(b2.get("NUM_UPSAMPLE_FILTERS", ())),
            dtype=b2.get("DTYPE", None),
            name="backbone_2d")(canvas, train)
        logic = cfg.head_logic
        head_out = build_anchor_head(mcfg.DENSE_HEAD, logic, cfg.num_class,
                                     cfg.class_names,
                                     name="dense_head")(bev2d, train)
        batch_cls_preds, batch_box_preds = logic.predict_boxes(head_out)
        return {"head_out": head_out, "batch_cls_preds": batch_cls_preds,
                "batch_box_preds": batch_box_preds, "spatial_features_2d": bev2d}

    def loss(self, out, gt_boxes):
        logic = self.cfg.head_logic
        targets = logic.assign_targets(gt_boxes)
        return logic.loss(out["head_out"], targets)


# --------------------------------------------------------------------------- #
# post-processing (detector3d_template.py:178-284 / second_net_iou.py:75-177)
# --------------------------------------------------------------------------- #

def cal_scores_by_npoints(cls_scores, iou_scores, num_points_in_box,
                          cls_thresh: float = 10, iou_thresh: float = 100):
    """Blend cls/iou scores by per-box point count (second_net_iou.py:38-57):
    sparse boxes trust the cls score, dense boxes the IoU score."""
    alpha = jnp.clip((num_points_in_box - cls_thresh) / (iou_thresh - cls_thresh),
                     0.0, 1.0)
    return (1 - alpha) * cls_scores + alpha * iou_scores


def post_processing(out: dict, post_cfg, num_class: int, has_roi_head: bool,
                    points=None, points_valid=None, class_names=None):
    """Config-driven final NMS. Returns per-frame fixed-size dicts:
    pred_boxes (B, N, 7), pred_scores (B, N), pred_labels (B, N), mask.

    ``points``/``points_valid`` are only needed for the num_pts_iou_cls
    scoring mode (second_net_iou.py:132-144); ``class_names`` only for the
    score_by_class mode (second_net_iou.py:59-75,119-122)."""
    nms_cfg = post_cfg.NMS_CONFIG
    score_thresh = post_cfg.get("SCORE_THRESH", 0.1)
    if not isinstance(score_thresh, (list, tuple)):
        score_thresh = float(score_thresh)

    if has_roi_head:
        boxes = out["rois"]
        iou_preds = jax.nn.sigmoid(out["rcnn_iou"])            # (B, R)
        cls_preds = jax.nn.sigmoid(out["roi_scores"])
        labels = out["roi_labels"]
        valid = out["roi_mask"]
        score_type = nms_cfg.get("SCORE_TYPE", "iou")
        if score_type == "score_by_class" and nms_cfg.get("SCORE_BY_CLASS"):
            # second_net_iou.py:59-75,119-122: per-class choice of iou/cls
            # score, keyed by the box's predicted label's class name. The
            # fixed-shape form: build a static per-class selector (0 = iou,
            # 1 = cls), gather it by label, and blend with where().
            assert class_names is not None, \
                "score_by_class needs the detector class_names"
            sbc = nms_cfg.SCORE_BY_CLASS
            sel_table = []
            for name in class_names:
                mode = sbc[name]
                if mode not in ("iou", "cls"):
                    raise NotImplementedError(mode)   # matches the reference
                sel_table.append(1 if mode == "cls" else 0)
            sel_table = jnp.asarray(sel_table, jnp.int32)
            # labels are 1..num_class; clamp padding (label 0) to class 0 —
            # those rows are masked by `valid` downstream anyway
            per_box_sel = sel_table[jnp.clip(labels - 1, 0, len(class_names) - 1)]
            scores = jnp.where(per_box_sel == 1, cls_preds, iou_preds)
        elif score_type in (None, "iou"):
            scores = iou_preds
        elif score_type == "cls":
            scores = cls_preds
        elif score_type == "weighted_iou_cls":
            w = nms_cfg.SCORE_WEIGHTS
            scores = float(w["iou"]) * iou_preds + float(w["cls"]) * cls_preds
        elif score_type == "num_pts_iou_cls":
            assert points is not None, "num_pts_iou_cls needs the frame points"
            from ...geom.boxes import points_in_boxes_count

            npts = jax.vmap(lambda p, v, b: points_in_boxes_count(
                p[:, :3], b[:, :7], v))(points, points_valid, boxes)
            st = nms_cfg.SCORE_THRESH
            scores = cal_scores_by_npoints(cls_preds, iou_preds, npts,
                                           float(st["cls"]), float(st["iou"]))
        else:
            raise NotImplementedError(score_type)
    else:
        cls = jax.nn.sigmoid(out["batch_cls_preds"])           # (B, A, ncls)
        scores = cls.max(axis=-1)
        labels = cls.argmax(axis=-1) + 1
        boxes = out["batch_box_preds"]
        valid = jnp.ones(scores.shape, dtype=bool)

        if nms_cfg.get("MULTI_CLASSES_NMS", False):
            # model_nms_utils.multi_classes_nms: independent NMS per class,
            # keeping up to NMS_POST_MAXSIZE *per class*, then concatenate —
            # the fixed-shape output is (num_class * post,) with pred_mask
            # marking real rows (no global top-k: that would cap total
            # detections and drop recall in multi-class scenes).
            post = int(nms_cfg.NMS_POST_MAXSIZE)
            st_list = score_thresh if isinstance(score_thresh, (list, tuple)) \
                else [score_thresh] * num_class

            def one_mc(bx, cls_scores, vd):
                cand_b, cand_s, cand_l = [], [], []
                for k in range(num_class):
                    idx, keep, _ = nms_bev(
                        bx[:, :7], cls_scores[:, k],
                        thresh=float(nms_cfg.NMS_THRESH),
                        pre_maxsize=int(nms_cfg.NMS_PRE_MAXSIZE),
                        post_maxsize=post,
                        score_thresh=float(st_list[k]), valid_mask=vd)
                    cand_b.append(jnp.where(keep[:, None], bx[idx], 0.0))
                    cand_s.append(jnp.where(keep, cls_scores[idx, k], 0.0))
                    cand_l.append(jnp.full((post,), k + 1, jnp.int32))
                ab = jnp.concatenate(cand_b)
                asym = jnp.concatenate(cand_s)
                al = jnp.concatenate(cand_l)
                # sort by score for a stable, reference-like ordering but
                # keep the full num_class*post rows
                order = jnp.argsort(-asym)
                asym = asym[order]
                return (ab[order], asym,
                        jnp.where(asym > 0, al[order], 0), asym > 0)

            pb, ps, pl, pm = jax.vmap(one_mc)(boxes, cls, valid)
            return {"pred_boxes": pb, "pred_scores": ps,
                    "pred_labels": pl.astype(jnp.int32), "pred_mask": pm}

    def one(bx, sc, lb, vd):
        idx, keep, kscores = nms_bev(
            bx[:, :7], sc, thresh=float(nms_cfg.NMS_THRESH),
            pre_maxsize=int(nms_cfg.NMS_PRE_MAXSIZE),
            post_maxsize=int(nms_cfg.NMS_POST_MAXSIZE),
            score_thresh=score_thresh, valid_mask=vd)
        return (jnp.where(keep[:, None], bx[idx], 0.0),
                jnp.where(keep, sc[idx], 0.0),
                jnp.where(keep, lb[idx], 0), keep)

    pb, ps, pl, pm = jax.vmap(one)(boxes, scores, labels, valid)
    return {"pred_boxes": pb, "pred_scores": ps,
            "pred_labels": pl.astype(jnp.int32), "pred_mask": pm}


DETECTORS = {
    "SECONDNet": SECONDNet,
    "SECONDNetIoU": SECONDNetIoU,
    "PointPillar": PointPillar,
}


def _register_pvrcnn():
    from .centerpoint import CenterPoint
    from .pointrcnn import PointRCNN
    from .pvrcnn import PVRCNN

    from .voxelrcnn import VoxelRCNN

    from .caddn import CaDDN
    from .parta2 import PartA2
    from .pvrcnn import PVRCNNPlusPlus

    DETECTORS["PVRCNN"] = PVRCNN
    DETECTORS["PVRCNNPlusPlus"] = PVRCNNPlusPlus
    DETECTORS["CenterPoint"] = CenterPoint
    DETECTORS["PointRCNN"] = PointRCNN
    DETECTORS["VoxelRCNN"] = VoxelRCNN
    DETECTORS["PartA2Net"] = PartA2
    DETECTORS["PartA2"] = PartA2
    DETECTORS["CaDDN"] = CaDDN


def build_detector(cfg, data_cfg=None, class_names=None, max_voxels=None):
    """cfg: full pcdet YAML Cfg (MODEL/DATA_CONFIG/CLASS_NAMES)."""
    if "PVRCNN" not in DETECTORS:
        _register_pvrcnn()
    model_cfg = cfg.MODEL
    data_cfg = data_cfg or cfg.DATA_CONFIG
    class_names = class_names or cfg.CLASS_NAMES
    dcfg = DetectorConfig(model_cfg, data_cfg, class_names, max_voxels=max_voxels)
    return DETECTORS[model_cfg.NAME](cfg=dcfg), dcfg

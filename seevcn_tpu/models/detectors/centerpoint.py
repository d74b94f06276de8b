"""CenterPoint detector (reference detectors/centerpoint.py + CenterHead)."""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...ops import sparse as SP
from ...ops.voxelize import voxelize_batch
from ..modules.backbone2d import BaseBEVBackbone
from ..modules.backbone3d import VoxelBackBone8x, VoxelResBackBone8x
from ..modules.center_head import (CenterHead, center_head_loss,
                                   decode_center_boxes)
from ..modules.map_to_bev import height_compression


class CenterPoint(nn.Module):
    cfg: Any  # DetectorConfig (head_logic unused)

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
        backbone = {"VoxelBackBone8x": VoxelBackBone8x,
                    "VoxelResBackBone8x": VoxelResBackBone8x}[
                        mcfg.BACKBONE_3D.NAME]
        kw = {"mode": mcfg.BACKBONE_3D.get("MODE", "zfold"),
              "dtype": mcfg.BACKBONE_3D.get("DTYPE", "float32")} \
            if mcfg.BACKBONE_3D.NAME in ("VoxelBackBone8x",
                                         "VoxelResBackBone8x") else {}
        bb_out = backbone(input_channels=cfg.num_point_features,
                          name="backbone_3d", **kw)(st, train)
        enc = bb_out["encoded_spconv_tensor"]
        if isinstance(enc, SP.ZFoldTensor):
            bev = SP.zfold_height_compression(enc)
        elif isinstance(enc, SP.DenseTensor):
            bev = SP.dense_height_compression(enc)
        else:
            bev = height_compression(enc)
        b2 = mcfg.BACKBONE_2D
        bev2d = BaseBEVBackbone(
            layer_nums=tuple(b2.LAYER_NUMS), layer_strides=tuple(b2.LAYER_STRIDES),
            num_filters=tuple(b2.NUM_FILTERS),
            upsample_strides=tuple(b2.get("UPSAMPLE_STRIDES", ())),
            num_upsample_filters=tuple(b2.get("NUM_UPSAMPLE_FILTERS", ())),
            name="backbone_2d")(bev, train)

        head_out = CenterHead(num_class=cfg.num_class, name="dense_head")(
            bev2d, train)
        out = {"head_out": head_out}
        if not train:
            boxes, scores, labels = decode_center_boxes(
                head_out, cfg.point_cloud_range, cfg.voxel_size, stride=8,
                k=int(mcfg.get("POST_PROCESSING", {}).get(
                    "MAX_OBJ_PER_SAMPLE", 500)))
            out["batch_box_preds"] = boxes
            out["batch_cls_preds"] = scores[..., None]
            out["batch_pred_labels"] = labels
        return out

    def loss(self, out, gt_boxes):
        cfg = self.cfg
        gt_mask = jnp.abs(gt_boxes).sum(-1) > 0
        grid_hw = (int(cfg.grid_size[1]) // 8, int(cfg.grid_size[0]) // 8)
        hm_loss, reg_loss = center_head_loss(
            out["head_out"], gt_boxes, gt_mask, grid_hw,
            tuple(cfg.point_cloud_range), tuple(cfg.voxel_size), 8,
            cfg.num_class)
        w = cfg.model_cfg.DENSE_HEAD.get("LOSS_CONFIG", {}).get(
            "LOSS_WEIGHTS", {"cls_weight": 1.0, "loc_weight": 2.0})
        total = hm_loss * float(w.get("cls_weight", 1.0)) \
            + reg_loss * float(w.get("loc_weight", 2.0))
        return total, {"hm_loss": hm_loss, "loc_loss": reg_loss,
                       "rpn_loss": total}

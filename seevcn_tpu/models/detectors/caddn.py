"""CaDDN: camera-only 3D detection (Categorical Depth Distribution Network).

Reference: detectors/caddn.py + backbones_3d/vfe/image_vfe.py and its
image_vfe_modules (ffn/ddn_deeplabv3, f2v frustum_to_voxel) — image features
x predicted categorical depth distribution -> frustum feature volume ->
sampled onto the lidar voxel grid via the calibration -> Conv2DCollapse ->
BEV backbone -> anchor head.

The image backbone is config-selected (FFN.DDN.NAME):
  * ``DDNDeepLabV3`` — native flax DeepLabV3 over ResNet50/101 (modules/ddn.py),
    mirroring ddn_deeplabv3.py: layer1 (stride-4) features, ASPP depth logits
    upsampled to the feature resolution, CHANNEL_REDUCE conv, focal DDN loss
    with fg/bg balancing (ddn_loss.py/balancer.py) when gt 2D boxes are given.
  * default — a compact conv pyramid for fast tests / small configs.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..losses import weighted_cross_entropy
from ..modules.backbone2d import BaseBEVBackbone
from ..modules.common import ConvBlock2d
from ..modules.dense_heads import AnchorHeadSingle


def lid_bin_edges(depth_min: float, depth_max: float, num_bins: int):
    """LID (linear-increasing discretization) bin edges (ddn_loss/
    balancer's discretization; CaDDN paper eq. 2)."""
    i = np.arange(num_bins + 1, dtype=np.float64)
    delta = 2 * (depth_max - depth_min) / (num_bins * (1 + num_bins))
    return depth_min + delta * i * (i + 1) / 2


def depth_to_lid_bin(depth, depth_min, depth_max, num_bins):
    """Continuous depth -> LID bin index (inverse of lid_bin_edges).

    Matches the reference's bin_depths(..., target=True) semantics
    (ffn/ddn_loss transform_utils): any out-of-range depth — BELOW
    depth_min (including the 0s that mark missing pixels in sparse depth
    maps) as well as beyond depth_max — and any non-finite depth maps to
    ``num_bins``, the 'beyond range' class, so the focal loss never
    supervises missing-depth pixels toward the nearest bin."""
    delta = 2 * (depth_max - depth_min) / (num_bins * (1 + num_bins))
    x = jnp.maximum(2 * (depth - depth_min) / delta + 0.25, 0.0)
    idx = jnp.floor(-0.5 + jnp.sqrt(x)).astype(jnp.int32)
    invalid = (~jnp.isfinite(depth)) | (depth < depth_min) | (idx < 0) \
        | (idx >= num_bins)
    return jnp.where(invalid, num_bins, jnp.clip(idx, 0, num_bins))


class ImageBackbone(nn.Module):
    """Compact conv pyramid standing in for DeepLabV3 (stride 4 features)."""
    channels: int = 64

    @nn.compact
    def __call__(self, img, train: bool = False):
        x = ConvBlock2d(self.channels // 2, stride=2, name="c1")(img, train)
        x = ConvBlock2d(self.channels, stride=2, name="c2")(x, train)
        x = ConvBlock2d(self.channels, name="c3")(x, train)
        return x


class CaDDN(nn.Module):
    cfg: Any  # DetectorConfig (head_logic present)

    @nn.compact
    def __call__(self, images, calib_P2, gt_boxes=None, train: bool = False,
                 rng=None, depth_maps=None):
        """images (B, H, W, 3) float, calib_P2 (B, 3, 4): rect projection.

        Input contract differs from the lidar detectors — CaDDN is
        camera-only (the reference's input_dict carries images + calib too).
        """
        cfg = self.cfg
        mcfg = cfg.model_cfg
        vfe_cfg = mcfg.VFE
        disc = vfe_cfg.FFN.DISCRETIZE
        num_bins = int(disc["num_bins"])
        d_min, d_max = float(disc["depth_min"]), float(disc["depth_max"])

        ddn_cfg = vfe_cfg.FFN.get("DDN", {})
        if ddn_cfg.get("NAME") == "DDNDeepLabV3":
            from ..modules.ddn import DDNDeepLabV3

            args = ddn_cfg.get("ARGS", {})
            feat, depth_logits = DDNDeepLabV3(
                num_classes=num_bins + 1,
                backbone_name=ddn_cfg.get("BACKBONE_NAME", "ResNet101"),
                width=int(args.get("width", 64)),
                pretrained_norm=bool(args.get("use_pretrained_norm", True)),
                name="ddn")(images, train)
            cr = vfe_cfg.FFN.get("CHANNEL_REDUCE")
            if cr:
                feat = ConvBlock2d(int(cr["out_channels"]),
                                   kernel=int(cr.get("kernel_size", 1)),
                                   stride=int(cr.get("stride", 1)),
                                   padding=int(cr.get("padding", 0)),
                                   name="channel_reduce")(feat, train)
        else:
            feat = ImageBackbone(name="image_backbone")(images, train)
            depth_logits = nn.Conv(num_bins + 1, (1, 1),
                                   name="depth_head")(feat)
        b, h, w, c = feat.shape
        stride = images.shape[1] // h
        # softmax over all D+1 bins, then drop the "beyond range" slot
        # (depth_ffn.create_frustum_features) — mass can leak out of range
        ddist = jax.nn.softmax(depth_logits, axis=-1)[..., :num_bins]

        # frustum features: outer product (B, h, w, D, C)
        frustum = ddist[..., :, None] * feat[..., None, :]

        # --- frustum -> voxel grid -------------------------------------------
        pcr = jnp.asarray(cfg.point_cloud_range)
        vs = jnp.asarray(cfg.voxel_size)
        nx, ny, nz = (int(g) for g in cfg.grid_size)
        # voxel centers in lidar frame == rect frame here? The reference
        # transforms via full calib (lidar->rect->image); we take the voxel
        # grid in RECT coordinates for the camera-only model, i.e. the
        # point_cloud_range is interpreted in the camera's forward frame
        # (x fwd, y left, z up) mapped to rect via the fixed kitti axes.
        xs = (jnp.arange(nx) + 0.5) * vs[0] + pcr[0]
        ys = (jnp.arange(ny) + 0.5) * vs[1] + pcr[1]
        zs = (jnp.arange(nz) + 0.5) * vs[2] + pcr[2]
        X, Y, Z = jnp.meshgrid(xs, ys, zs, indexing="ij")     # (nx, ny, nz)
        # lidar->rect fixed mapping (x_r = -y_l, y_r = -z_l, z_r = x_l)
        rect = jnp.stack([-Y, -Z, X], axis=-1).reshape(-1, 3)  # (V, 3)

        bins_edges = jnp.asarray(lid_bin_edges(d_min, d_max, num_bins),
                                 jnp.float32)

        def sample_one(fr, P2):
            hom = jnp.concatenate([rect, jnp.ones((rect.shape[0], 1))], axis=1)
            uvw = hom @ P2.T
            depth = uvw[:, 2]
            u = uvw[:, 0] / jnp.maximum(depth, 1e-3) / stride
            v = uvw[:, 1] / jnp.maximum(depth, 1e-3) / stride
            dbin = depth_to_lid_bin(depth, d_min, d_max, num_bins)
            ok = (depth > 0) & (u >= 0) & (u < w) & (v >= 0) & (v < h) & \
                (dbin < num_bins)
            ui = jnp.clip(u.astype(jnp.int32), 0, w - 1)
            vi = jnp.clip(v.astype(jnp.int32), 0, h - 1)
            db = jnp.clip(dbin, 0, num_bins - 1)
            vox = fr[vi, ui, db]                               # (V, C)
            return jnp.where(ok[:, None], vox, 0.0)

        vox = jax.vmap(sample_one)(frustum, calib_P2)          # (B, V, C)
        vox = vox.reshape(b, nx, ny, nz, c)
        # Conv2DCollapse: stack z into channels, 1x1 conv to NUM_BEV_FEATURES
        bev = vox.transpose(0, 2, 1, 4, 3).reshape(b, ny, nx, c * nz)
        bev = ConvBlock2d(int(mcfg.MAP_TO_BEV.NUM_BEV_FEATURES), kernel=1,
                          padding=0, name="collapse")(bev, train)

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
            num_dir_bins=logic.num_dir_bins, name="dense_head")(bev2d, train)
        batch_cls_preds, batch_box_preds = logic.predict_boxes(head_out)
        return {"head_out": head_out, "batch_cls_preds": batch_cls_preds,
                "batch_box_preds": batch_box_preds,
                "depth_logits": depth_logits}

    def loss(self, out, gt_boxes, depth_maps=None, gt_boxes2d=None):
        cfg = self.cfg
        logic = cfg.head_logic
        targets = logic.assign_targets(gt_boxes)
        rpn_loss, tb = logic.loss(out["head_out"], targets)
        if depth_maps is not None:
            ffn_cfg = cfg.model_cfg.VFE.FFN
            disc = ffn_cfg.DISCRETIZE
            num_bins = int(disc["num_bins"])
            dl = out["depth_logits"]
            b, h, w, _ = dl.shape
            # downsample gt depth to the feature stride by striding
            stride = depth_maps.shape[1] // h
            gt_d = depth_maps[:, ::stride, ::stride][:, :h, :w]
            bins = depth_to_lid_bin(gt_d, float(disc["depth_min"]),
                                    float(disc["depth_max"]), num_bins)
            loss_cfg = ffn_cfg.get("LOSS")
            if loss_cfg is not None and loss_cfg.get("NAME") == "DDNLoss":
                from ..modules.ddn import ddn_focal_loss

                args = loss_cfg.get("ARGS", {})
                ddn_loss, ddn_tb = ddn_focal_loss(
                    dl, jnp.clip(bins, 0, num_bins), gt_boxes2d,
                    alpha=float(args.get("alpha", 0.25)),
                    gamma=float(args.get("gamma", 2.0)),
                    fg_weight=float(args.get("fg_weight", 13.0)),
                    bg_weight=float(args.get("bg_weight", 1.0)),
                    downsample_factor=stride,
                    weight=float(args.get("weight", 3.0)))
                tb.update(ddn_tb)
            else:
                valid = (gt_d > 0).astype(jnp.float32)
                one_hot = jax.nn.one_hot(jnp.clip(bins, 0, num_bins),
                                         num_bins + 1)
                ddn = weighted_cross_entropy(dl.reshape(b, -1, num_bins + 1),
                                             one_hot.reshape(b, -1, num_bins + 1),
                                             valid.reshape(b, -1))
                ddn_loss = ddn.sum() / jnp.maximum(valid.sum(), 1.0)
                tb["ddn_loss"] = ddn_loss
            rpn_loss = rpn_loss + ddn_loss
        return rpn_loss, tb

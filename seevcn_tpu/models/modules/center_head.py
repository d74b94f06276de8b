"""CenterPoint head: class heatmaps + dense box regression.

Reference: detector3d/pcdet/models/dense_heads/center_head.py:48-355 —
shared conv -> per-head branches (center offset 2, center_z 1, dim 3,
rot sincos 2, heatmap C), gaussian-splatted heatmap targets with
size-adaptive radius, centernet focal + L1 losses, top-k peak decoding.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class SeparateHead(nn.Module):
    """Per-target conv branches over BEV features (NHWC)."""
    heads: dict  # name -> out_channels
    head_conv: int = 64
    num_conv: int = 2
    init_bias: float = -2.19  # heatmap bias (focal prior)

    @nn.compact
    def __call__(self, x):
        out = {}
        for name, ch in self.heads.items():
            h = x
            for i in range(self.num_conv - 1):
                h = nn.Conv(self.head_conv, (3, 3), padding=1,
                            name=f"{name}_conv{i}")(h)
                h = nn.relu(h)
            bias_init = nn.initializers.constant(self.init_bias) \
                if name == "hm" else nn.initializers.zeros
            out[name] = nn.Conv(ch, (3, 3), padding=1, bias_init=bias_init,
                                name=f"{name}_out")(h)
        return out


class CenterHead(nn.Module):
    num_class: int
    shared_ch: int = 64

    @nn.compact
    def __call__(self, bev, train: bool = False):
        x = nn.Conv(self.shared_ch, (3, 3), padding=1, name="shared_conv")(bev)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, name="shared_bn")(x)
        x = nn.relu(x)
        heads = {"hm": self.num_class, "center": 2, "center_z": 1,
                 "dim": 3, "rot": 2}
        return SeparateHead(heads=heads, name="sep")(x)


# --------------------------------------------------------------------------- #
# targets
# --------------------------------------------------------------------------- #

def gaussian_radius(dx, dy, min_overlap=0.1):
    """CornerNet radius heuristic (centernet_utils.gaussian_radius)."""
    a1 = 1
    b1 = dy + dx
    c1 = dx * dy * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 + jnp.sqrt(jnp.maximum(b1 ** 2 - 4 * a1 * c1, 0))) / 2
    a2 = 4
    b2 = 2 * (dx + dy)
    c2 = (1 - min_overlap) * dx * dy
    r2 = (b2 + jnp.sqrt(jnp.maximum(b2 ** 2 - 4 * a2 * c2, 0))) / 2
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (dx + dy)
    c3 = (min_overlap - 1) * dx * dy
    r3 = (b3 + jnp.sqrt(jnp.maximum(b3 ** 2 - 4 * a3 * c3, 0))) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def make_center_targets(gt_boxes, gt_mask, grid_hw, point_cloud_range,
                        voxel_size, stride: int, num_class: int,
                        min_radius: float = 2.0):
    """(M, 8) padded gt -> heatmap (H, W, C), reg targets (M, 8), center
    pixel indices (M, 2), validity (M,). Gaussian splat via a full coordinate
    grid (fixed shapes; M is small)."""
    h, w = grid_hw
    pcr = jnp.asarray(point_cloud_range)
    vs = jnp.asarray(voxel_size)
    fx = (gt_boxes[:, 0] - pcr[0]) / (vs[0] * stride)
    fy = (gt_boxes[:, 1] - pcr[1]) / (vs[1] * stride)
    xi = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, h - 1)
    inb = gt_mask & (fx >= 0) & (fx < w) & (fy >= 0) & (fy < h)

    dxp = gt_boxes[:, 3] / (vs[0] * stride)
    dyp = gt_boxes[:, 4] / (vs[1] * stride)
    radius = jnp.maximum(gaussian_radius(dyp, dxp), min_radius)

    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)

    cls_ids = jnp.clip(gt_boxes[:, 7].astype(jnp.int32) - 1, 0, num_class - 1)

    def splat(c, args):
        heat = c
        fx_i, fy_i, r, cid, ok = args
        sigma = (2 * r + 1) / 6.0
        g = jnp.exp(-((xs - fx_i) ** 2 + (ys - fy_i) ** 2) / (2 * sigma ** 2))
        g = jnp.where(ok, g, 0.0)
        onehot = jax.nn.one_hot(cid, num_class)                 # (C,)
        heat = jnp.maximum(heat, g[:, :, None] * onehot[None, None, :])
        return heat, None

    # splat at the INTEGER center pixel (CenterNet convention: the fractional
    # part is learned by the offset head), so the peak value is exactly 1
    heat, _ = jax.lax.scan(
        splat, jnp.zeros((h, w, num_class)),
        (xi.astype(jnp.float32), yi.astype(jnp.float32), radius, cls_ids, inb))

    reg = jnp.stack([
        fx - xi.astype(jnp.float32), fy - yi.astype(jnp.float32),
        gt_boxes[:, 2],
        jnp.log(jnp.maximum(gt_boxes[:, 3], 1e-3)),
        jnp.log(jnp.maximum(gt_boxes[:, 4], 1e-3)),
        jnp.log(jnp.maximum(gt_boxes[:, 5], 1e-3)),
        jnp.cos(gt_boxes[:, 6]), jnp.sin(gt_boxes[:, 6])], axis=1)
    return heat, reg, jnp.stack([yi, xi], 1), inb


def centernet_focal_loss(pred_hm, gt_hm, alpha=2.0, beta=4.0):
    """Penalty-reduced focal loss (loss_utils.FocalLossCenterNet)."""
    p = jnp.clip(jax.nn.sigmoid(pred_hm), 1e-4, 1 - 1e-4)
    pos = gt_hm >= 1.0 - 1e-4
    pos_loss = -jnp.log(p) * (1 - p) ** alpha
    neg_loss = -jnp.log(1 - p) * p ** alpha * (1 - gt_hm) ** beta
    loss = jnp.where(pos, pos_loss, neg_loss)
    n_pos = jnp.maximum(pos.sum(), 1.0)
    return loss.sum() / n_pos


def center_head_loss(preds, gt_boxes, gt_mask, grid_hw, point_cloud_range,
                     voxel_size, stride, num_class, code_weights=None):
    def one(hm, center, cz, dim, rot, gb, gm):
        heat, reg, yx, ok = make_center_targets(
            gb, gm, grid_hw, point_cloud_range, voxel_size, stride, num_class)
        hm_loss = centernet_focal_loss(hm, heat)
        pred_maps = jnp.concatenate([center, cz, dim, rot], axis=-1)  # (H,W,8)
        pred_at = pred_maps[yx[:, 0], yx[:, 1]]                        # (M, 8)
        l1 = jnp.abs(pred_at - reg).sum(-1)
        reg_loss = (l1 * ok).sum() / jnp.maximum(ok.sum(), 1.0)
        return hm_loss, reg_loss

    hm_l, reg_l = jax.vmap(one)(preds["hm"], preds["center"],
                                preds["center_z"], preds["dim"], preds["rot"],
                                gt_boxes, gt_mask)
    return hm_l.mean(), reg_l.mean()


def decode_center_boxes(preds, point_cloud_range, voxel_size, stride: int,
                        k: int = 500):
    """Top-k peaks (3x3 local-max NMS) -> (B, k, 7) boxes + scores + labels."""
    hm = jax.nn.sigmoid(preds["hm"])                      # (B, H, W, C)
    pooled = nn.max_pool(hm, (3, 3), strides=(1, 1), padding="SAME")
    hm = jnp.where(jnp.abs(hm - pooled) < 1e-6, hm, 0.0)
    b, h, w, c = hm.shape
    flat = hm.reshape(b, -1)
    k = min(k, flat.shape[1])
    scores, idx = jax.lax.top_k(flat, k)
    cls = idx % c
    pix = idx // c
    yi = pix // w
    xi = pix % w

    def gather(maps):
        return jax.vmap(lambda m, y, x: m[y, x])(maps, yi, xi)

    center = gather(preds["center"])
    cz = gather(preds["center_z"])[..., 0]
    dim = jnp.exp(gather(preds["dim"]))
    rot = gather(preds["rot"])
    heading = jnp.arctan2(rot[..., 1], rot[..., 0])

    pcr = jnp.asarray(point_cloud_range)
    vs = jnp.asarray(voxel_size)
    x = (xi.astype(jnp.float32) + center[..., 0]) * vs[0] * stride + pcr[0]
    y = (yi.astype(jnp.float32) + center[..., 1]) * vs[1] * stride + pcr[1]
    boxes = jnp.stack([x, y, cz, dim[..., 0], dim[..., 1], dim[..., 2],
                       heading], axis=-1)
    return boxes, scores, (cls + 1).astype(jnp.int32)

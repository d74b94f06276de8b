"""PointNet++ MSG backbone + feature propagation, and the PointResidualCoder.

Reference: detector3d/pcdet/models/backbones_3d/pointnet2_backbone.py:9-206
(PointNet2MSG for PointRCNN) and pcdet/utils/box_coder_utils.py:144-221
(PointResidualCoder with sin/cos angle and per-class mean sizes).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.sampling import farthest_point_sample, three_nn_interpolate
from .pfe import SALayer


class PointNet2MSG(nn.Module):
    """SA encoder (FPS + multi-scale grouping) + FP decoder back to all
    points. Input (B, N, 3+C) -> per-point features (B, N, FP_MLPS[0][-1])."""
    sa_cfg: Any      # dict with NPOINTS, RADIUS, NSAMPLE, MLPS
    fp_mlps: Sequence[Sequence[int]]

    @nn.compact
    def __call__(self, points, points_valid, train: bool = False):
        npoints = [int(n) for n in self.sa_cfg["NPOINTS"]]
        radii = self.sa_cfg["RADIUS"]
        nsamples = self.sa_cfg["NSAMPLE"]
        mlps = self.sa_cfg["MLPS"]

        xyz = [points[..., :3]]
        feats = [points[..., 3:] if points.shape[-1] > 3 else None]
        valid = [points_valid]

        # ---- SA encoder ----------------------------------------------------
        for li in range(len(npoints)):
            layer = SALayer(tuple(float(r) for r in radii[li]),
                            tuple(int(n) for n in nsamples[li]),
                            tuple(tuple(m) for m in mlps[li]),
                            name=f"sa{li}")

            def sample(px, pv):
                idx = farthest_point_sample(px, npoints[li], pv)
                return px[idx], pv[idx]

            nx, nv = jax.vmap(sample)(xyz[-1], valid[-1])
            nf = layer(nx, xyz[-1], feats[-1], valid[-1], train)
            xyz.append(nx)
            feats.append(nf)
            valid.append(nv)

        # ---- FP decoder ------------------------------------------------------
        # fp_mlps[i] refines level i using level i+1 (reference FP ordering)
        up_feats = feats[-1]
        for li in range(len(npoints) - 1, -1, -1):
            def interp(qx, sx, sf, sv):
                return three_nn_interpolate(qx, sx, sf, sv)

            interp_f = jax.vmap(interp)(xyz[li], xyz[li + 1], up_feats,
                                        valid[li + 1])
            skip = feats[li]
            cat = interp_f if skip is None else jnp.concatenate(
                [skip, interp_f], axis=-1)
            b, n, c = cat.shape
            x = cat.reshape(b * n, c)
            for mi, f in enumerate(self.fp_mlps[li]):
                x = nn.Dense(f, use_bias=False, name=f"fp{li}_dense{mi}")(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                 epsilon=1e-3, name=f"fp{li}_bn{mi}")(x)
                x = nn.relu(x)
            up_feats = x.reshape(b, n, -1)
        return up_feats  # (B, N, C0)


class PointResidualCoder:
    """Per-point box residuals with per-class mean-size anchors and sin/cos
    angle (box_coder_utils.py:144-221)."""

    def __init__(self, code_size: int = 8, use_mean_size: bool = True,
                 mean_size=None, **kw):
        self.code_size = code_size
        self.use_mean_size = use_mean_size
        self.mean_size = np.asarray(mean_size, np.float32) if mean_size is not None \
            else None

    def encode(self, gt_boxes, points, gt_classes=None):
        g = gt_boxes
        xa, ya, za = points[..., 0], points[..., 1], points[..., 2]
        xg, yg, zg = g[..., 0], g[..., 1], g[..., 2]
        dxg = jnp.maximum(g[..., 3], 1e-5)
        dyg = jnp.maximum(g[..., 4], 1e-5)
        dzg = jnp.maximum(g[..., 5], 1e-5)
        rg = g[..., 6]
        if self.use_mean_size:
            anchor = jnp.asarray(self.mean_size)[
                jnp.clip(gt_classes - 1, 0, len(self.mean_size) - 1)]
            dxa, dya, dza = anchor[..., 0], anchor[..., 1], anchor[..., 2]
            diag = jnp.sqrt(dxa ** 2 + dya ** 2)
            out = [(xg - xa) / diag, (yg - ya) / diag, (zg - za) / dza,
                   jnp.log(dxg / dxa), jnp.log(dyg / dya), jnp.log(dzg / dza)]
        else:
            out = [xg - xa, yg - ya, zg - za,
                   jnp.log(dxg), jnp.log(dyg), jnp.log(dzg)]
        out += [jnp.cos(rg), jnp.sin(rg)]
        return jnp.stack(out, axis=-1)

    def decode(self, encodings, points, pred_classes=None):
        xt, yt, zt, dxt, dyt, dzt = (encodings[..., i] for i in range(6))
        cost, sint = encodings[..., 6], encodings[..., 7]
        xa, ya, za = points[..., 0], points[..., 1], points[..., 2]
        if self.use_mean_size:
            anchor = jnp.asarray(self.mean_size)[
                jnp.clip(pred_classes - 1, 0, len(self.mean_size) - 1)]
            dxa, dya, dza = anchor[..., 0], anchor[..., 1], anchor[..., 2]
            diag = jnp.sqrt(dxa ** 2 + dya ** 2)
            x = xt * diag + xa
            y = yt * diag + ya
            z = zt * dza + za
            dx = jnp.exp(dxt) * dxa
            dy = jnp.exp(dyt) * dya
            dz = jnp.exp(dzt) * dza
        else:
            x, y, z = xt + xa, yt + ya, zt + za
            dx, dy, dz = jnp.exp(dxt), jnp.exp(dyt), jnp.exp(dzt)
        r = jnp.arctan2(sint, cost)
        return jnp.stack([x, y, z, dx, dy, dz, r], axis=-1)

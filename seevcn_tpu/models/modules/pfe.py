"""Point feature extraction: VoxelSetAbstraction for PV-RCNN.

Reference: detector3d/pcdet/models/backbones_3d/pfe/voxel_set_abstraction.py
:124-411 — per frame: FPS keypoints from raw points, then aggregate
(a) bilinear BEV features at keypoint xy, (b) multi-scale SA groups over raw
points, (c) SA groups over sparse-conv voxel centers at each named stage,
concatenated and fused by a Linear+BN+ReLU to NUM_OUTPUT_FEATURES.

The reference's "stack mode" CUDA kernels become masked dense ball queries
(ops.pointnet2); per-frame support sets are selected from the global sparse
tensor by batch-id masks.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import sparse as SP
from ...ops.pointnet2 import ball_query, group_features, masked_max_pool
from ...ops.sampling import farthest_point_sample
from .roi_heads import bilinear_sample


class SAGroupMLP(nn.Module):
    """Shared MLP over grouped (K, nsample, 3+C) + masked max-pool."""
    mlp: Sequence[int]

    @nn.compact
    def __call__(self, grouped, valid, train: bool = False):
        k, ns, c = grouped.shape
        x = grouped.reshape(k * ns, c)
        for i, f in enumerate(self.mlp):
            x = nn.Dense(f, use_bias=False, name=f"dense{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, name=f"bn{i}")(x)
            x = nn.relu(x)
        return masked_max_pool(x.reshape(k, ns, -1), valid)


class SALayer(nn.Module):
    """Multi-radius set abstraction around query points."""
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]

    @nn.compact
    def __call__(self, new_xyz, support_xyz, support_feats, support_valid,
                 train: bool = False):
        outs = []
        for i, (r, ns, mlp) in enumerate(zip(self.radii, self.nsamples, self.mlps)):
            idx, valid = ball_query(new_xyz, support_xyz, float(r), int(ns),
                                    support_valid)
            grouped = group_features(idx, valid, new_xyz, support_xyz,
                                     support_feats)
            outs.append(SAGroupMLP(tuple(mlp), name=f"scale{i}")(grouped, valid,
                                                                 train))
        return jnp.concatenate(outs, axis=-1)


class VoxelSetAbstraction(nn.Module):
    pfe_cfg: Any
    point_cloud_range: tuple
    voxel_size: tuple

    @nn.compact
    def __call__(self, points, points_valid, bev, bev_stride,
                 multi_scale_3d: dict, train: bool = False):
        """points (B, P, 3+), bev (B, H, W, C), multi_scale_3d: name ->
        SparseTensor. Returns dict with keypoints (B, K, 3),
        point_features (B, K, F), point_features_before_fusion."""
        cfg = self.pfe_cfg
        k = int(cfg["NUM_KEYPOINTS"])
        pcr = jnp.asarray(self.point_cloud_range)
        vs = jnp.asarray(self.voxel_size)

        # --- keypoints: per-frame FPS over raw points ----------------------
        def sample_one(pts, valid):
            idx = farthest_point_sample(pts[:, :3], k, valid)
            return pts[idx, :3]

        keypoints = jax.vmap(sample_one)(points, points_valid)  # (B, K, 3)

        feats = []
        sources = list(cfg["FEATURES_SOURCE"])

        if "bev" in sources:
            def bev_one(kp, fmap):
                x = (kp[:, 0] - pcr[0]) / vs[0] / bev_stride
                y = (kp[:, 1] - pcr[1]) / vs[1] / bev_stride
                return bilinear_sample(fmap, jnp.stack([x, y], axis=-1))

            feats.append(jax.vmap(bev_one)(keypoints, bev))     # (B, K, Cbev)

        if "raw_points" in sources:
            sa_cfg = cfg["SA_LAYER"]["raw_points"]
            layer = SALayer(tuple(float(r) for r in sa_cfg["POOL_RADIUS"]),
                            tuple(int(n) for n in sa_cfg["NSAMPLE"]),
                            tuple(tuple(m) for m in sa_cfg["MLPS"]),
                            name="sa_raw_points")
            feats.append(jax.vmap(
                lambda kp, pts, v: layer(kp, pts[:, :3],
                                         pts[:, 3:] if pts.shape[-1] > 3 else None,
                                         v, train))(keypoints, points, points_valid))

        for name in sources:
            if not name.startswith("x_conv"):
                continue
            st: SP.SparseTensor = multi_scale_3d[name]
            sa_cfg = cfg["SA_LAYER"][name]
            ds = float(sa_cfg.get("DOWNSAMPLE_FACTOR",
                                  {"x_conv1": 1, "x_conv2": 2,
                                   "x_conv3": 4, "x_conv4": 8}[name]))
            # voxel centers in metric space (coords [b, z, y, x])
            centers = jnp.stack([
                (st.coords[:, 3].astype(jnp.float32) + 0.5) * vs[0] * ds + pcr[0],
                (st.coords[:, 2].astype(jnp.float32) + 0.5) * vs[1] * ds + pcr[1],
                (st.coords[:, 1].astype(jnp.float32) + 0.5) * vs[2] * ds + pcr[2],
            ], axis=1)
            layer = SALayer(tuple(float(r) for r in sa_cfg["POOL_RADIUS"]),
                            tuple(int(n) for n in sa_cfg["NSAMPLE"]),
                            tuple(tuple(m) for m in sa_cfg["MLPS"]),
                            name=f"sa_{name}")

            def one_frame(kp, b):
                frame_mask = st.mask & (st.coords[:, 0] == b)
                return layer(kp, centers, st.features, frame_mask, train)

            feats.append(jax.vmap(one_frame)(
                keypoints, jnp.arange(keypoints.shape[0])))

        before_fusion = jnp.concatenate(feats, axis=-1)          # (B, K, Ctot)
        b, kk, c = before_fusion.shape
        x = before_fusion.reshape(b * kk, c)
        x = nn.Dense(int(cfg["NUM_OUTPUT_FEATURES"]), use_bias=False,
                     name="fusion_dense")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, name="fusion_bn")(x)
        x = nn.relu(x).reshape(b, kk, -1)
        return {"keypoints": keypoints, "point_features": x,
                "point_features_before_fusion": before_fusion}

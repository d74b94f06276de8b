"""Voxel feature encoders.

Reference: detector3d/pcdet/models/backbones_3d/vfe/
  * MeanVFE (mean_vfe.py:6-31) — mean of the (capped) points per voxel; here
    that IS the voxelizer's output, so MeanVFE is a passthrough.
  * PillarVFE (pillar_vfe.py:8-123) / DynamicPillarVFE (dynamic_pillar_vfe.py)
    — per-point augmented features -> PFN (Linear+BN+ReLU) -> max per pillar.
    Implemented dynamically (flat points + segment max), the TPU-friendly
    equivalent of the torch_scatter path; no (V, K, C) padding.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class PFNLayer(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.out_channels, use_bias=False, name="linear")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, name="norm")(x)
        return nn.relu(x)


class DynamicPillarVFE(nn.Module):
    """Per-point PFN + segment-max into pillars.

    Inputs are flat: points (P, 3+C), per-point pillar id (P,) in [0, V)
    (-1 = dropped), pillar mean xyz (V, 3), pillar coords (V, 4) for the
    voxel-center offset features.
    """
    num_filters: tuple = (64,)
    voxel_size: tuple = (0.16, 0.16, 4.0)
    point_cloud_range: tuple = (0, -39.68, -3, 69.12, 39.68, 1)
    use_absolute_xyz: bool = True
    with_distance: bool = False

    @nn.compact
    def __call__(self, points, pillar_id, pillar_mean, pillar_coords, num_pillars,
                 train: bool = False):
        ok = pillar_id >= 0
        pid = jnp.where(ok, pillar_id, num_pillars)

        xyz = points[:, :3]
        cluster = xyz - pillar_mean[jnp.clip(pid, 0, num_pillars - 1)]
        vs = jnp.asarray(self.voxel_size, points.dtype)
        pcr = jnp.asarray(self.point_cloud_range, points.dtype)
        # pillar coords are [b, z, y, x]
        centers = jnp.stack([
            (pillar_coords[:, 3].astype(points.dtype) + 0.5) * vs[0] + pcr[0],
            (pillar_coords[:, 2].astype(points.dtype) + 0.5) * vs[1] + pcr[1],
            (pillar_coords[:, 1].astype(points.dtype) + 0.5) * vs[2] + pcr[2],
        ], axis=1)
        center_off = xyz - centers[jnp.clip(pid, 0, num_pillars - 1)]

        feats = [points if self.use_absolute_xyz else points[:, 3:],
                 cluster, center_off]
        if self.with_distance:
            feats.append(jnp.linalg.norm(xyz, axis=1, keepdims=True))
        x = jnp.concatenate(feats, axis=1)
        x = jnp.where(ok[:, None], x, 0.0)

        for i, f in enumerate(self.num_filters):
            x = PFNLayer(f, name=f"pfn{i}")(x, train)
            if i != len(self.num_filters) - 1:
                pooled = jnp.full((num_pillars + 1, x.shape[-1]), -jnp.inf,
                                  x.dtype).at[pid].max(x)
                x = jnp.concatenate(
                    [x, pooled[jnp.clip(pid, 0, num_pillars - 1)]], axis=1)

        pooled = jnp.full((num_pillars + 1, x.shape[-1]), -jnp.inf, x.dtype
                          ).at[pid].max(jnp.where(ok[:, None], x, -jnp.inf))
        pooled = pooled[:num_pillars]
        return jnp.where(jnp.isfinite(pooled), pooled, 0.0)

"""Sparse 3D -> dense BEV projection layers.

Reference: detector3d/pcdet/models/backbones_2d/map_to_bev/
  * HeightCompression (height_compression.py:4-26): dense() then flatten
    (N, C, D, H, W) -> (N, C*D, H, W). Our channel-last equivalent keeps the
    SAME channel ordering (c * D + d) so imported 2D-conv weights line up:
    scatter to (B, H, W, C, D) and reshape.
  * PointPillarScatter (pointpillar_scatter.py:5-37): pillar features to a
    (B, ny, nx, C) canvas.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops import sparse as SP


def height_compression(st: SP.SparseTensor) -> jax.Array:
    """SparseTensor (stride-8, nz small) -> (B, H, W, C*D) BEV features."""
    nz, ny, nx = st.spatial_shape
    c = st.features.shape[-1]
    b = st.batch_size
    canvas = jnp.zeros((b, ny, nx, c, nz), st.features.dtype)
    bi = jnp.where(st.mask, st.coords[:, 0], 0)
    zi = jnp.where(st.mask, st.coords[:, 1], 0)
    yi = jnp.where(st.mask, st.coords[:, 2], 0)
    xi = jnp.where(st.mask, st.coords[:, 3], 0)
    feats = jnp.where(st.mask[:, None], st.features, 0.0)
    canvas = canvas.at[bi, yi, xi, :, zi].add(feats)
    return canvas.reshape(b, ny, nx, c * nz)


def pillar_scatter(features: jax.Array, coords: jax.Array, mask: jax.Array,
                   batch_size: int, grid: tuple) -> jax.Array:
    """Pillar features (N, C) + coords (N, 4) [b, z=0, y, x] -> (B, ny, nx, C)."""
    nx, ny = int(grid[0]), int(grid[1])
    c = features.shape[-1]
    canvas = jnp.zeros((batch_size, ny, nx, c), features.dtype)
    bi = jnp.where(mask, coords[:, 0], 0)
    yi = jnp.where(mask, coords[:, 2], 0)
    xi = jnp.where(mask, coords[:, 3], 0)
    feats = jnp.where(mask[:, None], features, 0.0)
    return canvas.at[bi, yi, xi].add(feats)


def height_compression_any(t) -> jax.Array:
    """Layout-polymorphic HeightCompression: accepts the SparseTensor
    rulebook form or any dense execution layout (ZFold/Dense), always
    producing the reference's (c * D + d) channel order."""
    if isinstance(t, SP.ZFoldTensor):
        return SP.zfold_height_compression(t)
    if isinstance(t, SP.DenseTensor):
        return SP.dense_height_compression(t)
    return height_compression(t)

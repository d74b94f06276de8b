"""Exact ROI-aware grid pooling (reference ops/roiaware_pool3d CUDA kernels,
roiaware_pool3d_kernel.cu + roiaware_pool3d.cpp:173-176).

For each ROI box, partition it into a G^3 local grid; every point (or voxel
center) inside the box lands in exactly one cell by its box-local
coordinates; pool max or avg per cell. Everything is a closed-form
coordinate transform + one scatter per ROI — no CUDA-style atomics needed:
``.at[...].max/.add`` compiles to a single deterministic XLA scatter.

Cell order matches the reference kernel: x-major, then y, then z
(pt_idx = x_idx * G^2 + y_idx * G + z_idx).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geom.transforms import rotate_points_along_z


@partial(jax.jit, static_argnames=("grid_size", "method"))
def roiaware_pool3d(rois: jax.Array, xyz: jax.Array, feats: jax.Array,
                    valid: jax.Array, grid_size: int = 12,
                    method: str = "max") -> jax.Array:
    """rois (R, 7), xyz (N, 3), feats (N, C), valid (N,) ->
    (R, G^3, C). Empty cells are 0 (the reference kernel's init)."""
    g = int(grid_size)
    r = rois.shape[0]
    local = rotate_points_along_z(
        jnp.broadcast_to(xyz[None], (r,) + xyz.shape) - rois[:, None, :3],
        -rois[:, 6])                                       # (R, N, 3)
    u = local / jnp.maximum(rois[:, None, 3:6], 1e-6) + 0.5
    cell = jnp.floor(u * g).astype(jnp.int32)              # (R, N, 3)
    inside = jnp.all((cell >= 0) & (cell < g), axis=-1) & valid[None, :]
    flat = (cell[..., 0] * g + cell[..., 1]) * g + cell[..., 2]
    flat = jnp.where(inside, flat, g ** 3)                 # sentinel slot

    if method == "max":
        def pool_one(fl):
            neg = jnp.full((g ** 3 + 1, feats.shape[-1]), -jnp.inf,
                           feats.dtype)
            out = neg.at[fl].max(feats)[:g ** 3]
            return jnp.where(jnp.isfinite(out), out, 0.0)
    else:                                                  # avg
        def pool_one(fl):
            sums = jnp.zeros((g ** 3 + 1, feats.shape[-1]),
                             feats.dtype).at[fl].add(feats)
            cnt = jnp.zeros((g ** 3 + 1,), feats.dtype).at[fl].add(1.0)
            return (sums / jnp.maximum(cnt[:, None], 1.0))[:g ** 3]

    return jax.vmap(pool_one)(flat)


def roiaware_pool3d_batch(rois, xyz, feats, valid, grid_size: int = 12,
                          method: str = "max"):
    """Batched: rois (B, R, 7), xyz (B, N, 3), feats (B, N, C),
    valid (B, N) -> (B, R, G^3, C)."""
    return jax.vmap(lambda ro, x, f, v: roiaware_pool3d(
        ro, x, f, v, grid_size=grid_size, method=method))(rois, xyz, feats,
                                                          valid)

"""Dynamic voxelization on device.

Replaces the reference's CPU spconv ``Point2VoxelCPU3d`` wrapper
(detector3d/pcdet/datasets/processor/data_processor.py:15-60,115-143) and
the (V, K, C) padded voxel buffers it produces. TPU-first design: points
stay flat; a stable sort by linearized voxel key produces run-IDs; voxel
features come from segment reductions. No (V, K, C) padding, no host loop —
the whole thing jits and fuses with the VFE that consumes it.

Semantics matched to the reference:
  * voxel coords are emitted [z, y, x] (data_processor.py docstring)
  * per-voxel point cap (MAX_POINTS_PER_VOXEL) honoured IN INPUT ORDER via
    the stable sort, so eval (unshuffled points) reproduces the reference's
    "first K points per voxel" means
  * voxel count capped at MAX_NUMBER_OF_VOXELS (overflow voxels dropped)
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class VoxelizationResult(NamedTuple):
    features: jax.Array      # (V, C) mean features (or raw per-point passthrough)
    coords: jax.Array        # (V, 3) int32 [z, y, x]
    num_points: jax.Array    # (V,) int32 points per voxel (uncapped count)
    mask: jax.Array          # (V,) bool valid voxel
    point_voxel_id: jax.Array  # (P,) int32 voxel row per point, -1 if dropped
    point_order: jax.Array     # (P,) permutation applied to points (sorted)


def grid_size(point_cloud_range, voxel_size) -> np.ndarray:
    pcr = np.asarray(point_cloud_range, dtype=np.float64)
    vs = np.asarray(voxel_size, dtype=np.float64)
    return np.round((pcr[3:6] - pcr[0:3]) / vs).astype(np.int64)  # (nx, ny, nz)


def voxelize(points: jax.Array, valid: jax.Array, *,
             point_cloud_range, voxel_size,
             max_voxels: int, max_points_per_voxel: int = 0,
             grid: tuple | None = None) -> VoxelizationResult:
    """points (P, 3+C) -> mean-pooled voxels.

    ``max_points_per_voxel=0`` means mean over ALL points in the voxel
    (dynamic-VFE semantics); >0 reproduces the reference cap.
    """
    return _voxelize_impl(points, valid,
                          point_cloud_range=tuple(float(v) for v in point_cloud_range),
                          voxel_size=tuple(float(v) for v in voxel_size),
                          max_voxels=int(max_voxels),
                          max_points_per_voxel=int(max_points_per_voxel),
                          grid=tuple(int(g) for g in grid) if grid is not None else None)


@partial(jax.jit, static_argnames=("point_cloud_range", "voxel_size", "max_voxels",
                                   "max_points_per_voxel", "grid"))
def _voxelize_impl(points: jax.Array, valid: jax.Array, *,
                   point_cloud_range, voxel_size,
                   max_voxels: int, max_points_per_voxel: int = 0,
                   grid: tuple | None = None) -> VoxelizationResult:
    pcr = jnp.asarray(point_cloud_range, dtype=points.dtype)
    vs = jnp.asarray(voxel_size, dtype=points.dtype)
    if grid is None:
        grid = tuple(grid_size(point_cloud_range, voxel_size).tolist())
    nx, ny, nz = int(grid[0]), int(grid[1]), int(grid[2])

    p = points.shape[0]
    xyz = points[:, :3]
    c = jnp.floor((xyz - pcr[0:3]) / vs).astype(jnp.int32)  # (P, 3) [x, y, z]
    in_bounds = jnp.all((c >= 0) & (c < jnp.asarray([nx, ny, nz])), axis=1)
    ok = valid & in_bounds

    big = jnp.int32(nx * ny * nz)
    key = (c[:, 2] * ny + c[:, 1]) * nx + c[:, 0]
    key = jnp.where(ok, key, big)

    order = jnp.argsort(key, stable=True)          # invalid keys go last
    skey = key[order]
    spts = points[order]

    head = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    head = head & (skey < big)
    run_id = jnp.cumsum(head) - 1                   # (P,) voxel index per point
    svalid = skey < big
    run_id = jnp.where(svalid & (run_id < max_voxels), run_id, max_voxels)

    # position of each point within its run (input order preserved by the
    # stable sort), for the per-voxel point cap
    pos_idx = jnp.arange(p)
    run_start = jax.lax.associative_scan(jnp.maximum, jnp.where(head, pos_idx, 0))
    in_run_pos = pos_idx - run_start
    contributes = run_id < max_voxels
    if max_points_per_voxel > 0:
        contributes = contributes & (in_run_pos < max_points_per_voxel)

    # run_id (post-clamp) IS nondecreasing: it is a cumsum over the sorted
    # keys' run heads, clamped to max_voxels, and invalid rows sort to the
    # end — so indices_are_sorted=True is genuinely valid for run_id. Every
    # reduction below segments on run_id directly; rows that must not
    # contribute (per-voxel point cap) carry ZERO WEIGHT instead of being
    # re-routed to an interleaved sentinel segment (which would break the
    # sortedness claim and make XLA output undefined — ADVICE r2, high).
    w = contributes.astype(points.dtype)
    feat_sum = jax.ops.segment_sum(spts * w[:, None], run_id,
                                   num_segments=max_voxels + 1,
                                   indices_are_sorted=True)
    cnt = jax.ops.segment_sum(w, run_id, num_segments=max_voxels + 1,
                              indices_are_sorted=True)
    features = feat_sum[:max_voxels] / jnp.maximum(cnt[:max_voxels, None], 1.0)

    # uncapped per-voxel counts (reference voxel_num_points)
    cnt_all = jax.ops.segment_sum(
        svalid.astype(jnp.int32), run_id,
        num_segments=max_voxels + 1, indices_are_sorted=True)
    num_points = cnt_all[:max_voxels]

    # voxel coords: every row of a run shares the SAME voxel coords (same
    # key), so a plain segment_max over run_id reproduces the head row's
    # coords without any head-interleaved sentinel segmenting
    csorted = c[order]
    coords_zyx = jnp.stack([csorted[:, 2], csorted[:, 1], csorted[:, 0]], axis=1)
    coords = jax.ops.segment_max(coords_zyx, run_id,
                                 num_segments=max_voxels + 1,
                                 indices_are_sorted=True)
    coords = jnp.maximum(coords, 0)[:max_voxels]

    vmask = num_points > 0
    point_voxel_id = jnp.where(run_id < max_voxels, run_id, -1)
    return VoxelizationResult(features, coords, num_points, vmask,
                              point_voxel_id.astype(jnp.int32), order)


def voxelize_batch(points: jax.Array, valid: jax.Array, *,
                   point_cloud_range, voxel_size,
                   max_voxels: int, max_points_per_voxel: int = 0,
                   grid: tuple | None = None):
    """(B, P, 3+C) -> concatenated per-frame voxels with batch indices.

    Returns (features (B*V, C), coords (B*V, 4) [b, z, y, x], mask (B*V,)).
    Rows are globally key-sorted with padding compacted to the end — the
    layout the sparse backbone's rulebook lookups rely on.
    """
    return _voxelize_batch_impl(
        points, valid,
        point_cloud_range=tuple(float(v) for v in point_cloud_range),
        voxel_size=tuple(float(v) for v in voxel_size),
        max_voxels=int(max_voxels),
        max_points_per_voxel=int(max_points_per_voxel),
        grid=tuple(int(g) for g in grid) if grid is not None else None)


@partial(jax.jit, static_argnames=("point_cloud_range", "voxel_size", "max_voxels",
                                   "max_points_per_voxel", "grid"))
def _voxelize_batch_impl(points: jax.Array, valid: jax.Array, *,
                         point_cloud_range, voxel_size,
                         max_voxels: int, max_points_per_voxel: int = 0,
                         grid: tuple | None = None):
    f = jax.vmap(lambda pts, v: voxelize(
        pts, v, point_cloud_range=point_cloud_range, voxel_size=voxel_size,
        max_voxels=max_voxels, max_points_per_voxel=max_points_per_voxel,
        grid=grid))
    res = f(points, valid)
    b, v = res.features.shape[:2]
    bidx = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None], (b, v))
    coords = jnp.concatenate([bidx[..., None], res.coords], axis=-1).reshape(b * v, 4)
    feats = res.features.reshape(b * v, -1)
    mask = res.mask.reshape(b * v)

    # compact: each frame's padding rows would otherwise sit BETWEEN frames
    # and break the global ascending-key invariant searchsorted relies on
    if grid is None:
        grid = tuple(int(g) for g in grid_size(point_cloud_range, voxel_size))
    nx, ny, nz = grid
    key = ((coords[:, 0] * nz + coords[:, 1]) * ny + coords[:, 2]) * nx + coords[:, 3]
    key = jnp.where(mask, key, jnp.int32(np.iinfo(np.int32).max))
    order = jnp.argsort(key, stable=True)
    return feats[order], coords[order], mask[order]

"""Point-set sampling ops: FPS, kNN selection, partial-mesh surface select,
fixed-size resampling. Pure XLA, fixed shapes, mask-aware.

Replaces the reference's CUDA/CPU mix:
  * pointnet2 farthest_point_sampling (pcdet/ops/pointnet2/pointnet2_batch/src/
    sampling_gpu.cu, and the external pointnet2_ops used by VCN misc.fps)
  * partial-mesh k-NN selection via scipy cKDTree
    (see/.../models/vcn/utils/sampling.py:8-80)
  * ResamplePoints tile+permute (see/.../vcn/datasets/data_transforms.py:247)

Padded/invalid points are handled by boolean masks instead of ragged shapes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def pairwise_sqdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """(..., N, 3) x (..., M, 3) -> (..., N, M) squared distances.

    Matmul formulation so the contraction rides the MXU; f32 accumulate.
    """
    a2 = jnp.sum(a * a, axis=-1)[..., :, None]
    b2 = jnp.sum(b * b, axis=-1)[..., None, :]
    ab = jnp.matmul(a, jnp.swapaxes(b, -1, -2), precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(a2 + b2 - 2 * ab, 0.0)


def tile_to_n(points: jax.Array, valid: jax.Array, n: int):
    """Cyclically repeat the valid points of (M, C) to exactly (n, C).

    Matches the reference's ``np.tile(sel, [n,1])[:n]`` semantics
    (sampling.py:38-39). Returns (out (n, C), ok scalar bool).
    """
    m = points.shape[0]
    order = jnp.argsort(jnp.where(valid, 0, 1), stable=True)  # valid first
    cnt = jnp.maximum(valid.sum(), 1)
    idx = order[jnp.arange(n) % jnp.minimum(cnt, m)]
    return points[idx], valid.any()


@partial(jax.jit, static_argnames=("n_samples",))
def farthest_point_sample(points: jax.Array, n_samples: int,
                          valid: jax.Array | None = None) -> jax.Array:
    """Iterative FPS. points (N, 3) -> (n_samples,) int32 indices.

    Starts from index 0 like the reference CUDA kernel. Invalid points are
    never selected (their distance is forced negative); if fewer valid points
    than n_samples exist, selections repeat among valid ones.
    """
    n = points.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)

    def step(carry, _):
        min_d, last = carry
        d = jnp.sum((points - points[last]) ** 2, axis=-1)
        min_d = jnp.minimum(min_d, d)
        nxt = jnp.argmax(jnp.where(valid, min_d, -1.0))
        return (min_d, nxt), last

    first = jnp.argmax(valid)  # first valid point
    init = (jnp.full((n,), jnp.inf, dtype=points.dtype), first)
    _, idx = jax.lax.scan(step, init, None, length=n_samples)
    return idx.astype(jnp.int32)


def fps(points: jax.Array, n_samples: int, valid: jax.Array | None = None) -> jax.Array:
    """Batched FPS gather: (B, N, 3) -> (B, n_samples, 3) (VCN misc.fps)."""
    if points.ndim == 2:
        return points[farthest_point_sample(points, n_samples, valid)]
    f = jax.vmap(lambda p, v: p[farthest_point_sample(p, n_samples, v)])
    if valid is None:
        valid = jnp.ones(points.shape[:2], dtype=bool)
    return f(points, valid)


@partial(jax.jit, static_argnames=("k",))
def knn_union_mask(partial_pc: jax.Array, complete_pc: jax.Array, k: int,
                   partial_valid: jax.Array | None = None) -> jax.Array:
    """Union of the k nearest ``complete`` points over every ``partial`` point.

    partial_pc (N, 3), complete_pc (M, 3) -> (M,) bool selection mask.
    The device analog of sampling.py:partial_with_KDTree's index-set union.
    """
    d = pairwise_sqdist(partial_pc, complete_pc)  # (N, M)
    if partial_valid is not None:
        d = jnp.where(partial_valid[:, None], d, jnp.inf)
    # approx_max_k: TPU-native approximate top-k (recall ~0.95 per row;
    # measured overlap 1.0 on the union at VCN shapes) — other backends
    # lower it to the exact sort
    _, idx = jax.lax.approx_max_k(-d, k, recall_target=0.95)  # (N, k)
    mask = jnp.zeros((complete_pc.shape[0],), dtype=bool)
    row_ok = jnp.ones_like(idx, dtype=bool) if partial_valid is None \
        else jnp.broadcast_to(partial_valid[:, None], idx.shape)
    return mask.at[idx.reshape(-1)].max(row_ok.reshape(-1))


@partial(jax.jit, static_argnames=("k", "surface_pts"))
def partial_mesh_batch(batch_partial: jax.Array, batch_complete: jax.Array,
                       k: int = 30, surface_pts: int = 1024,
                       partial_valid: jax.Array | None = None) -> jax.Array:
    """Batched partial-surface selection (sampling.py:get_partial_mesh_batch).

    batch_partial (B, N, 3), batch_complete (B, M, 3) -> (B, surface_pts, 3):
    the subset of predicted points near observed points, cyclically tiled to
    a fixed count.
    """
    def one(p, c, pv):
        sel = knn_union_mask(p, c, k, pv)
        out, _ = tile_to_n(c, sel, surface_pts)
        return out

    if partial_valid is None:
        partial_valid = jnp.ones(batch_partial.shape[:2], dtype=bool)
    return jax.vmap(one)(batch_partial, batch_complete, partial_valid)


def resample_points(points: jax.Array, valid: jax.Array, n: int, rng: jax.Array | None = None):
    """Fixed-count resample (data_transforms.py:ResamplePoints): if fewer than
    ``n`` valid points, cycle-tile; if more, take a (optionally shuffled)
    subset. Returns (n, C)."""
    if rng is not None:
        perm = jax.random.permutation(rng, points.shape[0])
        points = points[perm]
        valid = valid[perm]
    out, _ = tile_to_n(points, valid, n)
    return out


def cell_hash(c: jax.Array, t: int) -> jax.Array:
    """(..., 3) int32 cell coords -> bucket id in [0, t). The single
    spatial-hash scheme shared by grid_subsample and the pointnet2
    hash-grid ball query (one implementation so bucketing can never
    drift between them)."""
    p1, p2, p3 = 73856093, 19349663, 83492791
    h = (c[..., 0] * p1) ^ (c[..., 1] * p2) ^ (c[..., 2] * p3)
    return jnp.abs(h) % t


@partial(jax.jit, static_argnames=("max_out", "table_size"))
def grid_subsample(points: jax.Array, valid: jax.Array, cell,
                   max_out: int, table_size: int = 1 << 18):
    """Keep the lowest-index point per occupied (hashed) cell, compacted
    to ``max_out`` slots -> ((max_out,) int32 indices, (max_out,) bool).

    A cheap spatial dedupe used to bound the FPS scan length on big
    clouds: FPS over the representatives is near-identical to FPS over
    the raw cloud whenever the target spacing >> ``cell`` (4096 keypoints
    over a driving scene sit metres apart; cell ~0.35 m). Hash collisions
    merge distant cells (drops a point), and more than ``max_out``
    occupied cells truncate in hash order — both benign for sampling.
    """
    n = points.shape[0]
    origin = jnp.min(jnp.where(valid[:, None], points[:, :3], jnp.inf),
                     axis=0)
    origin = jnp.where(jnp.isfinite(origin), origin, 0.0)
    c = jnp.floor((points[:, :3] - origin) /
                  jnp.maximum(cell, 1e-3)).astype(jnp.int32)
    h = cell_hash(c, table_size)
    h = jnp.where(valid, h, jnp.int32(table_size))
    big = jnp.int32(n)
    slot = jnp.full((table_size + 1,), big, jnp.int32).at[h].min(
        jnp.arange(n, dtype=jnp.int32))
    occ = slot[:table_size] < big
    (sel,) = jnp.nonzero(occ, size=max_out, fill_value=-1)
    ok = sel >= 0
    idx = slot[jnp.maximum(sel, 0)]
    return jnp.where(ok, idx, 0).astype(jnp.int32), ok


def sample_points_with_roi_mask(points: jax.Array, rois: jax.Array,
                                roi_mask: jax.Array,
                                sample_radius_with_roi: float,
                                valid: jax.Array | None = None) -> jax.Array:
    """(N,) bool: points within (nearest ROI's half-diagonal + radius) of
    that ROI's center — the reference's proposal-centric point filter
    (voxel_set_abstraction.py:sample_points_with_roi:40-76; the reference
    chunks over num_max_points_of_part only to bound GPU memory, the math
    is identical).

    points (N, 3), rois (M, 7+) [cx cy cz dx dy dz heading ...],
    roi_mask (M,) bool.
    """
    d2 = pairwise_sqdist(points[:, :3], rois[:, :3])          # (N, M)
    d2 = jnp.where(roi_mask[None, :], d2, jnp.inf)
    min_idx = jnp.argmin(d2, axis=1)
    min_dis = jnp.sqrt(jnp.take_along_axis(d2, min_idx[:, None], 1)[:, 0])
    roi_max_dim = jnp.linalg.norm(rois[min_idx, 3:6] / 2, axis=-1)
    mask = min_dis < roi_max_dim + sample_radius_with_roi
    mask = mask & roi_mask.any()
    if valid is not None:
        mask = mask & valid
    return mask


@partial(jax.jit, static_argnames=("num_keypoints", "num_sectors"))
def sector_fps_sample(points: jax.Array, valid: jax.Array,
                      num_keypoints: int, num_sectors: int) -> tuple:
    """Azimuthal-sector quota FPS (voxel_set_abstraction.py:sector_fps:
    78-122), fixed-shape: bucket points into ``num_sectors`` sectors by
    atan2 angle, FPS independently inside each sector, keep
    quota_s = min(count_s, ceil(count_s / total * num_keypoints)) picks per
    sector, and merge by interleaving sectors proportionally (pick j of
    sector s scores (j+0.5)/quota_s; global top-``num_keypoints`` smallest).

    The reference runs a ragged stack-mode FPS and concatenates (yielding
    sum(quota_s) >= num_keypoints points, later truncated); the
    proportional interleave here selects the same per-sector prefixes,
    dropping only the highest-rank stragglers to land exactly on
    ``num_keypoints``. Returns ((num_keypoints,) int32 indices,
    (num_keypoints,) bool pick-validity).
    """
    n = points.shape[0]
    s = int(num_sectors)
    k = int(num_keypoints)
    sector_size = 2.0 * np.pi / s
    ang = jnp.arctan2(points[:, 1], points[:, 0]) + np.pi
    sec = jnp.clip(jnp.floor(ang / sector_size).astype(jnp.int32), 0, s - 1)
    sec_w = jnp.where(valid, sec, s)
    cnt = jax.ops.segment_sum(jnp.ones((n,), jnp.int32), sec_w,
                              num_segments=s + 1)[:s]          # (S,)
    total = jnp.maximum(cnt.sum(), 1)
    quota = jnp.minimum(cnt, jnp.ceil(cnt / total * k).astype(jnp.int32))

    # per-sector FPS over the full buffer with sector-masked validity;
    # picks beyond a sector's point count repeat (never rank < quota)
    per_k = min(k, n)
    idx = jax.vmap(lambda si: farthest_point_sample(
        points[:, :3], per_k, valid & (sec == si)))(jnp.arange(s))  # (S, per_k)
    j = jnp.arange(per_k)[None, :]
    score = jnp.where(j < quota[:, None],
                      (j + 0.5) / jnp.maximum(quota[:, None], 1), jnp.inf)
    picked = sec[idx] == jnp.arange(s)[:, None]  # FPS fell back <=> sector empty
    score = jnp.where(picked, score, jnp.inf)
    score, idx = score.reshape(-1), idx.reshape(-1)
    if score.shape[0] < k:                    # tiny-N guard
        pad = k - score.shape[0]
        score = jnp.pad(score, (0, pad), constant_values=jnp.inf)
        idx = jnp.pad(idx, (0, pad))
    neg, flat = jax.lax.top_k(-score, k)
    out = idx[flat]
    ok = neg > -jnp.inf
    out = jnp.where(ok, out, out[0])
    return out.astype(jnp.int32), ok


def three_nn_interpolate(query: jax.Array, support: jax.Array, features: jax.Array,
                         support_valid: jax.Array | None = None) -> jax.Array:
    """Inverse-distance-weighted 3-NN feature interpolation.

    query (N, 3), support (M, 3), features (M, C) -> (N, C).
    Replaces pointnet2 three_nn + three_interpolate (interpolate_gpu.cu).
    """
    d = pairwise_sqdist(query, support)
    if support_valid is not None:
        d = jnp.where(support_valid[None, :], d, jnp.inf)
    neg_d, idx = jax.lax.top_k(-d, 3)  # (N, 3)
    w = 1.0 / jnp.maximum(-neg_d, 1e-8)
    w = w / w.sum(axis=1, keepdims=True)
    return jnp.einsum("nk,nkc->nc", w, features[idx])


def within_radius_mask(a: jax.Array, b: jax.Array, radius: float,
                       b_valid: jax.Array | None = None,
                       chunk: int = 8192) -> jax.Array:
    """(N,) bool: does each point of ``a`` have a ``b`` point within radius?

    Replaces the reference's o3d compute_point_cloud_distance in
    replace_with_completed_pts (SEE_VCN.py:247-265). On TPU, large problems
    route to the fused Pallas min-distance kernel (no (N, M) HBM traffic);
    elsewhere a chunked XLA fallback bounds the buffer.
    """
    n, m = a.shape[0], b.shape[0]
    if (jax.default_backend() not in ("cpu",)) and n * m >= 1 << 22:
        from .pallas.min_dist import min_sqdist

        d = min_sqdist(jnp.asarray(a, jnp.float32)[:, :3],
                       jnp.asarray(b, jnp.float32)[:, :3], b_valid=b_valid,
                       prune_radius=float(radius))
        return d <= radius * radius
    return _within_radius_mask_xla(a, b, radius, b_valid, chunk=chunk)


@partial(jax.jit, static_argnames=("chunk",))
def _within_radius_mask_xla(a: jax.Array, b: jax.Array, radius: float,
                            b_valid: jax.Array | None = None,
                            chunk: int = 8192) -> jax.Array:
    n = a.shape[0]
    r2 = radius * radius
    pad = (-n) % chunk
    a_p = jnp.pad(a, ((0, pad), (0, 0)))

    def one(chunk_pts):
        d = pairwise_sqdist(chunk_pts, b)
        if b_valid is not None:
            d = jnp.where(b_valid[None, :], d, jnp.inf)
        return jnp.min(d, axis=1) <= r2

    out = jax.lax.map(one, a_p.reshape(-1, chunk, 3))
    return out.reshape(-1)[:n]

"""PointNet++-style grouping ops, fixed shapes.

Replaces the reference's pointnet2_batch / pointnet2_stack CUDA kernels
(detector3d/pcdet/ops/pointnet2/*/src: ball_query, group_points, FPS — FPS
already lives in ops.sampling). "Stack" (ragged) mode becomes masked dense
queries: supports carry a validity mask instead of per-frame row counts.

Ball query semantics match the CUDA kernel: for each query point take the
FIRST ``nsample`` support points (by index order) within ``radius``; if none
exist the group is empty (mask all-false).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .sampling import pairwise_sqdist


#: dense ball query switches to the hash-grid path above this support size
_GRID_BQ_MIN_SUPPORT = 16384
_HASH_T = 1 << 16          # hash buckets
_HASH_CAP = 96             # points kept per bucket (first-by-index)


def ball_query(new_xyz: jax.Array, support_xyz: jax.Array, radius: float,
               nsample: int, support_valid: jax.Array | None = None,
               chunk: int = 1024):
    """new_xyz (K, 3), support_xyz (N, 3) -> (idx (K, nsample) int32,
    valid (K, nsample) bool): the FIRST nsample in-radius supports by
    index order (CUDA ball_query semantics).

    Large supports route to the hash-grid path: the dense formulation's
    per-row top_k over N (the index-order selection) is O(N log N) per
    query — measured 5.2 s for a PV-RCNN forward at 150k points."""
    if support_xyz.shape[0] >= _GRID_BQ_MIN_SUPPORT:
        return grid_ball_query(new_xyz, support_xyz, radius, nsample,
                               support_valid)
    return _dense_ball_query(new_xyz, support_xyz, radius, nsample,
                             support_valid, chunk)


@partial(jax.jit, static_argnames=("nsample", "chunk"))
def _dense_ball_query(new_xyz: jax.Array, support_xyz: jax.Array,
                      radius: float, nsample: int,
                      support_valid: jax.Array | None = None,
                      chunk: int = 1024):
    """Chunked over K to bound the (chunk, N) buffer."""
    k = new_xyz.shape[0]
    n = support_xyz.shape[0]
    r2 = radius * radius
    big = jnp.int32(n + 1)

    pad = (-k) % chunk
    q = jnp.pad(new_xyz, ((0, pad), (0, 0)))

    def one(qc):
        d = pairwise_sqdist(qc, support_xyz)              # (chunk, N)
        ok = d <= r2
        if support_valid is not None:
            ok = ok & support_valid[None, :]
        key = jnp.where(ok, jnp.arange(n, dtype=jnp.int32)[None, :], big)
        neg, idx = jax.lax.top_k(-key, nsample)           # smallest indices
        valid = (-neg) < big
        return idx.astype(jnp.int32), valid

    idxs, valids = jax.lax.map(one, q.reshape(-1, chunk, 3))
    return idxs.reshape(-1, nsample)[:k], valids.reshape(-1, nsample)[:k]


def _cell_hash(c: jax.Array, t: int) -> jax.Array:
    """(..., 3) int32 cell coords -> bucket id in [0, t)."""
    p1, p2, p3 = 73856093, 19349663, 83492791
    h = (c[..., 0] * p1) ^ (c[..., 1] * p2) ^ (c[..., 2] * p3)
    return jnp.abs(h) % t


@partial(jax.jit, static_argnames=("nsample", "table_size", "capacity"))
def grid_ball_query(new_xyz: jax.Array, support_xyz: jax.Array,
                    radius: float, nsample: int,
                    support_valid: jax.Array | None = None,
                    table_size: int = _HASH_T, capacity: int = _HASH_CAP):
    """Hash-grid ball query: bucket supports by radius-sized cells into a
    fixed (table_size, capacity) table (stable sort keeps each bucket
    index-ordered), then each query distance-tests only its 27 neighbor
    cells' buckets and takes the first nsample by index.

    Replaces the CUDA spatial-search kernel TPU-natively with O(27*cap)
    work per query instead of O(N). Exact first-N semantics unless a
    bucket overflows ``capacity`` (hash collisions merge distant cells
    into one bucket; the 64k-bucket table holds ~2 cells/bucket at 150k
    points, and overflow drops only the HIGHEST-index members, which the
    first-N rule is least likely to need).
    """
    n = support_xyz.shape[0]
    k = new_xyz.shape[0]
    cell = jnp.maximum(jnp.asarray(radius, jnp.float32), 1e-3)
    if support_valid is None:
        support_valid = jnp.ones((n,), bool)

    origin = jnp.min(jnp.where(support_valid[:, None], support_xyz[:, :3],
                               jnp.inf), axis=0)
    origin = jnp.where(jnp.isfinite(origin), origin, 0.0)
    sc = jnp.floor((support_xyz[:, :3] - origin) / cell).astype(jnp.int32)
    h = jnp.where(support_valid, _cell_hash(sc, table_size),
                  jnp.int32(table_size))

    # stable sort by bucket: within-bucket order == support index order
    order = jnp.argsort(h, stable=True)
    h_s = h[order]
    # rank within the bucket run
    first = jnp.searchsorted(h_s, h_s, side="left")
    rank = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)
    keep = (h_s < table_size) & (rank < capacity)
    tgt = jnp.where(keep, h_s * capacity + rank, table_size * capacity)
    table = jnp.full((table_size * capacity + 1,), -1, jnp.int32).at[tgt].max(
        jnp.where(keep, order.astype(jnp.int32), -1))
    table = table[:table_size * capacity].reshape(table_size, capacity)

    # query: 27 neighbor cells -> candidate buckets -> distance + index sel
    offs = jnp.asarray(np.stack(np.meshgrid([-1, 0, 1], [-1, 0, 1],
                                            [-1, 0, 1],
                                            indexing="ij"),
                                axis=-1).reshape(27, 3), jnp.int32)
    qc = jnp.floor((new_xyz[:, :3] - origin) / cell).astype(jnp.int32)
    qh = _cell_hash(qc[:, None, :] + offs[None], table_size)   # (K, 27)
    # distinct probed cells can hash-collide onto the SAME bucket; keep
    # only the first probe of each bucket or its points duplicate
    dup = (qh[:, :, None] == qh[:, None, :]) & \
        (jnp.arange(27)[None, None, :] < jnp.arange(27)[None, :, None])
    probe_ok = ~dup.any(axis=2)                                 # (K, 27)
    cand = table[qh].reshape(k, 27 * capacity)                  # (K, 27*cap)
    cvalid = (cand >= 0) & jnp.repeat(probe_ok, capacity, axis=1)
    csafe = jnp.maximum(cand, 0)
    d2 = jnp.sum((support_xyz[csafe, :3] - new_xyz[:, None, :3]) ** 2,
                 axis=-1)
    ok = cvalid & (d2 <= radius * radius) & support_valid[csafe]
    big = jnp.int32(n + 1)
    key = jnp.where(ok, cand, big)
    neg, pos = jax.lax.top_k(-key, nsample)                    # smallest idx
    valid = (-neg) < big
    idx = jnp.take_along_axis(csafe, pos, axis=1)
    return jnp.where(valid, idx, 0).astype(jnp.int32), valid


def group_features(idx, valid, new_xyz, support_xyz, support_features=None):
    """Gather grouped relative-xyz (+features): -> (K, nsample, 3[+C]).

    Matches the reference QueryAndGroup: xyz is center-relative; empty slots
    zeroed; the caller max-pools with ``valid``.
    """
    safe = jnp.clip(idx, 0, support_xyz.shape[0] - 1)
    grouped_xyz = support_xyz[safe] - new_xyz[:, None, :]
    feats = [grouped_xyz]
    if support_features is not None:
        feats.append(support_features[safe])
    out = jnp.concatenate(feats, axis=-1)
    return jnp.where(valid[..., None], out, 0.0)


def masked_max_pool(x: jax.Array, valid: jax.Array) -> jax.Array:
    """(K, nsample, C), (K, nsample) -> (K, C) max over valid; 0 if empty."""
    neg = jnp.where(valid[..., None], x, -jnp.inf)
    out = neg.max(axis=1)
    return jnp.where(jnp.isfinite(out), out, 0.0)

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

from .sampling import pairwise_sqdist


@partial(jax.jit, static_argnames=("nsample", "chunk"))
def ball_query(new_xyz: jax.Array, support_xyz: jax.Array, radius: float,
               nsample: int, support_valid: jax.Array | None = None,
               chunk: int = 1024):
    """new_xyz (K, 3), support_xyz (N, 3) -> (idx (K, nsample) int32,
    valid (K, nsample) bool). Chunked over K to bound the (chunk, N) buffer."""
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

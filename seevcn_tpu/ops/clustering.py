"""Density clustering (DBSCAN-equivalent) on device.

Replaces the reference's per-object CPU calls to open3d ``cluster_dbscan``
(see/surface_completion/SEE_VCN.py:170-171, min_points=3;
see/.../vcn/utils/sampling.py:83-109, min_points=1/2). Those run one object
at a time on the host; here clustering is a fixed-iteration connected-
components label propagation over the eps-radius graph, batched with vmap.

DBSCAN semantics: a point is *core* iff its eps-ball holds >= min_points
points (itself included, matching open3d). Labels propagate only THROUGH
core points; border points adopt a neighboring core's label but do not
relay it. Non-core points with no core neighbor are noise (label -1).
With min_points <= 2 this reduces to exact connected components.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .sampling import pairwise_sqdist, tile_to_n


@partial(jax.jit, static_argnames=("min_points", "n_iters"))
def dbscan(points: jax.Array, eps: float, min_points: int = 1,
           valid: jax.Array | None = None, n_iters: int = 12) -> jax.Array:
    """points (N, 3) -> (N,) int32 labels; -1 = noise / invalid.

    Cluster ids are the index of each cluster's smallest member (stable,
    deterministic). ``n_iters`` rounds of neighbor-min + pointer jumping
    handle chain diameters up to ~2^n_iters.
    """
    n = points.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)

    eps = jnp.asarray(eps, dtype=points.dtype)
    adj = pairwise_sqdist(points, points) <= eps * eps
    adj = adj & valid[:, None] & valid[None, :]

    deg = adj.sum(axis=1)  # self included (d=0)
    core = (deg >= min_points) & valid

    big = jnp.int32(n)
    # connected components over the CORE subgraph only
    core_labels = jnp.where(core, jnp.arange(n, dtype=jnp.int32), big)
    core_adj = adj & core[:, None] & core[None, :]

    def body(_, labels):
        nbr_min = jnp.min(jnp.where(core_adj, labels[None, :], big), axis=1)
        labels = jnp.minimum(labels, nbr_min)
        # pointer jumping: labels index smaller core points
        labels = jnp.minimum(labels, labels[jnp.clip(labels, 0, n - 1)])
        return labels

    core_labels = jax.lax.fori_loop(0, n_iters, body, core_labels)

    # border points adopt the smallest neighboring core's cluster id;
    # their own index never becomes a cluster id
    border_label = jnp.min(
        jnp.where(adj & core[None, :], core_labels[None, :], big), axis=1)
    labels = jnp.where(core, core_labels, border_label)
    noise = ~valid | (labels >= big)
    return jnp.where(noise, -1, labels)


def largest_cluster_mask(labels: jax.Array) -> jax.Array:
    """(N,) labels -> (N,) bool mask of the biggest non-noise cluster."""
    n = labels.shape[0]
    safe = jnp.where(labels >= 0, labels, n)
    counts = jnp.zeros((n + 1,), dtype=jnp.int32).at[safe].add(1)
    best = jnp.argmax(counts[:n])
    return (labels == best) & (labels >= 0)


def best_cluster_mask(labels: jax.Array, weights: jax.Array) -> jax.Array:
    """(N,) labels + (N,) per-point weights -> bool mask of the cluster
    with the highest weight sum, ties broken by cluster size
    (lexicographic). With all-zero weights this degrades to
    ``largest_cluster_mask``. Used for mask-core cluster selection: score
    frustum clusters by how many of their points project into the
    heavily-shrunk mask interior, where the detected object dominates
    and background leakage at the mask edges cannot."""
    n = labels.shape[0]
    safe = jnp.where(labels >= 0, labels, n)
    counts = jnp.zeros((n + 1,), dtype=jnp.int32).at[safe].add(1)
    wsum = jnp.zeros((n + 1,), dtype=jnp.int32).at[safe].add(
        weights.astype(jnp.int32))
    score = wsum[:n] * (n + 1) + counts[:n]
    best = jnp.argmax(score)
    return (labels == best) & (labels >= 0)


def nearest_core_cluster_mask(labels: jax.Array, core: jax.Array,
                              points: jax.Array, min_core_pts: int = 3,
                              min_core_frac: float = 0.15,
                              merge_radius: float = 2.5) -> jax.Array:
    """Mask-core cluster selection with a nearest-surface prior.

    (N,) labels + (N,) bool core bits (points in the heavily-shrunk mask
    interior) + (N, 3) points -> bool mask. The camera sees the detected
    object, so the object is the NEAREST lidar surface along mask rays;
    background leakage (lidar-camera parallax lets farther ground/wall
    returns project inside the silhouette) is farther by construction
    and can out-count the object (round-5 maskpath frame 0: a 39 m
    ground strip with 61 core points beat the actual car at 10 m).

    Rule: among clusters holding >= ``min_core_pts`` AND
    >= ``min_core_frac`` of all core points, seed on the one with the
    smallest mean core range; then merge in any core-supported cluster
    whose centroid lies within ``merge_radius`` of the seed centroid
    (dbscan splits a car's near face from its roof at adaptive eps).
    With no eligible cluster, falls back to the core/size vote of
    ``best_cluster_mask``.
    """
    n = labels.shape[0]
    safe = jnp.where(labels >= 0, labels, n)
    counts = jnp.zeros((n + 1,), jnp.int32).at[safe].add(1)
    wsum = jnp.zeros((n + 1,), jnp.int32).at[safe].add(
        core.astype(jnp.int32))
    rng = jnp.linalg.norm(points, axis=-1)
    rsum = jnp.zeros((n + 1,), points.dtype).at[safe].add(
        jnp.where(core, rng, 0.0))
    csum = jnp.zeros((n + 1, 3), points.dtype).at[safe].add(points)
    centroid = csum[:n] / jnp.maximum(counts[:n], 1)[:, None]
    mean_core_r = rsum[:n] / jnp.maximum(wsum[:n], 1)

    total_core = wsum[:n].sum()
    eligible = ((wsum[:n] >= min_core_pts) &
                (wsum[:n] >= min_core_frac * total_core) &
                (counts[:n] > 0))
    seed_near = jnp.argmin(jnp.where(eligible, mean_core_r, jnp.inf))
    seed_vote = jnp.argmax(wsum[:n] * (n + 1) + counts[:n])
    seed = jnp.where(eligible.any(), seed_near, seed_vote)

    d2 = ((centroid - centroid[seed]) ** 2).sum(-1)
    keep = ((d2 <= merge_radius * merge_radius) &
            (wsum[:n] >= min_core_pts))
    keep = keep.at[seed].set(True)
    return keep[jnp.clip(labels, 0, n - 1)] & (labels >= 0)


@partial(jax.jit, static_argnames=("min_points", "total_pts", "n_iters"))
def largest_cluster_batch(points: jax.Array, eps: float, min_points: int = 2,
                          total_pts: int = 1024, valid: jax.Array | None = None,
                          n_iters: int = 12) -> jax.Array:
    """Batched largest-cluster extraction with fixed-size tiled output.

    points (B, N, 3) -> (B, total_pts, 3); device analog of
    sampling.py:get_largest_cluster_batch.
    """
    if valid is None:
        valid = jnp.ones(points.shape[:2], dtype=bool)

    def one(p, v):
        labels = dbscan(p, eps, min_points=min_points, valid=v, n_iters=n_iters)
        mask = largest_cluster_mask(labels)
        # if everything was noise, fall back to the valid points themselves
        mask = jnp.where(jnp.any(mask), mask, v)
        out, _ = tile_to_n(p, mask, total_pts)
        return out

    return jax.vmap(one)(points, valid)

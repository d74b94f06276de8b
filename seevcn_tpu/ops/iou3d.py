"""Rotated-box intersection / IoU on device — XLA replacement for the
reference CUDA kernels (detector3d/pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu
and the duplicate under see/.../vcn/extensions/iou3d_nms/).

The CUDA kernel walks polygon edges with branchy scalar code per thread. On
TPU we use a sort-free, branch-free formulation: the shoelace integral of a
convex intersection A∩B decomposes over its oriented boundary, which consists
of (a) the pieces of A's edges inside B and (b) the pieces of B's edges
inside A. Each piece is found by clipping a parametric edge against the 4
half-planes of the other box (two max/min reductions), and its signed
contribution cross(start, end)/2 is order-independent — so no vertex sort,
no candidate buffers, pure elementwise math that vectorizes to (N, M) pairs
with O(1) registers per pair. (A first sort-based implementation padded a
(N, M, 24) buffer 5.3x on the minor axis and blew HBM at N=M=4096.)

Shared-boundary double-counting (identical boxes) is avoided by eps-shrinking
the half-planes for the B-edges-in-A pass.

All public functions accept (N, 7) / (M, 7) boxes
[x, y, z, dx, dy, dz, heading] and are jit/vmap-safe.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geom.boxes import corners_bev

_EPS = 1e-5  # f32 tolerance for boundary tests (coordinates are pre-centered)


def _edges_in_poly_area(P: jax.Array, Q: jax.Array, shrink: float) -> jax.Array:
    """Signed shoelace contribution of P's edges clipped to convex ccw quad Q.

    P, Q: (4, 2). ``shrink`` pulls Q's half-planes inward (used on the second
    pass to avoid double-counting shared boundary segments).
    """
    p1 = P                                   # (4, 2) edge starts
    dp = jnp.roll(P, -1, axis=0) - P         # (4, 2) edge vectors
    v = Q[None, :, :]                        # (1, 4, 2) clip-edge starts
    e = (jnp.roll(Q, -1, axis=0) - Q)[None]  # (1, 4, 2) clip-edge vectors

    # f(t) = a + t*b >= 0  <=>  x(t) inside half-plane of clip edge
    rel = p1[:, None, :] - v                 # (4, 4, 2)
    a = e[..., 0] * rel[..., 1] - e[..., 1] * rel[..., 0] - shrink   # (4, 4)
    b = e[..., 0] * dp[:, None, 1] - e[..., 1] * dp[:, None, 0]      # (4, 4)

    ratio = -a / jnp.where(jnp.abs(b) < _EPS, 1.0, b)
    lo = jnp.where(b > _EPS, ratio, 0.0)
    hi = jnp.where(b < -_EPS, ratio, 1.0)
    # parallel & outside -> empty interval
    empty = (jnp.abs(b) <= _EPS) & (a < -_EPS)
    t0 = jnp.maximum(jnp.max(lo, axis=1), 0.0)
    t1 = jnp.minimum(jnp.min(hi, axis=1), 1.0)
    valid = (t1 > t0) & ~jnp.any(empty, axis=1)

    x0 = p1 + t0[:, None] * dp
    x1 = p1 + t1[:, None] * dp
    contrib = 0.5 * (x0[:, 0] * x1[:, 1] - x0[:, 1] * x1[:, 0])
    return jnp.sum(jnp.where(valid, contrib, 0.0))


def _pair_intersection_area(ca: jax.Array, cb: jax.Array) -> jax.Array:
    """Intersection area of two convex ccw quads, each (4, 2)."""
    # Work in pair-local coordinates: at |xy| ~ 75 m the f32 cancellation in
    # boundary cross-products is larger than any usable epsilon.
    offset = ca.mean(axis=0)
    ca = ca - offset
    cb = cb - offset
    area = _edges_in_poly_area(ca, cb, 0.0) + _edges_in_poly_area(cb, ca, 4 * _EPS)
    return jnp.maximum(area, 0.0)


def _overlap_matrix(corners_a: jax.Array, corners_b: jax.Array) -> jax.Array:
    """(N, 4, 2) x (M, 4, 2) -> (N, M) intersection areas."""
    return jax.vmap(lambda ca: jax.vmap(lambda cb: _pair_intersection_area(ca, cb))(corners_b))(corners_a)


@partial(jax.jit, static_argnames=("row_chunk",))
def boxes_overlap_bev(boxes_a: jax.Array, boxes_b: jax.Array, row_chunk: int | None = None) -> jax.Array:
    """(N, M) rotated BEV intersection areas (reference boxes_overlap_bev_gpu).

    ``row_chunk`` trades peak memory for sequential steps on huge N*M
    (candidate buffers are 24 points per pair).
    """
    ca = corners_bev(boxes_a)
    cb = corners_bev(boxes_b)
    if row_chunk is None or ca.shape[0] <= row_chunk:
        return _overlap_matrix(ca, cb)
    n = ca.shape[0]
    pad = (-n) % row_chunk
    ca_p = jnp.pad(ca, ((0, pad), (0, 0), (0, 0)))
    chunks = ca_p.reshape(-1, row_chunk, 4, 2)
    out = jax.lax.map(lambda c: _overlap_matrix(c, cb), chunks)
    return out.reshape(-1, cb.shape[0])[:n]


@partial(jax.jit, static_argnames=("row_chunk",))
def boxes_iou_bev(boxes_a: jax.Array, boxes_b: jax.Array, row_chunk: int | None = None) -> jax.Array:
    """(N, M) rotated BEV IoU (reference boxes_iou_bev_gpu / iou_bev)."""
    inter = boxes_overlap_bev(boxes_a, boxes_b, row_chunk=row_chunk)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return inter / jnp.maximum(area_a + area_b - inter, 1e-7)


@partial(jax.jit, static_argnames=("row_chunk",))
def boxes_iou3d(boxes_a: jax.Array, boxes_b: jax.Array, row_chunk: int | None = None) -> jax.Array:
    """(N, M) 3D IoU: BEV overlap x z-extent overlap over union of volumes
    (reference iou3d_nms_utils.boxes_iou3d_gpu)."""
    inter_bev = boxes_overlap_bev(boxes_a, boxes_b, row_chunk=row_chunk)
    a_max = (boxes_a[:, 2] + boxes_a[:, 5] / 2)[:, None]
    a_min = (boxes_a[:, 2] - boxes_a[:, 5] / 2)[:, None]
    b_max = (boxes_b[:, 2] + boxes_b[:, 5] / 2)[None, :]
    b_min = (boxes_b[:, 2] - boxes_b[:, 5] / 2)[None, :]
    inter_h = jnp.clip(jnp.minimum(a_max, b_max) - jnp.maximum(a_min, b_min), 0)
    inter_3d = inter_bev * inter_h
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return inter_3d / jnp.maximum(vol_a + vol_b - inter_3d, 1e-6)


def boxes_iou_bev_aligned_pair(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Element-wise (N,) rotated BEV IoU of paired boxes."""
    ca = corners_bev(boxes_a)
    cb = corners_bev(boxes_b)
    inter = jax.vmap(_pair_intersection_area)(ca, cb)
    area_a = boxes_a[:, 3] * boxes_a[:, 4]
    area_b = boxes_b[:, 3] * boxes_b[:, 4]
    return inter / jnp.maximum(area_a + area_b - inter, 1e-7)

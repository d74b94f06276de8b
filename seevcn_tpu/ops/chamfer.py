"""Chamfer distances as plain XLA (no custom kernel needed on TPU).

Replaces the reference CUDA extension (see/.../vcn/extensions/chamfer_dist/
{chamfer.cu,chamfer_cuda.cpp} + __init__.py:28-84). The (B, N, M) pairwise
min reduces fine under XLA fusion and autodiff-through-min reproduces the
hand-written backward.

Mask-aware: padded points are excluded from both the min and the mean, which
subsumes the reference's ``ignore_zeros`` option.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .sampling import pairwise_sqdist


def chamfer_sq(xyz1: jax.Array, xyz2: jax.Array,
               valid1: jax.Array | None = None, valid2: jax.Array | None = None):
    """Per-point squared NN distances both ways.

    xyz1 (B, N, 3), xyz2 (B, M, 3) -> dist1 (B, N), dist2 (B, M).
    """
    d = pairwise_sqdist(xyz1, xyz2)  # (B, N, M)
    if valid2 is not None:
        d = jnp.where(valid2[:, None, :], d, jnp.inf)
    dist1 = jnp.min(d, axis=-1)
    d_t = jnp.swapaxes(d, -1, -2) if valid2 is None else jnp.swapaxes(
        pairwise_sqdist(xyz1, xyz2), -1, -2)
    if valid1 is not None:
        d_t = jnp.where(valid1[:, None, :], d_t, jnp.inf)
    dist2 = jnp.min(d_t, axis=-1)
    if valid1 is not None:
        dist1 = jnp.where(valid1, dist1, 0.0)
    if valid2 is not None:
        dist2 = jnp.where(valid2, dist2, 0.0)
    return dist1, dist2


def _masked_mean(x, mask):
    if mask is None:
        return jnp.mean(x)
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def chamfer_l2(xyz1, xyz2, valid1=None, valid2=None):
    """mean(sq-NN 1->2) + mean(sq-NN 2->1)   (ChamferDistanceL2)."""
    d1, d2 = chamfer_sq(xyz1, xyz2, valid1, valid2)
    return _masked_mean(d1, valid1) + _masked_mean(d2, valid2)


def chamfer_l2_split(xyz1, xyz2, valid1=None, valid2=None):
    d1, d2 = chamfer_sq(xyz1, xyz2, valid1, valid2)
    return _masked_mean(d1, valid1), _masked_mean(d2, valid2)


def chamfer_l1(xyz1, xyz2, valid1=None, valid2=None):
    """(mean(NN-dist 1->2) + mean(NN-dist 2->1)) / 2   (ChamferDistanceL1)."""
    d1, d2 = chamfer_sq(xyz1, xyz2, valid1, valid2)
    eps = 1e-12  # sqrt grad guard at 0
    m1 = _masked_mean(jnp.sqrt(d1 + eps), valid1)
    m2 = _masked_mean(jnp.sqrt(d2 + eps), valid2)
    return (m1 + m2) / 2

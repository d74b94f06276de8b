"""Pointcloud / pose transforms, pure JAX, batched and jit-friendly.

Covers the reference's transform layer:
  * see/surface_completion/models/vcn/utils/transform.py:6-187
    (rot_from_heading, rotate_points_along_z, vc_to_cn, cn_to_vc,
     normalize_scale, restore_scale, rotm_to_heading)
  * detector3d/pcdet/utils/common_utils.py:22-60 (limit_period,
     rotate_points_along_z)
  * see/.../models/vcn/models/VCN_VC.py:36-49 (ortho-6D -> rotation matrix)

Angle convention: heading is measured about +z, increasing x -> y
(anti-clockwise when viewed from above).  ``rotate_points_along_z(p, a)``
rotates points *by* ``a`` (canonical -> view-centric); use ``-a`` for
view-centric -> canonical.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rot_z(angle: jax.Array) -> jax.Array:
    """(...,) heading -> (..., 3, 3) rotation matrix about z.

    Acts on *row-vector* points: ``p_rot = p @ rot_z(a)`` rotates p by +a.
    (This matches the reference's row-vector convention, transform.py:26-31.)
    """
    c, s = jnp.cos(angle), jnp.sin(angle)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [c, s, z,
         -s, c, z,
         z, z, o], axis=-1).reshape(*angle.shape, 3, 3)


def rotate_points_along_z_np(points: np.ndarray, angle: np.ndarray) -> np.ndarray:
    """numpy twin of rotate_points_along_z for host-side data transforms.
    points (B, N, 3), angle (B,)."""
    c, s = np.cos(angle), np.sin(angle)
    out = points.copy()
    x, y = points[..., 0], points[..., 1]
    out[..., 0] = x * c[:, None] - y * s[:, None]
    out[..., 1] = x * s[:, None] + y * c[:, None]
    return out


def rotate_points_along_z(points: jax.Array, angle: jax.Array) -> jax.Array:
    """Rotate (..., N, 3+C) points by (...,) angle about z. Extra feature
    channels beyond xyz pass through unchanged.

    Geometry matmuls run at f32 precision even on TPU (bf16 MXU rounding
    would cost ~1e-3 absolute error on coordinates, visible in AP parity).
    """
    rot = rot_z(angle)
    xyz = jnp.matmul(points[..., :3], rot, precision=jax.lax.Precision.HIGHEST)
    return jnp.concatenate([xyz, points[..., 3:]], axis=-1)


def limit_period(val: jax.Array, offset: float = 0.5, period: float = np.pi) -> jax.Array:
    """Wrap val into [-offset*period, (1-offset)*period)."""
    return val - jnp.floor(val / period + offset) * period


# ---------------------------------------------------------------------------
# Viewer-centric <-> canonical object frames (VCN)
# ---------------------------------------------------------------------------

def vc_to_cn(points: jax.Array, gt_boxes: jax.Array) -> jax.Array:
    """Sensor (view-centric) -> canonical object frame via GT box.

    points: (B, N, 3); gt_boxes: (B, 7) [x y z dx dy dz heading].
    """
    centre = gt_boxes[:, None, :3]
    return rotate_points_along_z(points - centre, -gt_boxes[:, -1])


def cn_to_vc(points: jax.Array, gt_boxes: jax.Array) -> jax.Array:
    """Canonical object frame -> sensor frame via GT box."""
    return rotate_points_along_z(points, gt_boxes[:, -1]) + gt_boxes[:, None, :3]


def normalize_scale(points: jax.Array, gt_boxes: jax.Array) -> jax.Array:
    """Scale-normalize canonical points by box length (gt dx)."""
    return points / gt_boxes[:, 3].reshape(-1, 1, 1)


def restore_scale(points: jax.Array, gt_boxes: jax.Array) -> jax.Array:
    return points * gt_boxes[:, 3].reshape(-1, 1, 1)


def vc_to_cn_rt(points: jax.Array, rot: jax.Array, trans: jax.Array) -> jax.Array:
    """VC -> CN with explicit (B,3,3) rotation + (B,[1,]3) translation."""
    if trans.ndim == 2:
        trans = trans[:, None, :]
    return (points - trans) @ jnp.swapaxes(rot, -1, -2)


def cn_to_vc_rt(points: jax.Array, rot: jax.Array, trans: jax.Array) -> jax.Array:
    if trans.ndim == 2:
        trans = trans[:, None, :]
    return points @ rot + trans


# ---------------------------------------------------------------------------
# Rotation representations
# ---------------------------------------------------------------------------

def rotation_matrix_from_ortho6d(ortho6d: jax.Array) -> jax.Array:
    """Continuous 6D rotation parameterisation (Zhou et al. 2019) -> (B,3,3).

    Column-stacked Gram–Schmidt, matching VCN_VC.py:36-49 so imported
    checkpoints regress identical poses.
    """
    x_raw, y_raw = ortho6d[:, 0:3], ortho6d[:, 3:6]
    x = x_raw / jnp.maximum(jnp.linalg.norm(x_raw, axis=1, keepdims=True), 1e-8)
    z = jnp.cross(x, y_raw)
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=1, keepdims=True), 1e-8)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)  # columns are x,y,z


def heading_from_rotm(R: jax.Array) -> jax.Array:
    """(B,3,3) rotation matrix -> heading about z in [-pi, pi].

    Applies R to e_x (row-vector convention) and reads off atan2, the
    geometric equivalent of transform.py:163-187.
    """
    v = R[:, 0, :]  # e_x @ R
    return jnp.arctan2(v[:, 1], v[:, 0])


def geodesic_distance(R1: jax.Array, R2: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Angle of the relative rotation between two (B,3,3) matrices.

    Reference: see/.../models/vcn/utils/losses.py:7 (geodesic rotation loss).
    """
    m = R1 @ jnp.swapaxes(R2, -1, -2)
    cos = (jnp.trace(m, axis1=-2, axis2=-1) - 1.0) / 2.0
    return jnp.arccos(jnp.clip(cos, -1.0 + eps, 1.0 - eps))

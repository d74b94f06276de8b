"""3D box geometry, pure JAX, batched.

Replaces the reference's box layer:
  * detector3d/pcdet/utils/box_utils.py:28-335 (corners, range masks,
    aligned-BEV IoU, camera<->lidar conversions)
  * detector3d/pcdet/ops/roiaware_pool3d (points_in_boxes_* — here a
    closed-form vectorized rotated-box containment test instead of CUDA)

Box convention (lidar frame): (x, y, z, dx, dy, dz, heading) with (x,y,z)
the box *center* and heading about +z increasing x->y.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .transforms import limit_period, rotate_points_along_z

# Corner ordering matches reference box_utils.py:28-53:
#     7 -------- 4
#    /|         /|
#   6 -------- 5 .
#   | |        | |
#   . 3 -------- 0
#   |/         |/
#   2 -------- 1
_CORNER_TEMPLATE = np.array(
    [[1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
     [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1]], dtype=np.float32) / 2


def boxes_to_corners_3d(boxes3d: jax.Array) -> jax.Array:
    """(N, 7) -> (N, 8, 3) box corners in lidar frame."""
    template = jnp.asarray(_CORNER_TEMPLATE, dtype=boxes3d.dtype)
    corners = boxes3d[:, None, 3:6] * template[None]
    corners = rotate_points_along_z(corners, boxes3d[:, 6])
    return corners + boxes3d[:, None, 0:3]


def corners_bev(boxes: jax.Array) -> jax.Array:
    """(..., 7) -> (..., 4, 2) BEV footprint corners, counter-clockwise."""
    # ccw order for positive shoelace area: (+,+), (-,+), (-,-), (+,-)
    template = jnp.asarray(
        [[0.5, 0.5], [-0.5, 0.5], [-0.5, -0.5], [0.5, -0.5]], dtype=boxes.dtype)
    pts = boxes[..., None, 3:5] * template
    c, s = jnp.cos(boxes[..., 6]), jnp.sin(boxes[..., 6])
    rot = jnp.stack([jnp.stack([c, s], -1), jnp.stack([-s, c], -1)], -2)
    return pts @ rot + boxes[..., None, 0:2]


def mask_boxes_outside_range(boxes: jax.Array, limit_range, min_num_corners: int = 1) -> jax.Array:
    """(N, 7+) boxes, [x0 y0 z0 x1 y1 z1] -> (N,) bool keep mask."""
    lr = jnp.asarray(limit_range, dtype=boxes.dtype)
    corners = boxes_to_corners_3d(boxes[:, :7])
    inside = jnp.all((corners >= lr[0:3]) & (corners <= lr[3:6]), axis=2)
    return inside.sum(axis=1) >= min_num_corners


def enlarge_box3d(boxes3d: jax.Array, extra_width=(0.0, 0.0, 0.0)) -> jax.Array:
    extra = jnp.asarray(extra_width, dtype=boxes3d.dtype)
    return boxes3d.at[:, 3:6].add(extra[None])


# ---------------------------------------------------------------------------
# Point-in-rotated-box (replaces roiaware_pool3d points_in_boxes CUDA kernel)
# ---------------------------------------------------------------------------

def points_in_boxes(points: jax.Array, boxes: jax.Array) -> jax.Array:
    """Rotated-box containment test.

    points: (N, 3+), boxes: (M, 7). Returns (M, N) bool.
    Matches the reference convention: z-extent is [z_c - dz/2, z_c + dz/2],
    xy via inverse-heading rotation into the box frame.
    """
    rel = points[None, :, :3] - boxes[:, None, :3]  # (M, N, 3)
    local = rotate_points_along_z(rel, -boxes[:, 6])
    half = boxes[:, None, 3:6] / 2
    inside = jnp.all(jnp.abs(local) <= half, axis=-1)
    return inside


def points_in_boxes_count(points: jax.Array, boxes: jax.Array,
                          point_mask: jax.Array | None = None) -> jax.Array:
    """(M,) number of valid points inside each box."""
    inside = points_in_boxes(points, boxes)
    if point_mask is not None:
        inside = inside & point_mask[None, :]
    return inside.sum(axis=1)


# ---------------------------------------------------------------------------
# Axis-aligned "nearest" BEV IoU (used by the anchor target assigner when
# MATCH_HEIGHT=False; reference box_utils.py:286-335)
# ---------------------------------------------------------------------------

def boxes3d_to_aligned_bev(boxes3d: jax.Array) -> jax.Array:
    """Snap each rotated box to its nearest axis-aligned BEV box (N, 4)."""
    rot = jnp.abs(limit_period(boxes3d[:, 6], offset=0.5, period=np.pi))
    swap = rot[:, None] >= np.pi / 4
    dims = jnp.where(swap, boxes3d[:, [4, 3]], boxes3d[:, [3, 4]])
    return jnp.concatenate([boxes3d[:, 0:2] - dims / 2, boxes3d[:, 0:2] + dims / 2], axis=1)


def boxes_iou_normal(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Axis-aligned IoU, (N, 4) x (M, 4) -> (N, M)."""
    x_min = jnp.maximum(boxes_a[:, None, 0], boxes_b[None, :, 0])
    x_max = jnp.minimum(boxes_a[:, None, 2], boxes_b[None, :, 2])
    y_min = jnp.maximum(boxes_a[:, None, 1], boxes_b[None, :, 1])
    y_max = jnp.minimum(boxes_a[:, None, 3], boxes_b[None, :, 3])
    inter = jnp.clip(x_max - x_min, 0) * jnp.clip(y_max - y_min, 0)
    area_a = (boxes_a[:, 2] - boxes_a[:, 0]) * (boxes_a[:, 3] - boxes_a[:, 1])
    area_b = (boxes_b[:, 2] - boxes_b[:, 0]) * (boxes_b[:, 3] - boxes_b[:, 1])
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-6)


def boxes3d_nearest_bev_iou(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """(N, 7) x (M, 7) -> (N, M) aligned-BEV IoU."""
    return boxes_iou_normal(boxes3d_to_aligned_bev(boxes_a), boxes3d_to_aligned_bev(boxes_b))


# ---------------------------------------------------------------------------
# KITTI camera <-> lidar box conversions (host-side numpy; reference
# box_utils.py:129-283). KITTI camera box: (x, y, z, l, h, w, ry) with y the
# bottom-face center in rect coords.
# ---------------------------------------------------------------------------

def boxes3d_lidar_to_kitti_camera(boxes3d_lidar: np.ndarray, calib) -> np.ndarray:
    b = np.array(boxes3d_lidar, dtype=np.float64, copy=True)
    xyz, l, w, h, r = b[:, 0:3], b[:, 3:4], b[:, 4:5], b[:, 5:6], b[:, 6:7]
    xyz[:, 2] -= h[:, 0] / 2  # center -> bottom
    xyz_cam = calib.lidar_to_rect(xyz)
    r = -r - np.pi / 2
    return np.concatenate([xyz_cam, l, h, w, r], axis=-1)


def boxes3d_kitti_camera_to_lidar(boxes3d_camera: np.ndarray, calib) -> np.ndarray:
    b = np.array(boxes3d_camera, dtype=np.float64, copy=True)
    xyz_cam, r = b[:, 0:3], b[:, 6:7]
    l, h, w = b[:, 3:4], b[:, 4:5], b[:, 5:6]
    xyz = calib.rect_to_lidar(xyz_cam)
    xyz[:, 2] += h[:, 0] / 2  # bottom -> center
    return np.concatenate([xyz, l, w, h, -(r + np.pi / 2)], axis=-1)


def boxes3d_to_corners3d_kitti_camera(boxes3d: np.ndarray, bottom_center: bool = True) -> np.ndarray:
    """(N, 7) camera boxes -> (N, 8, 3) corners in rect coords."""
    n = boxes3d.shape[0]
    l, h, w = boxes3d[:, 3], boxes3d[:, 4], boxes3d[:, 5]
    x_c = np.stack([l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2, -l / 2, -l / 2], axis=1)
    z_c = np.stack([w / 2, -w / 2, -w / 2, w / 2, w / 2, -w / 2, -w / 2, w / 2], axis=1)
    if bottom_center:
        y_c = np.zeros((n, 8), dtype=boxes3d.dtype)
        y_c[:, 4:8] = -h[:, None]
    else:
        y_c = np.stack([h / 2] * 4 + [-h / 2] * 4, axis=1)
    ry = boxes3d[:, 6]
    zeros, ones = np.zeros_like(ry), np.ones_like(ry)
    rot = np.stack([
        np.stack([np.cos(ry), zeros, -np.sin(ry)], 1),
        np.stack([zeros, ones, zeros], 1),
        np.stack([np.sin(ry), zeros, np.cos(ry)], 1)], axis=1)  # (N, 3, 3)
    corners = np.stack([x_c, y_c, z_c], axis=2) @ rot  # (N, 8, 3)
    return (corners + boxes3d[:, None, 0:3]).astype(np.float32)


def boxes3d_kitti_camera_to_imageboxes(boxes3d: np.ndarray, calib, image_shape=None) -> np.ndarray:
    """(N, 7) camera boxes -> (N, 4) [x1 y1 x2 y2] image boxes."""
    corners3d = boxes3d_to_corners3d_kitti_camera(boxes3d)
    pts_img, _ = calib.rect_to_img(corners3d.reshape(-1, 3))
    uv = pts_img.reshape(-1, 8, 2)
    boxes2d = np.concatenate([uv.min(axis=1), uv.max(axis=1)], axis=1)
    if image_shape is not None:
        boxes2d[:, [0, 2]] = np.clip(boxes2d[:, [0, 2]], 0, image_shape[1] - 1)
        boxes2d[:, [1, 3]] = np.clip(boxes2d[:, [1, 3]], 0, image_shape[0] - 1)
    return boxes2d

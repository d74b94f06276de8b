import numpy as np
import jax.numpy as jnp
import pytest

from seevcn_tpu.geom import transforms as T
from seevcn_tpu.geom import boxes as B


def test_rotate_points_along_z_roundtrip():
    rng = np.random.RandomState(0)
    pts = rng.randn(4, 100, 5).astype(np.float32)
    ang = rng.uniform(-np.pi, np.pi, 4).astype(np.float32)
    out = T.rotate_points_along_z(jnp.asarray(pts), jnp.asarray(ang))
    back = T.rotate_points_along_z(out, -jnp.asarray(ang))
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-4)
    # features untouched
    np.testing.assert_allclose(np.asarray(out)[..., 3:], pts[..., 3:], atol=0)


def test_rotate_points_known_angle():
    # +90deg about z maps e_x -> e_y (x->y convention)
    p = jnp.asarray([[[1.0, 0.0, 0.0]]])
    out = T.rotate_points_along_z(p, jnp.asarray([np.pi / 2]))
    np.testing.assert_allclose(np.asarray(out)[0, 0], [0, 1, 0], atol=1e-6)


def test_limit_period():
    v = jnp.asarray([0.1, np.pi + 0.1, -np.pi - 0.1, 3 * np.pi])
    out = np.asarray(T.limit_period(v, 0.5, np.pi))
    assert np.all(out >= -np.pi / 2 - 1e-6) and np.all(out < np.pi / 2 + 1e-6)


def test_vc_cn_roundtrip():
    rng = np.random.RandomState(1)
    pts = rng.randn(8, 64, 3).astype(np.float32)
    boxes = np.concatenate([
        rng.randn(8, 3), rng.uniform(1, 4, (8, 3)), rng.uniform(-np.pi, np.pi, (8, 1))
    ], axis=1).astype(np.float32)
    cn = T.vc_to_cn(jnp.asarray(pts), jnp.asarray(boxes))
    vc = T.cn_to_vc(cn, jnp.asarray(boxes))
    np.testing.assert_allclose(np.asarray(vc), pts, atol=1e-4)
    s = T.normalize_scale(cn, jnp.asarray(boxes))
    r = T.restore_scale(s, jnp.asarray(boxes))
    np.testing.assert_allclose(np.asarray(r), np.asarray(cn), atol=1e-5)


def test_ortho6d_identity_and_heading():
    o6 = jnp.asarray([[1.0, 0, 0, 0, 1.0, 0]])
    R = T.rotation_matrix_from_ortho6d(o6)
    np.testing.assert_allclose(np.asarray(R)[0], np.eye(3), atol=1e-6)
    # rot_z matrices should round-trip through heading extraction
    ang = jnp.asarray([0.3, -1.2, 2.9])
    R = T.rot_z(ang)
    h = T.heading_from_rotm(R)
    np.testing.assert_allclose(np.asarray(h), np.asarray(ang), atol=1e-5)


def test_geodesic_distance():
    a = T.rot_z(jnp.asarray([0.0, 0.5]))
    b = T.rot_z(jnp.asarray([0.5, 0.5]))
    d = np.asarray(T.geodesic_distance(a, b))
    np.testing.assert_allclose(d, [0.5, 0.0], atol=1e-3)


def test_corners_shape_and_axis_aligned():
    box = jnp.asarray([[0.0, 0, 0, 4, 2, 1.5, 0]])
    c = np.asarray(B.boxes_to_corners_3d(box))
    assert c.shape == (1, 8, 3)
    np.testing.assert_allclose(c[:, :, 0].max(), 2.0, atol=1e-6)
    np.testing.assert_allclose(c[:, :, 1].min(), -1.0, atol=1e-6)
    np.testing.assert_allclose(c[:, :, 2].max(), 0.75, atol=1e-6)


def test_corners_bev_ccw():
    boxes = jnp.asarray([[1.0, 2, 0, 4, 2, 1, 0.7]])
    c = np.asarray(B.corners_bev(boxes))[0]
    # shoelace area must be positive (ccw) and equal dx*dy
    area = 0.5 * np.sum(c[:, 0] * np.roll(c[:, 1], -1) - c[:, 1] * np.roll(c[:, 0], -1))
    np.testing.assert_allclose(area, 8.0, atol=1e-5)


def test_points_in_boxes():
    boxes = jnp.asarray([[0.0, 0, 0, 2, 2, 2, np.pi / 4]])
    pts = jnp.asarray([
        [0.0, 0, 0],    # center: inside
        [1.2, 0, 0],    # beyond rotated half-diag in x? dist 1.2 < sqrt(2): inside
        [1.5, 0, 0],    # outside
        [0, 0, 1.5],    # above: outside
    ])
    m = np.asarray(B.points_in_boxes(pts, boxes))[0]
    assert m.tolist() == [True, True, False, False]


def test_nearest_bev_iou_axis_aligned():
    a = jnp.asarray([[0.0, 0, 0, 2, 2, 2, 0]])
    b = jnp.asarray([[1.0, 0, 5, 2, 2, 2, 0]])  # z irrelevant for BEV
    iou = np.asarray(B.boxes3d_nearest_bev_iou(a, b))
    np.testing.assert_allclose(iou[0, 0], 2.0 / 6.0, atol=1e-5)


def test_mask_boxes_outside_range():
    boxes = jnp.asarray([
        [0.0, 0, 0, 2, 2, 2, 0],
        [100.0, 0, 0, 2, 2, 2, 0],
    ])
    m = np.asarray(B.mask_boxes_outside_range(boxes, [-10, -10, -10, 10, 10, 10]))
    assert m.tolist() == [True, False]


def test_camera_lidar_roundtrip():
    class FakeCalib:
        # rect = R @ lidar + t with a simple axis permutation (x_cam=-y_l, y_cam=-z_l, z_cam=x_l)
        M = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], dtype=np.float64)

        def lidar_to_rect(self, pts):
            return pts @ self.M.T

        def rect_to_lidar(self, pts):
            return pts @ self.M

    rng = np.random.RandomState(2)
    boxes = np.concatenate([
        rng.uniform(-20, 20, (5, 2)), rng.uniform(-2, 0, (5, 1)),
        rng.uniform(1.5, 4.5, (5, 3)), rng.uniform(-np.pi, np.pi, (5, 1))
    ], axis=1)
    cam = B.boxes3d_lidar_to_kitti_camera(boxes, FakeCalib())
    back = B.boxes3d_kitti_camera_to_lidar(cam, FakeCalib())
    np.testing.assert_allclose(back[:, :6], boxes[:, :6], atol=1e-6)
    # headings equal mod 2pi
    d = (back[:, 6] - boxes[:, 6]) % (2 * np.pi)
    d = np.minimum(d, 2 * np.pi - d)
    np.testing.assert_allclose(d, 0, atol=1e-6)

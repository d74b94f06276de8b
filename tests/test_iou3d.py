import numpy as np
import jax.numpy as jnp

from seevcn_tpu.ops import iou3d
from seevcn_tpu.ops.nms import nms_bev


def _raster_iou_bev(box_a, box_b, res=400):
    """Slow dense-grid reference for rotated BEV IoU."""
    def inside(box, xs, ys):
        x, y, _, dx, dy, _, r = box
        c, s = np.cos(-r), np.sin(-r)
        lx = (xs - x) * c - (ys - y) * s
        ly = (xs - x) * s + (ys - y) * c
        return (np.abs(lx) <= dx / 2) & (np.abs(ly) <= dy / 2)

    all_x = np.concatenate([[box_a[0] - 5, box_a[0] + 5], [box_b[0] - 5, box_b[0] + 5]])
    all_y = np.concatenate([[box_a[1] - 5, box_a[1] + 5], [box_b[1] - 5, box_b[1] + 5]])
    xs = np.linspace(all_x.min(), all_x.max(), res)
    ys = np.linspace(all_y.min(), all_y.max(), res)
    X, Y = np.meshgrid(xs, ys)
    a = inside(box_a, X, Y)
    b = inside(box_b, X, Y)
    inter = (a & b).sum()
    union = (a | b).sum()
    return inter / max(union, 1)


def test_identical_boxes():
    b = jnp.asarray([[1.0, 2, 0, 4, 2, 1.5, 0.6]])
    iou = np.asarray(iou3d.boxes_iou_bev(b, b))
    np.testing.assert_allclose(iou, [[1.0]], atol=1e-4)
    iou3 = np.asarray(iou3d.boxes_iou3d(b, b))
    np.testing.assert_allclose(iou3, [[1.0]], atol=1e-4)


def test_disjoint_boxes():
    a = jnp.asarray([[0.0, 0, 0, 2, 2, 2, 0.3]])
    b = jnp.asarray([[10.0, 10, 0, 2, 2, 2, -0.8]])
    np.testing.assert_allclose(np.asarray(iou3d.boxes_iou_bev(a, b)), [[0.0]], atol=1e-6)


def test_axis_aligned_analytic():
    a = jnp.asarray([[0.0, 0, 0, 2, 2, 2, 0]])
    b = jnp.asarray([[1.0, 1, 0, 2, 2, 2, 0]])
    # intersection 1x1=1, union 4+4-1=7
    np.testing.assert_allclose(np.asarray(iou3d.boxes_iou_bev(a, b)), [[1 / 7]], atol=1e-4)


def test_rotated_45_overlap():
    # unit square vs same square rotated 45deg: intersection is a regular octagon
    a = jnp.asarray([[0.0, 0, 0, 2, 2, 2, 0]])
    b = jnp.asarray([[0.0, 0, 0, 2, 2, 2, np.pi / 4]])
    inter = np.asarray(iou3d.boxes_overlap_bev(a, b))[0, 0]
    expected = 8 * (np.sqrt(2) - 1)  # octagon area for square side 2
    np.testing.assert_allclose(inter, expected, atol=1e-3)


def test_random_vs_raster():
    rng = np.random.RandomState(42)
    for _ in range(20):
        a = np.array([rng.uniform(-2, 2), rng.uniform(-2, 2), 0,
                      rng.uniform(1, 4), rng.uniform(1, 4), 1.5, rng.uniform(-np.pi, np.pi)])
        b = np.array([rng.uniform(-2, 2), rng.uniform(-2, 2), 0,
                      rng.uniform(1, 4), rng.uniform(1, 4), 1.5, rng.uniform(-np.pi, np.pi)])
        got = float(iou3d.boxes_iou_bev(jnp.asarray(a[None]), jnp.asarray(b[None]))[0, 0])
        ref = _raster_iou_bev(a, b)
        assert abs(got - ref) < 0.02, (a, b, got, ref)


def test_iou3d_z_offset():
    a = jnp.asarray([[0.0, 0, 0.0, 2, 2, 2, 0]])
    b = jnp.asarray([[0.0, 0, 1.0, 2, 2, 2, 0]])
    # bev overlap 4, height overlap 1 -> inter 4; union 8+8-4=12
    np.testing.assert_allclose(np.asarray(iou3d.boxes_iou3d(a, b)), [[4 / 12]], atol=1e-4)


def test_row_chunking_matches():
    rng = np.random.RandomState(7)
    boxes = np.concatenate([
        rng.uniform(-10, 10, (37, 2)), rng.uniform(-1, 1, (37, 1)),
        rng.uniform(1, 4, (37, 3)), rng.uniform(-np.pi, np.pi, (37, 1))], axis=1).astype(np.float32)
    full = np.asarray(iou3d.boxes_iou_bev(jnp.asarray(boxes), jnp.asarray(boxes)))
    chunked = np.asarray(iou3d.boxes_iou_bev(jnp.asarray(boxes), jnp.asarray(boxes), row_chunk=8))
    np.testing.assert_allclose(full, chunked, atol=1e-5)


def test_nms_basic():
    boxes = jnp.asarray([
        [0.0, 0, 0, 4, 2, 1.5, 0.0],    # score .9 keep
        [0.1, 0, 0, 4, 2, 1.5, 0.02],   # overlaps box0 heavily -> suppressed
        [10.0, 0, 0, 4, 2, 1.5, 0.0],   # far away -> keep
        [10.05, 0, 0, 4, 2, 1.5, 0.0],  # overlaps box2 -> suppressed
    ])
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    idx, keep, kscores = nms_bev(boxes, scores, thresh=0.5, pre_maxsize=4, post_maxsize=4)
    kept = np.asarray(idx)[np.asarray(keep)]
    assert kept.tolist() == [0, 2]


def test_nms_score_thresh_and_padding():
    boxes = jnp.tile(jnp.asarray([[0.0, 0, 0, 4, 2, 1.5, 0.0]]), (8, 1))
    boxes = boxes.at[:, 0].set(jnp.arange(8) * 100.0)  # all disjoint
    scores = jnp.asarray([0.9, 0.05, 0.8, 0.05, 0.7, 0.05, 0.6, 0.05])
    valid = jnp.asarray([True] * 6 + [False] * 2)
    idx, keep, _ = nms_bev(boxes, scores, thresh=0.5, pre_maxsize=8, post_maxsize=8,
                           score_thresh=0.1, valid_mask=valid)
    kept = set(np.asarray(idx)[np.asarray(keep)].tolist())
    assert kept == {0, 2, 4}

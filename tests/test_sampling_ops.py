import numpy as np
import jax
import jax.numpy as jnp

from seevcn_tpu.ops import sampling as S
from seevcn_tpu.ops import chamfer as C
from seevcn_tpu.ops import clustering as CL


def test_pairwise_sqdist():
    rng = np.random.RandomState(0)
    a = rng.randn(10, 3).astype(np.float32)
    b = rng.randn(7, 3).astype(np.float32)
    d = np.asarray(S.pairwise_sqdist(jnp.asarray(a), jnp.asarray(b)))
    ref = ((a[:, None] - b[None]) ** 2).sum(-1)
    np.testing.assert_allclose(d, ref, atol=1e-4)


def test_tile_to_n_cycles():
    pts = jnp.asarray(np.arange(12, dtype=np.float32).reshape(4, 3))
    valid = jnp.asarray([True, False, True, False])
    out, ok = S.tile_to_n(pts, valid, 5)
    out = np.asarray(out)
    assert bool(ok)
    # valid points are rows 0 and 2, cycled: 0,2,0,2,0
    np.testing.assert_allclose(out[:, 0], [0, 6, 0, 6, 0])


def test_fps_spread():
    rng = np.random.RandomState(1)
    # two well-separated blobs; 2-point FPS must pick one from each
    blob1 = rng.randn(50, 3).astype(np.float32) * 0.1
    blob2 = blob1 + 100.0
    pts = np.concatenate([blob1, blob2])
    idx = np.asarray(S.farthest_point_sample(jnp.asarray(pts), 2))
    assert (idx[0] < 50) != (idx[1] < 50)
    # full-coverage request returns unique indices
    idx = np.asarray(S.farthest_point_sample(jnp.asarray(pts), 100))
    assert len(set(idx.tolist())) == 100


def test_fps_respects_mask():
    pts = np.zeros((10, 3), dtype=np.float32)
    pts[:, 0] = np.arange(10)
    valid = np.asarray([True] * 5 + [False] * 5)
    idx = np.asarray(S.farthest_point_sample(jnp.asarray(pts), 5, jnp.asarray(valid)))
    assert idx.max() < 5


def test_knn_union_matches_numpy():
    rng = np.random.RandomState(2)
    partial = rng.randn(20, 3).astype(np.float32)
    complete = rng.randn(100, 3).astype(np.float32)
    k = 5
    mask = np.asarray(S.knn_union_mask(jnp.asarray(partial), jnp.asarray(complete), k))
    # numpy reference: union of k nearest per partial point
    d = ((partial[:, None] - complete[None]) ** 2).sum(-1)
    ref = set()
    for row in d:
        ref.update(np.argsort(row)[:k].tolist())
    assert set(np.where(mask)[0].tolist()) == ref


def test_partial_mesh_batch_shape():
    rng = np.random.RandomState(3)
    p = jnp.asarray(rng.randn(2, 30, 3).astype(np.float32))
    c = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    out = S.partial_mesh_batch(p, c, k=4, surface_pts=128)
    assert out.shape == (2, 128, 3)
    # every output point must be one of the complete points
    d = np.asarray(S.pairwise_sqdist(out[0], c[0])).min(axis=1)
    assert d.max() < 1e-4  # matmul-form sqdist has ~1e-6 f32 noise at zero


def test_chamfer_values():
    a = jnp.asarray([[[0.0, 0, 0], [1, 0, 0]]])
    b = jnp.asarray([[[0.0, 0, 0], [3, 0, 0]]])
    # d1: 0, min((1-0)^2,(1-3)^2)=1 -> mean 0.5 ; d2: 0, (3-1)^2=4 -> mean 2
    l2 = float(C.chamfer_l2(a, b))
    np.testing.assert_allclose(l2, 2.5, atol=1e-5)
    l1 = float(C.chamfer_l1(a, b))
    np.testing.assert_allclose(l1, (0.5 + 1.0) / 2, atol=1e-4)


def test_chamfer_mask():
    a = jnp.asarray([[[0.0, 0, 0], [99, 0, 0]]])
    b = jnp.asarray([[[0.0, 0, 0], [0, 0, 0]]])
    v1 = jnp.asarray([[True, False]])
    l2 = float(C.chamfer_l2(a, b, valid1=v1))
    np.testing.assert_allclose(l2, 0.0, atol=1e-5)


def test_chamfer_grad_flows():
    a = jnp.asarray(np.random.RandomState(4).randn(1, 16, 3).astype(np.float32))
    b = jnp.asarray(np.random.RandomState(5).randn(1, 16, 3).astype(np.float32))
    g = jax.grad(lambda x: C.chamfer_l2(x, b))(a)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0


def test_dbscan_two_clusters_and_noise():
    rng = np.random.RandomState(6)
    c1 = rng.randn(30, 3).astype(np.float32) * 0.05
    c2 = c1 + np.array([10, 0, 0], dtype=np.float32)
    noise = np.array([[5.0, 5, 5]], dtype=np.float32)
    pts = np.concatenate([c1, c2, noise])
    labels = np.asarray(CL.dbscan(jnp.asarray(pts), eps=0.4, min_points=2))
    assert labels[60] == -1  # isolated point is noise
    l1 = set(labels[:30].tolist())
    l2 = set(labels[30:60].tolist())
    assert len(l1) == 1 and len(l2) == 1 and l1 != l2


def test_dbscan_min_points_core_rule():
    # chain of 3 points 0.3 apart with min_points=3: middle point has 3
    # neighbors (core), ends have 2 (border) -> all one cluster
    pts = np.array([[0, 0, 0], [0.3, 0, 0], [0.6, 0, 0], [50, 0, 0]], dtype=np.float32)
    labels = np.asarray(CL.dbscan(jnp.asarray(pts), eps=0.4, min_points=3))
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == -1


def test_largest_cluster_batch():
    rng = np.random.RandomState(7)
    big = rng.randn(40, 3).astype(np.float32) * 0.05
    small = rng.randn(10, 3).astype(np.float32) * 0.05 + 20
    pts = np.concatenate([big, small])[None]
    out = np.asarray(CL.largest_cluster_batch(jnp.asarray(pts), eps=0.4, min_points=2, total_pts=64))
    assert out.shape == (1, 64, 3)
    assert np.abs(out).max() < 5  # only points from the big cluster


def test_three_nn_interpolate():
    support = jnp.asarray([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [5, 5, 5]])
    feats = jnp.asarray([[1.0], [2.0], [3.0], [100.0]])
    q = jnp.asarray([[0.0, 0, 0]])
    out = np.asarray(S.three_nn_interpolate(q, support, feats))
    # nearest is exact match -> weight ~1 on feature 1.0
    np.testing.assert_allclose(out[0, 0], 1.0, atol=1e-2)


def test_sample_points_with_roi_mask():
    """Reference semantics (voxel_set_abstraction.py:40-76): keep points
    whose distance to the NEAREST roi center < that roi's half-diagonal +
    radius."""
    pts = np.array([[0, 0, 0], [3, 0, 0], [10, 10, 0], [11, 10, 0]],
                   np.float32)
    rois = np.zeros((2, 7), np.float32)
    rois[0, :3] = [0, 0, 0]
    rois[0, 3:6] = [4, 2, 2]          # half-diag ~2.45
    rois[1, :3] = [10, 10, 0]
    rois[1, 3:6] = [1, 1, 1]          # half-diag ~0.87
    m = np.asarray(S.sample_points_with_roi_mask(
        jnp.asarray(pts), jnp.asarray(rois), jnp.ones(2, bool), 1.0))
    # pt0: d=0 < 3.45 yes; pt1: d=3 < 3.45 yes; pt2: d=0 < 1.87 yes;
    # pt3: d=1 < 1.87 yes
    assert m.tolist() == [True, True, True, True]
    m = np.asarray(S.sample_points_with_roi_mask(
        jnp.asarray(pts), jnp.asarray(rois), jnp.ones(2, bool), 0.1))
    # pt1: 3 > 2.55 no; pt3: 1 > 0.87+0.1 no
    assert m.tolist() == [True, False, True, False]
    # masked-out roi 1 -> its points fall to roi 0's ball (far away)
    m = np.asarray(S.sample_points_with_roi_mask(
        jnp.asarray(pts), jnp.asarray(rois), jnp.asarray([True, False]), 1.0))
    assert m.tolist() == [True, True, False, False]
    # no roi at all -> nothing selected
    m = np.asarray(S.sample_points_with_roi_mask(
        jnp.asarray(pts), jnp.asarray(rois), jnp.zeros(2, bool), 1.0))
    assert not m.any()


def test_sector_fps_proportional_quota():
    """Sector quotas follow the reference's ceil(cnt/total*K) rule
    (sector_fps, voxel_set_abstraction.py:78-122): a sector holding 3/4 of
    the points gets ~3/4 of the picks, and every non-empty sector gets at
    least one pick."""
    rng = np.random.RandomState(0)
    # sector of angle ~0..pi/2 gets 150 points, opposite sector gets 50
    a1 = rng.uniform(0.1, np.pi / 2 - 0.1, 150)
    a2 = rng.uniform(np.pi + 0.1, 1.5 * np.pi - 0.1, 50)
    r1 = rng.uniform(5, 20, 150)
    r2 = rng.uniform(5, 20, 50)
    pts = np.zeros((224, 3), np.float32)
    pts[:150, 0] = np.cos(a1) * r1
    pts[:150, 1] = np.sin(a1) * r1
    pts[150:200, 0] = np.cos(a2) * r2
    pts[150:200, 1] = np.sin(a2) * r2
    valid = np.zeros(224, bool)
    valid[:200] = True
    idx, ok = S.sector_fps_sample(jnp.asarray(pts), jnp.asarray(valid),
                                  num_keypoints=40, num_sectors=4)
    idx, ok = np.asarray(idx), np.asarray(ok)
    assert ok.all()
    assert valid[idx].all()
    n_big = (idx < 150).sum()
    # proportional: 150/200*40 = 30 from the big sector, 10 from the small
    assert 28 <= n_big <= 32
    # picks are unique (FPS prefix per sector)
    assert len(set(idx.tolist())) == 40


def test_sector_fps_spread_beats_random():
    """Sector-FPS picks must cover space like FPS does (min pairwise
    distance much larger than random picks)."""
    rng = np.random.RandomState(1)
    pts = rng.uniform(-30, 30, (400, 3)).astype(np.float32)
    idx, ok = S.sector_fps_sample(jnp.asarray(pts),
                                  jnp.ones(400, bool), 32, 6)
    sel = pts[np.asarray(idx)]
    d = ((sel[:, None] - sel[None]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    min_fps = np.sqrt(d.min())
    rand = pts[rng.choice(400, 32, replace=False)]
    d = ((rand[:, None] - rand[None]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    assert min_fps > np.sqrt(d.min())


def test_sector_fps_fewer_points_than_k():
    pts = np.random.RandomState(2).randn(10, 3).astype(np.float32)
    valid = np.ones(10, bool)
    valid[7:] = False
    idx, ok = S.sector_fps_sample(jnp.asarray(pts), jnp.asarray(valid), 16, 4)
    idx, ok = np.asarray(idx), np.asarray(ok)
    assert ok.sum() == 7                      # only 7 real picks
    assert valid[idx].all()                   # padding repeats a valid pick


def test_grid_subsample_dedupes_cells():
    pts = np.array([[0.0, 0, 0], [0.05, 0, 0],      # same 0.3-cell
                    [5.0, 0, 0], [5.01, 0, 0],       # same cell
                    [10.0, 3, 1]], np.float32)
    valid = np.ones(5, bool)
    idx, ok = S.grid_subsample(jnp.asarray(pts), jnp.asarray(valid), 0.3, 8)
    idx, ok = np.asarray(idx), np.asarray(ok)
    sel = sorted(idx[ok].tolist())
    # one representative per cell, the LOWEST index each
    assert sel == [0, 2, 4]
    # invalid points never selected
    valid[0] = False
    idx, ok = S.grid_subsample(jnp.asarray(pts), jnp.asarray(valid), 0.3, 8)
    sel = sorted(np.asarray(idx)[np.asarray(ok)].tolist())
    assert sel == [1, 2, 4]

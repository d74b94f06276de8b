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

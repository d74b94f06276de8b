"""Fused on-device SEE DET path (see/device_pipeline.py): membership ->
isolation -> replacement, against straightforward numpy references."""
import pytest

import numpy as np
import jax.numpy as jnp

from seevcn_tpu.see import device_pipeline as DP

pytestmark = pytest.mark.slow  # heavy tier: full model/backbone builds


def _proj_identity():
    # u = fx * x/z + cx with camera looking down +z; here use a lidar-like
    # frame where depth axis = x: proj maps (x, y, z) -> (y*f/x + cu, ...)
    # For test simplicity use a camera matrix with depth = z.
    return np.array([[100.0, 0, 0, 0],
                     [0, 100.0, 0, 0],
                     [0, 0, 1.0, 0]], np.float32)


def test_project_points():
    proj = _proj_identity()
    pts = np.array([[1.0, 2.0, 10.0], [0.5, -0.5, 5.0]], np.float32)
    u, v, d = DP.project_points(jnp.asarray(pts), jnp.asarray(proj))
    np.testing.assert_allclose(np.asarray(u), [10.0, 10.0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(v), [20.0, -10.0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(d), [10.0, 5.0], atol=1e-6)


def test_mask_membership_box_and_patch():
    proj = _proj_identity()
    # two points project to u,v = (10, 10) and (50, 50) at depth 10
    pts = np.array([[1.0, 1.0, 10.0], [5.0, 5.0, 10.0],
                    [1.0, 1.0, -10.0]], np.float32)   # third behind camera
    valid = np.array([True, True, True])
    boxes = np.array([[0.0, 0.0, 20.0, 20.0],        # covers (10, 10)
                      [40.0, 40.0, 60.0, 60.0]], np.float32)
    masks = np.ones((2, 28, 28), np.float32)
    masks[1] = 0.0                                    # second mask empty
    scores = np.array([0.9, 0.9], np.float32)
    m = np.asarray(DP.mask_membership(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(proj),
        jnp.asarray(boxes), jnp.asarray(masks), jnp.asarray(scores)))
    assert m.shape == (2, 3)
    assert m[0].tolist() == [True, False, False]      # in box 0's full mask
    assert not m[1].any()                             # empty mask patch
    # score gate
    m2 = np.asarray(DP.mask_membership(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(proj),
        jnp.asarray(boxes), jnp.asarray(masks),
        jnp.asarray(np.array([0.1, 0.9], np.float32)), score_thresh=0.5))
    assert not m2.any()


def test_isolate_and_resample_picks_largest_cluster():
    rng = np.random.RandomState(0)
    # instance 0: a 40-pt tight cluster at range 10 + 5 outliers far away
    cluster = rng.randn(40, 3).astype(np.float32) * 0.05 + [10, 0, 0]
    outliers = rng.randn(5, 3).astype(np.float32) * 0.05 + [30, 20, 0]
    pts = np.zeros((128, 3), np.float32)
    pts[:40] = cluster
    pts[40:45] = outliers
    membership = np.zeros((2, 128), bool)
    membership[0, :45] = True
    # instance 1: too few points -> invalid
    membership[1, :3] = True
    out, ok = DP.isolate_and_resample(jnp.asarray(pts),
                                      jnp.asarray(membership),
                                      max_instance_pts=64, out_pts=32)
    out, ok = np.asarray(out), np.asarray(ok)
    assert ok.tolist() == [True, False]
    # all resampled points come from the tight cluster, not the outliers
    d = np.linalg.norm(out[0] - [10, 0, 0], axis=1)
    assert (d < 1.0).all()


def test_replace_with_completed():
    pts = np.array([[10.0, 0, 0], [10.05, 0, 0], [50.0, 0, 0]], np.float32)
    valid = np.ones(3, bool)
    completed = np.array([[[10.0, 0, 0], [10.02, 0, 0]]], np.float32)
    inst_valid = np.array([True])
    new_pts, new_valid = DP.replace_with_completed(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(completed),
        jnp.asarray(inst_valid), point_dist_thresh=0.1)
    new_pts, new_valid = np.asarray(new_pts), np.asarray(new_valid)
    assert new_pts.shape == (5, 3)
    # originals near the completed surface dropped, far one kept
    assert new_valid.tolist() == [False, False, True, True, True]
    # invalid instances contribute nothing
    _, nv = DP.replace_with_completed(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(completed),
        jnp.asarray(np.array([False])), point_dist_thresh=0.1)
    assert np.asarray(nv).tolist() == [True, True, True, False, False]


def test_mask_membership_canvas_matches_bilinear():
    """The rasterized bit-canvas path must agree with the per-point
    bilinear path away from mask borders (canvas = nearest-pixel of the
    same bilinear field, the reference's mask[v, u] semantics)."""
    rng = np.random.RandomState(4)
    h, w = 96, 128
    proj = np.array([[50.0, 0, 64.0, 0], [0, 50.0, 48.0, 0],
                     [0, 0, 1.0, 0]], np.float32)
    # points across the image plane at depth 5
    n = 500
    pts = np.stack([rng.uniform(-5, 5, n), rng.uniform(-4, 4, n),
                    np.full(n, 5.0)], axis=1).astype(np.float32)
    valid = np.ones(n, bool)
    boxes = np.array([[10.0, 10.0, 70.0, 60.0],
                      [60.0, 30.0, 120.0, 90.0]], np.float32)
    # blocky half-on masks (sharp but axis-aligned borders)
    masks = np.zeros((2, 28, 28), np.float32)
    masks[0, :, :14] = 1.0
    masks[1, 7:, :] = 1.0
    scores = np.array([0.9, 0.8], np.float32)

    args = (jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(proj),
            jnp.asarray(boxes), jnp.asarray(masks), jnp.asarray(scores))
    m_bil = np.asarray(DP.mask_membership(*args))
    m_can = np.asarray(DP.mask_membership(*args, image_size=(h, w)))
    # borders quantize differently (nearest pixel vs exact uv); demand
    # agreement on >98% of (instance, point) decisions and all deep-inside
    agree = (m_bil == m_can).mean()
    assert agree > 0.98, agree
    assert m_can.any()                      # canvas path actually selects


def test_replace_compacted_path_matches_bruteforce():
    """The AABB-compacted candidate path == the full sweep (small
    cand_cap forces the compacted branch; cand_cap=P forces brute)."""
    rng = np.random.RandomState(7)
    pts = rng.uniform(-30, 30, (4096, 3)).astype(np.float32)
    valid = rng.rand(4096) > 0.1
    centers = rng.uniform(-25, 25, (4, 3)).astype(np.float32)
    completed = (centers[:, None, :] +
                 rng.uniform(-1.5, 1.5, (4, 64, 3))).astype(np.float32)
    iv = np.array([True, True, False, True])
    _, nv_fast = DP.replace_with_completed(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(completed),
        jnp.asarray(iv), cand_cap=512)
    _, nv_ref = DP.replace_with_completed(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(completed),
        jnp.asarray(iv), cand_cap=4096)
    np.testing.assert_array_equal(np.asarray(nv_fast), np.asarray(nv_ref))


def test_mask_shrink_reduces_membership():
    """shrink_pct (reference SHRINK_MASK_PERCENTAGE) must only REMOVE
    boundary members, never add, and must keep interior members."""
    rng = np.random.RandomState(11)
    h, w = 64, 96
    boxes = jnp.asarray([[20.0, 10, 60, 50]])
    patch = jnp.ones((1, 28, 28), jnp.float32)
    scores = jnp.ones((1,), jnp.float32)
    # points projecting across the box: a grid of pixels
    uu, vv = np.meshgrid(np.arange(15, 65, 1.0), np.arange(5, 55, 1.0))
    # simple projector: x_cam=(u-cx)*z/f etc. — use unit-focal identity
    # proj so points at (u*z, v*z, z) project back to (u, v)
    proj = jnp.asarray([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0]])
    z = 10.0
    pts = np.stack([uu.ravel() * z, vv.ravel() * z,
                    np.full(uu.size, z)], 1).astype(np.float32)
    valid = jnp.ones((len(pts),), bool)
    m0 = np.asarray(DP.mask_membership(jnp.asarray(pts), valid, proj, boxes,
                                       patch, scores, score_thresh=0.5,
                                       image_size=(h, w)))
    m3 = np.asarray(DP.mask_membership(jnp.asarray(pts), valid, proj, boxes,
                                       patch, scores, score_thresh=0.5,
                                       image_size=(h, w), shrink_pct=10.0))
    assert m0.sum() > 0
    assert (m3 <= m0).all()              # shrink only removes
    assert m3.sum() < m0.sum()           # and does remove boundary pixels
    # box-center pixel stays a member
    ci = np.argmin(np.abs(uu.ravel() - 40) + np.abs(vv.ravel() - 30))
    assert m3[0, ci]


def test_completion_sanity_mask():
    """Guard for the round-4 frame-0 failure: a completion placed tens of
    meters from its observed instance points must be rejected; a
    completion hugging its observed points must pass (BASELINE.md
    round-5 maskpath table)."""
    rng = np.random.RandomState(1)
    obs = np.zeros((3, 64, 3), np.float32)
    obs[0] = rng.randn(64, 3) * 0.3 + [10, 0, 0]    # car at 10 m
    obs[1] = rng.randn(64, 3) * 0.3 + [20, 5, 0]    # car at ~21 m
    # instance 2: all-zero padding rows (no observed points)
    comp = np.zeros((3, 128, 3), np.float32)
    comp[0] = rng.randn(128, 3) * 0.5 + [10, 0, 0]  # good placement
    comp[1] = rng.randn(128, 3) * 0.5 + [49, 5, 0]  # 29 m off (frame 0)
    comp[2] = rng.randn(128, 3) * 0.5 + [10, 0, 0]
    inst_valid = np.array([True, True, True])
    sane = np.asarray(DP.completion_sanity_mask(
        jnp.asarray(obs), jnp.asarray(comp), jnp.asarray(inst_valid),
        max_dist=2.0))
    assert sane.tolist() == [True, False, False]
    # respects incoming inst_valid
    sane2 = np.asarray(DP.completion_sanity_mask(
        jnp.asarray(obs), jnp.asarray(comp),
        jnp.asarray(np.array([False, True, True])), max_dist=2.0))
    assert sane2.tolist() == [False, False, False]


def test_best_cluster_mask_core_vote():
    """best_cluster_mask: the core-weighted vote picks a SMALLER cluster
    when it owns the core points; zero weights degrade to largest."""
    from seevcn_tpu.ops.clustering import best_cluster_mask, dbscan

    pts = np.zeros((64, 3), np.float32)
    pts[:20] = np.random.RandomState(0).randn(20, 3) * 0.03 + [5, 0, 0]
    pts[20:50] = np.random.RandomState(1).randn(30, 3) * 0.03 + [12, 3, 0]
    valid = np.zeros(64, bool)
    valid[:50] = True
    labels = dbscan(jnp.asarray(pts), 0.5, min_points=3,
                    valid=jnp.asarray(valid))
    # weights on the 20-pt cluster only
    w = np.zeros(64, np.int32)
    w[:20] = 1
    m = np.asarray(best_cluster_mask(labels, jnp.asarray(w)))
    assert m[:20].all() and not m[20:50].any()
    # zero weights -> size vote (the 30-pt cluster)
    m0 = np.asarray(best_cluster_mask(labels, jnp.zeros(64, np.int32)))
    assert m0[20:50].all() and not m0[:20].any()


def test_isolate_core_membership_overrides_largest():
    """A loose mask whose frustum holds a LARGER background cluster: the
    plain vote picks the background; the core vote recovers the object
    (the round-5 maskpath frame-0 failure mode)."""
    rng = np.random.RandomState(0)
    obj = rng.randn(25, 3).astype(np.float32) * 0.05 + [8, 0, 0]
    bg = rng.randn(60, 3).astype(np.float32) * 0.10 + [25, 5, 1]
    pts = np.zeros((128, 3), np.float32)
    pts[:25] = obj
    pts[25:85] = bg
    member = np.zeros((1, 128), bool)
    member[0, :85] = True                      # loose mask: both clusters
    core = np.zeros((1, 128), bool)
    core[0, :25] = True                        # shrunk interior: object only

    out_l, ok_l = DP.isolate_and_resample(jnp.asarray(pts),
                                          jnp.asarray(member),
                                          max_instance_pts=128, out_pts=32)
    out_c, ok_c = DP.isolate_and_resample(jnp.asarray(pts),
                                          jnp.asarray(member),
                                          max_instance_pts=128, out_pts=32,
                                          core_membership=jnp.asarray(core))
    assert bool(ok_l[0]) and bool(ok_c[0])
    d_l = np.linalg.norm(np.asarray(out_l[0]) - [25, 5, 1], axis=1)
    assert (d_l < 2.0).all()                   # largest vote = background
    d_c = np.linalg.norm(np.asarray(out_c[0]) - [8, 0, 0], axis=1)
    assert (d_c < 2.0).all()                   # core vote = the object


def test_nearest_core_cluster_mask():
    """The round-5 frame-0 anatomy: a FAR background strip owns MORE
    core points than the object (parallax leakage), and the object is
    split into two nearby fragments. The nearest-surface rule must seed
    on the near fragment and merge in the other, excluding the strip."""
    from seevcn_tpu.ops.clustering import nearest_core_cluster_mask

    rng = np.random.RandomState(0)
    face = rng.randn(40, 3).astype(np.float32) * 0.05 + [10, 0.5, -0.8]
    roof = rng.randn(35, 3).astype(np.float32) * 0.05 + [11.5, 0.5, 0.0]
    strip = rng.randn(60, 3).astype(np.float32) * 0.08 + [39, 2.5, -1.7]
    pts = np.concatenate([face, roof, strip]).astype(np.float32)
    labels = np.concatenate([np.zeros(40), np.full(35, 40),
                             np.full(60, 75)]).astype(np.int32)
    core = np.ones(135, bool)                  # ALL survive the shrink
    m = np.asarray(nearest_core_cluster_mask(
        jnp.asarray(labels), jnp.asarray(core), jnp.asarray(pts)))
    assert m[:40].all() and m[40:75].all()     # face seeded, roof merged
    assert not m[75:].any()                    # far strip excluded
    # no eligible core at all -> degrades to the size vote
    m0 = np.asarray(nearest_core_cluster_mask(
        jnp.asarray(labels), jnp.zeros(135, bool), jnp.asarray(pts)))
    assert m0[75:].all() and not m0[:75].any()


def test_mask_membership_core_shrink():
    """core_shrink_pct returns a second, strictly-smaller membership."""
    proj = _proj_identity()
    pts = np.zeros((200, 3), np.float32)
    # u = 100*x/z, v = 100*y/z with z = 10 -> u = 10x, v = 10y: sweep
    # x so u spans the box's full [40, 160] width at v = 100
    pts[:, 0] = np.linspace(3.5, 16.5, 200)
    pts[:, 1] = 10.0
    pts[:, 2] = 10.0
    boxes = np.array([[40.0, 40.0, 160.0, 160.0]], np.float32)
    masks = np.ones((1, 28, 28), np.float32)
    scores = np.ones((1,), np.float32)
    member, core = DP.mask_membership(
        jnp.asarray(pts), jnp.ones(200, bool), jnp.asarray(proj),
        jnp.asarray(boxes), jnp.asarray(masks), jnp.asarray(scores),
        score_thresh=0.5, image_size=(200, 200), shrink_pct=0.0,
        core_shrink_pct=30.0)
    member, core = np.asarray(member), np.asarray(core)
    assert core.sum() < member.sum()
    assert not (core & ~member).any()          # core subset of member

"""SEE completion stage sharded over the mesh (VERDICT r4 #6).

The reference parallelizes preprocessing over frames with a host worker
pool (sc_multiproc.py:65-94); the TPU analog is frames-over-dp SPMD
(seevcn_tpu/see/sharded.py). These tests run on the 8-device CPU mesh
(conftest) and check (a) the program compiles + executes with the frame
axis actually sharded, and (b) per-frame results match the unsharded
single-frame pipeline bit-for-bit semantics (no cross-frame coupling).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seevcn_tpu.models.vcn.nets import build_vcn
from seevcn_tpu.parallel.mesh import make_mesh
from seevcn_tpu.see import device_pipeline as DP
from seevcn_tpu.see.sharded import _complete_one_frame, make_sharded_completion

pytestmark = pytest.mark.slow  # heavy tier: VCN build + 8-dev compile


def _frames(f, p=512, d=4, seed=0):
    rng = np.random.RandomState(seed)
    pts = np.zeros((f, p, 3), np.float32)
    pts[..., 0] = rng.uniform(2, 30, (f, p))
    pts[..., 1] = rng.uniform(-15, 15, (f, p))
    pts[..., 2] = rng.uniform(-1.5, 1.0, (f, p))
    gtb = np.zeros((f, d, 7), np.float32)
    gtm = np.zeros((f, d), bool)
    for i in range(f):
        # one real car per frame with a dense cluster of points inside
        cx, cy = rng.uniform(8, 20), rng.uniform(-8, 8)
        gtb[i, 0] = [cx, cy, 0.0, 4.2, 1.9, 1.6, rng.uniform(-1, 1)]
        gtm[i, 0] = True
        pts[i, :64] = rng.randn(64, 3) * 0.4 + [cx, cy, 0.0]
    return (jnp.asarray(pts), jnp.ones((f, p), bool), jnp.asarray(gtb),
            jnp.asarray(gtm))


def test_sharded_completion_runs_on_8dev_mesh():
    mesh = make_mesh(8)
    vcn = build_vcn("VCN_VC", num_coarse=64)
    pts, valid, gtb, gtm = _frames(8)
    vcn_vars = vcn.init(jax.random.PRNGKey(0),
                        {"input": jnp.zeros((1, 128, 3))})
    fn = make_sharded_completion(mesh, vcn, out_pts=128)
    new_pts, new_valid, ok = fn(vcn_vars, pts, valid, gtb, gtm)
    jax.block_until_ready(new_pts)
    assert new_pts.shape == (8, 512 + 4 * 128, 3)
    assert np.isfinite(np.asarray(new_pts)).all()
    # the frame axis is genuinely dp-sharded, not replicated
    spec = new_pts.sharding.spec
    assert spec and spec[0] == "dp", spec
    # every frame has its one valid instance completed or sanity-rejected,
    # never an out-of-range instance accepted
    ok = np.asarray(ok)
    assert ok.shape == (8, 4)
    assert not ok[:, 1:].any()          # padding instances never complete


def test_sharded_matches_per_frame():
    """Frames are independent: the dp-sharded batch must equal running
    the per-frame pipeline frame by frame."""
    mesh = make_mesh(8)
    vcn = build_vcn("VCN_VC", num_coarse=64)
    pts, valid, gtb, gtm = _frames(8, seed=3)
    vcn_vars = vcn.init(jax.random.PRNGKey(1),
                        {"input": jnp.zeros((1, 128, 3))})
    fn = make_sharded_completion(mesh, vcn, out_pts=128)
    b_pts, b_val, b_ok = jax.tree.map(np.asarray,
                                      fn(vcn_vars, pts, valid, gtb, gtm))
    one = jax.jit(lambda p, v, g, m: _complete_one_frame(
        vcn, vcn_vars, p, v, g, m, out_pts=128, sanity_max_dist=2.0))
    for i in [0, 3, 7]:
        s_pts, s_val, s_ok = one(pts[i], valid[i], gtb[i], gtm[i])
        np.testing.assert_allclose(b_pts[i], np.asarray(s_pts), atol=2e-3)
        assert (b_ok[i] == np.asarray(s_ok)).all()

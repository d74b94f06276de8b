import pytest

import numpy as np
import jax
import jax.numpy as jnp

from seevcn_tpu.ops import sparse as SP
from seevcn_tpu.ops.voxelize import voxelize, voxelize_batch, grid_size

pytestmark = pytest.mark.slow  # heavy tier: full model/backbone builds


def _random_sparse(rng, batch=2, dims=(6, 8, 10), cin=5, density=0.15, capacity=None):
    nz, ny, nx = dims
    occ = rng.rand(batch, nz, ny, nx) < density
    coords = np.argwhere(occ)  # (N, 4) [b, z, y, x]
    n = len(coords)
    feats = rng.randn(n, cin).astype(np.float32)
    capacity = capacity or (n + 7)
    # key-sort (batch-major) to satisfy the invariant
    key = ((coords[:, 0] * nz + coords[:, 1]) * ny + coords[:, 2]) * nx + coords[:, 3]
    order = np.argsort(key)
    coords, feats = coords[order], feats[order]
    # pad to capacity
    pad = capacity - n
    coords = np.concatenate([coords, np.zeros((pad, 4), np.int64)]).astype(np.int32)
    feats = np.concatenate([feats, np.zeros((pad, cin), np.float32)])
    mask = np.arange(capacity) < n
    st = SP.make_sparse_tensor(jnp.asarray(feats), jnp.asarray(coords),
                               jnp.asarray(mask), dims, batch)
    dense = np.zeros((batch, nz, ny, nx, cin), np.float32)
    dense[occ] = feats[:n]
    return st, dense, occ


def _dense_conv(dense, w_kio, stride, padding, kernel):
    # w_kio: (K, Cin, Cout) z-major -> (kz, ky, kx, Cin, Cout)
    kz, ky, kx = kernel
    w = np.asarray(w_kio).reshape(kz, ky, kx, w_kio.shape[1], w_kio.shape[2])
    out = jax.lax.conv_general_dilated(
        jnp.asarray(dense), jnp.asarray(w),
        window_strides=stride, padding=[(p, p) for p in padding],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return np.asarray(out)


def test_subm_conv_matches_dense_at_active_sites():
    rng = np.random.RandomState(0)
    st, dense, occ = _random_sparse(rng)
    w = rng.randn(27, 5, 7).astype(np.float32) * 0.3
    out = SP.subm_conv3d(st, jnp.asarray(w), kernel_size=3, padding=1)
    ref = _dense_conv(dense, w, (1, 1, 1), (1, 1, 1), (3, 3, 3))
    got = np.asarray(out.features)
    coords = np.asarray(out.coords)
    m = np.asarray(out.mask)
    for i in np.where(m)[0]:
        b, z, y, x = coords[i]
        np.testing.assert_allclose(got[i], ref[b, z, y, x], atol=1e-4)


def test_sparse_conv_stride2_matches_dense():
    rng = np.random.RandomState(1)
    st, dense, occ = _random_sparse(rng, dims=(7, 9, 11))
    w = rng.randn(27, 5, 6).astype(np.float32) * 0.3
    out = SP.sparse_conv3d(st, jnp.asarray(w), kernel_size=3, stride=2, padding=1,
                           out_capacity=st.features.shape[0] * 2)
    ref = _dense_conv(dense, w, (2, 2, 2), (1, 1, 1), (3, 3, 3))
    got = np.asarray(out.features)
    coords = np.asarray(out.coords)
    m = np.asarray(out.mask)
    assert out.spatial_shape == ref.shape[1:4]
    # active outputs match dense conv
    active = set()
    for i in np.where(m)[0]:
        b, z, y, x = coords[i]
        np.testing.assert_allclose(got[i], ref[b, z, y, x], atol=1e-4)
        active.add((b, z, y, x))
    # every nonzero dense output position must be in the active set
    nz_pos = np.argwhere(np.abs(ref).max(axis=-1) > 1e-5)
    for b, z, y, x in nz_pos:
        assert (b, z, y, x) in active


def test_sparse_conv_anisotropic_kernel():
    """conv_out in VoxelBackBone8x: kernel (3,1,1), stride (2,1,1), pad 0."""
    rng = np.random.RandomState(2)
    st, dense, occ = _random_sparse(rng, dims=(5, 6, 7))
    w = rng.randn(3, 5, 4).astype(np.float32) * 0.3
    out = SP.sparse_conv3d(st, jnp.asarray(w), kernel_size=(3, 1, 1),
                           stride=(2, 1, 1), padding=0,
                           out_capacity=st.features.shape[0] * 2)
    ref = _dense_conv(dense, w, (2, 1, 1), (0, 0, 0), (3, 1, 1))
    assert out.spatial_shape == ref.shape[1:4]
    coords = np.asarray(out.coords)
    m = np.asarray(out.mask)
    got = np.asarray(out.features)
    for i in np.where(m)[0]:
        b, z, y, x = coords[i]
        np.testing.assert_allclose(got[i], ref[b, z, y, x], atol=1e-4)


def test_to_dense_roundtrip():
    rng = np.random.RandomState(3)
    st, dense, occ = _random_sparse(rng)
    got = np.asarray(SP.to_dense(st))
    np.testing.assert_allclose(got, dense, atol=0)


def test_voxelize_mean_features():
    pcr = [0, 0, 0, 4, 4, 4]
    vs = [1.0, 1.0, 1.0]
    pts = np.array([
        [0.5, 0.5, 0.5, 10],   # voxel (0,0,0)
        [0.6, 0.4, 0.2, 20],   # same voxel
        [3.5, 3.5, 3.5, 30],   # voxel (3,3,3)
        [9.0, 9.0, 9.0, 40],   # out of range
    ], dtype=np.float32)
    valid = np.ones(4, bool)
    res = voxelize(jnp.asarray(pts), jnp.asarray(valid), point_cloud_range=pcr,
                   voxel_size=vs, max_voxels=8)
    m = np.asarray(res.mask)
    assert m.sum() == 2
    feats = np.asarray(res.features)[m]
    coords = np.asarray(res.coords)[m]
    # first voxel (key-sorted: z-major) is (0,0,0)
    np.testing.assert_allclose(coords[0], [0, 0, 0])
    np.testing.assert_allclose(feats[0], [(0.5 + 0.6) / 2, 0.45, 0.35, 15.0], atol=1e-5)
    np.testing.assert_allclose(coords[1], [3, 3, 3])
    assert np.asarray(res.num_points)[m].tolist() == [2, 1]


def test_voxelize_point_cap_input_order():
    pcr = [0, 0, 0, 2, 2, 2]
    pts = np.array([[0.5, 0.5, 0.5, 1],
                    [0.4, 0.4, 0.4, 2],
                    [0.3, 0.3, 0.3, 100]], dtype=np.float32)
    res = voxelize(jnp.asarray(pts), jnp.ones(3, dtype=bool),
                   point_cloud_range=pcr, voxel_size=[1, 1, 1],
                   max_voxels=4, max_points_per_voxel=2)
    feats = np.asarray(res.features)[np.asarray(res.mask)]
    # mean over FIRST TWO points in input order (reference cap semantics)
    np.testing.assert_allclose(feats[0, 3], 1.5, atol=1e-5)
    assert np.asarray(res.num_points)[np.asarray(res.mask)][0] == 3


def test_voxelize_batch_key_sorted():
    rng = np.random.RandomState(4)
    pcr = [-10, -10, -2, 10, 10, 2]
    vs = [0.5, 0.5, 0.5]
    pts = rng.uniform(-9, 9, (2, 500, 3)).astype(np.float32)
    pts[:, :, 2] = rng.uniform(-1.9, 1.9, (2, 500))
    feats, coords, mask = voxelize_batch(jnp.asarray(pts), jnp.ones((2, 500), bool),
                                         point_cloud_range=pcr, voxel_size=vs,
                                         max_voxels=600)
    g = grid_size(pcr, vs)
    nz, ny, nx = int(g[2]), int(g[1]), int(g[0])
    key = ((np.asarray(coords[:, 0]) * nz + np.asarray(coords[:, 1])) * ny +
           np.asarray(coords[:, 2])) * nx + np.asarray(coords[:, 3])
    key = np.where(np.asarray(mask), key, np.iinfo(np.int32).max)
    assert (np.diff(key) >= 0).all()  # globally ascending incl. batch-major


def test_voxelize_then_sparse_conv_pipeline():
    """voxelize_batch output feeds sparse convs directly (layout invariant)."""
    rng = np.random.RandomState(5)
    pcr = [0, 0, 0, 8, 8, 4]
    vs = [1.0, 1.0, 1.0]
    pts = rng.uniform(0.1, 7.9, (2, 200, 3)).astype(np.float32)
    pts[:, :, 2] = rng.uniform(0.1, 3.9, (2, 200))
    feats, coords, mask = voxelize_batch(jnp.asarray(pts), jnp.ones((2, 200), bool),
                                         point_cloud_range=pcr, voxel_size=vs,
                                         max_voxels=256)
    g = grid_size(pcr, vs)
    st = SP.make_sparse_tensor(feats, coords, mask, (int(g[2]), int(g[1]), int(g[0])), 2)
    w = jnp.asarray(rng.randn(27, 3, 8).astype(np.float32) * 0.3)
    out = SP.subm_conv3d(st, w)
    assert np.isfinite(np.asarray(out.features)).all()
    w2 = jnp.asarray(rng.randn(27, 8, 16).astype(np.float32) * 0.3)
    out2 = SP.sparse_conv3d(out, w2, kernel_size=3, stride=2, padding=1)
    assert out2.spatial_shape == (2, 4, 4)
    assert np.asarray(out2.mask).sum() > 0


def test_focal_sparse_conv_and_backbone():
    """FocalSparseConv: center importance gates features; dilation adds only
    thresholded, in-bounds, non-duplicate neighbors; the merged tensor keeps
    the ascending-key invariant. VoxelBackBone8xFocal trains end-to-end in a
    SECOND detector with the box-of-points loss."""
    import jax
    import jax.numpy as jnp
    from seevcn_tpu.models.modules.backbone3d import FocalSparseConv
    from seevcn_tpu.ops.sparse import linear_key, make_sparse_tensor

    rng = np.random.RandomState(0)
    n = 64
    coords = np.unique(rng.randint(0, 8, (n, 3)), axis=0)
    coords = np.concatenate([np.zeros((len(coords), 1), np.int64), coords], 1)
    key = ((coords[:, 0] * 10 + coords[:, 1]) * 8 + coords[:, 2]) * 8 + coords[:, 3]
    coords = coords[np.argsort(key)]
    v = len(coords)
    pad = 16
    feats = np.zeros((v + pad, 4), np.float32)
    feats[:v] = rng.randn(v, 4)
    cc = np.zeros((v + pad, 4), np.int32)
    cc[:v] = coords
    mask = np.arange(v + pad) < v
    st = make_sparse_tensor(jnp.asarray(feats), jnp.asarray(cc),
                            jnp.asarray(mask), (10, 8, 8), 1)

    mod = FocalSparseConv(8, topk=16, threshold=0.4)
    variables = mod.init(jax.random.PRNGKey(0), st)
    (out, aux), _ = mod.apply(variables, st, train=True,
                              mutable=["batch_stats"])
    # invariant: keys ascending, invalid at the end
    keys = np.asarray(linear_key(out.coords, out.spatial_shape, out.mask))
    valid_keys = keys[np.asarray(out.mask)]
    assert (np.diff(valid_keys) > 0).all(), "duplicate or unsorted keys"
    assert out.features.shape[0] == st.features.shape[0] + 16 * 26
    assert aux["importance"].shape == (st.features.shape[0],)

    # end-to-end: SECOND with the focal backbone trains
    from test_detector import _mini_cfg, _fake_batch
    from seevcn_tpu.models.detectors.second import build_detector
    cfg = _mini_cfg()
    cfg["MODEL"]["NAME"] = "SECONDNet"
    cfg["MODEL"].pop("ROI_HEAD", None)
    cfg["MODEL"]["BACKBONE_3D"]["NAME"] = "VoxelBackBone8xFocal"
    model, dcfg = build_detector(cfg)
    pts, pv, gt = _fake_batch(np.random.RandomState(1))
    variables = jax.jit(lambda p, vv: model.init(
        {"params": jax.random.PRNGKey(0)}, p, vv, train=False))(pts, pv)
    out2, _ = jax.jit(lambda vv, p, pv2, g: model.apply(
        vv, p, pv2, gt_boxes=g, train=True, rng=jax.random.PRNGKey(1),
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"]))(variables, pts, pv, gt)
    loss, tb = model.loss(out2, gt)
    assert "loss_box_of_pts" in tb
    assert np.isfinite(float(loss)), tb


def _autodiff_ref_grads(st, w3, q_fwd, in_keys, out_mask, r):
    """Grads of the SAME gather-GEMM via plain autodiff (scatter-add
    backward) — ground truth for the scatter-free custom VJP."""
    def loss(f, w):
        y = SP._gather_matmul(f, w, q_fwd, in_keys, out_mask)
        return (y * r).sum()
    return jax.grad(loss, argnums=(0, 1))(st.features, w3)


def test_subm_conv_custom_vjp_matches_autodiff():
    rng = np.random.RandomState(4)
    st, dense, occ = _random_sparse(rng)
    w = jnp.asarray(rng.randn(27, 5, 7).astype(np.float32) * 0.3)
    r = jnp.asarray(rng.randn(st.features.shape[0], 7).astype(np.float32))

    def loss(f, w):
        out = SP.subm_conv3d(st._replace(features=f), w, 3, padding=1)
        return (out.features * r).sum()

    dx, dw = jax.grad(loss, argnums=(0, 1))(st.features, w)

    offs = SP._offsets((3, 3, 3))
    in_keys = SP.linear_key(st.coords, st.spatial_shape, st.mask)
    q_fwd = SP._conv_queries(st.coords, st.mask, offs, 1, 1, st.spatial_shape)
    rx, rw = _autodiff_ref_grads(st, w, q_fwd, in_keys, st.mask, r)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rx), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(rw.reshape(27, 5, 7)),
                               atol=1e-4)


def test_strided_conv_custom_vjp_matches_autodiff():
    rng = np.random.RandomState(5)
    st, dense, occ = _random_sparse(rng, dims=(7, 9, 11))
    w = jnp.asarray(rng.randn(27, 5, 6).astype(np.float32) * 0.3)
    cap = st.features.shape[0] * 2

    out0 = SP.sparse_conv3d(st, w, 3, stride=2, padding=1, out_capacity=cap)
    r = jnp.asarray(rng.randn(cap, 6).astype(np.float32))

    def loss(f, w):
        out = SP.sparse_conv3d(st._replace(features=f), w, 3, stride=2,
                               padding=1, out_capacity=cap)
        return (out.features * r).sum()

    dx, dw = jax.grad(loss, argnums=(0, 1))(st.features, w)

    offs = SP._offsets((3, 3, 3))
    in_keys = SP.linear_key(st.coords, st.spatial_shape, st.mask)
    q_fwd = SP._conv_queries(out0.coords, out0.mask, offs, 2, 1,
                             st.spatial_shape)
    rx, rw = _autodiff_ref_grads(st, w, q_fwd, in_keys, out0.mask, r)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rx), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(rw.reshape(27, 5, 6)),
                               atol=1e-4)


def test_inverse_conv_custom_vjp_matches_autodiff():
    rng = np.random.RandomState(6)
    target, dense, occ = _random_sparse(rng, dims=(6, 8, 10), cin=5)
    down = SP.sparse_conv3d(target, jnp.asarray(
        rng.randn(27, 5, 4).astype(np.float32) * 0.3), 3, stride=2, padding=1,
        out_capacity=target.features.shape[0])
    w = jnp.asarray(rng.randn(27, 4, 5).astype(np.float32) * 0.3)
    r = jnp.asarray(rng.randn(target.features.shape[0], 5).astype(np.float32))

    def loss(f, w):
        out = SP.sparse_inverse_conv3d(down._replace(features=f), w, target,
                                       3, stride=2, padding=1)
        return (out.features * r).sum()

    dx, dw = jax.grad(loss, argnums=(0, 1))(down.features, w)

    offs = SP._offsets((3, 3, 3))
    in_keys = SP.linear_key(down.coords, down.spatial_shape, down.mask)
    q_fwd = SP._invconv_queries(target.coords, target.mask, offs, 2, 1,
                                down.spatial_shape)
    rx, rw = _autodiff_ref_grads(down, w, q_fwd, in_keys, target.mask, r)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rx), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(rw.reshape(27, 4, 5)),
                               atol=1e-4)


def test_dense_masked_ops_match_sparse():
    """DenseTensor execution == sparse rulebook execution (same math)."""
    rng = np.random.RandomState(7)
    st, dense, occ_np = _random_sparse(rng, dims=(7, 9, 11))
    dt = SP.to_dense_tensor(st)
    np.testing.assert_array_equal(np.asarray(dt.occ), occ_np)
    np.testing.assert_allclose(np.asarray(dt.features), dense, atol=0)

    w = jnp.asarray(rng.randn(27, 5, 6).astype(np.float32) * 0.3)
    # subm
    ds = SP.dense_subm_conv3d(dt, w, 3, padding=1)
    ss = SP.subm_conv3d(st, w, 3, padding=1)
    got = np.asarray(ds.features)
    coords, m = np.asarray(ss.coords), np.asarray(ss.mask)
    sf = np.asarray(ss.features)
    for i in np.where(m)[0]:
        b, z, y, x = coords[i]
        np.testing.assert_allclose(got[b, z, y, x], sf[i], atol=1e-4)
    # inactive positions stay zero
    assert np.abs(got[~np.asarray(ds.occ)]).max() == 0

    # strided
    dstr = SP.dense_sparse_conv3d(dt, w, 3, stride=2, padding=1)
    sstr = SP.sparse_conv3d(st, w, 3, stride=2, padding=1,
                            out_capacity=st.features.shape[0] * 2)
    got = np.asarray(dstr.features)
    coords, m = np.asarray(sstr.coords), np.asarray(sstr.mask)
    sf = np.asarray(sstr.features)
    occ2 = np.asarray(dstr.occ)
    active = set()
    for i in np.where(m)[0]:
        b, z, y, x = coords[i]
        np.testing.assert_allclose(got[b, z, y, x], sf[i], atol=1e-4)
        assert occ2[b, z, y, x]
        active.add((b, z, y, x))
    assert len(active) == occ2.sum()          # same active set


def test_backbone_dense_mode_matches_sparse():
    """VoxelBackBone8x(mode=dense) == mode=sparse with shared params."""
    from seevcn_tpu.models.modules.backbone3d import VoxelBackBone8x

    rng = np.random.RandomState(8)
    st, dense, occ = _random_sparse(rng, dims=(25, 16, 24), cin=4)
    sparse_bb = VoxelBackBone8x(input_channels=4, mode="sparse",
                                capacities=[4096] * 4)
    dense_bb = VoxelBackBone8x(input_channels=4, mode="dense")
    variables = sparse_bb.init({"params": jax.random.PRNGKey(0)}, st, False)
    out_s = sparse_bb.apply(variables, st, False)["encoded_spconv_tensor"]
    out_d = dense_bb.apply(variables, st, False)["encoded_spconv_tensor"]

    assert isinstance(out_d, SP.DenseTensor)
    got = np.asarray(out_d.features)
    coords, m = np.asarray(out_s.coords), np.asarray(out_s.mask)
    sf = np.asarray(out_s.features)
    assert m.sum() > 0
    for i in np.where(m)[0]:
        b, z, y, x = coords[i]
        np.testing.assert_allclose(got[b, z, y, x], sf[i],
                                   rtol=1e-3, atol=1e-4)
    # BEV projections agree
    from seevcn_tpu.models.modules.map_to_bev import height_compression

    bev_s = np.asarray(height_compression(out_s))
    bev_d = np.asarray(SP.dense_height_compression(out_d))
    np.testing.assert_allclose(bev_d, bev_s, rtol=1e-3, atol=1e-4)


def test_backbone_dense_mode_train_grads():
    """Dense-mode BN stats and gradients are finite and nonzero."""
    from seevcn_tpu.models.modules.backbone3d import VoxelBackBone8x

    rng = np.random.RandomState(9)
    st, dense, occ = _random_sparse(rng, dims=(25, 16, 24), cin=4)
    bb = VoxelBackBone8x(input_channels=4, mode="dense")
    variables = bb.init({"params": jax.random.PRNGKey(0)}, st, False)

    def loss(params):
        out, mut = bb.apply({"params": params,
                             "batch_stats": variables["batch_stats"]},
                            st, True, mutable=["batch_stats"])
        return jnp.sum(out["encoded_spconv_tensor"].features ** 2)

    g = jax.grad(loss)(variables["params"])
    total = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), g, 0.0)
    assert np.isfinite(total) and total > 0


def test_res_backbone_dense_mode_matches_sparse():
    """VoxelResBackBone8x dense == sparse (residual blocks incl.)."""
    from seevcn_tpu.models.modules.backbone3d import VoxelResBackBone8x

    rng = np.random.RandomState(11)
    st, dense, occ = _random_sparse(rng, dims=(25, 16, 24), cin=4)
    sparse_bb = VoxelResBackBone8x(input_channels=4, mode="sparse",
                                   capacities=[4096] * 4)
    dense_bb = VoxelResBackBone8x(input_channels=4, mode="dense")
    variables = sparse_bb.init({"params": jax.random.PRNGKey(0)}, st, False)
    out_s = sparse_bb.apply(variables, st, False)["encoded_spconv_tensor"]
    out_d = dense_bb.apply(variables, st, False)["encoded_spconv_tensor"]
    got = np.asarray(out_d.features)
    coords, m = np.asarray(out_s.coords), np.asarray(out_s.mask)
    sf = np.asarray(out_s.features)
    assert m.sum() > 0
    for i in np.where(m)[0]:
        b, z, y, x = coords[i]
        np.testing.assert_allclose(got[b, z, y, x], sf[i],
                                   rtol=1e-3, atol=1e-4)


def test_backbone_zfold_mode_matches_sparse():
    """mode='zfold' (z folded into conv2d channel blocks) == sparse."""
    from seevcn_tpu.models.modules.backbone3d import VoxelBackBone8x
    from seevcn_tpu.models.modules.map_to_bev import height_compression

    rng = np.random.RandomState(12)
    st, dense, occ = _random_sparse(rng, dims=(25, 16, 24), cin=4)
    sparse_bb = VoxelBackBone8x(input_channels=4, mode="sparse",
                                capacities=[4096] * 4)
    zf_bb = VoxelBackBone8x(input_channels=4, mode="zfold")
    variables = sparse_bb.init({"params": jax.random.PRNGKey(0)}, st, False)
    out_s = sparse_bb.apply(variables, st, False)["encoded_spconv_tensor"]
    out_z = zf_bb.apply(variables, st, False)["encoded_spconv_tensor"]
    assert isinstance(out_z, SP.ZFoldTensor)
    bev_s = np.asarray(height_compression(out_s))
    bev_z = np.asarray(SP.zfold_height_compression(out_z))
    assert bev_z.shape == bev_s.shape
    np.testing.assert_allclose(bev_z, bev_s, rtol=1e-3, atol=1e-4)

    # gradients flow and are finite in zfold train mode
    def loss(params):
        out, _ = zf_bb.apply({"params": params,
                              "batch_stats": variables["batch_stats"]},
                             st, True, mutable=["batch_stats"])
        return jnp.sum(out["encoded_spconv_tensor"].features ** 2)

    g = jax.grad(loss)(variables["params"])
    total = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), g, 0.0)
    assert np.isfinite(total) and total > 0


def test_zfold_conv_unit_cases():
    """zfold_conv == dense conv3d for every backbone conv signature."""
    rng = np.random.RandomState(13)
    cases = [
        # (kernel, stride, padding, subm)
        (3, 1, 1, True),            # subm 3x3x3
        (3, 2, 1, False),           # stage downsample
        (3, 2, (0, 1, 1), False),   # conv4_down (z pad 0)
        ((3, 1, 1), (2, 1, 1), 0, False),  # conv_out
    ]
    for kernel, stride, padding, subm in cases:
        st, dense, occ = _random_sparse(rng, dims=(7, 10, 12), cin=5,
                                        density=0.2)
        ks = SP._as3(kernel)
        k = ks[0] * ks[1] * ks[2]
        w = jnp.asarray(rng.randn(k, 5, 6).astype(np.float32) * 0.3)
        zt = SP.to_zfold_tensor(st)
        out = SP.zfold_conv(zt, w, 6, kernel_size=kernel, stride=stride,
                            padding=padding, subm=subm)
        dt = SP.to_dense_tensor(st)
        ref = SP.dense_subm_conv3d(dt, w, kernel_size=kernel,
                                   padding=padding) if subm else \
            SP.dense_sparse_conv3d(dt, w, kernel_size=kernel, stride=stride,
                                   padding=padding)
        got = np.asarray(out.features).reshape(
            out.features.shape[0], out.features.shape[1],
            out.features.shape[2], out.z, out.channels)
        got = np.transpose(got, (0, 3, 1, 2, 4))     # -> (B, Z, Y, X, C)
        np.testing.assert_allclose(got, np.asarray(ref.features),
                                   atol=1e-4, err_msg=str((kernel, stride,
                                                           padding, subm)))
        occ_got = np.transpose(np.asarray(out.occ), (0, 3, 1, 2))
        np.testing.assert_array_equal(occ_got, np.asarray(ref.occ))


def test_zfold_bf16_finite_close():
    """bf16 zfold stays close to f32 (mixed-precision training dtype)."""
    from seevcn_tpu.models.modules.backbone3d import VoxelBackBone8x

    rng = np.random.RandomState(14)
    st, dense, occ = _random_sparse(rng, dims=(25, 16, 24), cin=4)
    f32_bb = VoxelBackBone8x(input_channels=4, mode="zfold")
    bf_bb = VoxelBackBone8x(input_channels=4, mode="zfold",
                            dtype="bfloat16")
    variables = f32_bb.init({"params": jax.random.PRNGKey(0)}, st, False)
    a = f32_bb.apply(variables, st, False)["encoded_spconv_tensor"]
    b = bf_bb.apply(variables, st, False)["encoded_spconv_tensor"]
    fa = np.asarray(a.features, np.float32)
    fb = np.asarray(b.features, np.float32)
    assert np.isfinite(fb).all()
    denom = np.maximum(np.abs(fa).max(), 1e-6)
    assert np.abs(fa - fb).max() / denom < 0.1


def test_col_subm_conv_matches_zfold():
    """col_subm_conv (active-column gather-GEMM) == zfold subm conv."""
    rng = np.random.RandomState(15)
    st, dense, occ = _random_sparse(rng, dims=(7, 10, 12), cin=5,
                                    density=0.2)
    w = jnp.asarray(rng.randn(27, 5, 6).astype(np.float32) * 0.3)
    ct = SP.to_col_tensor(st)
    out = SP.col_subm_conv(ct, w, 6, kernel_size=3, padding=1)
    ref = SP.zfold_conv(SP.to_zfold_tensor(st), w, 6, kernel_size=3,
                        padding=1, subm=True)
    # scatter column output onto the plane and compare
    got = SP.col_to_zfold(out)
    np.testing.assert_allclose(np.asarray(got.features),
                               np.asarray(ref.features), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got.occ), np.asarray(ref.occ))


def test_col_tensor_roundtrip():
    rng = np.random.RandomState(16)
    st, dense, occ = _random_sparse(rng, dims=(6, 9, 11), cin=4)
    ct = SP.to_col_tensor(st)
    zt = SP.col_to_zfold(ct)
    ref = SP.to_zfold_tensor(st)
    np.testing.assert_allclose(np.asarray(zt.features),
                               np.asarray(ref.features), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(zt.occ), np.asarray(ref.occ))


def test_col_conv_custom_vjp_matches_autodiff():
    """Scatter-free column-conv VJP == finite differences / plain autodiff
    of the same math in the zfold lowering."""
    rng = np.random.RandomState(17)
    st, dense, occ = _random_sparse(rng, dims=(5, 7, 8), cin=3)
    w = jnp.asarray(rng.randn(27, 3, 4).astype(np.float32) * 0.3)
    ct = SP.to_col_tensor(st)

    def f_col(feats, w):
        out = SP.col_subm_conv(ct._replace(features=feats), w, 4)
        return jnp.sum(out.features ** 2)

    zt = SP.to_zfold_tensor(st)

    def f_zf(zfeats, w):
        out = SP.zfold_conv(zt._replace(features=zfeats), w, 4,
                            kernel_size=3, padding=1, subm=True)
        return jnp.sum(out.features ** 2)

    gc_f, gc_w = jax.grad(f_col, argnums=(0, 1))(ct.features, w)
    gz_f, gz_w = jax.grad(f_zf, argnums=(0, 1))(zt.features, w)
    np.testing.assert_allclose(np.asarray(gc_w), np.asarray(gz_w),
                               rtol=1e-3, atol=1e-4)
    # feature grads: the column layout only HAS active columns (inactive
    # plane positions are structural zeros with no gradient), so compare at
    # active columns only
    gplane = SP.col_to_zfold(ct._replace(features=gc_f))
    active = np.asarray(ct.colmap >= 0)
    np.testing.assert_allclose(np.asarray(gplane.features)[active],
                               np.asarray(gz_f)[active],
                               rtol=1e-3, atol=1e-4)


def test_backbone_hybrid_mode_matches_sparse():
    """mode='hybrid' (stage-1 active-column + zfold rest) == sparse."""
    from seevcn_tpu.models.modules.backbone3d import VoxelBackBone8x
    from seevcn_tpu.models.modules.map_to_bev import height_compression

    rng = np.random.RandomState(18)
    st, dense, occ = _random_sparse(rng, dims=(25, 16, 24), cin=4)
    sparse_bb = VoxelBackBone8x(input_channels=4, mode="sparse",
                                capacities=[4096] * 4)
    hy_bb = VoxelBackBone8x(input_channels=4, mode="hybrid")
    variables = sparse_bb.init({"params": jax.random.PRNGKey(0)}, st, False)
    out_s = sparse_bb.apply(variables, st, False)["encoded_spconv_tensor"]
    out_h = hy_bb.apply(variables, st, False)["encoded_spconv_tensor"]
    assert isinstance(out_h, SP.ZFoldTensor)
    bev_s = np.asarray(height_compression(out_s))
    bev_h = np.asarray(SP.zfold_height_compression(out_h))
    np.testing.assert_allclose(bev_h, bev_s, rtol=1e-3, atol=1e-4)

    # train-mode grads flow and are finite
    def loss(params):
        out, _ = hy_bb.apply({"params": params,
                              "batch_stats": variables["batch_stats"]},
                             st, True, mutable=["batch_stats"])
        return jnp.sum(out["encoded_spconv_tensor"].features ** 2)

    g = jax.grad(loss)(variables["params"])
    total = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), g, 0.0)
    assert np.isfinite(total) and total > 0


def test_multi_scale_extraction_matches_sparse():
    """as_sparse stage-boundary extraction (VERDICT r2 #3 bridge): the
    hybrid-mode backbone's x_conv1..4, converted back to key-sorted
    SparseTensors, carry EXACTLY the rulebook path's active sets and
    features — so PV-RCNN/VoxelRCNN/Part-A2 consumers see identical
    inputs off the fast execution."""
    from seevcn_tpu.models.modules.backbone3d import VoxelBackBone8x

    rng = np.random.RandomState(21)
    st, dense, occ = _random_sparse(rng, dims=(25, 16, 24), cin=4)
    cap = st.features.shape[0]
    sparse_bb = VoxelBackBone8x(input_channels=4, mode="sparse",
                                capacities=[4096] * 4)
    hybrid_bb = VoxelBackBone8x(input_channels=4, mode="hybrid")
    variables = sparse_bb.init({"params": jax.random.PRNGKey(0)}, st, False)
    ms_s = sparse_bb.apply(variables, st, False)["multi_scale_3d_features"]
    ms_h = hybrid_bb.apply(variables, st, False)["multi_scale_3d_features"]

    for name in ("x_conv1", "x_conv2", "x_conv3", "x_conv4"):
        ref = ms_s[name]
        got = SP.as_sparse(ms_h[name], st.batch_size, 4096)
        km_ref = np.asarray(SP.linear_key(ref.coords, ref.spatial_shape,
                                          ref.mask))
        km_got = np.asarray(SP.linear_key(got.coords, got.spatial_shape,
                                          got.mask))
        ref_keys = np.sort(km_ref[np.asarray(ref.mask)])
        got_keys = np.sort(km_got[np.asarray(got.mask)])
        np.testing.assert_array_equal(ref_keys, got_keys), name
        # features match per key
        fr = {int(k): np.asarray(ref.features)[i]
              for i, k in enumerate(km_ref) if np.asarray(ref.mask)[i]}
        for i, k in enumerate(km_got):
            if not np.asarray(got.mask)[i]:
                continue
            np.testing.assert_allclose(np.asarray(got.features)[i],
                                       fr[int(k)], rtol=1e-3, atol=1e-4)
        # rows come out key-sorted (SparseTensor invariant)
        valid_keys = km_got[np.asarray(got.mask)]
        assert (np.diff(valid_keys) > 0).all()


def test_col_zdec_conv_matches_banded():
    """impl='zdec' (z decomposed out of the GEMM) == banded, values and
    grads."""
    rng = np.random.RandomState(23)
    st, dense, occ = _random_sparse(rng, dims=(5, 7, 8), cin=3)
    w = jnp.asarray(rng.randn(27, 3, 4).astype(np.float32) * 0.3)
    ct = SP.to_col_tensor(st)
    out_b = SP.col_subm_conv(ct, w, 4, impl="banded")
    out_z = SP.col_subm_conv(ct, w, 4, impl="zdec")
    np.testing.assert_allclose(np.asarray(out_z.features),
                               np.asarray(out_b.features),
                               rtol=1e-4, atol=1e-5)

    def f(feats, w, impl):
        out = SP.col_subm_conv(ct._replace(features=feats), w, 4, impl=impl)
        return jnp.sum(out.features ** 2)

    gb_f, gb_w = jax.grad(f, argnums=(0, 1))(ct.features, w, "banded")
    gz_f, gz_w = jax.grad(f, argnums=(0, 1))(ct.features, w, "zdec")
    np.testing.assert_allclose(np.asarray(gz_w), np.asarray(gb_w),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gz_f), np.asarray(gb_f),
                               rtol=1e-3, atol=1e-4)


def test_zgroup_conv_matches_band():
    """impl='zgroup' (z-slab batched conv2d) == impl='band' for every
    backbone conv signature and several (zin, cout) combos."""
    rng = np.random.RandomState(29)
    cases = [
        # (kernel, stride, padding, subm, cin, cout, dims)
        (3, 1, 1, True, 5, 6, (7, 10, 12)),        # subm, tiny channels
        (3, 1, 1, True, 16, 16, (27, 8, 9)),       # stage-1 shape (z=27)
        (3, 2, 1, False, 16, 32, (27, 8, 9)),      # conv2_down
        (3, 1, 1, True, 32, 32, (14, 8, 9)),       # stage-2 subm
        (3, 2, (0, 1, 1), False, 64, 64, (7, 8, 9)),  # conv4_down (z pad 0)
        ((3, 1, 1), (2, 1, 1), 0, False, 64, 128, (5, 8, 9)),  # conv_out
    ]
    for kernel, stride, padding, subm, cin, cout, dims in cases:
        st, dense, occ = _random_sparse(rng, dims=dims, cin=cin,
                                        density=0.25)
        ks = SP._as3(kernel)
        k = ks[0] * ks[1] * ks[2]
        w = jnp.asarray(rng.randn(k, cin, cout).astype(np.float32) * 0.3)
        zt = SP.to_zfold_tensor(st)
        kw = dict(kernel_size=kernel, stride=stride, padding=padding,
                  subm=subm)
        ref = SP.zfold_conv(zt, w, cout, impl="band", **kw)
        for impl, g in (("zgroup", None), ("zblock", None), ("zblock", 3),
                        ("zblock", 16)):
            got = SP.zfold_conv(zt, w, cout, impl=impl, zblock_g=g, **kw)
            assert got.z == ref.z and got.channels == ref.channels
            np.testing.assert_allclose(np.asarray(got.features),
                                       np.asarray(ref.features), atol=1e-4,
                                       err_msg=str((impl, kernel, stride,
                                                    padding, subm, cin,
                                                    cout, dims)))
            np.testing.assert_array_equal(np.asarray(got.occ),
                                          np.asarray(ref.occ))


def test_extraction_capacity_overflow_audit():
    """ADVICE r3 (medium): a stride-2 k3 conv EXPANDS isolated voxels (up
    to 8 outputs each), so extraction capacity pinned to the input count
    silently drops actives. active_count() must expose the true active
    set so callers/tests can audit, and as_sparse at sufficient capacity
    must capture every active the rulebook path produces."""
    # 4 isolated voxels at ODD coords (stride-2 k3 p1: an odd coordinate
    # feeds 2 output positions per axis -> 8 outputs per isolated voxel)
    coords = np.array([[0, 3, 3, 3], [0, 11, 11, 11],
                       [0, 3, 11, 3], [0, 11, 3, 11]], np.int32)
    dims = (16, 16, 16)
    n, cin = len(coords), 3
    key = ((coords[:, 0] * dims[0] + coords[:, 1]) * dims[1]
           + coords[:, 2]) * dims[2] + coords[:, 3]
    order = np.argsort(key)
    coords = coords[order]
    rng = np.random.RandomState(3)
    feats = rng.randn(n, cin).astype(np.float32)
    st = SP.make_sparse_tensor(jnp.asarray(feats), jnp.asarray(coords),
                               jnp.ones(n, bool), dims, 1)

    layer_kw = dict(subm=False, stride=2, padding=1)
    from seevcn_tpu.models.modules.backbone3d import SpConvLayer
    sparse_layer = SpConvLayer(8, out_capacity=64, **layer_kw)
    variables = sparse_layer.init({"params": jax.random.PRNGKey(0)}, st, False)
    out_sparse = sparse_layer.apply(variables, st, False)
    n_true = int(np.asarray(SP.active_count(out_sparse)))
    assert n_true > n, n_true     # the expansion actually happened

    # zfold execution of the same conv
    zt = SP.to_zfold_tensor(st)
    out_z = sparse_layer.apply(variables, zt, False)
    assert int(np.asarray(SP.active_count(out_z))) == n_true

    # undersized extraction (input count) drops actives; sized captures all
    got_small = SP.as_sparse(out_z, 1, n)
    assert int(np.asarray(got_small.mask.sum())) == n < n_true
    got = SP.as_sparse(out_z, 1, 2 * n_true)
    km_ref = np.asarray(SP.linear_key(out_sparse.coords,
                                      out_sparse.spatial_shape,
                                      out_sparse.mask))
    km_got = np.asarray(SP.linear_key(got.coords, got.spatial_shape,
                                      got.mask))
    np.testing.assert_array_equal(
        np.sort(km_ref[np.asarray(out_sparse.mask)]),
        np.sort(km_got[np.asarray(got.mask)]))

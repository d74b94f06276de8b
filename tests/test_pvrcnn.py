import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seevcn_tpu.ops.pointnet2 import ball_query, group_features, masked_max_pool
from seevcn_tpu.utils.config import Cfg
from seevcn_tpu.models.detectors.second import build_detector
from test_detector import _mini_cfg, _fake_batch

pytestmark = pytest.mark.slow  # heavy tier: full model/backbone builds


def test_ball_query_first_n_within_radius():
    support = jnp.asarray(np.array(
        [[0, 0, 0], [0.1, 0, 0], [0.2, 0, 0], [5, 0, 0], [0.05, 0, 0]], np.float32))
    q = jnp.asarray(np.array([[0.0, 0, 0]], np.float32))
    idx, valid = ball_query(q, support, radius=0.3, nsample=3)
    # first 3 in-index-order within radius: 0, 1, 2 (4 is in radius but later)
    assert idx[0].tolist() == [0, 1, 2]
    assert valid[0].all()
    # no support in radius -> all invalid
    q2 = jnp.asarray(np.array([[100.0, 0, 0]], np.float32))
    idx2, valid2 = ball_query(q2, support, radius=0.3, nsample=3)
    assert not valid2.any()


def test_ball_query_respects_support_mask():
    support = jnp.asarray(np.array([[0, 0, 0], [0.1, 0, 0]], np.float32))
    q = jnp.asarray(np.array([[0.0, 0, 0]], np.float32))
    mask = jnp.asarray([False, True])
    idx, valid = ball_query(q, support, 0.3, 2, support_valid=mask)
    assert valid[0].tolist() == [True, False]
    assert idx[0, 0] == 1


def test_group_and_pool():
    support = jnp.asarray(np.array([[1, 0, 0], [2, 0, 0]], np.float32))
    feats = jnp.asarray(np.array([[10.0], [20.0]], np.float32))
    q = jnp.asarray(np.array([[1.0, 0, 0]], np.float32))
    idx, valid = ball_query(q, support, 1.5, 2)
    g = group_features(idx, valid, q, support, feats)
    assert g.shape == (1, 2, 4)
    np.testing.assert_allclose(np.asarray(g)[0, 0], [0, 0, 0, 10])
    pooled = masked_max_pool(g, valid)
    np.testing.assert_allclose(np.asarray(pooled)[0], [1, 0, 0, 20])


def _pvrcnn_cfg():
    cfg = _mini_cfg()
    cfg.MODEL.NAME = "PVRCNN"
    cfg.MODEL.PFE = Cfg({
        "NAME": "VoxelSetAbstraction", "POINT_SOURCE": "raw_points",
        "NUM_KEYPOINTS": 256, "NUM_OUTPUT_FEATURES": 32,
        "SAMPLE_METHOD": "FPS",
        "FEATURES_SOURCE": ["bev", "x_conv3", "x_conv4", "raw_points"],
        "SA_LAYER": {
            "raw_points": {"MLPS": [[8, 8], [8, 8]], "POOL_RADIUS": [0.4, 0.8],
                           "NSAMPLE": [8, 8]},
            "x_conv3": {"DOWNSAMPLE_FACTOR": 4, "MLPS": [[16, 16], [16, 16]],
                        "POOL_RADIUS": [1.2, 2.4], "NSAMPLE": [8, 8]},
            "x_conv4": {"DOWNSAMPLE_FACTOR": 8, "MLPS": [[16, 16], [16, 16]],
                        "POOL_RADIUS": [2.4, 4.8], "NSAMPLE": [8, 8]},
        }})
    cfg.MODEL.POINT_HEAD = Cfg({
        "NAME": "PointHeadSimple", "CLS_FC": [32, 32], "CLASS_AGNOSTIC": True,
        "USE_POINT_FEATURES_BEFORE_FUSION": True,
        "TARGET_CONFIG": {"GT_EXTRA_WIDTH": [0.2, 0.2, 0.2]},
        "LOSS_CONFIG": {"LOSS_REG": "smooth-l1",
                        "LOSS_WEIGHTS": {"point_cls_weight": 1.0}}})
    cfg.MODEL.ROI_HEAD = Cfg({
        "NAME": "PVRCNNHead", "CLASS_AGNOSTIC": True,
        "SHARED_FC": [32, 32], "CLS_FC": [32, 32], "REG_FC": [32, 32],
        "DP_RATIO": 0.3,
        "NMS_CONFIG": {
            "TRAIN": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                      "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 16,
                      "NMS_THRESH": 0.8},
            "TEST": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                     "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 16,
                     "NMS_THRESH": 0.85}},
        "ROI_GRID_POOL": {"GRID_SIZE": 4, "MLPS": [[16, 16], [16, 16]],
                          "POOL_RADIUS": [0.8, 1.6], "NSAMPLE": [8, 8],
                          "POOL_METHOD": "max_pool"},
        "TARGET_CONFIG": {"BOX_CODER": "ResidualCoder", "ROI_PER_IMAGE": 16,
                          "FG_RATIO": 0.5, "SAMPLE_ROI_BY_EACH_CLASS": True,
                          "CLS_SCORE_TYPE": "roi_iou", "CLS_FG_THRESH": 0.75,
                          "CLS_BG_THRESH": 0.25, "CLS_BG_THRESH_LO": 0.1,
                          "HARD_BG_RATIO": 0.8, "REG_FG_THRESH": 0.55},
        "LOSS_CONFIG": {"CLS_LOSS": "BinaryCrossEntropy", "REG_LOSS": "smooth-l1",
                        "CORNER_LOSS_REGULARIZATION": True,
                        "LOSS_WEIGHTS": {"rcnn_cls_weight": 1.0,
                                         "rcnn_reg_weight": 1.0,
                                         "rcnn_corner_weight": 1.0,
                                         "code_weights": [1.0] * 7}}})
    return cfg


@pytest.fixture(scope="module")
def pvrcnn():
    cfg = _pvrcnn_cfg()
    model, dcfg = build_detector(cfg)
    rng = np.random.RandomState(0)
    pts, valid, gt = _fake_batch(rng, b=2, p=400)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pts, valid,
                           train=False)
    return cfg, model, dcfg, variables, (pts, valid, gt)


def test_pvrcnn_eval_forward(pvrcnn):
    cfg, model, dcfg, variables, (pts, valid, gt) = pvrcnn
    out = model.apply(variables, pts, valid, train=False)
    assert out["keypoints"].shape == (2, 256, 3)
    assert out["rcnn_cls"].shape == (2, 16)
    assert out["rcnn_reg"].shape == (2, 16, 7)
    assert out["rois"].shape[:2] == (2, 16)
    assert np.isfinite(np.asarray(out["rois"])).all()

    from seevcn_tpu.models.detectors.second import post_processing
    post = post_processing(out, cfg.MODEL.POST_PROCESSING, 1, has_roi_head=True)
    assert post["pred_boxes"].shape[2] == 7
    assert np.isfinite(np.asarray(post["pred_boxes"])).all()


def test_pvrcnn_train_loss_and_grads(pvrcnn):
    cfg, model, dcfg, variables, (pts, valid, gt) = pvrcnn

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pts, valid, gt_boxes=gt, train=True, rng=jax.random.PRNGKey(1),
            rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"])
        return model.loss(out, gt)

    (loss, tb), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(loss))
    for k in ("rpn_loss", "point_loss_cls", "rcnn_loss_cls", "rcnn_loss_reg",
              "rcnn_loss_corner"):
        assert np.isfinite(float(tb[k])), k
    g = jax.tree_util.tree_reduce(lambda a, x: a + float(jnp.abs(x).sum()),
                                  grads, 0.0)
    assert np.isfinite(g) and g > 0


def test_canonical_roundtrip():
    """decode_rcnn_boxes(encode(gt)) must reproduce gt boxes."""
    from seevcn_tpu.models.modules.box_coder import ResidualCoder
    from seevcn_tpu.models.modules.pvrcnn_head import (canonical_gt_of_rois,
                                                       decode_rcnn_boxes)

    rng = np.random.RandomState(0)
    rois = np.concatenate([rng.uniform(-10, 10, (1, 8, 3)),
                           rng.uniform(2, 5, (1, 8, 3)),
                           rng.uniform(-np.pi, np.pi, (1, 8, 1))], -1)
    gt = rois + rng.uniform(-0.2, 0.2, rois.shape)
    rois = jnp.asarray(rois, jnp.float32)
    gt = jnp.asarray(gt, jnp.float32)
    coder = ResidualCoder()
    canon = canonical_gt_of_rois(rois, gt)
    anchor = jnp.concatenate([jnp.zeros_like(rois[..., :3]), rois[..., 3:6],
                              jnp.zeros_like(rois[..., 6:7])], -1)
    enc = coder.encode(canon, anchor)
    dec = decode_rcnn_boxes(rois, enc)
    np.testing.assert_allclose(np.asarray(dec[..., :6]), np.asarray(gt[..., :6]),
                               atol=1e-3)
    # headings equal mod pi (canonical frame folds opposite directions)
    d = np.abs(np.asarray(dec[..., 6]) - np.asarray(gt[..., 6])) % np.pi
    d = np.minimum(d, np.pi - d)
    np.testing.assert_allclose(d, 0, atol=1e-3)


def test_pvrcnn_plusplus_forward_and_loss():
    from seevcn_tpu.utils.config import Cfg

    cfg = _pvrcnn_cfg()
    cfg.MODEL.NAME = "PVRCNNPlusPlus"
    cfg.MODEL.PFE["ROI_NEIGHBOR_RADIUS"] = 2.4
    model, dcfg = build_detector(cfg)
    rng = np.random.RandomState(1)
    pts, valid, gt = _fake_batch(rng, b=2, p=400)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pts, valid,
                           train=False)
    out = model.apply(variables, pts, valid, train=False)
    assert out["rois"].shape == (2, 16, 7)
    assert np.isfinite(np.asarray(out["rois"])).all()

    def loss_fn(params):
        o, _ = model.apply({"params": params,
                            "batch_stats": variables["batch_stats"]},
                           pts, valid, gt_boxes=gt, train=True,
                           rng=jax.random.PRNGKey(1),
                           rngs={"dropout": jax.random.PRNGKey(2)},
                           mutable=["batch_stats"])
        return model.loss(o, gt)

    (loss, tb), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(loss))


def test_vectorpool_aggregation():
    """VectorPool (PV-RCNN++ SA_LAYER NAME: VectorPoolAggregationModuleMSG):
    per-bin means of a local sub-voxel grid; empty bins contribute zeros and
    neighbors bin deterministically by relative position."""
    import jax
    import jax.numpy as jnp
    from seevcn_tpu.models.modules.pfe import (VectorPoolAggregation,
                                               build_sa_layer)
    from seevcn_tpu.utils.config import Cfg

    rng = np.random.RandomState(0)
    support = jnp.asarray(rng.uniform(-2, 2, (2, 200, 3)).astype(np.float32))
    feats = jnp.asarray(rng.randn(2, 200, 8).astype(np.float32))
    valid = jnp.ones((2, 200), bool)
    new_xyz = jnp.asarray(np.array([[[0, 0, 0], [1, 1, 0]],
                                    [[0.5, 0, 0], [-1, 1, 0]]], np.float32))

    mod = VectorPoolAggregation(num_local_voxel=(2, 2, 2),
                                max_neighbor_distance=0.5, nsample=32,
                                post_mlps=(16,), num_reduced_channels=4)
    variables = mod.init(jax.random.PRNGKey(0), new_xyz, support, feats,
                         valid)
    out = mod.apply(variables, new_xyz, support, feats, valid)
    assert out.shape == (2, 2, 16)
    assert np.isfinite(np.asarray(out)).all()

    # config-driven MSG build
    sa_cfg = Cfg({"NAME": "VectorPoolAggregationModuleMSG", "NUM_GROUPS": 2,
                  "NUM_REDUCED_CHANNELS": 4, "MSG_POST_MLPS": [24],
                  "GROUP_CFG_0": {"NUM_LOCAL_VOXEL": [2, 2, 2],
                                  "MAX_NEIGHBOR_DISTANCE": 0.2,
                                  "NEIGHBOR_NSAMPLE": -1,
                                  "POST_MLPS": [16, 16]},
                  "GROUP_CFG_1": {"NUM_LOCAL_VOXEL": [3, 3, 3],
                                  "MAX_NEIGHBOR_DISTANCE": 0.4,
                                  "NEIGHBOR_NSAMPLE": -1,
                                  "POST_MLPS": [16, 16]}})
    msg = build_sa_layer(sa_cfg, name="sa_test")
    v2 = msg.init(jax.random.PRNGKey(1), new_xyz, support, feats, valid)
    out2 = msg.apply(v2, new_xyz, support, feats, valid)
    assert out2.shape == (2, 2, 24)
    assert np.isfinite(np.asarray(out2)).all()


def test_pvrcnn_plusplus_with_vectorpool():
    """PV-RCNN++ end-to-end with VectorPool SA layers (the reference
    pv_rcnn_plusplus.yaml aggregation), train forward + loss finite."""
    import jax
    import jax.numpy as jnp

    cfg = _pvrcnn_cfg()
    cfg.MODEL.NAME = "PVRCNNPlusPlus"
    cfg.MODEL.PFE["ROI_NEIGHBOR_RADIUS"] = 2.4
    for src in ("raw_points", "x_conv3", "x_conv4"):
        if src in cfg.MODEL.PFE["SA_LAYER"]:
            base = cfg.MODEL.PFE["SA_LAYER"][src]
            cfg.MODEL.PFE["SA_LAYER"][src] = Cfg({
                "NAME": "VectorPoolAggregationModuleMSG", "NUM_GROUPS": 1,
                "NUM_REDUCED_CHANNELS": 4, "MSG_POST_MLPS": [32],
                "DOWNSAMPLE_FACTOR": base.get("DOWNSAMPLE_FACTOR", 1),
                "GROUP_CFG_0": {"NUM_LOCAL_VOXEL": [2, 2, 2],
                                "MAX_NEIGHBOR_DISTANCE": 0.4,
                                "NEIGHBOR_NSAMPLE": -1, "POST_MLPS": [32]}})
    model, dcfg = build_detector(cfg)
    pts, pv, gt = _fake_batch(np.random.RandomState(1), b=2, p=400)
    variables = jax.jit(lambda p, v: model.init(
        {"params": jax.random.PRNGKey(0)}, p, v, train=False))(pts, pv)
    out, _ = jax.jit(lambda v, p, pv2, g: model.apply(
        v, p, pv2, gt_boxes=g, train=True, rng=jax.random.PRNGKey(1),
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"]))(variables, pts, pv, gt)
    loss, tb = model.loss(out, gt)
    assert np.isfinite(float(loss)), tb


def test_pvrcnn_jitted_train_step():
    """Regression: BatchNorm inside jax.vmap leaked tracers under an outer
    jit, so PV-RCNN could not train through the jitted CLI train step. SA
    layers are now batched with flat BN."""
    from seevcn_tpu.train.train import create_train_state, make_train_step

    cfg = _pvrcnn_cfg()
    model, dcfg = build_detector(cfg)
    pts, valid, gt = _fake_batch(np.random.RandomState(2), b=2, p=400)
    variables = jax.jit(lambda p, v: model.init(
        {"params": jax.random.PRNGKey(0)}, p, v, train=False))(pts, valid)
    opt = Cfg({"OPTIMIZER": "adam_onecycle", "LR": 1e-3, "WEIGHT_DECAY": 0.01,
               "MOMS": [0.95, 0.85], "PCT_START": 0.4, "DIV_FACTOR": 10,
               "GRAD_NORM_CLIP": 10})
    state = create_train_state(model, variables, opt, total_steps=4)
    step = make_train_step(model, jit=True, donate=False)
    state, metrics = step(state, pts, valid, gt, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_pvrcnn_plusplus_spc_sampling():
    """SAMPLE_METHOD: SPC (pv_rcnn_plusplus.yaml:77-80) routes keypoint
    sampling through sample_points_with_roi + sector_fps
    (voxel_set_abstraction.py:206-224): eval forward works and the train
    path differentiates."""
    cfg = _pvrcnn_cfg()
    cfg.MODEL.NAME = "PVRCNNPlusPlus"
    cfg.MODEL.PFE["SAMPLE_METHOD"] = "SPC"
    cfg.MODEL.PFE["SPC_SAMPLING"] = {"NUM_SECTORS": 6,
                                     "SAMPLE_RADIUS_WITH_ROI": 1.6}
    model, dcfg = build_detector(cfg)
    rng = np.random.RandomState(3)
    pts, valid, gt = _fake_batch(rng, b=2, p=400)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pts, valid,
                           train=False)
    out = model.apply(variables, pts, valid, train=False)
    assert out["rois"].shape == (2, 16, 7)
    assert np.isfinite(np.asarray(out["rois"])).all()
    kp = np.asarray(out["keypoints"])
    assert np.isfinite(kp).all()

    def loss_fn(params):
        o, _ = model.apply({"params": params,
                            "batch_stats": variables["batch_stats"]},
                           pts, valid, gt_boxes=gt, train=True,
                           rng=jax.random.PRNGKey(1),
                           rngs={"dropout": jax.random.PRNGKey(2)},
                           mutable=["batch_stats"])
        return model.loss(o, gt)

    (loss, tb), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(loss))


def _assert_ball_query_close(gi, gv, di, dv, sup, q, radius, valid=None):
    """Exact first-N equality on CPU (approx_max_k lowers to the exact
    sort there); on TPU recall-0.95 selection may swap in-radius members
    between the two paths, so assert the contract instead: every
    selected support is valid + in radius, and the selected sets overlap
    >= 90% per query."""
    gi, gv = np.asarray(gi), np.asarray(gv)
    di, dv = np.asarray(di), np.asarray(dv)
    if jax.default_backend() == "cpu":
        np.testing.assert_array_equal(gv, dv)
        np.testing.assert_array_equal(gi[gv], di[dv])
        return
    d = np.linalg.norm(sup[gi] - q[:, None], axis=-1)
    assert (d[gv] <= radius + 1e-4).all()
    if valid is not None:
        assert valid[gi[gv]].all()
    inter = sum(len(set(a[m]) & set(b[n]))
                for a, m, b, n in zip(gi, gv, di, dv))
    assert inter >= 0.9 * max(dv.sum(), 1)


def test_grid_ball_query_matches_dense():
    """Hash-grid ball query == dense first-N-by-index semantics
    (the CUDA ball_query contract) on random clouds, incl. masks."""
    from seevcn_tpu.ops.pointnet2 import _dense_ball_query, grid_ball_query

    rng = np.random.RandomState(7)
    sup = rng.uniform(-20, 20, (3000, 3)).astype(np.float32)
    q = rng.uniform(-20, 20, (128, 3)).astype(np.float32)
    valid = rng.rand(3000) < 0.9
    for radius, ns in ((1.0, 8), (3.0, 16)):
        gi, gv = grid_ball_query(jnp.asarray(q), jnp.asarray(sup),
                                 radius, ns, jnp.asarray(valid))
        di, dv = _dense_ball_query(jnp.asarray(q), jnp.asarray(sup),
                                   radius, ns, jnp.asarray(valid))
        _assert_ball_query_close(gi, gv, di, dv, sup, q, radius, valid)


def test_grid_ball_query_dispatch_threshold():
    """ball_query() routes large supports through the grid path and the
    results still honour first-N ordering."""
    from seevcn_tpu.ops.pointnet2 import (_GRID_BQ_MIN_SUPPORT, ball_query,
                                          _dense_ball_query)

    rng = np.random.RandomState(8)
    n = _GRID_BQ_MIN_SUPPORT
    sup = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
    q = sup[rng.choice(n, 64, replace=False)] + 0.05
    gi, gv = ball_query(jnp.asarray(q), jnp.asarray(sup), 0.5, 8)
    di, dv = _dense_ball_query(jnp.asarray(q), jnp.asarray(sup), 0.5, 8)
    _assert_ball_query_close(gi, gv, di, dv, sup, q, 0.5)

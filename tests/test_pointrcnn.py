import pytest

import numpy as np
import jax
import jax.numpy as jnp

from seevcn_tpu.utils.config import Cfg
from seevcn_tpu.models.detectors.second import build_detector
from test_detector import _mini_cfg, _fake_batch

pytestmark = pytest.mark.slow  # heavy tier: full model/backbone builds


def _prcnn_cfg():
    cfg = _mini_cfg()
    cfg.MODEL.NAME = "PointRCNN"
    cfg.MODEL.BACKBONE_3D = Cfg({
        "NAME": "PointNet2MSG",
        "SA_CONFIG": {"NPOINTS": [128, 32],
                      "RADIUS": [[0.5, 1.0], [1.0, 2.0]],
                      "NSAMPLE": [[8, 8], [8, 8]],
                      "MLPS": [[[8, 8], [8, 8]], [[16, 16], [16, 16]]]},
        "FP_MLPS": [[16, 16], [16, 16]]})
    cfg.MODEL.POINT_HEAD = Cfg({
        "NAME": "PointHeadBox", "CLS_FC": [32], "REG_FC": [32],
        "CLASS_AGNOSTIC": False,
        "TARGET_CONFIG": {"GT_EXTRA_WIDTH": [0.2, 0.2, 0.2],
                          "BOX_CODER": "PointResidualCoder",
                          "BOX_CODER_CONFIG": {"use_mean_size": True,
                                               "mean_size": [[3.9, 1.6, 1.56]]}},
        "LOSS_CONFIG": {"LOSS_WEIGHTS": {"point_cls_weight": 1.0,
                                         "point_box_weight": 1.0}}})
    cfg.MODEL.ROI_HEAD = Cfg({
        "NAME": "PointRCNNHead", "CLASS_AGNOSTIC": True,
        "ROI_POINT_POOL": {"POOL_EXTRA_WIDTH": [0, 0, 0],
                           "NUM_SAMPLED_POINTS": 64, "DEPTH_NORMALIZER": 70.0},
        "XYZ_UP_LAYER": [16, 16], "CLS_FC": [32], "REG_FC": [32],
        "DP_RATIO": 0.0, "USE_BN": False,
        "NMS_CONFIG": {
            "TRAIN": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                      "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 16,
                      "NMS_THRESH": 0.8},
            "TEST": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                     "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 16,
                     "NMS_THRESH": 0.85}},
        "TARGET_CONFIG": {"BOX_CODER": "ResidualCoder", "ROI_PER_IMAGE": 16,
                          "FG_RATIO": 0.5, "SAMPLE_ROI_BY_EACH_CLASS": True,
                          "CLS_SCORE_TYPE": "cls", "CLS_FG_THRESH": 0.6,
                          "CLS_BG_THRESH": 0.45, "CLS_BG_THRESH_LO": 0.1,
                          "HARD_BG_RATIO": 0.8, "REG_FG_THRESH": 0.55},
        "LOSS_CONFIG": {"CLS_LOSS": "BinaryCrossEntropy", "REG_LOSS": "smooth-l1",
                        "CORNER_LOSS_REGULARIZATION": True,
                        "LOSS_WEIGHTS": {"rcnn_cls_weight": 1.0,
                                         "rcnn_reg_weight": 1.0,
                                         "rcnn_corner_weight": 1.0,
                                         "code_weights": [1.0] * 7}}})
    return cfg


def test_pointrcnn_forward_and_loss():
    cfg = _prcnn_cfg()
    model, dcfg = build_detector(cfg)
    rng = np.random.RandomState(0)
    pts, valid, gt = _fake_batch(rng, b=2, p=256)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pts, valid,
                           train=False)
    out = model.apply(variables, pts, valid, train=False)
    assert out["batch_box_preds"].shape == (2, 256, 7)
    assert out["rois"].shape == (2, 16, 7)
    assert np.isfinite(np.asarray(out["rois"])).all()

    def loss_fn(params):
        o, _ = model.apply({"params": params,
                            "batch_stats": variables["batch_stats"]},
                           pts, valid, gt_boxes=gt, train=True,
                           rng=jax.random.PRNGKey(1),
                           mutable=["batch_stats"])
        return model.loss(o, gt)

    (loss, tb), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(loss))
    for k in ("point_loss_cls", "point_loss_box", "rcnn_loss_cls"):
        assert np.isfinite(float(tb[k])), k
    g = jax.tree_util.tree_reduce(lambda a, x: a + float(jnp.abs(x).sum()),
                                  grads, 0.0)
    assert g > 0


def test_point_residual_coder_roundtrip():
    from seevcn_tpu.models.modules.pointnet2_backbone import PointResidualCoder

    rng = np.random.RandomState(0)
    coder = PointResidualCoder(mean_size=[[3.9, 1.6, 1.56], [0.8, 0.6, 1.73]])
    pts = jnp.asarray(rng.uniform(-10, 10, (20, 3)).astype(np.float32))
    boxes = jnp.asarray(np.concatenate(
        [rng.uniform(-10, 10, (20, 3)), rng.uniform(1, 4, (20, 3)),
         rng.uniform(-np.pi, np.pi, (20, 1))], 1).astype(np.float32))
    cls = jnp.asarray(rng.randint(1, 3, 20))
    enc = coder.encode(boxes, pts, cls)
    dec = coder.decode(enc, pts, cls)
    np.testing.assert_allclose(np.asarray(dec[:, :6]), np.asarray(boxes[:, :6]),
                               atol=1e-4)
    d = np.abs(np.asarray(dec[:, 6]) - np.asarray(boxes[:, 6])) % (2 * np.pi)
    d = np.minimum(d, 2 * np.pi - d)
    np.testing.assert_allclose(d, 0, atol=1e-4)

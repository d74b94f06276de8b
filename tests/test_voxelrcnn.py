import pytest

import numpy as np
import jax
import jax.numpy as jnp

from seevcn_tpu.utils.config import Cfg
from seevcn_tpu.models.detectors.second import build_detector
from test_detector import _mini_cfg, _fake_batch

pytestmark = pytest.mark.slow  # heavy tier: full model/backbone builds


def _vr_cfg():
    cfg = _mini_cfg()
    cfg.MODEL.NAME = "VoxelRCNN"
    cfg.MODEL.ROI_HEAD = Cfg({
        "NAME": "VoxelRCNNHead", "CLASS_AGNOSTIC": True,
        "SHARED_FC": [64, 64], "CLS_FC": [32], "REG_FC": [32], "DP_RATIO": 0.3,
        "NMS_CONFIG": {
            "TRAIN": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                      "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 16,
                      "NMS_THRESH": 0.8},
            "TEST": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                     "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 16,
                     "NMS_THRESH": 0.7}},
        "ROI_GRID_POOL": {
            "FEATURES_SOURCE": ["x_conv3", "x_conv4"], "PRE_MLP": True,
            "GRID_SIZE": 4,
            "POOL_LAYERS": {
                "x_conv3": {"MLPS": [[16, 16]], "QUERY_RANGES": [[4, 4, 4]],
                            "POOL_RADIUS": [1.2], "NSAMPLE": [8],
                            "POOL_METHOD": "max_pool"},
                "x_conv4": {"MLPS": [[16, 16]], "QUERY_RANGES": [[4, 4, 4]],
                            "POOL_RADIUS": [2.4], "NSAMPLE": [8],
                            "POOL_METHOD": "max_pool"}}},
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


def test_voxelrcnn_forward_and_loss():
    cfg = _vr_cfg()
    model, dcfg = build_detector(cfg)
    rng = np.random.RandomState(0)
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
    g = jax.tree_util.tree_reduce(lambda a, x: a + float(jnp.abs(x).sum()),
                                  grads, 0.0)
    assert g > 0

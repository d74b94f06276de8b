import pytest

import numpy as np
import jax
import jax.numpy as jnp

from seevcn_tpu.utils.config import Cfg
from seevcn_tpu.models.detectors.second import build_detector
from test_detector import _mini_cfg, _fake_batch

pytestmark = pytest.mark.slow  # heavy tier: full model/backbone builds


def _pa2_cfg():
    cfg = _mini_cfg()
    cfg.MODEL.NAME = "PartA2Net"
    cfg.MODEL.BACKBONE_3D = Cfg({"NAME": "UNetV2"})
    cfg.MODEL.POINT_HEAD = Cfg({"NAME": "PointIntraPartOffsetHead"})
    cfg.MODEL.ROI_HEAD = Cfg({
        "NAME": "PartA2FCHead", "CLASS_AGNOSTIC": True,
        "SHARED_FC": [64, 64], "CLS_FC": [32], "REG_FC": [32], "DP_RATIO": 0.0,
        "ROI_GRID_POOL": {"GRID_SIZE": 4},
        "POOL_RADIUS": 0.4, "POOL_MLP": [16, 16],
        "NMS_CONFIG": {
            "TRAIN": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                      "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 16,
                      "NMS_THRESH": 0.8},
            "TEST": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                     "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 16,
                     "NMS_THRESH": 0.7}},
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


def test_parta2_forward_and_loss():
    cfg = _pa2_cfg()
    model, dcfg = build_detector(cfg, max_voxels=512)
    rng = np.random.RandomState(0)
    pts, valid, gt = _fake_batch(rng, b=2, p=400)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pts, valid,
                           train=False)
    out = model.apply(variables, pts, valid, train=False)
    assert out["rois"].shape == (2, 16, 7)
    # B * (max_voxels * UNetV2.extract_capacity_mult) extraction rows
    from seevcn_tpu.models.modules.unet3d import UNetV2
    ecap = int(round(512 * UNetV2.extract_capacity_mult))
    assert out["seg_logits"].shape == (2 * ecap,)
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
    for k in ("seg_loss", "part_loss", "rcnn_loss_cls"):
        assert np.isfinite(float(tb[k])), k
    g = jax.tree_util.tree_reduce(lambda a, x: a + float(jnp.abs(x).sum()),
                                  grads, 0.0)
    assert g > 0


def test_roiaware_pool3d_exact():
    """Each in-box point lands in exactly its grid cell; max/avg pooled;
    out-of-box and invalid points ignored (reference roiaware_pool3d)."""
    import jax.numpy as jnp
    from seevcn_tpu.ops.roiaware import roiaware_pool3d

    # axis-aligned box at origin, G=2: cell index = (x>0, y>0, z>0)
    rois = jnp.asarray([[0, 0, 0, 4.0, 2.0, 1.6, 0.0]])
    xyz = jnp.asarray([[-1.0, -0.5, -0.4],   # cell (0,0,0) -> flat 0
                       [1.0, 0.5, 0.4],      # cell (1,1,1) -> flat 7
                       [1.0, -0.5, 0.4],     # cell (1,0,1) -> flat 5
                       [9.0, 9.0, 9.0],      # outside
                       [-1.0, -0.5, -0.4]])  # cell 0 again (for max/avg)
    feats = jnp.asarray([[1.0], [2.0], [3.0], [99.0], [5.0]])
    valid = jnp.asarray([True, True, True, True, False])

    mx = np.asarray(roiaware_pool3d(rois, xyz, feats, valid, grid_size=2,
                                    method="max"))[0]
    assert mx[0, 0] == 1.0          # invalid 5.0 ignored
    assert mx[7, 0] == 2.0
    assert mx[5, 0] == 3.0
    assert mx[1, 0] == 0.0          # empty cell -> 0
    assert (mx != 99.0).all()       # outside point never pooled

    valid2 = jnp.asarray([True, True, True, True, True])
    av = np.asarray(roiaware_pool3d(rois, xyz, feats, valid2, grid_size=2,
                                    method="avg"))[0]
    np.testing.assert_allclose(av[0, 0], 3.0)   # mean(1, 5)

    # rotated box: point ahead of the box center along heading lands in +x cells
    rois_r = jnp.asarray([[0, 0, 0, 4.0, 2.0, 1.6, np.pi / 2]])
    xyz_r = jnp.asarray([[0.0, 1.5, 0.0]])      # +y world == +x local
    f_r = jnp.asarray([[7.0]])
    out_r = np.asarray(roiaware_pool3d(rois_r, xyz_r, f_r,
                                       jnp.ones(1, bool), grid_size=2,
                                       method="max"))[0]
    assert out_r[:, 0].max() == 7.0
    assert np.flatnonzero(out_r[:, 0])[0] >= 4  # x_idx == 1 half (flat >= G^2)

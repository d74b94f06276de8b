import pytest

import numpy as np
import jax
import jax.numpy as jnp

from seevcn_tpu.utils.config import Cfg
from seevcn_tpu.models.detectors.second import build_detector
from test_detector import _mini_cfg, _fake_batch

pytestmark = pytest.mark.slow  # heavy tier: full model/backbone builds


def _cp_cfg():
    cfg = _mini_cfg()
    cfg.MODEL.NAME = "CenterPoint"
    cfg.MODEL.DENSE_HEAD = Cfg({
        "NAME": "CenterHead", "CLASS_AGNOSTIC": False,
        "LOSS_CONFIG": {"LOSS_WEIGHTS": {"cls_weight": 1.0, "loc_weight": 2.0}}})
    del cfg.MODEL["ROI_HEAD"]
    cfg.MODEL.POST_PROCESSING["MAX_OBJ_PER_SAMPLE"] = 64
    return cfg


def test_centerpoint_forward_and_loss():
    cfg = _cp_cfg()
    model, dcfg = build_detector(cfg)
    rng = np.random.RandomState(0)
    pts, valid, gt = _fake_batch(rng, b=2, p=400)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pts, valid,
                           train=False)
    out = model.apply(variables, pts, valid, train=False)
    assert out["batch_box_preds"].shape == (2, 16, 7)  # k clamped to H*W*C
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()

    def loss_fn(params):
        o, _ = model.apply({"params": params,
                            "batch_stats": variables["batch_stats"]},
                           pts, valid, gt_boxes=gt, train=True,
                           mutable=["batch_stats"])
        return model.loss(o, gt)

    (loss, tb), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(loss))
    g = jax.tree_util.tree_reduce(lambda a, x: a + float(jnp.abs(x).sum()),
                                  grads, 0.0)
    assert g > 0


def test_center_targets_peak_at_gt():
    from seevcn_tpu.models.modules.center_head import make_center_targets

    gt = jnp.asarray([[8.0, 0, 0, 4.2, 2.0, 1.6, 0.3, 1]])
    mask = jnp.asarray([True])
    # grid: pcr x [0,16] y [-8,8], voxel 0.5, stride 8 -> 4x4 map
    heat, reg, yx, ok = make_center_targets(
        gt, mask, (4, 4), (0, -8, -2, 16, 8, 2), (0.5, 0.5, 0.1), 8, 1)
    assert bool(ok[0])
    # peak at the gt cell
    yi, xi = int(yx[0, 0]), int(yx[0, 1])
    assert heat[yi, xi, 0] == heat.max()
    np.testing.assert_allclose(float(reg[0, 2]), 0.0, atol=1e-6)  # z
    np.testing.assert_allclose(float(jnp.arctan2(reg[0, 7], reg[0, 6])), 0.3,
                               atol=1e-5)


def test_decode_recovers_gt_box():
    """Construct ideal head outputs for one box; decode must reproduce it."""
    from seevcn_tpu.models.modules.center_head import (decode_center_boxes,
                                                       make_center_targets)

    pcr, vs, stride = (0, -8, -2, 16, 8, 2), (0.5, 0.5, 0.1), 8
    gt = jnp.asarray([[8.0, 2, -0.5, 4.2, 2.0, 1.6, 0.7, 1]])
    heat, reg, yx, ok = make_center_targets(gt, jnp.asarray([True]), (4, 4),
                                            pcr, vs, stride, 1)
    big = 12.0  # logit -> sigmoid ~1 at the peak
    hm = jnp.where(heat[None] > 0.999, big, -big)
    h, w = 4, 4
    maps = {"hm": hm,
            "center": jnp.broadcast_to(reg[0, 0:2], (1, h, w, 2)),
            "center_z": jnp.broadcast_to(reg[0, 2:3], (1, h, w, 1)),
            "dim": jnp.broadcast_to(reg[0, 3:6], (1, h, w, 3)),
            "rot": jnp.broadcast_to(reg[0, 6:8], (1, h, w, 2))}
    boxes, scores, labels = decode_center_boxes(maps, pcr, vs, stride, k=4)
    best = np.asarray(boxes[0, 0])
    np.testing.assert_allclose(best, np.asarray(gt[0, :7]), atol=1e-3)
    assert labels[0, 0] == 1

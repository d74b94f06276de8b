import pytest

import numpy as np
import jax
import jax.numpy as jnp

from seevcn_tpu.utils.config import Cfg
from seevcn_tpu.models.detectors.second import build_detector
from seevcn_tpu.models.detectors.caddn import depth_to_lid_bin, lid_bin_edges

pytestmark = pytest.mark.slow  # heavy tier: full model/backbone builds


def test_lid_discretization_roundtrip():
    edges = lid_bin_edges(2.0, 46.8, 80)
    assert edges[0] == 2.0 and abs(edges[-1] - 46.8) < 1e-9
    mids = jnp.asarray((edges[:-1] + edges[1:]) / 2, jnp.float32)
    bins = np.asarray(depth_to_lid_bin(mids, 2.0, 46.8, 80))
    np.testing.assert_array_equal(bins, np.arange(80))
    # out of range -> bin 80
    assert int(depth_to_lid_bin(jnp.asarray([100.0]), 2.0, 46.8, 80)[0]) == 80


def _caddn_cfg():
    from test_detector import _mini_cfg

    cfg = _mini_cfg()
    cfg.MODEL.NAME = "CaDDN"
    cfg.DATA_CONFIG.POINT_CLOUD_RANGE = [2, -8, -2, 18, 8, 2]
    cfg.DATA_CONFIG.DATA_PROCESSOR[0].VOXEL_SIZE = [0.5, 0.5, 0.25]
    cfg.MODEL.VFE = Cfg({"NAME": "ImageVFE", "FFN": {
        "DISCRETIZE": {"mode": "LID", "num_bins": 20, "depth_min": 2.0,
                       "depth_max": 30.0}}})
    cfg.MODEL.MAP_TO_BEV = Cfg({"NAME": "Conv2DCollapse",
                                "NUM_BEV_FEATURES": 32})
    # CaDDN's BEV canvas is at voxel-grid resolution (no sparse 8x stride)
    cfg.MODEL.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG[0]["feature_map_stride"] = 1
    del cfg.MODEL["ROI_HEAD"]
    return cfg


def test_caddn_forward_and_loss():
    cfg = _caddn_cfg()
    model, dcfg = build_detector(cfg)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, 96, 320, 3).astype(np.float32))
    P2 = jnp.asarray(np.array([[[200, 0, 160, 0], [0, 200, 48, 0],
                                [0, 0, 1, 0]]], np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, images, P2,
                           train=False)
    out = model.apply(variables, images, P2, train=False)
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()
    a = dcfg.head_logic.anchors_flat.shape[0]
    assert out["batch_box_preds"].shape == (1, a, 7)

    gt = jnp.asarray(np.array([[[8, 0, 0, 4.2, 2.0, 1.6, 0.2, 1]]], np.float32))
    depth = jnp.asarray(rng.uniform(3, 25, (1, 96, 320)).astype(np.float32))

    def loss_fn(params):
        o, _ = model.apply({"params": params,
                            "batch_stats": variables["batch_stats"]},
                           images, P2, train=True, mutable=["batch_stats"])
        return model.loss(o, gt, depth_maps=depth)

    (loss, tb), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(loss))
    assert np.isfinite(float(tb["ddn_loss"]))
    g = jax.tree_util.tree_reduce(lambda a, x: a + float(jnp.abs(x).sum()),
                                  grads, 0.0)
    assert g > 0

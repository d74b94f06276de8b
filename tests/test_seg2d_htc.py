"""HTC's remaining two components on the native Mask R-CNN.

Reference behavior target: the reference's 2D stage is mmdetection HTC
(see/detector2d/scripts/htc/kitti_masks.sh:10-11). Beyond the cascade box
heads (tests/test_seg2d.py::test_cascade_stages_train_and_infer) HTC adds
a fused semantic-segmentation branch and mask information flow between
per-stage mask heads — both covered here, including checkpoint
compatibility with the flags off.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seevcn_tpu.models.seg2d.maskrcnn import (MaskRCNN, MaskRCNNLogic,
                                              Seg2DConfig, roi_align_single)


def _htc_cfg(**kw):
    base = dict(image_size=(96, 128), max_gt=4, num_proposals=32,
                roi_batch=16, pre_nms_topk=64, max_detections=8,
                stage_sizes=(1, 1, 1, 1), stage_channels=(8, 8, 8, 8),
                fpn_channels=8, box_hidden=32, mask_channels=8,
                mask_convs=1, cascade_stages=3, semantic_branch=True,
                mask_info_flow=True)
    base.update(kw)
    return Seg2DConfig(**base)


def _toy_batch():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 96, 128, 3).astype(np.float32))
    gtb = jnp.asarray([[[20, 30, 60, 60], [70, 10, 100, 40],
                        [0, 0, 0, 0], [0, 0, 0, 0]]], jnp.float32)
    gtl = jnp.zeros((1, 4), jnp.int32)
    gtv = jnp.asarray([[True, True, False, False]])
    gtm = jnp.zeros((1, 4, 96, 128), jnp.float32)
    gtm = gtm.at[0, 0, 30:60, 20:60].set(1.0)
    gtm = gtm.at[0, 1, 10:40, 70:100].set(1.0)
    return img, gtb, gtl, gtv, gtm


@pytest.mark.slow
def test_htc_semantic_and_info_flow_train_and_infer():
    """Full HTC config (cascade 3 + semantic branch + mask info flow):
    train forward emits per-stage mask logits + semantic logits, the loss
    includes the stage-weighted mask terms and the 0.2-weighted semantic
    CE, and inference ensembles the stage mask heads."""
    cfg = _htc_cfg()
    model = MaskRCNN(cfg, MaskRCNNLogic(cfg))
    img, gtb, gtl, gtv, gtm = _toy_batch()

    key = jax.random.PRNGKey(0)
    variables = model.init(key, img, gtb, gtl, gtv, gtm, train=True, rng=key)
    out = model.apply(variables, img, gtb, gtl, gtv, gtm, train=True,
                      rng=key, mutable=["batch_stats"])[0]
    # semantic branch: stride-8 logits with K+1 channels
    assert out["semantic_logits"].shape == (1, 12, 16, 2)
    # info flow: every cascade stage carries its own mask logits + rois
    for s in (1, 2):
        cs = out[f"cascade_s{s}"]
        assert cs["mask_logits"].shape == (1, cfg.roi_batch, 28, 28, 1)
        assert cs["rois"].shape == (1, cfg.roi_batch, 4)

    total, tb = model.loss(out, gtb, gtl, gtv, gtm, key)
    assert np.isfinite(float(total))
    assert "semantic" in tb and "mask_s1" in tb and "mask_s2" in tb
    # semantic CE contributes at its 0.2 weight
    assert float(total) > 0.2 * float(tb["semantic"]) - 1e-6

    # params: per-stage mask heads exist; heads s>0 own the transfer conv
    p = variables["params"]
    assert "mask_head_s1" in p and "mask_head_s2" in p
    assert "res_conv" in p["mask_head_s1"] and "res_conv" not in p["mask_head"]
    assert "semantic_head" in p

    det = model.apply(variables, img, train=False)
    assert det["det_masks"].shape == (1, 8, 28, 28)
    assert np.isfinite(np.asarray(det["det_masks"])).all()
    # ensembled sigmoid probabilities stay in [0, 1]
    m = np.asarray(det["det_masks"])
    assert (m >= 0.0).all() and (m <= 1.0).all()


@pytest.mark.slow
def test_htc_flags_off_param_tree_unchanged():
    """With both flags off the param tree is exactly the cascade-only
    tree — every checkpoint trained before the flags existed (and the
    in-flight cascade-3 runs) still loads."""
    cfg_off = _htc_cfg(semantic_branch=False, mask_info_flow=False)
    model = MaskRCNN(cfg_off, MaskRCNNLogic(cfg_off))
    img, gtb, gtl, gtv, gtm = _toy_batch()
    key = jax.random.PRNGKey(0)
    v = model.init(key, img, gtb, gtl, gtv, gtm, train=True, rng=key)
    p = v["params"]
    assert "semantic_head" not in p
    assert "mask_head" in p and "mask_head_s1" not in p
    assert "res_conv" not in p["mask_head"]
    out = model.apply(v, img, gtb, gtl, gtv, gtm, train=True, rng=key,
                      mutable=["batch_stats"])[0]
    assert "semantic_logits" not in out
    total, tb = model.loss(out, gtb, gtl, gtv, gtm, key)
    assert np.isfinite(float(total)) and "semantic" not in tb


@pytest.mark.slow
def test_semantic_loss_drives_segmentation():
    """A few SGD steps on one scene push the semantic logits toward the
    instance-union target (branch is actually trainable, not dead)."""
    import optax

    cfg = _htc_cfg(cascade_stages=1, mask_info_flow=False)
    model = MaskRCNN(cfg, MaskRCNNLogic(cfg))
    img, gtb, gtl, gtv, gtm = _toy_batch()
    key = jax.random.PRNGKey(1)
    variables = model.init(key, img, gtb, gtl, gtv, gtm, train=True, rng=key)
    tx = optax.adam(1e-2)
    opt = tx.init(variables["params"])

    def loss_fn(params, stats):
        out, mut = model.apply({"params": params, "batch_stats": stats},
                               img, gtb, gtl, gtv, gtm, train=True, rng=key,
                               mutable=["batch_stats"])
        total, tb = model.loss(out, gtb, gtl, gtv, gtm, key)
        return total, (tb["semantic"], mut["batch_stats"])

    params, stats = variables["params"], variables["batch_stats"]
    sem0 = None
    for _ in range(8):
        (_, (sem, stats)), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, stats)
        sem0 = float(sem) if sem0 is None else sem0
        upd, opt = tx.update(g, opt, params)
        params = optax.apply_updates(params, upd)
    assert float(sem) < sem0


def test_roi_align_single_constant_map():
    """Single-level align reproduces a constant feature map exactly."""
    fmap = jnp.full((12, 16, 3), 2.5)
    rois = jnp.asarray([[8.0, 8.0, 56.0, 40.0]])
    out = roi_align_single(fmap, 8, rois, 7)
    assert out.shape == (1, 7, 7, 3)
    np.testing.assert_allclose(np.asarray(out), 2.5, rtol=1e-5)

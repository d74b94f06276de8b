"""Native 2D instance segmentation (flax Mask R-CNN).

Covers: anchor generation, delta encode/decode roundtrip, ROIAlign level
mixing, fixed-shape train forward + loss, a short overfit run on synthetic
rectangles (loss decreases, detections land on the rectangle), and the
generate_masks CLI integration through the jax backend.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from seevcn_tpu.models.seg2d.maskrcnn import (MaskRCNN, MaskRCNNLogic,
                                              Seg2DConfig,
                                              decode_deltas, encode_deltas,
                                              generate_anchors_2d, roi_align)
from seevcn_tpu.models.seg2d.backend import (JaxMaskRCNNBackend, build_seg2d,
                                             init_seg2d,
                                             make_seg2d_train_step,
                                             save_seg2d_checkpoint)


def _tiny_cfg():
    return Seg2DConfig(image_size=(96, 128), max_gt=4,
                       pre_nms_topk=128, num_proposals=32, roi_batch=16,
                       rpn_batch=64, max_detections=4,
                       stage_sizes=(1, 1, 1, 1),
                       stage_channels=(16, 32, 64, 64), fpn_channels=32,
                       box_hidden=128, mask_channels=32, mask_convs=2)


def test_anchor_generation_counts():
    per_level = generate_anchors_2d((128, 160))
    assert len(per_level) == 5
    assert per_level[0].shape == (32 * 40 * 3, 4)
    # anchors are centered on their cells and valid xyxy
    for a in per_level:
        assert (a[:, 2] > a[:, 0]).all() and (a[:, 3] > a[:, 1]).all()


def test_delta_roundtrip():
    anchors = jnp.asarray([[10.0, 20, 50, 60], [0, 0, 100, 80]])
    boxes = jnp.asarray([[12.0, 18, 56, 66], [5, 4, 90, 70]])
    deltas = encode_deltas(boxes, anchors)
    rec = decode_deltas(deltas, anchors, (128, 160))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(boxes), atol=1e-3)


def test_roi_align_constant_map():
    # constant feature maps -> ROIAlign returns that constant regardless of roi
    feats = [jnp.full((32, 40, 8), float(i + 1)) for i in range(4)]
    rois = jnp.asarray([[8.0, 8, 40, 40],      # small -> level 0 (P2)
                        [0.0, 0, 120, 120]])   # larger
    out = roi_align(feats, (4, 8, 16, 32), rois, 7)
    assert out.shape == (2, 7, 7, 8)
    # each roi samples exactly one level => constant values
    v0 = np.asarray(out[0]); v1 = np.asarray(out[1])
    assert np.allclose(v0, v0.flat[0]) and np.allclose(v1, v1.flat[0])


def _synthetic_batch(rng, cfg, b=2):
    """Images with one bright rectangle each; gt box/mask = the rectangle."""
    h, w = cfg.image_size
    imgs = np.full((b, h, w, 3), -1.0, np.float32)
    gtb = np.zeros((b, cfg.max_gt, 4), np.float32)
    gtl = np.zeros((b, cfg.max_gt), np.int32)
    gtv = np.zeros((b, cfg.max_gt), bool)
    gtm = np.zeros((b, cfg.max_gt, h, w), np.float32)
    for i in range(b):
        x1, y1 = rng.randint(8, w // 2), rng.randint(8, h // 2)
        bw, bh = rng.randint(28, 48), rng.randint(22, 40)
        x2, y2 = min(x1 + bw, w - 2), min(y1 + bh, h - 2)
        imgs[i, y1:y2, x1:x2] = 1.0
        gtb[i, 0] = [x1, y1, x2, y2]
        gtv[i, 0] = True
        gtm[i, 0, y1:y2, x1:x2] = 1.0
    return (jnp.asarray(imgs), jnp.asarray(gtb), jnp.asarray(gtl),
            jnp.asarray(gtv), jnp.asarray(gtm))


@pytest.mark.slow
def test_train_forward_and_loss_shapes():
    cfg = _tiny_cfg()
    model, logic = build_seg2d(cfg)
    imgs, gtb, gtl, gtv, gtm = _synthetic_batch(np.random.RandomState(0), cfg)
    variables = init_seg2d(model)
    rng = jax.random.PRNGKey(1)
    out, _ = jax.jit(lambda v, *a: model.apply(
        v, *a, train=True, rng=rng, mutable=["batch_stats"]))(
        variables, imgs, gtb, gtl, gtv, gtm)
    assert out["rois"].shape == (2, cfg.roi_batch, 4)
    assert out["cls_logits"].shape == (2, cfg.roi_batch, cfg.num_classes + 1)
    assert out["mask_logits"].shape == (2, cfg.roi_batch, 28, 28,
                                        cfg.num_classes)
    loss, tb = model.loss(out, gtb, gtl, gtv, gtm, rng)
    assert np.isfinite(float(loss))
    assert set(tb) == {"rpn_cls", "rpn_reg", "box_cls", "box_reg", "mask"}


@pytest.mark.slow
def test_overfit_synthetic_rectangles(tmp_path):
    cfg = _tiny_cfg()
    model, logic = build_seg2d(cfg)
    variables = init_seg2d(model)
    tx = optax.adamw(2e-3)
    state = {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {}),
             "opt": tx.init(variables["params"])}
    step = make_seg2d_train_step(model, tx)
    rs = np.random.RandomState(0)
    batch = _synthetic_batch(rs, cfg)          # fixed batch -> overfit
    rng = jax.random.PRNGKey(0)
    losses = []
    for it in range(60):
        state, metrics = step(state, *batch, jax.random.fold_in(rng, it))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, losses[::8]

    # inference on the training image: the top detection must overlap the gt
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    out = fwd({"params": state["params"],
               "batch_stats": state["batch_stats"]}, batch[0])
    boxes = np.asarray(out["det_boxes"][0])
    scores = np.asarray(out["det_scores"][0])
    gt = np.asarray(batch[1][0, 0])
    best = boxes[scores.argmax()]
    xx1, yy1 = max(best[0], gt[0]), max(best[1], gt[1])
    xx2, yy2 = min(best[2], gt[2]), min(best[3], gt[3])
    inter = max(xx2 - xx1, 0) * max(yy2 - yy1, 0)
    a1 = (best[2] - best[0]) * (best[3] - best[1])
    a2 = (gt[2] - gt[0]) * (gt[3] - gt[1])
    iou = inter / (a1 + a2 - inter)
    assert iou > 0.3, (best, gt, scores.max())

    # checkpoint -> backend -> CLI COCO export roundtrip
    ckpt = tmp_path / "seg2d.pkl"
    save_seg2d_checkpoint(str(ckpt), state, cfg)
    backend = JaxMaskRCNNBackend(str(ckpt), score_thresh=0.05)
    img_bgr = np.asarray((batch[0][0] * 0.5 + 0.5) * 255,
                         np.uint8)[..., ::-1]
    dets = backend(np.ascontiguousarray(img_bgr))
    assert dets, "backend returned no detections on the overfit image"
    d = dets[0]
    assert d["mask"].shape == img_bgr.shape[:2]
    assert d["mask"].sum() > 0 and d["category_id"] == 3

    import json
    from seevcn_tpu.cli.generate_masks import detections_to_coco
    out_json = tmp_path / "masks.json"
    detections_to_coco([("000000.png", img_bgr.shape[:2], dets)],
                       str(out_json), score_thresh=0.0)
    coco = json.loads(out_json.read_text())
    assert coco["annotations"], "no COCO annotations written"
    assert coco["annotations"][0]["segmentation"]


def test_synth_scene_hard_has_far_instances():
    """hard=True must actually produce the far regime: small instances
    (bbox height < h/8) present at a meaningful rate, placed above the
    near ones (perspective)."""
    from seevcn_tpu.models.seg2d.synthetic import synth_scene

    rng = np.random.RandomState(0)
    h, w = 384, 512
    far, total = 0, 0
    for _ in range(20):
        _, boxes, _, valid, _ = synth_scene(h, w, rng, hard=True)
        bh = boxes[valid][:, 3] - boxes[valid][:, 1]
        far += int((bh < h / 8).sum())
        total += int(valid.sum())
    assert total > 30
    assert far >= total * 0.2, f"only {far}/{total} far instances"


def test_bucketed_ap_ignore_semantics():
    """height_range buckets follow COCO ignore rules: a perfect far-only
    predictor scores AP50=1.0 on the far bucket even though it misses
    every near instance, and 0 on the near bucket."""
    from seevcn_tpu.models.seg2d.coco_eval import evaluate_instances

    h, w = 96, 128
    def inst(x, y, bw, bh):
        m = np.zeros((h, w), bool)
        m[y:y + bh, x:x + bw] = True
        return m, [x, y, x + bw, y + bh]

    m_far, b_far = inst(10, 10, 8, 6)       # height 6 < 96/8
    m_near, b_near = inst(40, 40, 40, 30)   # height 30
    gt = [{"masks": np.stack([m_far, m_near]),
           "boxes": np.array([b_far, b_near], np.float32),
           "labels": np.array([0, 0])}]
    pred_far_only = [{"masks": m_far[None], 
                      "boxes": np.array([b_far], np.float32),
                      "scores": np.array([0.9]), "labels": np.array([0])}]
    far_r = (0.0, h / 8)
    near_r = (h / 8, float("inf"))
    ap_far = evaluate_instances(pred_far_only, gt, kind="mask",
                                height_range=far_r)["AP50"]
    ap_near = evaluate_instances(pred_far_only, gt, kind="mask",
                                 height_range=near_r)["AP50"]
    assert ap_far == 1.0, ap_far
    assert ap_near == 0.0, ap_near
    # a near-matching detection does NOT pollute the far bucket (ignored)
    pred_both = [{"masks": np.stack([m_far, m_near]),
                  "boxes": np.array([b_far, b_near], np.float32),
                  "scores": np.array([0.5, 0.9]),
                  "labels": np.array([0, 0])}]
    ap_far2 = evaluate_instances(pred_both, gt, kind="mask",
                                 height_range=far_r)["AP50"]
    assert ap_far2 == 1.0, ap_far2
    # unbucketed eval unchanged by the new path
    ap_all = evaluate_instances(pred_both, gt, kind="mask")["AP50"]
    assert ap_all == 1.0


@pytest.mark.slow
def test_cascade_stages_train_and_infer():
    """HTC-class cascade (3 box heads at IoU 0.5/0.6/0.7): train forward
    produces per-stage targets/losses, inference refines boxes through
    the stages and ensembles class probs; loss is finite and the
    single-stage param set is a strict subset (ckpt compat)."""
    cfg = Seg2DConfig(image_size=(96, 128), max_gt=4, num_proposals=32,
                      roi_batch=16, pre_nms_topk=64, max_detections=8,
                      stage_sizes=(1, 1, 1, 1), stage_channels=(8, 8, 8, 8),
                      fpn_channels=8, box_hidden=32, mask_channels=8,
                      mask_convs=1, cascade_stages=3)
    logic = MaskRCNNLogic(cfg)
    model = MaskRCNN(cfg, logic)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 96, 128, 3).astype(np.float32))
    gtb = jnp.asarray([[[20, 30, 60, 60], [70, 10, 100, 40],
                        [0, 0, 0, 0], [0, 0, 0, 0]]], jnp.float32)
    gtl = jnp.zeros((1, 4), jnp.int32)
    gtv = jnp.asarray([[True, True, False, False]])
    gtm = jnp.zeros((1, 4, 96, 128), jnp.float32)
    gtm = gtm.at[0, 0, 30:60, 20:60].set(1.0)
    gtm = gtm.at[0, 1, 10:40, 70:100].set(1.0)

    key = jax.random.PRNGKey(0)
    variables = model.init(key, img, gtb, gtl, gtv, gtm, train=True,
                           rng=key)
    out = model.apply(variables, img, gtb, gtl, gtv, gtm, train=True,
                      rng=key, mutable=["batch_stats"])[0]
    assert "cascade_s1" in out and "cascade_s2" in out
    total, tb = model.loss(out, gtb, gtl, gtv, gtm, key)
    assert np.isfinite(float(total))
    assert "box_cls_s1" in tb and "box_cls_s2" in tb

    # inference path runs and returns fixed shapes
    det = model.apply(variables, img, train=False)
    assert det["det_boxes"].shape == (1, 8, 4)
    assert np.isfinite(np.asarray(det["det_scores"])).all()

    # stage-0 params use the plain names -> plain ckpts remain loadable
    p = variables["params"]
    assert "box_head" in p and "box_head_s1" in p and "box_head_s2" in p
    cfg1 = Seg2DConfig(**{**cfg.__dict__, "cascade_stages": 1})
    m1 = MaskRCNN(cfg1, MaskRCNNLogic(cfg1))
    v1 = m1.init(key, img, gtb, gtl, gtv, gtm, train=True, rng=key)
    assert set(v1["params"]["box_head"]) == set(p["box_head"])

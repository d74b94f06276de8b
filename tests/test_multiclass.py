"""Multi-class anchors/assignment (KITTI 3-class layout)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from seevcn_tpu.utils.config import Cfg
from seevcn_tpu.models.modules.dense_heads import AnchorHeadLogic


def _head_cfg():
    return Cfg({
        "USE_DIRECTION_CLASSIFIER": True, "DIR_OFFSET": 0.78539,
        "DIR_LIMIT_OFFSET": 0.0, "NUM_DIR_BINS": 2,
        "ANCHOR_GENERATOR_CONFIG": [
            {"class_name": "Car", "anchor_sizes": [[3.9, 1.6, 1.56]],
             "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.78],
             "align_center": False, "feature_map_stride": 8,
             "matched_threshold": 0.6, "unmatched_threshold": 0.45},
            {"class_name": "Pedestrian", "anchor_sizes": [[0.8, 0.6, 1.73]],
             "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-0.6],
             "align_center": False, "feature_map_stride": 8,
             "matched_threshold": 0.5, "unmatched_threshold": 0.35},
            {"class_name": "Cyclist", "anchor_sizes": [[1.76, 0.6, 1.73]],
             "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-0.6],
             "align_center": False, "feature_map_stride": 8,
             "matched_threshold": 0.5, "unmatched_threshold": 0.35}],
        "TARGET_ASSIGNER_CONFIG": {
            "NAME": "AxisAlignedTargetAssigner", "POS_FRACTION": -1.0,
            "SAMPLE_SIZE": 512, "NORM_BY_NUM_EXAMPLES": False,
            "MATCH_HEIGHT": False, "BOX_CODER": "ResidualCoder"},
        "LOSS_CONFIG": {"LOSS_WEIGHTS": {
            "cls_weight": 1.0, "loc_weight": 2.0, "dir_weight": 0.2,
            "code_weights": [1.0] * 7}},
    })


def test_multiclass_anchor_layout_and_assignment():
    classes = ["Car", "Pedestrian", "Cyclist"]
    grid = [128, 128, 40]          # feature map 16x16
    pcr = [0, -32, -3, 64, 32, 1]
    logic = AnchorHeadLogic(_head_cfg(), 3, classes, grid, pcr)
    assert logic.num_anchors_per_location == 6
    a = logic.anchors_flat
    assert a.shape == (16 * 16 * 6, 7)
    # per-location interleave: first 2 are Car anchors, then Ped, then Cyc
    np.testing.assert_allclose(a[0, 3:6], [3.9, 1.6, 1.56])
    np.testing.assert_allclose(a[2, 3:6], [0.8, 0.6, 1.73])
    np.testing.assert_allclose(a[4, 3:6], [1.76, 0.6, 1.73])

    # place gts exactly on anchor grid nodes (stride 64/15): small classes
    # only match when near a node — faithful to the reference assigner
    xs = 64 / 15
    gt = jnp.asarray(np.array([[
        [3 * xs, -32 + 9 * xs, -1.0, 3.9, 1.6, 1.56, 0.0, 1],    # Car
        [6 * xs, -32 + 5 * xs, 0.265, 0.8, 0.6, 1.73, 0.0, 2],   # Pedestrian
        [9 * xs, -32 + 12 * xs, 0.265, 1.76, 0.6, 1.73, 1.57, 3],  # Cyclist
    ]], np.float32))
    targets = logic.assign_targets(gt)
    labels = np.asarray(targets["box_cls_labels"])[0]
    assert labels.shape == (16 * 16 * 6,)
    # each class must have at least one positive with its own class id
    for cid in (1, 2, 3):
        assert (labels == cid).sum() >= 1, cid
    # positives sit in the right per-location slots (car -> slots 0/1 etc.)
    pos_idx = np.where(labels > 0)[0]
    for i in pos_idx:
        slot = i % 6
        cid = labels[i]
        assert slot // 2 == cid - 1, (i, slot, cid)

    # loss end-to-end with 3-class preds
    n_loc = 16 * 16
    rng = np.random.RandomState(0)
    preds = {"cls_preds": jnp.asarray(rng.randn(1, 16, 16, 6 * 3).astype(np.float32)),
             "box_preds": jnp.asarray(rng.randn(1, 16, 16, 6 * 7).astype(np.float32)),
             "dir_cls_preds": jnp.asarray(rng.randn(1, 16, 16, 6 * 2).astype(np.float32))}
    loss, tb = logic.loss(preds, targets)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_anchor_head_multi(tmp_path):
    """AnchorHeadMulti: grouped heads score only their classes; the scattered
    layout trains and decodes through the unchanged AnchorHeadLogic."""
    import jax
    import jax.numpy as jnp
    from seevcn_tpu.utils.config import Cfg
    from seevcn_tpu.models.detectors.second import build_detector

    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_detector import _mini_cfg, _fake_batch

    cfg = _mini_cfg()
    cfg["CLASS_NAMES"] = ["Car", "Pedestrian", "Cyclist"]
    hc = _head_cfg()
    cfg["MODEL"]["DENSE_HEAD"] = hc
    hc["NAME"] = "AnchorHeadMulti"
    hc["SHARED_CONV_NUM_FILTER"] = 32
    hc["CLASS_NAMES_EACH_HEAD"] = [["Car"], ["Pedestrian", "Cyclist"]]
    cfg["MODEL"]["NAME"] = "SECONDNet"
    cfg["MODEL"].pop("ROI_HEAD", None)
    model, dcfg = build_detector(cfg)
    pts, pv, gt = _fake_batch(np.random.RandomState(0))
    variables = jax.jit(lambda p, v: model.init(
        {"params": jax.random.PRNGKey(0)}, p, v, train=False))(pts, pv)
    # grouped param structure exists
    dh = variables["params"]["dense_head"]
    assert "head0_conv_cls" in dh and "head1_conv_cls" in dh
    assert "shared_conv" in dh

    out, _ = jax.jit(lambda v, p, pv2, g: model.apply(
        v, p, pv2, gt_boxes=g, train=True, rng=jax.random.PRNGKey(1),
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"]))(variables, pts, pv, gt)
    logic = dcfg.head_logic
    targets = logic.assign_targets(gt)
    loss, tb = logic.loss(out["head_out"], targets)
    assert np.isfinite(float(loss))

    # decode: out-of-group class scores are ~0 after sigmoid
    cls, box = logic.predict_boxes(out["head_out"])
    assert cls.shape[-1] == 3 and box.shape[-1] == 7
    probs = np.asarray(jax.nn.sigmoid(cls))
    # per-anchor: the per-location layout puts Car anchors (group 0) first
    npl = logic.num_anchors_per_location_list
    a_car = int(npl[0])
    per_loc = int(sum(npl))
    probs_loc = probs.reshape(probs.shape[0], -1, per_loc, 3)
    # Car anchors never score Pedestrian/Cyclist
    assert probs_loc[:, :, :a_car, 1:].max() < 1e-3
    # Ped/Cyc anchors never score Car
    assert probs_loc[:, :, a_car:, 0].max() < 1e-3


def test_multi_classes_nms():
    """MULTI_CLASSES_NMS keeps overlapping boxes of DIFFERENT classes that
    class-agnostic NMS would suppress (model_nms_utils.multi_classes_nms)."""
    from seevcn_tpu.models.detectors.second import post_processing

    # two nearly identical boxes, one confidently Car, one Pedestrian
    boxes = np.zeros((1, 8, 7), np.float32)
    boxes[0, 0] = [10, 0, 0, 4.0, 2.0, 1.6, 0.0]
    boxes[0, 1] = [10.1, 0, 0, 4.0, 2.0, 1.6, 0.0]
    cls_logits = np.full((1, 8, 2), -10.0, np.float32)
    cls_logits[0, 0, 0] = 4.0          # Car
    cls_logits[0, 1, 1] = 3.0          # Pedestrian
    out = {"batch_cls_preds": jnp.asarray(cls_logits),
           "batch_box_preds": jnp.asarray(boxes)}

    base = {"RECALL_THRESH_LIST": [0.3], "SCORE_THRESH": 0.1,
            "NMS_CONFIG": {"MULTI_CLASSES_NMS": True, "NMS_TYPE": "nms_gpu",
                           "NMS_THRESH": 0.1, "NMS_PRE_MAXSIZE": 8,
                           "NMS_POST_MAXSIZE": 4}}
    res = post_processing(out, Cfg(base), num_class=2, has_roi_head=False)
    labels = np.asarray(res["pred_labels"][0])[np.asarray(res["pred_mask"][0])]
    assert set(labels.tolist()) == {1, 2}, labels

    base["NMS_CONFIG"]["MULTI_CLASSES_NMS"] = False
    res2 = post_processing(out, Cfg(base), num_class=2, has_roi_head=False)
    labels2 = np.asarray(res2["pred_labels"][0])[
        np.asarray(res2["pred_mask"][0])]
    assert set(labels2.tolist()) == {1}, labels2   # agnostic: Ped suppressed

    # per-class SCORE_THRESH list is honored
    base["NMS_CONFIG"]["MULTI_CLASSES_NMS"] = True
    base["SCORE_THRESH"] = [0.1, 0.999]
    res3 = post_processing(out, Cfg(base), num_class=2, has_roi_head=False)
    labels3 = np.asarray(res3["pred_labels"][0])[
        np.asarray(res3["pred_mask"][0])]
    assert set(labels3.tolist()) == {1}, labels3


def test_multi_classes_nms_keeps_per_class_post():
    """The fixed-shape output is num_class * NMS_POST_MAXSIZE rows: up to
    POST detections survive *per class* (reference multi_classes_nms
    concatenates per-class keeps; no global top-k cap on the total)."""
    from seevcn_tpu.models.detectors.second import post_processing

    # 3 well-separated confident boxes of each of 2 classes, post=3:
    # all 6 must survive (a global top-k at post would keep only 3).
    n = 8
    boxes = np.zeros((1, n, 7), np.float32)
    cls_logits = np.full((1, n, 2), -10.0, np.float32)
    for i in range(3):
        boxes[0, i] = [10 + 8 * i, 0, 0, 4.0, 2.0, 1.6, 0.0]
        cls_logits[0, i, 0] = 4.0                     # Car
        boxes[0, 3 + i] = [10 + 8 * i, 12, 0, 0.8, 0.6, 1.7, 0.0]
        cls_logits[0, 3 + i, 1] = 3.0                 # Pedestrian
    out = {"batch_cls_preds": jnp.asarray(cls_logits),
           "batch_box_preds": jnp.asarray(boxes)}
    base = {"RECALL_THRESH_LIST": [0.3], "SCORE_THRESH": 0.1,
            "NMS_CONFIG": {"MULTI_CLASSES_NMS": True, "NMS_TYPE": "nms_gpu",
                           "NMS_THRESH": 0.1, "NMS_PRE_MAXSIZE": 8,
                           "NMS_POST_MAXSIZE": 3}}
    res = post_processing(out, Cfg(base), num_class=2, has_roi_head=False)
    mask = np.asarray(res["pred_mask"][0])
    labels = np.asarray(res["pred_labels"][0])[mask]
    assert res["pred_boxes"].shape[1] == 2 * 3
    assert mask.sum() == 6, labels
    assert (labels == 1).sum() == 3 and (labels == 2).sum() == 3
    scores = np.asarray(res["pred_scores"][0])[mask]
    assert (np.diff(scores) <= 1e-6).all()  # sorted by score


def test_score_by_class_iou_head():
    """SCORE_TYPE score_by_class selects iou vs cls score per class name
    (reference second_net_iou.py:59-75,119-122)."""
    import scipy.special as sp

    from seevcn_tpu.models.detectors.second import post_processing

    # two well-separated ROIs: box0 labeled Car, box1 labeled Pedestrian
    rois = np.zeros((1, 4, 7), np.float32)
    rois[0, 0] = [10, 0, 0, 4.0, 2.0, 1.6, 0.0]
    rois[0, 1] = [30, 10, 0, 0.8, 0.6, 1.7, 0.0]
    iou_logit = np.full((1, 4), -10.0, np.float32)
    cls_logit = np.full((1, 4), -10.0, np.float32)
    iou_logit[0, 0], cls_logit[0, 0] = 2.0, -1.0    # Car: iou high, cls low
    iou_logit[0, 1], cls_logit[0, 1] = -1.0, 2.0    # Ped: iou low, cls high
    labels = np.zeros((1, 4), np.int32)
    labels[0, 0], labels[0, 1] = 1, 2
    mask = np.zeros((1, 4), bool)
    mask[0, :2] = True
    out = {"rois": jnp.asarray(rois), "rcnn_iou": jnp.asarray(iou_logit),
           "roi_scores": jnp.asarray(cls_logit),
           "roi_labels": jnp.asarray(labels), "roi_mask": jnp.asarray(mask)}

    base = {"RECALL_THRESH_LIST": [0.3], "SCORE_THRESH": 0.1,
            "NMS_CONFIG": {"MULTI_CLASSES_NMS": False, "NMS_TYPE": "nms_gpu",
                           "NMS_THRESH": 0.1, "NMS_PRE_MAXSIZE": 4,
                           "NMS_POST_MAXSIZE": 4,
                           "SCORE_TYPE": "score_by_class",
                           "SCORE_BY_CLASS": {"Car": "iou",
                                              "Pedestrian": "cls"}}}
    res = post_processing(out, Cfg(base), num_class=2, has_roi_head=True,
                          class_names=["Car", "Pedestrian"])
    m = np.asarray(res["pred_mask"][0])
    got = {int(l): float(s) for l, s, k in zip(
        np.asarray(res["pred_labels"][0]), np.asarray(res["pred_scores"][0]),
        m) if k}
    assert np.isclose(got[1], sp.expit(2.0), atol=1e-5), got   # Car -> iou
    assert np.isclose(got[2], sp.expit(2.0), atol=1e-5), got   # Ped -> cls

    # sanity: plain iou mode scores the Pedestrian with its (low) iou score
    base["NMS_CONFIG"]["SCORE_TYPE"] = "iou"
    res2 = post_processing(out, Cfg(base), num_class=2, has_roi_head=True,
                           class_names=["Car", "Pedestrian"])
    m2 = np.asarray(res2["pred_mask"][0])
    got2 = {int(l): float(s) for l, s, k in zip(
        np.asarray(res2["pred_labels"][0]),
        np.asarray(res2["pred_scores"][0]), m2) if k}
    assert np.isclose(got2.get(2, sp.expit(-1.0)), sp.expit(-1.0), atol=1e-5)

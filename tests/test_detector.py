import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seevcn_tpu.utils.config import Cfg
from seevcn_tpu.models.modules.box_coder import ResidualCoder
from seevcn_tpu.models.modules.anchors import generate_anchors
from seevcn_tpu.models.detectors.second import build_detector, post_processing

pytestmark = pytest.mark.slow  # heavy tier: full model/backbone builds


def test_residual_coder_roundtrip():
    rng = np.random.RandomState(0)
    anchors = np.concatenate([
        rng.uniform(-10, 10, (20, 3)), rng.uniform(1, 4, (20, 3)),
        rng.uniform(-np.pi, np.pi, (20, 1))], axis=1).astype(np.float32)
    boxes = anchors + rng.uniform(-0.3, 0.3, anchors.shape).astype(np.float32)
    coder = ResidualCoder()
    enc = coder.encode(jnp.asarray(boxes), jnp.asarray(anchors))
    dec = coder.decode(enc, jnp.asarray(anchors))
    np.testing.assert_allclose(np.asarray(dec), boxes, atol=1e-4)


def test_anchor_generation_positions():
    cfg = [{
        "class_name": "Car", "anchor_sizes": [[4.2, 2.0, 1.6]],
        "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [0],
        "align_center": False, "feature_map_stride": 8,
        "matched_threshold": 0.55, "unmatched_threshold": 0.4,
    }]
    pcr = [0, -8, -2, 16, 8, 4]
    # grid 32 x 32 (voxel 0.5) -> feature map 4 x 4
    anchors, npl = generate_anchors(cfg, [32, 32, 12], pcr)
    assert npl == [2]
    assert anchors.shape == (4 * 4 * 2, 7)
    # first anchor at (x_min, y_min), z = bottom + dz/2
    np.testing.assert_allclose(anchors[0, :3], [0, -8, 0.8], atol=1e-5)
    np.testing.assert_allclose(anchors[0, 3:6], [4.2, 2.0, 1.6], atol=1e-6)
    assert anchors[0, 6] == 0 and abs(anchors[1, 6] - 1.57) < 1e-6
    # flattened y-major: index 2 moves x by stride (16-0)/(4-1)
    np.testing.assert_allclose(anchors[2, 0] - anchors[0, 0], 16 / 3, atol=1e-5)
    # row stride: after 4 x positions comes next y
    np.testing.assert_allclose(anchors[8, 1] - anchors[0, 1], 16 / 3, atol=1e-5)


def _mini_cfg():
    return Cfg({
        "CLASS_NAMES": ["Car"],
        "DATA_CONFIG": {
            "POINT_CLOUD_RANGE": [0, -8, -2, 16, 8, 2],
            "POINT_FEATURE_ENCODING": {"used_feature_list": ["x", "y", "z"]},
            "DATA_PROCESSOR": [
                {"NAME": "transform_points_to_voxels",
                 "VOXEL_SIZE": [0.5, 0.5, 0.1],
                 "MAX_POINTS_PER_VOXEL": 5,
                 "MAX_NUMBER_OF_VOXELS": {"train": 512, "test": 512}},
            ],
        },
        "MODEL": {
            "NAME": "SECONDNetIoU",
            "VFE": {"NAME": "MeanVFE"},
            "BACKBONE_3D": {"NAME": "VoxelBackBone8x"},
            "MAP_TO_BEV": {"NAME": "HeightCompression", "NUM_BEV_FEATURES": 256},
            "BACKBONE_2D": {"NAME": "BaseBEVBackbone", "LAYER_NUMS": [2, 2],
                            "LAYER_STRIDES": [1, 2], "NUM_FILTERS": [32, 64],
                            "UPSAMPLE_STRIDES": [1, 2],
                            "NUM_UPSAMPLE_FILTERS": [32, 32]},
            "DENSE_HEAD": {
                "NAME": "AnchorHeadSingle", "CLASS_AGNOSTIC": False,
                "USE_DIRECTION_CLASSIFIER": True, "DIR_OFFSET": 0.78539,
                "DIR_LIMIT_OFFSET": 0.0, "NUM_DIR_BINS": 2,
                "ANCHOR_GENERATOR_CONFIG": [{
                    "class_name": "Car", "anchor_sizes": [[4.2, 2.0, 1.6]],
                    "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [0],
                    "align_center": False, "feature_map_stride": 8,
                    "matched_threshold": 0.55, "unmatched_threshold": 0.4}],
                "TARGET_ASSIGNER_CONFIG": {
                    "NAME": "AxisAlignedTargetAssigner", "POS_FRACTION": -1.0,
                    "SAMPLE_SIZE": 512, "NORM_BY_NUM_EXAMPLES": False,
                    "MATCH_HEIGHT": False, "BOX_CODER": "ResidualCoder"},
                "LOSS_CONFIG": {"LOSS_WEIGHTS": {
                    "cls_weight": 1.0, "loc_weight": 2.0, "dir_weight": 0.2,
                    "code_weights": [1.0] * 7}},
            },
            "ROI_HEAD": {
                "NAME": "SECONDHead", "CLASS_AGNOSTIC": True,
                "SHARED_FC": [64, 64], "IOU_FC": [64, 64], "DP_RATIO": 0.3,
                "NMS_CONFIG": {
                    "TRAIN": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                              "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 32,
                              "NMS_THRESH": 0.8},
                    "TEST": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                             "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 16,
                             "NMS_THRESH": 0.7}},
                "ROI_GRID_POOL": {"GRID_SIZE": 7, "IN_CHANNEL": 64,
                                  "DOWNSAMPLE_RATIO": 8},
                "TARGET_CONFIG": {
                    "BOX_CODER": "ResidualCoder", "ROI_PER_IMAGE": 16,
                    "FG_RATIO": 0.5, "SAMPLE_ROI_BY_EACH_CLASS": True,
                    "CLS_SCORE_TYPE": "raw_roi_iou", "CLS_FG_THRESH": 0.75,
                    "CLS_BG_THRESH": 0.25, "CLS_BG_THRESH_LO": 0.1,
                    "HARD_BG_RATIO": 0.8, "REG_FG_THRESH": 0.55},
                "LOSS_CONFIG": {"IOU_LOSS": "BinaryCrossEntropy",
                                "LOSS_WEIGHTS": {"rcnn_iou_weight": 1.0,
                                                 "code_weights": [1.0] * 7}},
            },
            "POST_PROCESSING": {
                "RECALL_THRESH_LIST": [0.3, 0.5, 0.7], "SCORE_THRESH": 0.1,
                "OUTPUT_RAW_SCORE": False, "EVAL_METRIC": "kitti",
                "NMS_CONFIG": {"MULTI_CLASSES_NMS": False, "NMS_TYPE": "nms_gpu",
                               "NMS_THRESH": 0.01, "NMS_PRE_MAXSIZE": 64,
                               "NMS_POST_MAXSIZE": 16}},
        },
    })


def _fake_batch(rng, b=2, p=600):
    pts = np.zeros((b, p, 3), np.float32)
    pts[:, :, 0] = rng.uniform(0.5, 15.5, (b, p))
    pts[:, :, 1] = rng.uniform(-7.5, 7.5, (b, p))
    pts[:, :, 2] = rng.uniform(-1.9, 1.9, (b, p))
    valid = np.ones((b, p), bool)
    gt = np.zeros((b, 4, 8), np.float32)
    gt[:, 0] = [8, 0, 0, 4.2, 2.0, 1.6, 0.3, 1]
    gt[:, 1] = [4, -4, 0, 4.0, 1.9, 1.5, -1.0, 1]
    return jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(gt)


@pytest.fixture(scope="module")
def second_iou():
    cfg = _mini_cfg()
    model, dcfg = build_detector(cfg)
    rng = np.random.RandomState(0)
    pts, valid, gt = _fake_batch(rng)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           pts, valid, train=False)
    return cfg, model, dcfg, variables, (pts, valid, gt)


def test_second_iou_eval_forward(second_iou):
    cfg, model, dcfg, variables, (pts, valid, gt) = second_iou
    out = model.apply(variables, pts, valid, train=False)
    a = dcfg.head_logic.anchors_flat.shape[0]
    assert out["batch_cls_preds"].shape == (2, a, 1)
    assert out["batch_box_preds"].shape == (2, a, 7)
    assert out["rcnn_iou"].shape == (2, 16)
    assert np.isfinite(np.asarray(out["rcnn_iou"])).all()

    post = post_processing(out, cfg.MODEL.POST_PROCESSING, 1, has_roi_head=True)
    assert post["pred_boxes"].shape == (2, 16, 7)
    assert post["pred_labels"].dtype == jnp.int32


def test_second_iou_train_loss_and_grads(second_iou):
    cfg, model, dcfg, variables, (pts, valid, gt) = second_iou

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pts, valid, gt_boxes=gt, train=True,
            rng=jax.random.PRNGKey(1),
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        loss, tb = model.loss(out, gt)
        return loss, tb

    (loss, tb), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(loss))
    for k in ("rpn_loss_cls", "rpn_loss_loc", "rpn_loss_dir", "rcnn_loss_iou"):
        assert np.isfinite(float(tb[k])), k
    gnorm = jax.tree_util.tree_reduce(
        lambda a, g: a + float(jnp.abs(g).sum()), grads, 0.0)
    assert np.isfinite(gnorm) and gnorm > 0


def test_target_assigner_matches_expectations(second_iou):
    cfg, model, dcfg, variables, (pts, valid, gt) = second_iou
    logic = dcfg.head_logic
    targets = logic.assign_targets(gt)
    labels = np.asarray(targets["box_cls_labels"])
    a = logic.anchors_flat.shape[0]
    assert labels.shape == (2, a)
    # there must be positives (gt boxes sit on anchor grid) and backgrounds
    assert (labels > 0).sum() > 0
    assert (labels == 0).sum() > 0
    # every positive must have nonzero reg weight and targets
    w = np.asarray(targets["reg_weights"])
    assert ((labels > 0) == (w > 0)).all()


def test_atss_assigner():
    """ATSS (arXiv:1912.02424): anchors nearest a gt with IoU above the
    candidate mean+std AND center inside the gt become positive; padding gt
    rows assign nothing beyond force-matching."""
    import jax.numpy as jnp
    from seevcn_tpu.models.modules.anchors import ATSSTargetAssigner

    coder = ResidualCoder()
    assigner = ATSSTargetAssigner(topk=9, box_coder=coder)

    # a small grid of anchors around two gts
    xs, ys = np.meshgrid(np.arange(0, 40, 2.0), np.arange(-10, 10, 2.0),
                         indexing="ij")
    anchors = np.zeros((xs.size, 7), np.float32)
    anchors[:, 0] = xs.ravel(); anchors[:, 1] = ys.ravel()
    anchors[:, 2] = 0.0; anchors[:, 3:6] = [4.0, 2.0, 1.6]

    gt = np.zeros((1, 4, 8), np.float32)
    gt[0, 0] = [10, 0, 0, 4.2, 2.0, 1.6, 0.0, 1]
    gt[0, 1] = [30, 4, 0, 4.0, 1.9, 1.5, 0.3, 2]
    out = assigner.assign([jnp.asarray(anchors)], jnp.asarray(gt))
    labels = np.asarray(out["box_cls_labels"][0])
    w = np.asarray(out["reg_weights"][0])

    assert (labels == 1).any() and (labels == 2).any()
    # positives sit near their gt centers
    pos1 = anchors[labels == 1]
    assert np.all(np.linalg.norm(pos1[:, :2] - [10, 0], axis=1) < 4.0)
    pos2 = anchors[labels == 2]
    assert np.all(np.linalg.norm(pos2[:, :2] - [30, 4], axis=1) < 4.0)
    # reg weights mark exactly the foreground anchors
    np.testing.assert_array_equal(w > 0, labels > 0)
    # padding rows (class 0) never produce positives of class 0
    assert not (labels < 0).any()


def test_atss_in_head_logic():
    """NAME: ATSS routes AnchorHeadLogic to the ATSS assigner."""
    import jax.numpy as jnp
    from seevcn_tpu.models.modules.dense_heads import AnchorHeadLogic

    cfg = _mini_cfg()["MODEL"]["DENSE_HEAD"]
    cfg["TARGET_ASSIGNER_CONFIG"]["NAME"] = "ATSS"
    cfg["TARGET_ASSIGNER_CONFIG"]["TOPK"] = 9
    logic = AnchorHeadLogic(Cfg(cfg), num_class=1, class_names=["Car"],
                            grid_size=np.array([32, 32, 40]),
                            point_cloud_range=np.array(
                                [0, -8, -2, 16, 8, 2.0]))
    from seevcn_tpu.models.modules.anchors import ATSSTargetAssigner
    assert isinstance(logic.assigner, ATSSTargetAssigner)
    gt = np.zeros((1, 2, 8), np.float32)
    gt[0, 0] = [8, 0, 0, 4.2, 2.0, 1.6, 0.0, 1]
    t = logic.assign_targets(jnp.asarray(gt))
    assert (np.asarray(t["box_cls_labels"]) == 1).any()

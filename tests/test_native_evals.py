"""Native nuScenes NDS and Waymo AP/APH evaluators (devkit-free)."""
import numpy as np

from seevcn_tpu.data.nuscenes_eval import nuscenes_eval
from seevcn_tpu.data.waymo_eval import waymo_eval


def _frame(boxes, names, scores=None, npts=None):
    a = {"name": np.asarray(names)}
    if scores is None:
        a["gt_boxes_lidar"] = np.asarray(boxes, np.float64)
        if npts is not None:
            a["num_points_in_gt"] = np.asarray(npts)
    else:
        a["boxes_lidar"] = np.asarray(boxes, np.float64)
        a["score"] = np.asarray(scores, np.float64)
    return a


def _boxes(n, rng, spread=40.0):
    b = np.zeros((n, 7))
    b[:, 0] = rng.uniform(5, spread, n)
    b[:, 1] = rng.uniform(-15, 15, n)
    b[:, 3:6] = [4.2, 1.9, 1.6]
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


def test_nuscenes_perfect_detections():
    rng = np.random.RandomState(0)
    gts, dets = [], []
    for _ in range(4):
        b = _boxes(5, rng)
        gts.append(_frame(b, ["car"] * 5))
        dets.append(_frame(b, ["car"] * 5, scores=np.linspace(0.9, 0.5, 5)))
    report, res = nuscenes_eval(dets, gts, ["car"])
    assert res["mAP"] > 0.95, res
    assert res["NDS"] > 0.95, res
    assert res["car/trans_err"] < 1e-6
    assert res["car/scale_err"] < 1e-6
    assert res["car/orient_err"] < 1e-6
    assert "mAP" in report and "NDS" in report


def test_nuscenes_center_distance_thresholds():
    """A detection offset by 1.5 m matches at 2 m / 4 m but not 0.5 m / 1 m."""
    gt_box = np.array([[10.0, 0, 0, 4.2, 1.9, 1.6, 0.0]])
    det_box = gt_box.copy()
    det_box[0, 1] += 1.5
    gts = [_frame(gt_box, ["car"])]
    dets = [_frame(det_box, ["car"], scores=[0.9])]
    _, res = nuscenes_eval(dets, gts, ["car"])
    assert res["car/AP@0.5"] == 0.0
    assert res["car/AP@1.0"] == 0.0
    assert res["car/AP@2.0"] > 0.9
    assert res["car/AP@4.0"] > 0.9


def test_nuscenes_false_positive_lowers_map():
    rng = np.random.RandomState(1)
    b = _boxes(3, rng)
    gts = [_frame(b, ["car"] * 3)]
    fp = _boxes(3, rng) + np.array([60, 0, 0, 0, 0, 0, 0.0])
    det_b = np.concatenate([b, fp])
    # false positives score HIGHER than the true positives -> AP must drop
    dets = [_frame(det_b, ["car"] * 6,
                   scores=[0.5, 0.45, 0.4, 0.95, 0.9, 0.85])]
    _, res = nuscenes_eval(dets, gts, ["car"])
    assert 0.05 < res["mAP"] < 0.9, res["mAP"]


def test_waymo_perfect_and_heading():
    rng = np.random.RandomState(2)
    b = _boxes(6, rng)
    gts = [_frame(b, ["Vehicle"] * 6, npts=[100, 100, 100, 3, 3, 3])]
    dets = [_frame(b, ["Vehicle"] * 6, scores=np.linspace(0.9, 0.4, 6))]
    _, res = waymo_eval(dets, gts, ["Vehicle"])
    assert res["Vehicle/L2/AP"] > 0.95
    assert res["Vehicle/L2/APH"] > 0.95
    # L1 counts only the >5-point objects as positives
    assert res["Vehicle/L1/AP"] > 0.95

    # flip headings by pi: AP unchanged-ish? No — IoU is heading-agnostic for
    # pi flips, so the match survives but APH collapses.
    flipped = b.copy()
    flipped[:, 6] += np.pi
    dets_f = [_frame(flipped, ["Vehicle"] * 6,
                     scores=np.linspace(0.9, 0.4, 6))]
    _, res_f = waymo_eval(dets_f, gts, ["Vehicle"])
    assert res_f["Vehicle/L2/AP"] > 0.95
    assert res_f["Vehicle/L2/APH"] < 0.1, res_f


def test_waymo_misses_count_against_recall():
    rng = np.random.RandomState(3)
    b = _boxes(4, rng)
    gts = [_frame(b, ["Vehicle"] * 4, npts=[50] * 4)]
    dets = [_frame(b[:2], ["Vehicle"] * 2, scores=[0.9, 0.8])]
    _, res = waymo_eval(dets, gts, ["Vehicle"])
    assert 0.3 < res["Vehicle/L2/AP"] < 0.7, res


def test_nuscenes_dataset_dispatch(tmp_path):
    """NuScenesDataset.evaluation routes to the native NDS evaluator."""
    from seevcn_tpu.data.generic import NuScenesDataset
    from seevcn_tpu.utils.config import Cfg
    import pickle

    rng = np.random.RandomState(4)
    b = _boxes(3, rng)
    infos = [{"lidar_path": "x.bin", "token": "t0",
              "annos": {"name": np.array(["car"] * 3),
                        "gt_boxes_lidar": b}}]
    with open(tmp_path / "infos.pkl", "wb") as f:
        pickle.dump(infos, f)
    cfg = Cfg({"DATASET": "NuScenesDataset", "DATA_PATH": str(tmp_path),
               "INFO_PATH": {"test": ["infos.pkl"]},
               "POINT_CLOUD_RANGE": [0, -40, -3, 70, 40, 1],
               "EVAL_METRIC": "nuscenes",
               "POINT_FEATURE_ENCODING": {
                   "encoding_type": "absolute_coordinates_encoding",
                   "used_feature_list": ["x", "y", "z"],
                   "src_feature_list": ["x", "y", "z"]},
               "DATA_PROCESSOR": []})
    ds = NuScenesDataset(cfg, ["car"], training=False, max_points=128)
    det = [{"boxes_lidar": b, "name": np.array(["car"] * 3),
            "score": np.array([0.9, 0.8, 0.7])}]
    report, res = ds.evaluation(det, ["car"])
    assert res["NDS"] > 0.9

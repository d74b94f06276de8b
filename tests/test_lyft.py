"""Lyft family: devkit-free mAP eval + bootstrap + dataset e2e
(reference lyft_dataset.py / lyft_utils.py / lyft_mAP_eval/lyft_eval.py)."""
import json
import os
import pickle

import numpy as np

from seevcn_tpu.data.lyft_eval import (_get_ap, iou_3d, lyft_eval)


def _box(x, y, z, dx, dy, dz, yaw):
    return np.array([x, y, z, dx, dy, dz, yaw], np.float64)


def test_iou3d_axis_aligned():
    a = _box(0, 0, 0, 4, 2, 2, 0.0)
    # identical boxes
    assert abs(iou_3d(a, a) - 1.0) < 1e-6
    # half-shifted along x: inter = 2*2*2=8, union = 16+16-8=24
    b = _box(2, 0, 0, 4, 2, 2, 0.0)
    assert abs(iou_3d(a, b) - 8.0 / 24.0) < 1e-6
    # z-disjoint
    c = _box(0, 0, 5, 4, 2, 2, 0.0)
    assert iou_3d(a, c) == 0.0


def test_iou3d_rotated():
    # unit cube vs itself rotated 45deg: BEV intersection is the regular
    # octagon with area 2*(sqrt(2)-1) ~ 0.8284
    a = _box(0, 0, 0, 1, 1, 1, 0.0)
    b = _box(0, 0, 0, 1, 1, 1, np.pi / 4)
    inter = 2 * (np.sqrt(2) - 1)
    expect = inter / (2 - inter)
    assert abs(iou_3d(a, b) - expect) < 1e-3


def test_get_ap_known_curve():
    # 2 predictions, 2 gts, first TP second FP: recalls [0.5, 0.5],
    # precisions [1.0, 0.5] -> AP = 0.5 * 1.0
    ap = _get_ap(np.array([0.5, 0.5]), np.array([1.0, 0.5]))
    assert abs(ap - 0.5) < 1e-9


def test_lyft_eval_end_to_end():
    gt = [{"gt_boxes_lidar": np.array([_box(10, 0, 0, 4, 2, 1.6, 0.1),
                                       _box(20, 5, 0, 4, 2, 1.6, 0.0)]),
           "name": np.array(["car", "car"])},
          {"gt_boxes_lidar": np.array([_box(5, -3, 0, 0.8, 0.8, 1.8, 0.0)]),
           "name": np.array(["pedestrian"])}]
    det = [{"boxes_lidar": np.array([_box(10, 0, 0, 4, 2, 1.6, 0.1),
                                     _box(50, 0, 0, 4, 2, 1.6, 0.0)]),
            "name": np.array(["car", "car"]),
            "score": np.array([0.9, 0.8])},
           {"boxes_lidar": np.array([_box(5, -3, 0, 0.8, 0.8, 1.8, 0.0)]),
            "name": np.array(["pedestrian"]),
            "score": np.array([0.7])}]
    report, res = lyft_eval(det, gt, ["car", "pedestrian"],
                            iou_thresholds=[0.5])
    # car: 1 TP of 2 gts then 1 FP -> AP 0.5; ped: perfect -> 1.0
    assert abs(res["car"] - 0.5) < 1e-6
    assert abs(res["pedestrian"] - 1.0) < 1e-6
    assert abs(res["mAP"] - 0.75) < 1e-6
    assert "mAP" in report


def test_lyft_eval_duplicate_detection_is_fp():
    """Second detection on an already-matched gt counts FP (the
    reference's gt_checked rule, lyft_eval.py:305-318)."""
    gt = [{"gt_boxes_lidar": np.array([_box(10, 0, 0, 4, 2, 1.6, 0.0)]),
           "name": np.array(["car"])}]
    det = [{"boxes_lidar": np.array([_box(10, 0, 0, 4, 2, 1.6, 0.0),
                                     _box(10.1, 0, 0, 4, 2, 1.6, 0.0)]),
            "name": np.array(["car", "car"]),
            "score": np.array([0.9, 0.8])}]
    _, res = lyft_eval(det, gt, ["car"], iou_thresholds=[0.5])
    # recall hits 1.0 at precision 1.0 -> AP 1.0 despite the duplicate FP
    assert abs(res["car"] - 1.0) < 1e-6


# ---------------------------------------------------------------------------
# bootstrap + dataset e2e on a synthetic lyft tree
# ---------------------------------------------------------------------------

def _quat_z(yaw):
    return [np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)]


def _make_raw_lyft(root, version="trainval", n_samples=3):
    """Minimal Lyft tree: tables at <root>/<version>/data/*.json, lidar
    bins relative to <root>/<version>/, ImageSets split files, plain class
    names, annotations WITHOUT num_lidar_pts (the Lyft schema)."""
    data_path = root / version
    tdir = data_path / "data"
    os.makedirs(tdir, exist_ok=True)
    os.makedirs(data_path / "lidar", exist_ok=True)
    os.makedirs(root / "ImageSets", exist_ok=True)

    sensors = [{"token": "sens_lidar", "channel": "LIDAR_TOP",
                "modality": "lidar"}]
    cal = [{"token": "cs_lidar", "sensor_token": "sens_lidar",
            "translation": [1.0, 0.0, 1.7], "rotation": _quat_z(0.0),
            "camera_intrinsic": []}]
    scenes = [{"token": "scene0", "name": "host-a004-lidar0-1",
               "first_sample_token": "samp0"},
              {"token": "scene1", "name": "host-a004-lidar0-2",
               "first_sample_token": "samp2"}]
    samples, sample_data, ego_poses, anns = [], [], [], []
    instances = [{"token": "inst0", "category_token": "cat_car"}]
    categories = [{"token": "cat_car", "name": "car"}]

    rng = np.random.RandomState(3)
    t0 = 1_500_000_000
    prev_sd = ""
    for i in range(n_samples):
        scene = "scene0" if i < 2 else "scene1"
        stok = f"samp{i}"
        samples.append({"token": stok, "timestamp": t0 + i * 200_000,
                        "scene_token": scene, "prev": "", "next": ""})
        ego_poses.append({"token": f"ego{i}",
                          "translation": [5.0 * i, 0.0, 0.0],
                          "rotation": _quat_z(0.0),
                          "timestamp": t0 + i * 200_000})
        fn = f"lidar/host-a004_lidar0_{i}.bin"
        pts = rng.uniform(-20, 20, (200, 5)).astype(np.float32)
        pts.tofile(data_path / fn)
        sample_data.append({"token": f"sd{i}", "sample_token": stok,
                            "ego_pose_token": f"ego{i}",
                            "calibrated_sensor_token": "cs_lidar",
                            "timestamp": t0 + i * 200_000,
                            "fileformat": "bin", "is_key_frame": True,
                            "filename": fn, "prev": prev_sd, "next": ""})
        prev_sd = f"sd{i}"
        # Lyft annotations: no num_lidar_pts / num_radar_pts fields
        anns.append({"token": f"ann{i}", "sample_token": stok,
                     "instance_token": "inst0",
                     "translation": [5.0 * i + 12.0, 1.0, 0.5],
                     "size": [2.0, 4.5, 1.7],  # w, l, h
                     "rotation": _quat_z(0.2),
                     "prev": f"ann{i-1}" if i > 0 else "",
                     "next": f"ann{i+1}" if i < n_samples - 1 else ""})

    tables = {"scene": scenes, "sample": samples, "sample_data": sample_data,
              "calibrated_sensor": cal, "ego_pose": ego_poses,
              "sample_annotation": anns, "instance": instances,
              "category": categories, "sensor": sensors}
    for name, rows in tables.items():
        with open(tdir / f"{name}.json", "w") as f:
            json.dump(rows, f)
    (root / "ImageSets" / "train.txt").write_text("host-a004-lidar0-1\n")
    (root / "ImageSets" / "val.txt").write_text("host-a004-lidar0-2\n")


def test_lyft_bootstrap_and_dataset(tmp_path):
    from seevcn_tpu.data.generic import LyftDataset
    from seevcn_tpu.data.lyft_bootstrap import (
        create_lyft_groundtruth_database, create_lyft_infos)
    from seevcn_tpu.utils.config import Cfg

    _make_raw_lyft(tmp_path)
    paths = create_lyft_infos(str(tmp_path), version="trainval",
                              max_sweeps=2)
    with open(paths["train"], "rb") as f:
        train = pickle.load(f)
    with open(paths["val"], "rb") as f:
        val = pickle.load(f)
    assert len(train) == 2 and len(val) == 1

    info = train[1]
    assert info["lidar_path"].startswith("lidar/")
    # despite missing num_lidar_pts fields, the gt box survives
    gt = np.asarray(info["gt_boxes"])
    assert gt.shape[0] == 1
    # global (17, 1, 0.5) - ego (5, 0, 0) - cs (1, 0, 1.7)
    np.testing.assert_allclose(gt[0, :3], [11.0, 1.0, -1.2], atol=1e-9)
    np.testing.assert_allclose(gt[0, 3:6], [4.5, 2.0, 1.7], atol=1e-9)
    assert abs(gt[0, 6] - 0.2) < 1e-9
    assert info["gt_names"][0] == "car"
    # sweep walks to the previous sample_data
    assert info["sweeps"][0]["sample_data_token"] == "sd0"
    np.testing.assert_allclose(info["sweeps"][0]["transform_matrix"][:3, 3],
                               [-5.0, 0.0, 0.0], atol=1e-9)

    db = create_lyft_groundtruth_database(str(tmp_path), "trainval",
                                          paths["train"])
    with open(db, "rb") as f:
        dbinfos = pickle.load(f)
    assert "car" in dbinfos and len(dbinfos["car"]) == 2

    dcfg = Cfg({"DATASET": "LyftDataset",
                "DATA_PATH": str(tmp_path / "trainval"),
                "MAX_SWEEPS": 2,
                "POINT_CLOUD_RANGE": [-40, -40, -3, 40, 40, 3],
                "INFO_PATH": {"train": ["lyft_infos_train.pkl"],
                              "test": ["lyft_infos_val.pkl"]},
                "EVAL_LYFT_IOU_LIST": [0.5, 0.7],
                "POINT_FEATURE_ENCODING": {
                    "used_feature_list": ["x", "y", "z"],
                    "src_feature_list": ["x", "y", "z", "intensity"]}})
    ds = LyftDataset(dcfg, ["car"], training=False)
    assert len(ds) == 1
    out = ds[0]
    assert out["points_valid"].sum() > 0

    # perfect predictions -> mAP 1.0 through the dataset evaluation hook
    det = [{"boxes_lidar": np.asarray(info["gt_boxes"])[:, :7],
            "name": np.array(["car"]),
            "score": np.array([0.9]),
            "pred_labels": np.array([1])}
           for info in ds.infos]
    report, res = ds.evaluation(det, ["car"])
    assert abs(res["mAP"] - 1.0) < 1e-6

    # registry dispatch
    from seevcn_tpu.data.registry import build_dataset
    ds2 = build_dataset(dcfg, ["car"], training=False)
    assert isinstance(ds2, LyftDataset)

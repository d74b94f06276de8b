"""Custom (Baraja) + nuScenes + Waymo dataset adapters on synthetic trees."""
import os
import pickle

import numpy as np

from seevcn_tpu.utils.config import Cfg
from seevcn_tpu.data.registry import DATASETS, build_dataset
from seevcn_tpu.geom.pcd_io import write_pcd


def _cfg(name, root, **kw):
    d = {"DATASET": name, "DATA_PATH": str(root),
         "POINT_CLOUD_RANGE": [-75.2, -75.2, -2, 75.2, 75.2, 4],
         "POINT_FEATURE_ENCODING": {"used_feature_list": ["x", "y", "z"],
                                    "src_feature_list": ["x", "y", "z", "intensity"]},
         "DATA_PROCESSOR": [], "INFO_PATH": {"train": [], "test": ["infos.pkl"]}}
    d.update(kw)
    return Cfg(d)


def test_custom_dataset_eval_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    os.makedirs(tmp_path / "test" / "pcd", exist_ok=True)
    os.makedirs(tmp_path / "test" / "vcn_x", exist_ok=True)
    infos = []
    for i in range(3):
        pts = rng.uniform(-40, 40, (500, 3)).astype(np.float32)
        write_pcd(str(tmp_path / "test" / "pcd" / f"{i:03d}.pcd"), pts)
        write_pcd(str(tmp_path / "test" / "vcn_x" / f"{i:03d}.pcd"), pts + 0.5)
        boxes = np.array([[10 + i, 0, 0, 4.2, 2.0, 1.6, 0.3]], np.float32)
        infos.append({"point_cloud": {"lidar_idx": f"{i:03d}"},
                      "annos": {"name": np.array(["Car"]),
                                "gt_boxes_lidar": boxes,
                                "num_points_in_gt": np.array([120])}})
    with open(tmp_path / "infos.pkl", "wb") as f:
        pickle.dump(infos, f)

    cfg = _cfg("CustomDataset", tmp_path, MIN_POINTS_OF_GT=50)
    ds = build_dataset(cfg, ["Car"], training=False, max_points=600, max_boxes=4)
    assert len(ds) == 3
    item = ds[0]
    assert item["points"].shape == (600, 3)
    assert item["gt_mask"].sum() == 1

    # SC variant loads the completed cloud
    sc = DATASETS["SCCustomDataset"](
        _cfg("SCCustomDataset", tmp_path, PROCESSED_DATA_TAG="vcn_x"),
        ["Car"], training=False, max_points=600, max_boxes=4)
    assert not np.allclose(sc[0]["points"][:5], item["points"][:5])

    # perfect predictions -> KITTI-protocol eval runs and reports
    preds = [{"pred_boxes": infos[i]["annos"]["gt_boxes_lidar"],
              "pred_scores": np.array([0.9]), "pred_labels": np.array([1])}
             for i in range(3)]
    annos = ds.generate_prediction_dicts([0, 1, 2], preds, ["Car"])
    report, res = ds.evaluation(annos, ["Car"])
    assert "Car" in report and res["Car"]["3d"][1] > 0


def test_nuscenes_dataset(tmp_path):
    rng = np.random.RandomState(1)
    os.makedirs(tmp_path / "sweeps", exist_ok=True)
    infos = []
    for i in range(2):
        pts = rng.uniform(-40, 40, (400, 5)).astype(np.float32)
        path = f"sweeps/{i}.bin"
        pts.tofile(tmp_path / path)
        infos.append({"token": f"tok{i}", "lidar_path": path,
                      "gt_boxes": np.array([[5, 0, 0, 4.2, 2.0, 1.6, 0.2]],
                                           np.float32),
                      "gt_names": np.array(["car"])})
    with open(tmp_path / "infos.pkl", "wb") as f:
        pickle.dump(infos, f)
    cfg = _cfg("NuScenesDataset", tmp_path)
    ds = build_dataset(cfg, ["car"], training=False, max_points=500, max_boxes=4)
    item = ds[0]
    assert item["gt_mask"].sum() == 1
    preds = [{"pred_boxes": infos[i]["gt_boxes"], "pred_scores": np.array([0.9]),
              "pred_labels": np.array([1])} for i in range(2)]
    annos = ds.generate_prediction_dicts([0, 1], preds, ["car"])
    report, res = ds.evaluation(annos, ["car"])
    assert report is not None and "Car" in report


def test_waymo_dataset(tmp_path):
    rng = np.random.RandomState(2)
    seq = "segment-001"
    os.makedirs(tmp_path / "waymo_processed_data" / seq, exist_ok=True)
    infos = []
    for i in range(2):
        pts = rng.uniform(-50, 50, (300, 6)).astype(np.float32)
        np.save(tmp_path / "waymo_processed_data" / seq / f"{i:04d}.npy", pts)
        infos.append({"point_cloud": {"lidar_sequence": seq, "sample_idx": i},
                      "annos": {"name": np.array(["Vehicle"]),
                                "gt_boxes_lidar": np.array(
                                    [[8, 1, 0, 4.5, 2.0, 1.7, -0.4]], np.float32),
                                "num_points_in_gt": np.array([99])}})
    with open(tmp_path / "infos.pkl", "wb") as f:
        pickle.dump(infos, f)
    cfg = _cfg("WaymoDataset", tmp_path, SAMPLED_INTERVAL={"train": 1, "test": 1})
    ds = build_dataset(cfg, ["Vehicle"], training=False, max_points=400, max_boxes=4)
    assert len(ds) == 2
    assert ds[1]["gt_mask"].sum() == 1


def test_nuscenes_sweep_aggregation(tmp_path):
    """MAX_SWEEPS sweep merge with relative transforms + time-lag channel
    (reference get_lidar_with_sweeps, nuscenes_dataset.py:77-110)."""
    os.makedirs(tmp_path / "samples", exist_ok=True)
    main = np.array([[10, 0, 0, 0.5, 0],
                     [0.5, 0.5, 0, 0.5, 0]], np.float32)   # 2nd is ego-radius
    main.tofile(tmp_path / "samples" / "main.bin")
    sweep = np.array([[1, 2, 3, 0.7, 0],
                      [0.2, -0.2, 0, 0.1, 0]], np.float32)  # 2nd ego-dropped
    sweep.tofile(tmp_path / "samples" / "sweep.bin")
    tm = np.eye(4); tm[:3, 3] = [100, 0, 0]                 # shift x by 100
    infos = [{"token": "t0", "lidar_path": "samples/main.bin",
              "sweeps": [{"lidar_path": "samples/sweep.bin",
                          "transform_matrix": tm, "time_lag": 0.45}],
              "gt_boxes": np.zeros((0, 7), np.float32),
              "gt_names": np.array([], dtype="<U8")}]
    with open(tmp_path / "infos.pkl", "wb") as f:
        pickle.dump(infos, f)
    cfg = _cfg("NuScenesDataset", tmp_path, MAX_SWEEPS=2)
    cfg.POINT_FEATURE_ENCODING = Cfg(
        {"used_feature_list": ["x", "y", "z", "timestamp"],
         "src_feature_list": ["x", "y", "z", "intensity", "timestamp"]})
    ds = build_dataset(cfg, ["car"], training=False, max_points=10, max_boxes=2)
    pts = ds.get_lidar(ds.infos[0])
    assert pts.shape == (3, 5)            # 2 main (ego kept for ref frame) + 1 sweep
    # sweep point transformed into the ref frame, time lag attached
    sw = pts[pts[:, 4] > 0]
    assert sw.shape == (1, 5)
    np.testing.assert_allclose(sw[0, :3], [101, 2, 3], atol=1e-5)
    np.testing.assert_allclose(sw[0, 4], 0.45, atol=1e-6)
    # main points carry zero lag
    assert (pts[pts[:, 4] == 0][:, 0] <= 10).all()


def test_nuscenes_balanced_resampling(tmp_path):
    """CBGS resampling evens out class frame counts
    (nuscenes_dataset.py:40-65)."""
    os.makedirs(tmp_path / "samples", exist_ok=True)
    pts = np.zeros((10, 5), np.float32)
    pts.tofile(tmp_path / "samples" / "p.bin")
    infos = []
    for i in range(20):
        name = "car" if i < 18 else "truck"
        infos.append({"token": f"t{i}", "lidar_path": "samples/p.bin",
                      "gt_boxes": np.array([[5, 0, 0, 4, 2, 1.6, 0]],
                                           np.float32),
                      "gt_names": np.array([name])})
    with open(tmp_path / "infos_train.pkl", "wb") as f:
        pickle.dump(infos, f)
    cfg = _cfg("NuScenesDataset", tmp_path, BALANCED_RESAMPLING=True,
               INFO_PATH={"train": ["infos_train.pkl"], "test": []})
    ds = build_dataset(cfg, ["car", "truck"], training=True, max_points=16,
                       max_boxes=2)
    names = [str(info["gt_names"][0]) for info in ds.infos]
    n_car, n_truck = names.count("car"), names.count("truck")
    # raw ratio is 9:1; resampling must bring it near 1:1
    assert n_truck > 0.5 * n_car, (n_car, n_truck)
    # without the flag the imbalance stays
    cfg2 = _cfg("NuScenesDataset", tmp_path,
                INFO_PATH={"train": ["infos_train.pkl"], "test": []})
    ds2 = build_dataset(cfg2, ["car", "truck"], training=True, max_points=16,
                        max_boxes=2)
    assert len(ds2.infos) == 20

"""Dataset bootstrap: raw trees -> infos + gt-database -> training consumers.

Covers kitti (create_kitti_infos/create_groundtruth_database vs reference
kitti_dataset.py:151,225), nuscenes (devkit-free table reader vs
nuscenes_utils.fill_trainval_infos), waymo (TFRecord framing +
process_single_sequence tree layout), and the gt_sampling paste path fed by
a generated database.
"""
import os
import pickle
import struct
import zlib

import numpy as np

from seevcn_tpu.cli.create_infos import main as create_infos_main


# ---------------------------------------------------------------------------
# synthetic raw KITTI tree
# ---------------------------------------------------------------------------

def _write_png(path, h=32, w=64):
    """Minimal 8-bit grayscale PNG."""
    raw = b"".join(b"\x00" + bytes(w) for _ in range(h))

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw)))
        f.write(chunk(b"IEND", b""))


# lidar -> camera: x_c = -y_l, y_c = -z_l, z_c = x_l
V2C = "0 -1 0 0 0 0 -1 0 1 0 0 0"


def _make_raw_kitti(root, n_frames=3):
    rng = np.random.RandomState(0)
    for sub in ("velodyne", "calib", "label_2", "image_2"):
        os.makedirs(root / "training" / sub, exist_ok=True)
    os.makedirs(root / "ImageSets", exist_ok=True)
    boxes_per_frame = []
    for i in range(n_frames):
        idx = f"{i:06d}"
        # one Car per frame at a known lidar pose
        cx, cy, yaw = 8.0 + i, (-2.0) ** (i % 2), 0.2 * i
        l, w, h = 4.2, 2.0, 1.6
        pts = np.zeros((500, 4), np.float32)
        pts[:, 0] = rng.uniform(0.5, 30.0, 500)
        pts[:, 1] = rng.uniform(-10.0, 10.0, 500)
        pts[:, 2] = rng.uniform(-1.5, 1.5, 500)
        # 60 points inside the box
        local = rng.uniform(-0.4, 0.4, (60, 3)).astype(np.float32) * [l, w, h]
        c, s = np.cos(yaw), np.sin(yaw)
        pts[:60, 0] = local[:, 0] * c - local[:, 1] * s + cx
        pts[:60, 1] = local[:, 0] * s + local[:, 1] * c + cy
        pts[:60, 2] = local[:, 2]
        pts.tofile(root / "training" / "velodyne" / f"{idx}.bin")

        with open(root / "training" / "calib" / f"{idx}.txt", "w") as f:
            f.write("P2: 700 0 600 0 0 700 180 0 0 0 1 0\n")
            f.write("R0_rect: 1 0 0 0 1 0 0 0 1\n")
            f.write(f"Tr_velo_to_cam: {V2C}\n")

        # camera-frame label: loc = bottom center, ry = -yaw - pi/2
        loc_cam = [-cy, 0.8, cx]  # z_l of bottom = -h/2 = -0.8
        ry = -yaw - np.pi / 2
        with open(root / "training" / "label_2" / f"{idx}.txt", "w") as f:
            f.write(f"Car 0.00 0 {-1.0:.2f} 100 100 300 200 "
                    f"{h} {w} {l} {loc_cam[0]} {loc_cam[1]} {loc_cam[2]} "
                    f"{ry:.6f}\n")
            f.write("DontCare -1 -1 -10 500 160 540 180 -1 -1 -1 "
                    "-1000 -1000 -1000 -10\n")
        _write_png(root / "training" / "image_2" / f"{idx}.png",
                   h=370, w=1224)
        boxes_per_frame.append([cx, cy, 0.0, l, w, h, yaw])
    for split in ("train", "val"):
        with open(root / "ImageSets" / f"{split}.txt", "w") as f:
            f.write("\n".join(f"{i:06d}" for i in range(n_frames)))
    return np.asarray(boxes_per_frame, np.float32)


def test_kitti_bootstrap_infos_and_gt_database(tmp_path):
    expected = _make_raw_kitti(tmp_path)
    create_infos_main(["--dataset", "kitti", "--root", str(tmp_path),
                       "--classes", "Car"])

    with open(tmp_path / "kitti_infos_train.pkl", "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 3
    info = infos[0]
    assert info["point_cloud"]["lidar_idx"] == "000000"
    assert tuple(info["image"]["image_shape"]) == (370, 1224)
    assert info["calib"]["P2"].shape == (4, 4)

    a = info["annos"]
    assert list(a["name"]) == ["Car", "DontCare"]
    assert a["index"].tolist() == [0, -1]
    # gt_boxes_lidar recovered the lidar-frame pose we planted
    np.testing.assert_allclose(a["gt_boxes_lidar"][0], expected[0], atol=1e-4)
    # difficulty: height 101 px, trunc 0, occl 0 -> Easy(0); DontCare -> -1
    assert a["difficulty"].tolist() == [0, -1]
    # the 60 planted points are counted (plus any random strays)
    assert a["num_points_in_gt"][0] >= 60
    assert a["num_points_in_gt"][1] == -1  # DontCare never counted

    # trainval concatenation exists
    with open(tmp_path / "kitti_infos_trainval.pkl", "rb") as f:
        assert len(pickle.load(f)) == 6

    # ---- gt database ----
    with open(tmp_path / "kitti_dbinfos_train.pkl", "rb") as f:
        db = pickle.load(f)
    assert set(db) == {"Car"} and len(db["Car"]) == 3
    e = db["Car"][0]
    assert e["num_points_in_gt"] >= 60
    obj = np.fromfile(tmp_path / e["path"], np.float32).reshape(-1, 4)
    assert len(obj) == e["num_points_in_gt"]
    # points are center-subtracted: all inside the box extents
    assert np.abs(obj[:, 2]).max() <= 0.81
    box = e["box3d_lidar"]
    np.testing.assert_allclose(box, expected[0], atol=1e-4)


def test_kitti_bootstrap_feeds_gt_sampling_training(tmp_path):
    """The generated infos + gt database drive a real training dataset with
    gt_sampling enabled: sampled objects are pasted (more boxes + their
    points present) — the reference DataBaseSampler path end-to-end from a
    raw tree."""
    from seevcn_tpu.data.kitti.dataset import KittiDataset
    from seevcn_tpu.utils.config import Cfg

    _make_raw_kitti(tmp_path)
    create_infos_main(["--dataset", "kitti", "--root", str(tmp_path),
                       "--classes", "Car"])

    dcfg = Cfg({
        "DATASET": "KittiDataset", "DATA_PATH": str(tmp_path),
        "POINT_CLOUD_RANGE": [0, -16, -3, 32, 16, 2],
        "DATA_SPLIT": {"train": "train", "test": "val"},
        "INFO_PATH": {"train": ["kitti_infos_train.pkl"],
                      "test": ["kitti_infos_val.pkl"]},
        "POINT_FEATURE_ENCODING": {
            "used_feature_list": ["x", "y", "z"],
            "src_feature_list": ["x", "y", "z", "intensity"]},
        "DATA_AUGMENTOR": {
            "DISABLE_AUG_LIST": [],
            "AUG_CONFIG_LIST": [{
                "NAME": "gt_sampling",
                "DB_INFO_PATH": ["kitti_dbinfos_train.pkl"],
                "SAMPLE_GROUPS": ["Car:5"],
                "PREPARE": {"filter_by_min_points": ["Car:5"]},
                "NUM_POINT_FEATURES": 4,
            }]},
    })
    ds = KittiDataset(dcfg, ["Car"], training=True)
    assert ds.gt_sampler is not None, "gt_sampling did not initialize"
    out = ds[0]
    n_gt = int(out["gt_mask"].sum())
    assert n_gt > 1, "no objects pasted by gt_sampling"
    # pasted boxes contain points (their db points moved with them)
    from seevcn_tpu.data.kitti.bootstrap import points_in_rotated_boxes_np

    pts = out["points"][out["points_valid"]]
    boxes = out["gt_boxes"][out["gt_mask"]]
    inside = points_in_rotated_boxes_np(pts[:, :3], boxes[:, :7])
    assert (inside.sum(axis=1) >= 5).all(), inside.sum(axis=1)


# ---------------------------------------------------------------------------
# nuScenes raw tables
# ---------------------------------------------------------------------------

def _quat_z(yaw):
    return [np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)]


def _make_raw_nuscenes(root, version="v1.0-mini", n_samples=3):
    import json

    tdir = root / version
    os.makedirs(tdir, exist_ok=True)
    os.makedirs(root / "samples" / "LIDAR_TOP", exist_ok=True)
    os.makedirs(root / "sweeps" / "LIDAR_TOP", exist_ok=True)
    os.makedirs(root / "samples" / "CAM_FRONT", exist_ok=True)

    sensors = [{"token": "sens_lidar", "channel": "LIDAR_TOP",
                "modality": "lidar"},
               {"token": "sens_cam", "channel": "CAM_FRONT",
                "modality": "camera"}]
    cal = [{"token": "cs_lidar", "sensor_token": "sens_lidar",
            "translation": [0.9, 0.0, 1.8], "rotation": _quat_z(0.0),
            "camera_intrinsic": []},
           {"token": "cs_cam", "sensor_token": "sens_cam",
            "translation": [1.7, 0.0, 1.5], "rotation": _quat_z(0.0),
            "camera_intrinsic": [[1266.0, 0, 800], [0, 1266.0, 450],
                                 [0, 0, 1]]}]
    scenes = [{"token": "scene0", "name": "scene-0001",
               "first_sample_token": "samp0"},
              {"token": "scene1", "name": "scene-0002",
               "first_sample_token": "samp2"}]
    samples, sample_data, ego_poses, anns = [], [], [], []
    instances = [{"token": "inst0", "category_token": "cat_car"}]
    categories = [{"token": "cat_car", "name": "vehicle.car"}]

    rng = np.random.RandomState(1)
    t0 = 1_000_000_000
    prev_sd = ""
    for i in range(n_samples):
        scene = "scene0" if i < 2 else "scene1"
        stok = f"samp{i}"
        samples.append({"token": stok, "timestamp": t0 + i * 500_000,
                        "scene_token": scene, "prev": "", "next": ""})
        # ego drives along +x in global frame
        ego = {"token": f"ego{i}", "translation": [10.0 * i, 0.0, 0.0],
               "rotation": _quat_z(0.0), "timestamp": t0 + i * 500_000}
        ego_poses.append(ego)
        fn = f"samples/LIDAR_TOP/lidar_{i}.pcd.bin"
        pts = rng.uniform(-20, 20, (300, 5)).astype(np.float32)
        pts.tofile(root / fn)
        sd = {"token": f"sd{i}", "sample_token": stok,
              "ego_pose_token": f"ego{i}",
              "calibrated_sensor_token": "cs_lidar",
              "timestamp": t0 + i * 500_000, "fileformat": "pcd",
              "is_key_frame": True, "filename": fn,
              "prev": prev_sd, "next": ""}
        sample_data.append(sd)
        prev_sd = f"sd{i}"
        cam_fn = f"samples/CAM_FRONT/cam_{i}.jpg"
        (root / cam_fn).write_bytes(b"\xff\xd8\xff\xe0")
        sample_data.append({"token": f"sdc{i}", "sample_token": stok,
                            "ego_pose_token": f"ego{i}",
                            "calibrated_sensor_token": "cs_cam",
                            "timestamp": t0 + i * 500_000,
                            "fileformat": "jpg", "is_key_frame": True,
                            "filename": cam_fn, "prev": "", "next": ""})
        # one car 15 m ahead of the ego in global frame, yaw 0.3
        anns.append({"token": f"ann{i}", "sample_token": stok,
                     "instance_token": "inst0",
                     "translation": [10.0 * i + 15.0, 2.0, 1.0],
                     "size": [2.0, 4.5, 1.7],  # w, l, h
                     "rotation": _quat_z(0.3),
                     "prev": f"ann{i-1}" if i > 0 else "",
                     "next": f"ann{i+1}" if i < n_samples - 1 else "",
                     "num_lidar_pts": 40, "num_radar_pts": 2,
                     "visibility_token": "4"})

    tables = {"scene": scenes, "sample": samples, "sample_data": sample_data,
              "calibrated_sensor": cal, "ego_pose": ego_poses,
              "sample_annotation": anns, "instance": instances,
              "category": categories, "sensor": sensors}
    for name, rows in tables.items():
        with open(tdir / f"{name}.json", "w") as f:
            json.dump(rows, f)


def test_nuscenes_bootstrap_infos(tmp_path):
    from seevcn_tpu.data.nuscenes_bootstrap import create_nuscenes_infos

    _make_raw_nuscenes(tmp_path)
    paths = create_nuscenes_infos(str(tmp_path), version="v1.0-mini",
                                  max_sweeps=3,
                                  val_scene_names=["scene-0002"])
    with open(paths["train"], "rb") as f:
        train = pickle.load(f)
    with open(paths["val"], "rb") as f:
        val = pickle.load(f)
    assert len(train) == 2 and len(val) == 1

    info = train[1]  # sample 1: ego at x=10
    assert info["lidar_path"].startswith("samples/LIDAR_TOP")
    assert len(info["sweeps"]) == 2
    # first sweep walks back to sample 0's sample_data with a real transform
    sw = info["sweeps"][0]
    assert sw["sample_data_token"] == "sd0"
    tm = sw["transform_matrix"]
    # sensor offset cancels; ego moved +10 in x => prev-frame points shift -10
    np.testing.assert_allclose(tm[:3, 3], [-10.0, 0.0, 0.0], atol=1e-9)
    assert abs(sw["time_lag"] - 0.5) < 1e-6

    # gt box in lidar frame: global (25, 2, 1) - ego(10,0,0) - cs(0.9,0,1.8)
    gt = info["gt_boxes"]
    assert gt.shape == (1, 9)
    np.testing.assert_allclose(gt[0, :3], [14.1, 2.0, -0.8], atol=1e-9)
    np.testing.assert_allclose(gt[0, 3:6], [4.5, 2.0, 1.7], atol=1e-9)  # lwh
    assert abs(gt[0, 6] - 0.3) < 1e-9
    # velocity: instance moves +10 m per 0.5 s in x => 20 m/s
    np.testing.assert_allclose(gt[0, 7:9], [20.0, 0.0], atol=1e-6)
    assert info["gt_names"][0] == "car"

    # the generated infos feed the NuScenesDataset directly
    from seevcn_tpu.data.generic import NuScenesDataset
    from seevcn_tpu.utils.config import Cfg

    dcfg = Cfg({"DATASET": "NuScenesDataset", "DATA_PATH": str(tmp_path),
                "POINT_CLOUD_RANGE": [-40, -40, -3, 40, 40, 3],
                "INFO_PATH": {"train":
                              [os.path.basename(paths["train"])]},
                "POINT_FEATURE_ENCODING": {
                    "used_feature_list": ["x", "y", "z"],
                    "src_feature_list": ["x", "y", "z", "intensity"]}})
    ds = NuScenesDataset(dcfg, ["car"], training=True)
    out = ds[0]
    assert out["points_valid"].sum() == 300
    assert int(out["gt_mask"].sum()) == 1


def test_nuscenes_gt_database(tmp_path):
    from seevcn_tpu.data.nuscenes_bootstrap import (
        create_nuscenes_groundtruth_database, create_nuscenes_infos)

    _make_raw_nuscenes(tmp_path)
    paths = create_nuscenes_infos(str(tmp_path), version="v1.0-mini",
                                  max_sweeps=3,
                                  val_scene_names=["scene-0002"])
    db_path = create_nuscenes_groundtruth_database(
        str(tmp_path), paths["train"], used_classes=["car"], max_sweeps=3)
    with open(db_path, "rb") as f:
        db = pickle.load(f)
    assert "car" in db and len(db["car"]) == 2
    for e in db["car"]:
        assert os.path.exists(tmp_path / e["path"])


# ---------------------------------------------------------------------------
# Waymo: TFRecord framing + processed-tree layout
# ---------------------------------------------------------------------------

def test_tfrecord_roundtrip(tmp_path):
    from seevcn_tpu.data.waymo_bootstrap import read_tfrecord, write_tfrecord

    payloads = [b"hello", b"", np.arange(100, dtype=np.int32).tobytes()]
    p = tmp_path / "seg.tfrecord"
    write_tfrecord(str(p), payloads)
    assert list(read_tfrecord(str(p))) == payloads


def _fake_waymo_frames(n=4, seed=0):
    rng = np.random.RandomState(seed)
    frames = []
    for i in range(n):
        pts = np.zeros((400, 6), np.float32)
        pts[:, 0] = rng.uniform(-30, 30, 400)
        pts[:, 1] = rng.uniform(-30, 30, 400)
        pts[:, 2] = rng.uniform(-1, 3, 400)
        box = [5.0 + i, 1.0, 1.0, 4.8, 2.1, 1.8, 0.1 * i]
        local = rng.uniform(-0.4, 0.4, (50, 3)) * [4.8, 2.1, 1.8]
        pts[:50, :3] = local + box[:3]
        frames.append({
            "points": pts,
            "labels": [
                {"name": "Vehicle", "box": box, "difficulty": 1,
                 "tracking_difficulty": 1, "num_points_in_gt": 50,
                 "obj_id": f"veh{i}"},
                {"name": "unknown", "box": [0, 0, 0, 1, 1, 1, 0],
                 "difficulty": 0, "tracking_difficulty": 0,
                 "num_points_in_gt": 0, "obj_id": f"unk{i}"},
            ],
            "pose": np.eye(4, dtype=np.float32),
            "context_name": "ctx", "timestamp_micros": 1000 + i,
            "image_shapes": [(1280, 1920)] * 5,
            "num_points_of_each_lidar": [400],
        })
    return frames


def test_waymo_process_sequence_and_dataset(tmp_path):
    from seevcn_tpu.data.waymo_bootstrap import (
        create_waymo_groundtruth_database, process_single_sequence)

    processed = tmp_path / "waymo_processed_data"
    infos = process_single_sequence(
        "segment-123_with_camera_labels.tfrecord", str(processed),
        frames=_fake_waymo_frames())
    assert len(infos) == 4
    assert infos[0]["point_cloud"]["lidar_sequence"] == "segment-123"
    # 'unknown' labels dropped, Vehicle kept
    assert list(infos[0]["annos"]["name"]) == ["Vehicle"]
    assert os.path.exists(processed / "segment-123" / "0000.npy")
    assert os.path.exists(processed / "segment-123" / "segment-123.pkl")

    # resume: re-processing returns the cached infos without frames
    again = process_single_sequence(
        "segment-123_with_camera_labels.tfrecord", str(processed),
        frames=None)
    assert len(again) == 4

    # gt database over the processed tree
    db_path = create_waymo_groundtruth_database(
        str(processed), save_path=str(tmp_path), sampled_interval=1)
    with open(db_path, "rb") as f:
        db = pickle.load(f)
    assert len(db["Vehicle"]) == 4
    e = db["Vehicle"][0]
    assert e["num_points_in_gt"] >= 50
    obj = np.fromfile(tmp_path / e["path"], np.float32).reshape(-1, 6)
    assert len(obj) == e["num_points_in_gt"]

    # WaymoDataset consumes the per-sequence pkl + npy tree
    from seevcn_tpu.data.generic import WaymoDataset
    from seevcn_tpu.utils.config import Cfg

    with open(processed / "segment-123" / "segment-123.pkl", "rb") as f:
        seq_infos = pickle.load(f)
    with open(tmp_path / "waymo_infos_train.pkl", "wb") as f:
        pickle.dump(seq_infos, f)
    dcfg = Cfg({"DATASET": "WaymoDataset", "DATA_PATH": str(tmp_path),
                "POINT_CLOUD_RANGE": [-40, -40, -3, 40, 40, 3],
                "INFO_PATH": {"train": ["waymo_infos_train.pkl"]},
                "POINT_FEATURE_ENCODING": {
                    "used_feature_list": ["x", "y", "z"],
                    "src_feature_list": ["x", "y", "z", "intensity"]}})
    ds = WaymoDataset(dcfg, ["Vehicle"], training=True)
    out = ds[0]
    assert int(out["gt_mask"].sum()) == 1
    assert out["points_valid"].sum() == 400

"""SEE adapters for nuScenes / Waymo / Baraja on synthetic trees, each driven
end-to-end through the run_see CLI det path (masks -> isolation -> VCN ->
completed .pcd -> update_infos -> SC dataset consumption).

Reference parity targets: nuscenes_objects.py:237-297 (6-cam/multi-sweep),
waymo_objects.py:170-186 (precomputed projections),
custom_dataset_objects.py:141-194 (fisheye distortion chain).
"""
import json
import os
import pickle

import numpy as np
import pytest
import yaml

from seevcn_tpu.cli.generate_masks import detections_to_coco


def _quat_from_rotmat(R):
    """(3,3) -> (w,x,y,z), for building synthetic nuScenes tables."""
    w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    if w > 1e-6:
        return [w, (R[2, 1] - R[1, 2]) / (4 * w),
                (R[0, 2] - R[2, 0]) / (4 * w), (R[1, 0] - R[0, 1]) / (4 * w)]
    raise ValueError("degenerate quaternion in test fixture")


def _vcn_ckpt(tmp_path, rng):
    import torch

    from test_vcn_models import make_reference_vcn_state_dict

    sd = make_reference_vcn_state_dict(rng, "VC")
    ckpt = tmp_path / "VCN_VC.pth"
    torch.save({"base_model": {k: torch.from_numpy(v) for k, v in sd.items()}},
               ckpt)
    return ckpt


def _see_cfg(tmp_path, data_block, vcn_ckpt, name):
    cfg = {
        "DATA": data_block,
        "PC_ISOLATION": {"MIN_LIDAR_PTS": 30, "EPS_SCALING": 4.0,
                         "MIN_EPS": 0.3, "MAX_EPS": 1.0},
        "SURFACE_COMPLETION": {"VRES": 0.4, "VCN": {
            "MODEL": "VCN_VC", "CKPT_PATH": str(vcn_ckpt),
            "NORM_WITH_GT": False, "SEL_K_NEAREST": 30, "CLUSTER_EPS": 0.4,
            "BATCH_SIZE_LIMIT": 8}},
    }
    path = tmp_path / f"see_{name}.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def _car_blob(rng, center, n=150):
    return (rng.randn(n, 3) * np.array([1.0, 0.4, 0.3])
            + np.asarray(center, np.float64)).astype(np.float32)


# ---------------------------------------------------------------------------
# nuScenes
# ---------------------------------------------------------------------------

# ego->camera: cam x = -ego y, cam y = -ego z (down), cam z = ego x (fwd)
R_EGO_FROM_CAM = np.array([[0., 0., 1.], [-1., 0., 0.], [0., -1., 0.]])


def _make_nuscenes_see_tree(root, rng, n_samples=2):
    version = "v1.0-mini"
    tdir = root / version
    os.makedirs(tdir, exist_ok=True)
    os.makedirs(root / "samples" / "LIDAR_TOP", exist_ok=True)
    os.makedirs(root / "samples" / "CAM_FRONT", exist_ok=True)

    K = [[800.0, 0, 800], [0, 800.0, 450], [0, 0, 1]]
    sensors = [{"token": "sens_lidar", "channel": "LIDAR_TOP",
                "modality": "lidar"},
               {"token": "sens_cam", "channel": "CAM_FRONT",
                "modality": "camera"}]
    cal = [{"token": "cs_lidar", "sensor_token": "sens_lidar",
            "translation": [0.0, 0.0, 1.8], "rotation": [1, 0, 0, 0],
            "camera_intrinsic": []},
           {"token": "cs_cam", "sensor_token": "sens_cam",
            "translation": [1.5, 0.0, 1.5],
            "rotation": _quat_from_rotmat(R_EGO_FROM_CAM),
            "camera_intrinsic": K}]
    scenes = [{"token": "scene0", "name": "scene-0001",
               "first_sample_token": "samp0"}]
    samples, sample_data, ego_poses, anns = [], [], [], []
    instances = [{"token": "inst0", "category_token": "cat_car"}]
    categories = [{"token": "cat_car", "name": "vehicle.car"}]

    t0 = 1_000_000_000
    masks_per_image = []
    prev_lidar_sd = ""
    infos = []
    for i in range(n_samples):
        stok = f"samp{i}"
        samples.append({"token": stok, "timestamp": t0 + i * 500_000,
                        "scene_token": "scene0",
                        "prev": f"samp{i-1}" if i else "",
                        "next": f"samp{i+1}" if i < n_samples - 1 else ""})
        ego_poses.append({"token": f"ego{i}",
                          "translation": [2.0 * i, 0.0, 0.0],
                          "rotation": [1, 0, 0, 0],
                          "timestamp": t0 + i * 500_000})
        # car blob 14 m ahead of the ego (global), background everywhere
        car_global = np.array([2.0 * i + 14.0, 0.5, 0.8])
        car = _car_blob(rng, car_global)
        bg = np.concatenate([rng.uniform(3, 40, (1200, 1)),
                             rng.uniform(-10, 10, (1200, 1)),
                             rng.uniform(-0.2, 1.6, (1200, 1))], 1
                            ).astype(np.float32)
        pts_global = np.vstack([bg + [2.0 * i, 0, 0], car])
        # store in LIDAR frame: global - ego - lidar cs (identity rotations)
        pts_lidar = pts_global - [2.0 * i, 0.0, 1.8]
        fn = f"samples/LIDAR_TOP/lidar_{i}.pcd.bin"
        out = np.zeros((len(pts_lidar), 5), np.float32)
        out[:, :3] = pts_lidar
        out.tofile(root / fn)
        sample_data.append({"token": f"sd{i}", "sample_token": stok,
                            "ego_pose_token": f"ego{i}",
                            "calibrated_sensor_token": "cs_lidar",
                            "timestamp": t0 + i * 500_000,
                            "fileformat": "pcd", "is_key_frame": True,
                            "filename": fn, "prev": prev_lidar_sd,
                            "next": ""})
        prev_lidar_sd = f"sd{i}"
        cam_fn = f"samples/CAM_FRONT/cam_{i}.jpg"
        (root / cam_fn).write_bytes(b"\xff\xd8\xff\xe0")
        sample_data.append({"token": f"sdc{i}", "sample_token": stok,
                            "ego_pose_token": f"ego{i}",
                            "calibrated_sensor_token": "cs_cam",
                            "timestamp": t0 + i * 500_000,
                            "fileformat": "jpg", "is_key_frame": True,
                            "filename": cam_fn, "width": 1600, "height": 900,
                            "prev": "", "next": ""})
        anns.append({"token": f"ann{i}", "sample_token": stok,
                     "instance_token": "inst0",
                     "translation": car_global.tolist(),
                     "size": [2.0, 4.5, 1.7], "rotation": [1, 0, 0, 0],
                     "prev": "", "next": "", "num_lidar_pts": 150,
                     "num_radar_pts": 0, "visibility_token": "4"})
        # project the car into CAM_FRONT for the mask
        cam_pts = (car - np.array([2.0 * i + 1.5, 0.0, 1.5])) @ R_EGO_FROM_CAM
        uv = np.stack([800 * cam_pts[:, 0] / cam_pts[:, 2] + 800,
                       800 * cam_pts[:, 1] / cam_pts[:, 2] + 450], 1)
        x0, y0 = uv.min(0) - 4
        x1, y1 = uv.max(0) + 4
        mask = np.zeros((900, 1600), bool)
        mask[int(max(y0, 0)):int(min(y1, 899)),
             int(max(x0, 0)):int(min(x1, 1599))] = True
        masks_per_image.append((f"cam_{i}", (900, 1600),
                                [{"mask": mask,
                                  "bbox": [x0, y0, x1 - x0, y1 - y0],
                                  "score": 0.95, "category_id": 2}]))
        infos.append({"token": stok, "lidar_path": fn,
                      "gt_boxes": np.array([[14.0 + 0.0, 0.5, -1.0,
                                             4.5, 2.0, 1.7, 0.0]],
                                           np.float32),
                      "gt_names": np.array(["car"])})

    tables = {"scene": scenes, "sample": samples, "sample_data": sample_data,
              "calibrated_sensor": cal, "ego_pose": ego_poses,
              "sample_annotation": anns, "instance": instances,
              "category": categories, "sensor": sensors}
    for name, rows in tables.items():
        with open(tdir / f"{name}.json", "w") as f:
            json.dump(rows, f)
    os.makedirs(root / "masks", exist_ok=True)
    detections_to_coco(masks_per_image, str(root / "masks" / "CAM_FRONT.json"))
    with open(root / "nuscenes_infos_train.pkl", "wb") as f:
        pickle.dump(infos, f)


def test_nuscenes_adapter_projection_and_sweeps(tmp_path):
    from seevcn_tpu.data.see_adapters import NuscenesObjects
    from seevcn_tpu.utils.config import Cfg

    rng = np.random.RandomState(0)
    _make_nuscenes_see_tree(tmp_path, rng)
    obj = NuscenesObjects(Cfg({
        "DATA_DIR": str(tmp_path), "VERSION": "v1.0-mini",
        "CAMERA_CHANNELS": ["CAM_FRONT"], "CLASSES": ["car"],
        "LIDAR_NSWEEPS": 2, "TAG": "T",
        "INFO_PATHS": {"train": "nuscenes_infos_train.pkl"}}))
    assert len(obj) == 2

    # single-sweep = this frame only; 2-sweep aggregates the previous frame
    pc1 = obj.get_pointcloud(1, nsweeps=1)
    pc2 = obj.get_pointcloud(1, nsweeps=2)
    assert len(pc1) == 1350 and len(pc2) == 2700
    # sweep transform: ego advanced +2 in x -> old points land 2 m behind
    prev_own = obj.get_pointcloud(0, nsweeps=1)
    np.testing.assert_allclose(pc2[1350:, 0], prev_own[:, 0] - 2.0, atol=1e-5)

    fov = obj.map_pointcloud_to_image(1, "CAM_FRONT")
    assert fov["pc_lidar"].shape[0] > 100
    assert fov["img_shape"] == (900, 1600)
    # depth along camera z == forward distance from the camera position
    lead = fov["pc_lidar"][:, 0] - (1.5 - 0.0)  # lidar x fwd; cam 1.5 m ahead
    np.testing.assert_allclose(fov["pc_cam"][:, 2], lead, atol=1e-5)

    inst = obj.get_camera_instances(1, "CAM_FRONT")
    assert len(inst) == 1 and inst[0]["category_id"] == 2


@pytest.mark.slow
def test_nuscenes_see_cli_end_to_end(tmp_path):
    from seevcn_tpu.cli import run_see
    from seevcn_tpu.data.generic import SCNuScenesDataset
    from seevcn_tpu.utils.config import Cfg

    rng = np.random.RandomState(0)
    _make_nuscenes_see_tree(tmp_path, rng)
    cfg_path = _see_cfg(tmp_path, {
        "DATASET": "nuscenes", "DATA_DIR": str(tmp_path),
        "VERSION": "v1.0-mini", "CAMERA_CHANNELS": ["CAM_FRONT"],
        "CLASSES": ["car"], "LIDAR_NSWEEPS": 1, "TAG": "T", "SPLIT": "train",
        "INFO_PATHS": {"train": "nuscenes_infos_train.pkl"},
    }, _vcn_ckpt(tmp_path, rng), "nuscenes")

    run_see.main(["--cfg_file", str(cfg_path), "--path", "det"])
    pcds = sorted((tmp_path / "samples" / "vcn_T").glob("*.pcd"))
    assert len(pcds) == 2

    infos_pkl = tmp_path / "infos_T" / "nuscenes_infos_train.pkl"
    assert infos_pkl.exists()
    with open(infos_pkl, "rb") as f:
        infos = pickle.load(f)
    assert all("completed_lidar_path" in i for i in infos)
    assert infos[0]["num_completed_lidar_pts"].shape == (1,)

    ds = SCNuScenesDataset(Cfg({
        "DATASET": "SCNuScenesDataset", "DATA_PATH": str(tmp_path),
        "POINT_CLOUD_RANGE": [-40, -40, -3, 40, 40, 3],
        "INFO_PATH": {"test": [str(infos_pkl)]}}), ["car"], training=False,
        max_points=8192, max_boxes=4)
    item = ds[0]
    assert item["points_valid"].sum() > 500


# ---------------------------------------------------------------------------
# Waymo
# ---------------------------------------------------------------------------

def _make_waymo_see_tree(root, rng, n_frames=2):
    from seevcn_tpu.data.waymo_bootstrap import process_single_sequence

    seq = "segment-777"
    frames = []
    projections = []
    for i in range(n_frames):
        car = _car_blob(rng, [12.0, 0.5, 0.9])
        bg = np.concatenate([rng.uniform(3, 50, (1200, 1)),
                             rng.uniform(-15, 15, (1200, 1)),
                             rng.uniform(-0.3, 2.5, (1200, 1))], 1
                            ).astype(np.float32)
        pts = np.vstack([bg, car])
        feats = np.zeros((len(pts), 6), np.float32)
        feats[:, :3] = pts
        feats[:, 5] = -1  # NLZ flag: valid
        frames.append({
            "points": feats,
            "labels": [{"name": "Vehicle",
                        "box": [12.0, 0.5, 0.9, 4.5, 2.0, 1.7, 0.0],
                        "difficulty": 1, "tracking_difficulty": 1,
                        "num_points_in_gt": 150, "obj_id": f"v{i}"}],
            "pose": np.eye(4, dtype=np.float32),
            "context_name": seq, "timestamp_micros": 1000 + i,
            "image_shapes": [(800, 1200)] * 5,
            "num_points_of_each_lidar": [len(pts)],
        })
        # pinhole FRONT camera at origin: u = 600 - 600*y/x, v = 400 - 600*z/x
        fov = pts[:, 0] > 2.0
        u = 600 - 600 * pts[fov, 1] / pts[fov, 0]
        v = 400 - 600 * pts[fov, 2] / pts[fov, 0]
        inside = (u > 0) & (u < 1200) & (v > 0) & (v < 800)
        fov[np.where(fov)[0][~inside]] = False
        uv = np.stack([u[inside], v[inside]], 1)
        projections.append((fov, uv, car))
    process_single_sequence(f"{seq}.tfrecord",
                            str(root / "waymo_processed_data"), frames=frames)

    masks_per_image = []
    for i, (fov, uv, car) in enumerate(projections):
        os.makedirs(root / "image_lidar_projections" / "image_pc" / "FRONT",
                    exist_ok=True)
        os.makedirs(root / "image_lidar_projections" / "fov_inds" / "FRONT",
                    exist_ok=True)
        stem = f"{seq}_{i:04d}.npy"
        np.save(root / "image_lidar_projections" / "image_pc" / "FRONT" / stem,
                uv)
        np.save(root / "image_lidar_projections" / "fov_inds" / "FRONT" / stem,
                fov)
        cu = 600 - 600 * car[:, 1] / car[:, 0]
        cv = 400 - 600 * car[:, 2] / car[:, 0]
        x0, y0 = cu.min() - 4, cv.min() - 4
        x1, y1 = cu.max() + 4, cv.max() + 4
        mask = np.zeros((800, 1200), bool)
        mask[int(max(y0, 0)):int(min(y1, 799)),
             int(max(x0, 0)):int(min(x1, 1199))] = True
        masks_per_image.append((f"{seq}_{i:04d}", (800, 1200),
                                [{"mask": mask,
                                  "bbox": [x0, y0, x1 - x0, y1 - y0],
                                  "score": 0.9, "category_id": 2}]))
    os.makedirs(root / "image_lidar_projections" / "masks", exist_ok=True)
    detections_to_coco(masks_per_image, str(
        root / "image_lidar_projections" / "masks" / "FRONT.json"))
    os.makedirs(root / "ImageSets", exist_ok=True)
    with open(root / "ImageSets" / "train.txt", "w") as f:
        f.write(f"{seq}.tfrecord\n")
    return seq


@pytest.mark.slow
def test_waymo_see_cli_end_to_end(tmp_path):
    from seevcn_tpu.cli import run_see
    from seevcn_tpu.data.generic import SCWaymoDataset
    from seevcn_tpu.data.see_adapters import WaymoObjects
    from seevcn_tpu.utils.config import Cfg

    rng = np.random.RandomState(1)
    seq = _make_waymo_see_tree(tmp_path, rng)

    data_block = {"DATASET": "waymo", "DATA_DIR": str(tmp_path),
                  "CAMERA_CHANNELS": ["FRONT"], "CLASSES": ["Car"],
                  "TAG": "T", "SPLIT": "train", "SAMPLED_INTERVAL": 1,
                  "MASK_DIR": str(tmp_path / "image_lidar_projections" /
                                  "masks")}
    obj = WaymoObjects(Cfg(data_block))
    assert len(obj) == 2
    fov = obj.map_pointcloud_to_image(0, "FRONT")
    assert fov["pc_lidar"].shape[0] == fov["pts_img"].shape[0]
    assert len(obj.get_camera_instances(0, "FRONT")) == 1
    assert obj.get_gt_boxes(0).shape == (1, 7)

    cfg_path = _see_cfg(tmp_path, data_block, _vcn_ckpt(tmp_path, rng),
                        "waymo")
    run_see.main(["--cfg_file", str(cfg_path), "--path", "det"])
    pcds = sorted((tmp_path / "vcn_T" / seq).glob("*.pcd"))
    assert len(pcds) == 2

    # update_infos wrote per-sequence pkls with completed paths
    with open(tmp_path / "vcn_T" / seq / f"{seq}.pkl", "rb") as f:
        seq_infos = pickle.load(f)
    assert all("completed_lidar_path" in i for i in seq_infos)

    with open(tmp_path / "sc_waymo_infos.pkl", "wb") as f:
        pickle.dump(seq_infos, f)
    ds = SCWaymoDataset(Cfg({
        "DATASET": "SCWaymoDataset", "DATA_PATH": str(tmp_path),
        "POINT_CLOUD_RANGE": [-50, -50, -3, 50, 50, 4],
        "INFO_PATH": {"test": ["sc_waymo_infos.pkl"]}}), ["Vehicle"],
        training=False, max_points=8192, max_boxes=4)
    assert ds[0]["points_valid"].sum() > 500


# ---------------------------------------------------------------------------
# Custom / Baraja (fisheye)
# ---------------------------------------------------------------------------

def _make_baraja_tree(root, rng, n_frames=2, model="equidistant"):
    from seevcn_tpu.geom.pcd_io import write_pcd

    split = "test"
    for sub in ("pcd", "calib"):
        os.makedirs(root / split / sub, exist_ok=True)
    os.makedirs(root / "infos", exist_ok=True)
    K = np.array([[900.0, 0, 960], [0, 900.0, 540], [0, 0, 1]])
    T = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0],
                  [0, 0, 0, 1.0]])
    dist = [0.02, -0.01, 0.005, -0.002] if model == "equidistant" \
        else [0.1, -0.05, 0.001, 0.001, 0.01]
    infos, masks_per_image = [], []
    from seevcn_tpu.geom.calibration import JsonCalibration

    calib = JsonCalibration({"intrinsic": K.tolist(), "extrinsic": T.tolist(),
                             "distcoeff": dist,
                             "distortion_model":
                             "fisheye" if model == "equidistant" else model})
    for i in range(n_frames):
        fid = f"{i:06d}"
        car = _car_blob(rng, [10.0, 0.3, 0.2])
        bg = np.concatenate([rng.uniform(3, 30, (1000, 1)),
                             rng.uniform(-8, 8, (1000, 1)),
                             rng.uniform(-0.5, 1.5, (1000, 1))], 1
                            ).astype(np.float32)
        pts = np.vstack([bg, car])
        write_pcd(str(root / split / "pcd" / f"{fid}.pcd"), pts)
        with open(root / split / "calib" / f"{fid}.json", "w") as f:
            json.dump({"intrinsic": K.tolist(), "extrinsic": T.tolist(),
                       "distcoeff": dist}, f)
        uv, _ = calib.lidar_to_img(car)
        x0, y0 = uv.min(0) - 4
        x1, y1 = uv.max(0) + 4
        mask = np.zeros((1080, 1920), bool)
        mask[int(max(y0, 0)):int(min(y1, 1079)),
             int(max(x0, 0)):int(min(x1, 1919))] = True
        masks_per_image.append((f"{fid}.jpg", (1080, 1920),
                                [{"mask": mask,
                                  "bbox": [x0, y0, x1 - x0, y1 - y0],
                                  "score": 0.9, "category_id": 2}]))
        infos.append({"point_cloud": {"lidar_idx": fid},
                      "image": {"image_shape": np.array([1080, 1920])},
                      "annos": {"name": np.array(["Car"]),
                                "gt_boxes_lidar": np.array(
                                    [[10.0, 0.3, 0.2, 4.5, 2.0, 1.7, 0.0]],
                                    np.float32)}})
    with open(root / "infos" / "baraja_infos_test.pkl", "wb") as f:
        pickle.dump(infos, f)
    os.makedirs(root / split / "masks", exist_ok=True)
    detections_to_coco(masks_per_image,
                       str(root / split / "masks" / "front.json"))


def test_baraja_fisheye_projection(tmp_path):
    from seevcn_tpu.data.see_adapters import CustomObjects
    from seevcn_tpu.utils.config import Cfg

    rng = np.random.RandomState(2)
    _make_baraja_tree(tmp_path, rng, model="equidistant")
    obj = CustomObjects(Cfg({
        "DATA_DIR": str(tmp_path), "SPLIT": "test",
        "CAMERA_CHANNELS": ["front"], "CLASSES": ["Car"], "TAG": "T",
        "CAMERA_MODEL": "equidistant"}))
    assert len(obj) == 2
    fov = obj.map_pointcloud_to_image(0, "front")
    assert fov["pc_lidar"].shape[0] > 200
    # fisheye distortion applied: reproject one point manually
    p = fov["pc_lidar"][0:1]
    x, y = p[0, 1] * -1, p[0, 2] * -1  # into camera axes
    z = p[0, 0]
    xn, yn = x / z, y / z
    r = np.sqrt(xn**2 + yn**2)
    th = np.arctan(r)
    d = [0.02, -0.01, 0.005, -0.002]
    th_d = th * (1 + d[0] * th**2 + d[1] * th**4 + d[2] * th**6
                 + d[3] * th**8)
    u = 900 * (th_d / r) * xn + 960
    v = 900 * (th_d / r) * yn + 540
    np.testing.assert_allclose(fov["pc_cam"][0, :2], [u, v], atol=1e-6)
    assert len(obj.get_camera_instances(0, "front")) == 1


@pytest.mark.slow
def test_baraja_see_cli_end_to_end(tmp_path):
    from seevcn_tpu.cli import run_see
    from seevcn_tpu.data.generic import SCCustomDataset
    from seevcn_tpu.utils.config import Cfg

    rng = np.random.RandomState(2)
    _make_baraja_tree(tmp_path, rng)
    cfg_path = _see_cfg(tmp_path, {
        "DATASET": "baraja", "DATA_DIR": str(tmp_path), "SPLIT": "test",
        "CAMERA_CHANNELS": ["front"], "CLASSES": ["Car"], "TAG": "T",
        "CAMERA_MODEL": "equidistant",
    }, _vcn_ckpt(tmp_path, rng), "baraja")

    run_see.main(["--cfg_file", str(cfg_path), "--path", "det"])
    pcds = sorted((tmp_path / "test" / "vcn_T").glob("*.pcd"))
    assert len(pcds) == 2

    infos_pkl = tmp_path / "infos_T" / "baraja_infos_test.pkl"
    assert infos_pkl.exists()
    ds = SCCustomDataset(Cfg({
        "DATASET": "SCCustomDataset", "DATA_PATH": str(tmp_path),
        "POINT_CLOUD_RANGE": [-40, -40, -3, 40, 40, 3],
        "INFO_PATH": {"test": [str(infos_pkl)]},
        "PROCESSED_DATA_TAG": "vcn_T"}), ["Car"], training=False,
        max_points=8192, max_boxes=4)
    item = ds[0]
    assert item["points_valid"].sum() > 500


@pytest.mark.slow
def test_run_see_threaded_workers(tmp_path):
    """--workers N (sc_multiproc pool analog): same outputs as the serial
    loop, resume-by-file preserved."""
    from seevcn_tpu.cli import run_see
    from seevcn_tpu.geom.pcd_io import read_pcd

    rng = np.random.RandomState(3)
    _make_nuscenes_see_tree(tmp_path, rng)
    cfg_path = _see_cfg(tmp_path, {
        "DATASET": "nuscenes", "DATA_DIR": str(tmp_path),
        "VERSION": "v1.0-mini", "CAMERA_CHANNELS": ["CAM_FRONT"],
        "CLASSES": ["car"], "LIDAR_NSWEEPS": 1, "TAG": "W", "SPLIT": "train",
        "INFO_PATHS": {"train": "nuscenes_infos_train.pkl"},
    }, _vcn_ckpt(tmp_path, rng), "nuscenes")

    run_see.main(["--cfg_file", str(cfg_path), "--path", "det",
                  "--workers", "3"])
    pcds = sorted((tmp_path / "samples" / "vcn_W").glob("*.pcd"))
    assert len(pcds) == 2
    first = {p.name: read_pcd(str(p)).copy() for p in pcds}

    # rerun resumes by file: contents unchanged
    run_see.main(["--cfg_file", str(cfg_path), "--path", "det",
                  "--workers", "3"])
    for p in pcds:
        np.testing.assert_array_equal(read_pcd(str(p)), first[p.name])

"""Full SEE preprocessing loop on a synthetic KITTI tree: masks ->
isolation -> VCN -> completed .pcd + infos -> SCKittiDataset consumes them.
This is BASELINE config 2's path end-to-end (synthetic data, random VCN)."""
import os
import pickle

import numpy as np
import jax
import pytest
import yaml

from seevcn_tpu.cli.generate_masks import detections_to_coco
from seevcn_tpu.geom.calibration import KittiCalibration


def _make_kitti_see_tree(tmp_path, rng):
    os.makedirs(tmp_path / "training" / "velodyne", exist_ok=True)
    os.makedirs(tmp_path / "training" / "calib", exist_ok=True)
    calib_lines = (
        "P0: " + " ".join(["0"] * 12) + "\n"
        "P1: " + " ".join(["0"] * 12) + "\n"
        "P2: 700 0 620 0 0 700 180 0 0 0 1 0\n"
        "P3: " + " ".join(["0"] * 12) + "\n"
        "R0_rect: 1 0 0 0 1 0 0 0 1\n"
        "Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0\n")
    infos = []
    masks_per_image = []
    for i in range(2):
        fid = f"{i:06d}"
        # background + car blob at (12, 0, 0)
        bg = np.concatenate([rng.uniform(3, 40, (1500, 1)),
                             rng.uniform(-8, 8, (1500, 1)),
                             rng.uniform(-1.5, 0.5, (1500, 1)),
                             rng.rand(1500, 1)], 1).astype(np.float32)
        car = (rng.randn(150, 3) * np.array([1.0, 0.4, 0.3])
               + np.array([12, 0, 0])).astype(np.float32)
        car = np.concatenate([car, rng.rand(150, 1).astype(np.float32)], 1)
        pts = np.vstack([bg, car])
        pts.tofile(tmp_path / "training" / "velodyne" / f"{fid}.bin")
        with open(tmp_path / "training" / "calib" / f"{fid}.txt", "w") as f:
            f.write(calib_lines)
        infos.append({
            "point_cloud": {"lidar_idx": fid},
            "image": {"image_shape": np.array([375, 1242])},
            "annos": {"name": np.array(["Car"]),
                      "gt_boxes_lidar": np.array([[12, 0, 0, 4.2, 2.0, 1.6, 0.0]],
                                                 np.float32),
                      "num_points_in_gt": np.array([150])},
        })
        # mask: project the car blob into image_2 and take its bbox hull
        calib = KittiCalibration({"P2": np.array(
            [[700, 0, 620, 0], [0, 700, 180, 0], [0, 0, 1, 0]]),
            "R0": np.eye(3),
            "Tr_velo2cam": np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0]])})
        uv, _ = calib.lidar_to_img(car[:, :3])
        x0, y0 = uv.min(0) - 3
        x1, y1 = uv.max(0) + 3
        mask = np.zeros((375, 1242), bool)
        mask[int(max(y0, 0)):int(min(y1, 374)),
             int(max(x0, 0)):int(min(x1, 1241))] = True
        masks_per_image.append((f"{fid}.png", (375, 1242),
                                [{"mask": mask,
                                  "bbox": [x0, y0, x1 - x0, y1 - y0],
                                  "score": 0.95, "category_id": 3}]))
    with open(tmp_path / "kitti_infos_val.pkl", "wb") as f:
        pickle.dump(infos, f)
    detections_to_coco(masks_per_image, str(tmp_path / "masks_image_2.json"))
    return infos


def _write_see_cfg(tmp_path, vcn_ckpt):
    cfg = {
        "DATA": {"DATASET": "kitti", "DATA_DIR": str(tmp_path),
                 "INFO_PATHS": ["kitti_infos_val.pkl"],
                 "MASK_PATHS": {"image_2": "masks_image_2.json"},
                 "CAMERA_CHANNELS": ["image_2"], "TAG": "TESTTAG",
                 "CLASSES": ["Car"]},
        "PC_ISOLATION": {"MIN_LIDAR_PTS": 30, "EPS_SCALING": 4.0,
                         "MIN_EPS": 0.3, "MAX_EPS": 1.0},
        "SURFACE_COMPLETION": {"VRES": 0.4, "VCN": {
            "MODEL": "VCN_VC", "CKPT_PATH": str(vcn_ckpt),
            "NORM_WITH_GT": False, "SEL_K_NEAREST": 30, "CLUSTER_EPS": 0.4,
            "BATCH_SIZE_LIMIT": 8}},
    }
    path = tmp_path / "see_kitti.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


@pytest.mark.slow
def test_see_cli_end_to_end(tmp_path):
    import torch

    from test_vcn_models import make_reference_vcn_state_dict
    from seevcn_tpu.cli import run_see
    from seevcn_tpu.data.kitti.dataset import SCKittiDataset
    from seevcn_tpu.utils.config import Cfg

    rng = np.random.RandomState(0)
    _make_kitti_see_tree(tmp_path, rng)
    sd = make_reference_vcn_state_dict(rng, "VC")
    ckpt = tmp_path / "VCN_VC.pth"
    torch.save({"base_model": {k: torch.from_numpy(v) for k, v in sd.items()}},
               ckpt)
    cfg_path = _write_see_cfg(tmp_path, ckpt)

    run_see.main(["--cfg_file", str(cfg_path), "--path", "det"])
    out_dir = tmp_path / "training" / "vcn_TESTTAG"
    pcds = sorted(out_dir.glob("*.pcd"))
    assert len(pcds) == 2, list(out_dir.iterdir())

    # resume-by-file: second run skips everything
    run_see.main(["--cfg_file", str(cfg_path), "--path", "det"])

    # the updated infos drive SCKittiDataset
    infos_pkl = tmp_path / "infos_TESTTAG" / "kitti_infos_val.pkl"
    assert infos_pkl.exists()
    ds_cfg = Cfg({"DATASET": "SCKittiDataset", "DATA_PATH": str(tmp_path),
                  "POINT_CLOUD_RANGE": [0, -40, -3, 70.4, 40, 1],
                  "DATA_PROCESSOR": [],
                  "INFO_PATH": {"train": [],
                                "test": [str(infos_pkl)]},
                  "PROCESSED_DATA_TAG": "vcn_TESTTAG"})
    ds = SCKittiDataset(ds_cfg, ["Car"], training=False, max_points=4096,
                        max_boxes=4)
    assert len(ds) == 2
    item = ds[0]
    assert item["points_valid"].sum() > 1000
    # completed clouds contain VCN surface points (not identical to raw)
    raw = np.fromfile(tmp_path / "training" / "velodyne" / "000000.bin",
                      np.float32).reshape(-1, 4)
    assert item["points_valid"].sum() != len(raw)

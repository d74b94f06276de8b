"""End-to-end CLI integration: train a mini SECOND-IoU on synthetic KITTI
infos (1 epoch on the 8-device CPU mesh), then evaluate the saved checkpoint
through the test CLI (including the .pth export path)."""
import os
import pickle

import numpy as np
import pytest
import yaml

from test_detector import _mini_cfg


def _make_kitti_tree(root, n_frames=4):
    rng = np.random.RandomState(0)
    os.makedirs(root / "training" / "velodyne", exist_ok=True)
    infos = []
    for i in range(n_frames):
        pts = np.zeros((700, 4), np.float32)
        pts[:, 0] = rng.uniform(0.5, 15.5, 700)
        pts[:, 1] = rng.uniform(-7.5, 7.5, 700)
        pts[:, 2] = rng.uniform(-1.9, 1.9, 700)
        box = np.array([[rng.uniform(4, 12), rng.uniform(-4, 4), 0,
                         4.2, 2.0, 1.6, rng.uniform(-1.5, 1.5)]], np.float32)
        # add a dense blob inside the box so there's signal
        blob = rng.randn(80, 3).astype(np.float32) * 0.3 + box[0, :3]
        pts[:80, :3] = blob
        pts.tofile(root / "training" / "velodyne" / f"{i:06d}.bin")
        infos.append({
            "point_cloud": {"lidar_idx": f"{i:06d}"},
            "image": {"image_shape": np.array([375, 1242])},
            "calib": {"P2": np.eye(4)[:3] * 700, "R0_rect": np.eye(4),
                      "Tr_velo_to_cam": np.array([[0, -1, 0, 0], [0, 0, -1, 0],
                                                  [1, 0, 0, 0], [0, 0, 0, 1.0]])},
            "annos": {"name": np.array(["Car"]),
                      "gt_boxes_lidar": box,
                      "location": np.array([[-box[0, 1], 0.8, box[0, 0]]]),
                      "dimensions": np.array([[4.2, 1.6, 2.0]]),
                      "rotation_y": np.array([-box[0, 6] - np.pi / 2]),
                      "bbox": np.array([[100, 100, 300, 200.0]]),
                      "occluded": np.array([0]), "truncated": np.array([0.0]),
                      "num_points_in_gt": np.array([80])},
        })
    for split in ("train", "val"):
        with open(root / f"kitti_infos_{split}.pkl", "wb") as f:
            pickle.dump(infos, f)


def _write_cfg(tmp_path):
    cfg = _mini_cfg()
    cfg["DATA_CONFIG"]["DATASET"] = "KittiDataset"
    cfg["DATA_CONFIG"]["DATA_PATH"] = str(tmp_path)
    cfg["DATA_CONFIG"]["INFO_PATH"] = {"train": ["kitti_infos_train.pkl"],
                                       "test": ["kitti_infos_val.pkl"]}
    cfg["DATA_CONFIG"]["DATA_AUGMENTOR"] = {
        "DISABLE_AUG_LIST": [],
        "AUG_CONFIG_LIST": [
            {"NAME": "random_world_flip", "ALONG_AXIS_LIST": ["x"]},
        ]}
    cfg["OPTIMIZATION"] = {"OPTIMIZER": "adam_onecycle",
                           "BATCH_SIZE_PER_GPU": 1, "NUM_EPOCHS": 1,
                           "LR": 0.003, "WEIGHT_DECAY": 0.01, "MOMENTUM": 0.9,
                           "MOMS": [0.95, 0.85], "PCT_START": 0.4,
                           "DIV_FACTOR": 10, "GRAD_NORM_CLIP": 10}
    path = tmp_path / "mini_second_iou.yaml"

    def clean(o):
        if isinstance(o, dict):
            return {k: clean(v) for k, v in o.items()}
        if isinstance(o, (list, tuple)):
            return [clean(v) for v in o]
        return o

    with open(path, "w") as f:
        yaml.safe_dump(clean(cfg), f)
    return path


@pytest.mark.slow
def test_cli_train_then_eval(tmp_path):
    from seevcn_tpu.cli import test_detector as test_cli
    from seevcn_tpu.cli import train_detector as train_cli

    _make_kitti_tree(tmp_path)
    cfg_path = _write_cfg(tmp_path)
    out_dir = tmp_path / "output"

    train_cli.main(["--cfg_file", str(cfg_path), "--batch_size", "8",
                    "--epochs", "1", "--max_points", "1024",
                    "--output_dir", str(out_dir)])
    ckpts = sorted((out_dir / "mini_second_iou" / "default" / "ckpt").glob("*.pkl"))
    assert ckpts, "no checkpoint written"
    pths = sorted((out_dir / "mini_second_iou" / "default" / "ckpt").glob("*.pth"))
    assert pths, "no reference-format .pth exported"

    report, ap = test_cli.main(["--cfg_file", str(cfg_path),
                                "--ckpt", str(ckpts[-1]),
                                "--batch_size", "2", "--max_points", "1024",
                                "--output_dir", str(out_dir)])
    assert report is not None and "Car" in report

    # DA: DATA_CONFIG_TAR routes evaluation to the target dataset
    import yaml as _yaml
    with open(cfg_path) as f:
        full = _yaml.safe_load(f)
    full["DATA_CONFIG_TAR"] = {
        "DATASET": "KittiDataset", "TARGET": True, "CLASS_NAMES": ["Car"],
        "DATA_PATH": str(tmp_path), "SHIFT_COOR": [0.0, 0.0, 0.0],
        "POINT_CLOUD_RANGE": [0, -8, -2, 16, 8, 2],
        "POINT_FEATURE_ENCODING": full["DATA_CONFIG"]["POINT_FEATURE_ENCODING"],
        "DATA_PROCESSOR": [], "INFO_PATH": {"train": [],
                                            "test": ["kitti_infos_val.pkl"]}}
    tar_cfg = tmp_path / "mini_da.yaml"
    with open(tar_cfg, "w") as f:
        _yaml.safe_dump(full, f)
    report_tar, ap_tar = test_cli.main(["--cfg_file", str(tar_cfg),
                                        "--ckpt", str(ckpts[-1]),
                                        "--batch_size", "2",
                                        "--max_points", "1024",
                                        "--output_dir", str(out_dir)])
    assert report_tar is not None and "Car" in report_tar

    # the exported .pth must also be loadable for eval (checkpoint-compat path)
    report2, ap2 = test_cli.main(["--cfg_file", str(cfg_path),
                                  "--ckpt", str(pths[-1]),
                                  "--batch_size", "2", "--max_points", "1024",
                                  "--output_dir", str(out_dir)])
    assert report2 is not None
    # same weights -> same AP
    assert abs(ap["Car"]["3d"][0] - ap2["Car"]["3d"][0]) < 1e-6

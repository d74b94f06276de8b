"""generate_masks COCO writer <-> see.masks reader roundtrip, and the SEE
KITTI adapter on a synthetic tree."""
import os
import pickle

import numpy as np

from seevcn_tpu.cli.generate_masks import detections_to_coco, mask_to_polygons
from seevcn_tpu.see.masks import CocoMasks, get_pts_in_mask


def test_mask_polygon_roundtrip(tmp_path):
    mask = np.zeros((100, 120), bool)
    mask[20:60, 30:80] = True
    dets = [{"mask": mask, "bbox": [30, 20, 50, 40], "score": 0.9,
             "category_id": 3}]
    out = detections_to_coco([("000001.png", (100, 120), dets)],
                             str(tmp_path / "masks.json"))
    coco = CocoMasks(out)
    insts = coco.load_anns(coco.get_ann_ids(1))
    assert len(insts) == 1
    rmask = coco.annToMask(insts[0])
    # rasterized polygon must overlap the original mask almost exactly
    inter = (rmask.astype(bool) & mask).sum()
    union = (rmask.astype(bool) | mask).sum()
    assert inter / union > 0.95


def test_see_kitti_adapter(tmp_path):
    from seevcn_tpu.data.kitti.see_adapter import KittiObjects
    from seevcn_tpu.utils.config import Cfg

    rng = np.random.RandomState(0)
    os.makedirs(tmp_path / "training" / "velodyne", exist_ok=True)
    os.makedirs(tmp_path / "training" / "calib", exist_ok=True)
    pts = np.concatenate([rng.uniform(3, 40, (400, 1)),
                          rng.uniform(-10, 10, (400, 1)),
                          rng.uniform(-1.5, 1.0, (400, 1)),
                          rng.rand(400, 1)], 1).astype(np.float32)
    pts.tofile(tmp_path / "training" / "velodyne" / "000001.bin")
    with open(tmp_path / "training" / "calib" / "000001.txt", "w") as f:
        f.write("P0: " + " ".join(["0"] * 12) + "\n")
        f.write("P1: " + " ".join(["0"] * 12) + "\n")
        f.write("P2: 700 0 600 0 0 700 180 0 0 0 1 0\n")
        f.write("P3: " + " ".join(["0"] * 12) + "\n")
        f.write("R0_rect: 1 0 0 0 1 0 0 0 1\n")
        f.write("Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0\n")
    infos = [{"point_cloud": {"lidar_idx": "000001"},
              "image": {"image_shape": np.array([375, 1242])},
              "annos": {"name": np.array(["Car"]),
                        "gt_boxes_lidar": np.array([[10, 0, 0, 4, 2, 1.6, 0.1]])}}]
    with open(tmp_path / "infos.pkl", "wb") as f:
        pickle.dump(infos, f)

    # masks covering the full image -> all fov points selected
    full = [{"mask": np.ones((375, 1242), bool), "bbox": [0, 0, 1242, 375],
             "score": 0.99, "category_id": 3}]
    mask_path = detections_to_coco([("000001.png", (375, 1242), full)],
                                   str(tmp_path / "masks.json"))

    ko = KittiObjects(Cfg({"DATA_DIR": str(tmp_path),
                           "INFO_PATHS": ["infos.pkl"],
                           "MASK_PATHS": {"image_2": "masks.json"},
                           "TAG": "test"}))
    assert len(ko) == 1
    imgfov = ko.map_pointcloud_to_image(0)
    assert imgfov["pc_lidar"].shape[0] > 100
    insts = ko.get_camera_instances(0)
    assert len(insts) == 1
    out = get_pts_in_mask(ko.masks["image_2"], insts, imgfov)
    assert len(out["lidar_xyz"]) == 1
    assert len(out["lidar_xyz"][0]) == len(imgfov["pc_lidar"])
    # gt boxes + infos update
    assert ko.get_gt_boxes(0).shape == (1, 7)
    path = ko.update_infos(str(tmp_path / "infos_out"))
    with open(path, "rb") as f:
        new = pickle.load(f)
    assert new[0]["completed_lidar_path"].endswith("000001.pcd")

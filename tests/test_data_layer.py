import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp

from seevcn_tpu.utils.config import Cfg
from seevcn_tpu.data.dataset import DatasetTemplate, PointFeatureEncoder
from seevcn_tpu.data import augmentor as A


def _ds_cfg(**kw):
    d = {
        "POINT_CLOUD_RANGE": [0, -40, -3, 70.4, 40, 1],
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z"],
            "src_feature_list": ["x", "y", "z", "intensity"]},
        "DATA_PROCESSOR": [
            {"NAME": "shuffle_points",
             "SHUFFLE_ENABLED": {"train": True, "test": False}}],
    }
    d.update(kw)
    return Cfg(d)


def test_feature_encoder_selects():
    enc = PointFeatureEncoder(_ds_cfg().POINT_FEATURE_ENCODING)
    pts = np.arange(8, dtype=np.float32).reshape(2, 4)
    out = enc(pts)
    assert out.shape == (2, 3)
    np.testing.assert_allclose(out, pts[:, :3])


def test_prepare_frame_fixed_shapes():
    ds = DatasetTemplate(_ds_cfg(), ["Car"], training=False,
                         max_points=1000, max_boxes=8)
    rng = np.random.RandomState(0)
    pts = np.concatenate([rng.uniform(1, 60, (500, 1)),
                          rng.uniform(-30, 30, (500, 1)),
                          rng.uniform(-2, 0.5, (500, 1)),
                          rng.rand(500, 1)], axis=1).astype(np.float32)
    pts[0] = [500, 0, 0, 0]  # out of range -> dropped
    gt = np.array([[10, 0, -1, 4, 2, 1.5, 0.3]], np.float32)
    out = ds.prepare_frame(pts, gt, np.array(["Car"]))
    assert out["points"].shape == (1000, 3)
    assert out["points_valid"].sum() == 499
    assert out["gt_boxes"].shape == (8, 8)
    assert out["gt_boxes"][0, 7] == 1  # class id
    assert out["gt_mask"].sum() == 1
    # test split keeps order (no shuffle)
    np.testing.assert_allclose(out["points"][0], pts[1, :3])


def test_prepare_frame_class_filter_and_shift():
    cfg = _ds_cfg(SHIFT_COOR=[0.0, 0.0, 1.8])
    ds = DatasetTemplate(cfg, ["Car"], training=False, max_points=100, max_boxes=4)
    pts = np.array([[10, 0, -1, 0.5]], np.float32)
    gt = np.array([[10, 0, -1, 4, 2, 1.5, 0.3],
                   [20, 0, -1, 0.8, 0.8, 1.8, 0.0]], np.float32)
    out = ds.prepare_frame(pts, gt, np.array(["Car", "Pedestrian"]))
    assert out["gt_mask"].sum() == 1          # Pedestrian filtered out
    np.testing.assert_allclose(out["points"][0, 2], -1 + 1.8, atol=1e-6)
    np.testing.assert_allclose(out["gt_boxes"][0, 2], -1 + 1.8, atol=1e-6)


def test_world_augmentations_consistency():
    """Points inside a gt box must stay inside after any world aug."""
    from seevcn_tpu.geom.boxes import points_in_boxes

    rng = jax.random.PRNGKey(0)
    p = np.random.RandomState(1)
    box = np.array([[10, 5, 0, 4, 2, 1.6, 0.4]], np.float32)
    local = p.uniform(-0.45, 0.45, (50, 3)).astype(np.float32) * \
        np.array([4, 2, 1.6], np.float32)
    from seevcn_tpu.geom.transforms import rotate_points_along_z as rot
    pts = np.asarray(rot(jnp.asarray(local[None]), jnp.asarray([0.4])))[0] + box[0, :3]
    pts = jnp.asarray(np.concatenate([pts, np.zeros((50, 1))], 1).astype(np.float32))
    gb = jnp.asarray(box)
    aug_list = (("random_world_flip", ("x", "y")),
                ("random_world_rotation", (-0.7853, 0.7853)),
                ("random_world_scaling", (0.95, 1.05)))
    pts2, _, gb2, _ = A.augment_frame(rng, pts, jnp.ones(50, bool), gb,
                                      jnp.ones(1, bool), aug_list=aug_list)
    inside = np.asarray(points_in_boxes(pts2[:, :3], gb2[:, :7]))
    assert inside[0].mean() > 0.95


def test_object_scaling_shrinks():
    rng = jax.random.PRNGKey(3)
    box = jnp.asarray([[10, 5, 0, 4, 2, 1.6, 0.0]], jnp.float32)
    pts = jnp.asarray(np.array([[11.9, 5, 0, 0], [30, 30, 0, 0]], np.float32))
    p2, b2 = A.random_object_scaling(rng, pts, box, jnp.ones(1, bool), (0.7, 0.95))
    b2 = np.asarray(b2)
    assert (b2[0, 3:6] < np.array([4, 2, 1.6])).all()
    # in-box point moved toward center, out-of-box point untouched
    assert float(p2[0, 0]) < 11.9
    np.testing.assert_allclose(np.asarray(p2)[1], [30, 30, 0, 0])


def test_kitti_dataset_with_synthetic_infos(tmp_path):
    from seevcn_tpu.data.kitti.dataset import KittiDataset, SCKittiDataset
    from seevcn_tpu.geom.pcd_io import write_pcd

    root = tmp_path
    os.makedirs(root / "training" / "velodyne", exist_ok=True)
    pts = np.random.RandomState(0).rand(200, 4).astype(np.float32) * 10
    pts.tofile(root / "training" / "velodyne" / "000001.bin")
    os.makedirs(root / "training" / "vcn_test", exist_ok=True)
    write_pcd(str(root / "training" / "vcn_test" / "000001.pcd"), pts[:, :3] + 1)

    info = {
        "point_cloud": {"lidar_idx": "000001"},
        "image": {"image_shape": np.array([375, 1242])},
        "calib": {"P2": np.eye(4)[:3] * 700, "R0_rect": np.eye(4),
                  "Tr_velo_to_cam": np.array(
                      [[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1.0]])},
        "annos": {"name": np.array(["Car"]),
                  "gt_boxes_lidar": np.array([[5, 0, 0, 4, 2, 1.5, 0.1]]),
                  "location": np.array([[0, 0, 5.0]]),
                  "dimensions": np.array([[4, 1.5, 2.0]]),
                  "rotation_y": np.array([0.1]), "bbox": np.array([[0, 0, 100, 100.0]]),
                  "occluded": np.array([0]), "truncated": np.array([0.0]),
                  "num_points_in_gt": np.array([100])},
    }
    with open(root / "infos_val.pkl", "wb") as f:
        pickle.dump([info], f)

    cfg = _ds_cfg(DATA_PATH=str(root),
                  INFO_PATH={"train": [], "test": ["infos_val.pkl"]},
                  PROCESSED_DATA_TAG="vcn_test")
    ds = KittiDataset(cfg, ["Car"], training=False, root_path=str(root),
                      max_points=512, max_boxes=4)
    assert len(ds) == 1
    item = ds[0]
    assert item["points"].shape == (512, 3)
    assert item["gt_mask"].sum() == 1

    sc = SCKittiDataset(cfg, ["Car"], training=False, root_path=str(root),
                        max_points=512, max_boxes=4)
    item_sc = sc[0]
    # completed cloud is shifted by +1 -> different points
    assert not np.allclose(item_sc["points"][:10], item["points"][:10])

    # prediction dicts + evaluation roundtrip (perfect prediction)
    pred = [{"pred_boxes": info["annos"]["gt_boxes_lidar"],
             "pred_scores": np.array([0.9]), "pred_labels": np.array([1])}]
    annos = ds.generate_prediction_dicts([0], pred, ["Car"],
                                         output_path=str(root / "out"))
    assert len(annos) == 1 and annos[0]["name"][0] == "Car"
    assert os.path.exists(root / "out" / "000001.txt")
    report, res = ds.evaluation(annos, ["Car"])
    assert "Car" in report


def test_translation_and_local_augmentations():
    """World translation shifts everything rigidly; local augs move only the
    points inside each gt box; frustum dropout shrinks validity masks."""
    import jax
    import jax.numpy as jnp
    import seevcn_tpu.data.augmentor as A

    rng = jax.random.PRNGKey(3)
    rs = np.random.RandomState(0)
    pts = np.zeros((60, 4), np.float32)
    pts[:40] = rs.uniform(-20, 20, (40, 4))          # background
    pts[40:, 0] = rs.uniform(9, 11, 20)              # inside the box
    pts[40:, 1] = rs.uniform(-0.8, 0.8, 20)
    pts[40:, 2] = rs.uniform(-0.7, 0.7, 20)
    box = np.array([[10, 0, 0, 4.0, 2.0, 1.6, 0.0]], np.float32)
    pj, gj = jnp.asarray(pts), jnp.asarray(box)
    ones = jnp.ones(60, bool)
    m1 = jnp.ones(1, bool)

    # world translation: same offset everywhere
    p2, _, g2, _ = A.augment_frame(
        rng, pj, ones, gj, m1,
        aug_list=(("random_world_translation", ((0.5, 0.5, 0.5),
                                                ("x", "y", "z"))),))
    off_p = np.asarray(p2[:, :3] - pj[:, :3])
    off_b = np.asarray(g2[:, :3] - gj[:, :3])
    np.testing.assert_allclose(off_p, np.tile(off_p[0], (60, 1)), atol=1e-5)
    np.testing.assert_allclose(off_b[0], off_p[0], atol=1e-5)

    # local translation: background untouched, box + its points shifted alike
    p3, _, g3, _ = A.augment_frame(
        rng, pj, ones, gj, m1,
        aug_list=(("random_local_translation", ((-1.0, 1.0),
                                                ("x", "y"))),))
    np.testing.assert_allclose(np.asarray(p3[:40]), pts[:40], atol=1e-5)
    shift = np.asarray(g3[0, :3] - gj[0, :3])
    np.testing.assert_allclose(np.asarray(p3[40:, :3] - pj[40:, :3]),
                               np.tile(shift, (20, 1)), atol=1e-5)

    # local rotation: background untouched, box heading changed
    p4, _, g4, _ = A.augment_frame(
        rng, pj, ones, gj, m1,
        aug_list=(("random_local_rotation", (-0.7, 0.7)),))
    np.testing.assert_allclose(np.asarray(p4[:40]), pts[:40], atol=1e-5)
    assert abs(float(g4[0, 6] - gj[0, 6])) > 1e-4

    # local scaling: dims scale, background untouched
    p5, _, g5, _ = A.augment_frame(
        rng, pj, ones, gj, m1,
        aug_list=(("random_local_scaling", (0.5, 0.6)),))
    s = float(g5[0, 3] / gj[0, 3])
    assert 0.5 <= s <= 0.6
    np.testing.assert_allclose(np.asarray(p5[:40]), pts[:40], atol=1e-5)

    # world frustum dropout (top): some points become invalid, none move
    p6, v6, g6, m6 = A.augment_frame(
        rng, pj, ones, gj, m1,
        aug_list=(("random_world_frustum_dropout",
                   ((0.3, 0.5), ("top",))),))
    np.testing.assert_allclose(np.asarray(p6), pts, atol=1e-5)
    assert 0 < int(np.asarray(v6).sum()) < 60
    zmax = pts[:, 2].max()
    dropped = ~np.asarray(v6)
    assert pts[dropped, 2].min() > pts[:, 2].mean()  # only the top got cut

    # local frustum dropout: only in-box points can be dropped
    p7, v7, _, _ = A.augment_frame(
        rng, pj, ones, gj, m1,
        aug_list=(("random_local_frustum_dropout",
                   ((0.4, 0.6), ("top",))),))
    assert np.asarray(v7)[:40].all()


def test_local_pyramid_aug():
    """Pyramid membership = in-box + dominant normalized axis; dropout kills
    exactly one face's points; sparsify caps a pyramid's population; swap
    relocates a pyramid into the partner box preserving local coords."""
    import jax
    import jax.numpy as jnp
    import seevcn_tpu.data.augmentor as A

    # membership: points near +x face vs -y face of an axis-aligned box
    box = jnp.asarray([0, 0, 0, 4.0, 2.0, 1.6, 0.0])
    pts = jnp.asarray([[1.8, 0.1, 0.1, 0.0],     # +x dominant -> face 0
                       [-1.8, 0.1, 0.1, 0.0],    # -x -> face 1
                       [0.1, 0.9, 0.1, 0.0],     # +y -> face 2
                       [0.1, 0.1, -0.7, 0.0],    # -z -> face 5
                       [9.0, 9.0, 9.0, 0.0]])    # outside
    face, inside = A._pyramid_membership(pts, box)
    np.testing.assert_array_equal(np.asarray(face[:4]), [0, 1, 2, 5])
    np.testing.assert_array_equal(np.asarray(inside),
                                  [True, True, True, True, False])

    # dropout with prob 1: exactly one pyramid's points invalidated
    rng = jax.random.PRNGKey(0)
    rs = np.random.RandomState(0)
    p = np.zeros((400, 4), np.float32)
    p[:, 0] = rs.uniform(-1.9, 1.9, 400)
    p[:, 1] = rs.uniform(-0.95, 0.95, 400)
    p[:, 2] = rs.uniform(-0.75, 0.75, 400)
    pj = jnp.asarray(p)
    gj = jnp.asarray(box)[None]
    ones = jnp.ones(400, bool)
    p2, v2, _, _ = A.random_local_pyramid_aug(
        rng, pj, ones, gj, jnp.ones(1, bool), (1.0, 0.0, 50, 0.0))
    dropped = ~np.asarray(v2)
    assert 0 < dropped.sum() < 400
    f_all, ins_all = A._pyramid_membership(pj, jnp.asarray(box))
    f_np = np.asarray(f_all)
    assert len(np.unique(f_np[dropped])) == 1    # one face only

    # sparsify with prob 1: chosen pyramid capped at 20 members
    p3, v3, _, _ = A.random_local_pyramid_aug(
        jax.random.PRNGKey(1), pj, ones, gj, jnp.ones(1, bool),
        (0.0, 1.0, 20, 0.0))
    v3 = np.asarray(v3)
    counts = [((f_np == k) & v3).sum() for k in range(6)]
    before = [(f_np == k).sum() for k in range(6)]
    assert sum(c < b for c, b in zip(counts, before)) == 1
    assert min(counts) >= 0 and any(c == 20 for c in counts)


def test_shm_cache_roundtrip():
    """SharedArray-equivalent (reference sa_create/attach): create, attach
    from the same process, mutate through the view, delete."""
    from seevcn_tpu.utils.shm_cache import (sa_attach, sa_create, sa_delete,
                                            sa_exists)

    rs = np.random.RandomState(0)
    arr = rs.randn(100, 5).astype(np.float32)
    name = "shm://test_pts_0001"
    v = sa_create(name, arr)
    assert sa_exists(name)
    np.testing.assert_array_equal(v, arr)
    a = sa_attach(name)
    np.testing.assert_array_equal(a, arr)
    a[0, 0] = 42.0                       # shared: visible through both views
    assert v[0, 0] == 42.0
    # long names are hashed into valid segment names
    long = "shm://waymo_processed_data/segment-1234567890_with_a_long_tag__17"
    sa_create(long, arr[:10])
    assert sa_exists(long)
    np.testing.assert_array_equal(sa_attach(long), arr[:10])
    sa_delete(long)
    sa_delete(name)
    assert not sa_exists(name)


def test_waymo_shared_memory_cache(tmp_path):
    """WaymoDataset USE_SHARED_MEMORY: second access comes from the cache."""
    import pickle
    from seevcn_tpu.data.generic import WaymoDataset
    from seevcn_tpu.utils.config import Cfg
    from seevcn_tpu.utils.shm_cache import sa_delete, sa_exists

    rs = np.random.RandomState(1)
    seq = "segment-777"
    d = tmp_path / "waymo_processed_data" / seq
    d.mkdir(parents=True)
    pts = rs.randn(300, 6).astype(np.float32)
    np.save(d / "0000.npy", pts)
    infos = [{"point_cloud": {"lidar_sequence": seq, "sample_idx": 0},
              "annos": {"name": np.array(["Vehicle"]),
                        "gt_boxes_lidar": np.zeros((1, 7))}}]
    with open(tmp_path / "waymo_infos.pkl", "wb") as f:
        pickle.dump(infos, f)
    cfg = Cfg({"DATASET": "WaymoDataset", "DATA_PATH": str(tmp_path),
               "USE_SHARED_MEMORY": True,
               "INFO_PATH": {"test": ["waymo_infos.pkl"]},
               "POINT_CLOUD_RANGE": [-10, -10, -3, 10, 10, 2],
               "POINT_FEATURE_ENCODING": {
                   "encoding_type": "absolute_coordinates_encoding",
                   "used_feature_list": ["x", "y", "z"],
                   "src_feature_list": ["x", "y", "z"]},
               "DATA_PROCESSOR": []})
    ds = WaymoDataset(cfg, ["Vehicle"], training=False, max_points=64)
    p1 = ds.get_lidar(infos[0])
    assert sa_exists(f"{seq}__0")
    # delete the backing file: the cache must serve the second read
    (d / "0000.npy").unlink()
    p2 = ds.get_lidar(infos[0])
    np.testing.assert_array_equal(p1, p2)
    sa_delete(f"{seq}__0")


def test_kitti_get_item_list_camera_items(tmp_path):
    """GET_ITEM_LIST images/depth_maps/calib_matricies + FOV_POINTS_ONLY
    (reference kitti_dataset.py:411-462) — the CaDDN input path."""
    import cv2
    from seevcn_tpu.data.kitti.dataset import KittiDataset

    root = tmp_path
    os.makedirs(root / "training" / "velodyne", exist_ok=True)
    os.makedirs(root / "training" / "image_2", exist_ok=True)
    os.makedirs(root / "training" / "depth_2", exist_ok=True)
    # points ahead (in FOV) and behind (culled)
    pts = np.array([[10, 0, 0, 0.5], [12, 1, 0, 0.5],
                    [-5, 0, 0, 0.5]], np.float32)
    pts.tofile(root / "training" / "velodyne" / "000001.bin")
    img = np.full((100, 200, 3), 128, np.uint8)
    cv2.imwrite(str(root / "training" / "image_2" / "000001.png"), img)
    depth = (np.full((100, 200), 7.25) * 256).astype(np.uint16)
    cv2.imwrite(str(root / "training" / "depth_2" / "000001.png"), depth)

    info = {
        "point_cloud": {"lidar_idx": "000001"},
        "image": {"image_shape": np.array([100, 200])},
        "calib": {"P2": np.array([[50, 0, 100, 0], [0, 50, 50, 0],
                                  [0, 0, 1, 0], [0, 0, 0, 1.0]]),
                  "R0_rect": np.eye(4),
                  "Tr_velo_to_cam": np.array(
                      [[0, -1, 0, 0], [0, 0, -1, 0],
                       [1, 0, 0, 0], [0, 0, 0, 1.0]])},
        "annos": {"name": np.array(["Car"]),
                  "gt_boxes_lidar": np.array([[10, 0, 0, 4, 2, 1.5, 0.0]]),
                  "num_points_in_gt": np.array([2])},
    }
    with open(root / "infos_val.pkl", "wb") as f:
        pickle.dump([info], f)

    cfg = _ds_cfg(DATA_PATH=str(root),
                  INFO_PATH={"train": [], "test": ["infos_val.pkl"]},
                  GET_ITEM_LIST=["points", "images", "depth_maps",
                                 "calib_matricies"],
                  FOV_POINTS_ONLY=True,
                  IMAGE_PAD_SHAPE=(128, 256))
    ds = KittiDataset(cfg, ["Car"], training=False, root_path=str(root),
                      max_points=16, max_boxes=4)
    item = ds[0]
    # behind-camera point culled by FOV filter
    assert int(item["points_valid"].sum()) == 2
    assert item["images"].shape == (128, 256, 3)
    np.testing.assert_allclose(item["images"][:100, :200],
                               128 / 255.0, atol=1e-3)
    np.testing.assert_allclose(item["images"][100:], 0.0)
    assert item["depth_maps"].shape == (128, 256)
    np.testing.assert_allclose(item["depth_maps"][:100, :200], 7.25)
    assert item["trans_lidar_to_cam"].shape == (4, 4)
    np.testing.assert_allclose(
        item["trans_lidar_to_cam"][:3, :4],
        np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0.0]]))
    assert item["trans_cam_to_img"].shape == (3, 4)

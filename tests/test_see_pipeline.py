"""End-to-end SEE pipeline tests on the bundled reference demo frames
(/root/reference/demo/demo_data: 5 pcd+calib+image frames — the reference's
only fixture, SURVEY.md §4)."""
import os

import numpy as np
import pytest
import jax.numpy as jnp

DEMO = "/root/reference/demo/demo_data"
needs_demo = pytest.mark.skipif(not os.path.isdir(DEMO), reason="demo data absent")


def test_pcd_roundtrip(tmp_path):
    from seevcn_tpu.geom.pcd_io import read_pcd, write_pcd

    pts = np.random.RandomState(0).randn(100, 3).astype(np.float32)
    for binary in (True, False):
        p = tmp_path / f"x_{binary}.pcd"
        write_pcd(str(p), pts, binary=binary)
        back = read_pcd(str(p))
        np.testing.assert_allclose(back, pts, atol=1e-6)


@needs_demo
def test_read_reference_demo_pcd():
    from seevcn_tpu.geom.pcd_io import read_pcd

    pts = read_pcd(os.path.join(DEMO, "pcd", "000001.pcd"))
    assert pts.shape == (26715, 3)
    assert np.isfinite(pts).all()


@needs_demo
def test_demo_projection():
    from seevcn_tpu.data.demo_dataset import DemoObjects

    do = DemoObjects(DEMO)
    imgfov = do.map_pointcloud_to_image(0)
    assert imgfov["pc_lidar"].shape[0] > 1000
    assert (imgfov["pts_img"][:, 0] >= 0).all()
    h, w = imgfov["img_shape"]
    assert (imgfov["pts_img"][:, 0] < w).all() and (imgfov["pts_img"][:, 1] < h).all()


def test_kitti_calibration_roundtrip(tmp_path):
    from seevcn_tpu.geom.calibration import KittiCalibration

    calib = KittiCalibration({
        "P2": np.array([[700, 0, 600, 40], [0, 700, 200, 1], [0, 0, 1, 0.01]]),
        "R0": np.eye(3) + 0.01 * np.array([[0, -1, 0], [1, 0, 0], [0, 0, 0]]),
        "Tr_velo2cam": np.array([[0, -1, 0, 0.1], [0, 0, -1, -0.2], [1, 0, 0, 0.3]]),
    })
    pts = np.random.RandomState(1).uniform(-20, 20, (50, 3))
    pts[:, 0] = np.abs(pts[:, 0]) + 5
    rect = calib.lidar_to_rect(pts)
    back = calib.rect_to_lidar(rect)
    np.testing.assert_allclose(back, pts, atol=1e-9)
    uv, depth = calib.rect_to_img(rect)
    assert (depth > 0).all()


def test_masks_and_pts_in_mask():
    from seevcn_tpu.see.masks import CocoMasks, get_pts_in_mask, polygons_to_mask

    m = polygons_to_mask([[10, 10, 50, 10, 50, 50, 10, 50]], 100, 100)
    assert m[30, 30] == 1 and m[5, 5] == 0

    coco = CocoMasks({
        "images": [{"id": 1, "file_name": "a.jpg", "height": 100, "width": 100}],
        "annotations": [{"id": 7, "image_id": 1, "category_id": 3, "score": 0.9,
                         "bbox": [10, 10, 40, 40],
                         "segmentation": [[10, 10, 50, 10, 50, 50, 10, 50]]}],
    })
    insts = coco.load_anns(coco.get_ann_ids(1))
    assert len(insts) == 1

    pts_img = np.array([[30, 30], [70, 70], [11, 49]])
    pc_lidar = np.array([[1.0, 0, 0], [2, 0, 0], [3, 0, 0]])
    out = get_pts_in_mask(coco, insts, {
        "pts_img": pts_img, "pc_lidar": pc_lidar, "pc_cam": None,
        "img_shape": (100, 100)})
    assert len(out["lidar_xyz"]) == 1
    np.testing.assert_allclose(out["lidar_xyz"][0][:, 0], [1.0, 3.0])


def _fake_vcn_seevcn():
    """SEEVCN with a tiny randomly-initialized VCN (no ckpt on disk)."""
    import jax
    from seevcn_tpu.models.vcn.inference import VCNInference
    from seevcn_tpu.models.vcn.nets import build_vcn
    from seevcn_tpu.see.pipeline import SEEVCN
    from seevcn_tpu.utils.config import Cfg

    model = build_vcn("VCN_VC")
    variables = model.init(jax.random.PRNGKey(0),
                           {"input": jnp.zeros((1, 1024, 3))})
    vcn = VCNInference(model_name="VCN_VC", variables=variables,
                       norm_with_gt=False, batch_size=8)
    see = SEEVCN(Cfg({"PC_ISOLATION": {"MIN_LIDAR_PTS": 30, "EPS_SCALING": 4.0,
                                       "MIN_EPS": 0.3, "MAX_EPS": 1.0},
                      "SURFACE_COMPLETION": {"VRES": 0.4}}))
    see.vcn = vcn
    return see


@pytest.mark.slow
def test_gt_isolation_and_replacement():
    see = _fake_vcn_seevcn()
    rng = np.random.RandomState(0)
    # background + one dense car-shaped blob inside a gt box
    bg = rng.uniform(-20, 20, (3000, 3)).astype(np.float32)
    bg[:, 2] = rng.uniform(-2, 2, 3000)
    car = rng.randn(200, 3).astype(np.float32) * np.array([1.2, 0.5, 0.4]) + \
        np.array([5, 5, 0.5])
    points = np.vstack([bg, car]).astype(np.float32)
    gt = np.array([[5, 5, 0.5, 4.2, 2.0, 1.6, 0.2]], np.float32)

    pcds, labels = see.isolate_gt_pts(points, gt)
    assert len(pcds) == 1 and pcds[0].shape[0] >= 100

    out = see.process_gt_frame(points, gt)
    assert out.shape[1] == 3 and np.isfinite(out).all()
    # completed frame should contain completed instance points (1024-point
    # surfaces) replacing the original car points
    assert len(out) != len(points)


def test_det_isolation_clusters():
    see = _fake_vcn_seevcn()
    rng = np.random.RandomState(1)
    car = rng.randn(300, 3).astype(np.float32) * 0.3 + np.array([10, 0, 0])
    stray = np.array([[30.0, 20, 5]], np.float32)  # far outlier in same mask
    proj = [{"img_uv": [np.zeros((301, 2), int)],
             "cam_xyz": [],
             "lidar_xyz": [np.vstack([car, stray])],
             "img_labels": [{}]}]
    inst = see.isolate_det_pts(proj)
    assert len(inst) == 1
    assert len(inst[0]) >= 290          # stray point clustered away
    assert np.abs(inst[0] - [10, 0, 0]).max() < 3


def test_replace_with_completed():
    see = _fake_vcn_seevcn()
    pts = np.array([[0.0, 0, 0], [5, 0, 0], [10, 0, 0]], np.float32)
    completed = np.array([[5.02, 0, 0]], np.float32)
    out = see.replace_with_completed_pts(pts, completed, point_dist_thresh=0.1)
    # the point at 5.0 is replaced by the completed point; others kept
    assert out.shape == (3, 3)
    assert 5.02 in out[:, 0] and 5.0 not in out[:, 0]


def test_seev1_sampling_densifies_by_range():
    """Legacy SEE-v1 path: upsampling rate grows with object range
    (ring_height / optimal); near objects are left as-is."""
    from seevcn_tpu.see.pipeline import seev1_sampling, seev1_upsample

    rs = np.random.RandomState(0)
    obj = rs.randn(120, 3).astype(np.float32) * 0.4

    near = seev1_sampling(obj + [3.0, 0, 0], gt_box=np.array([3.0, 0, 0]))
    far = seev1_sampling(obj + [40.0, 0, 0],
                         gt_box=np.array([40.0, 0, 0, 4, 2, 1.6, 0.0]))
    assert len(near) >= len(obj)
    assert len(far) > 3 * len(obj)            # 40m: ring_h ~0.28 -> ~5.6x
    # originals preserved, interpolants stay near the object
    np.testing.assert_array_equal(far[:len(obj)], obj + [40.0, 0, 0])
    d = np.linalg.norm(far - [40.0, 0, 0], axis=1)
    assert d.max() < np.linalg.norm(obj, axis=1).max() + 1e-4

    up = seev1_upsample(obj, 500)
    assert up.shape == (500, 3)


def test_seev1_pipeline_path():
    """USE_SEEV1: the GT completion path densifies without a VCN model."""
    from seevcn_tpu.see.pipeline import SEEVCN
    from seevcn_tpu.utils.config import Cfg

    see = SEEVCN(Cfg({"PC_ISOLATION": {"MIN_LIDAR_PTS": 10},
                      "SURFACE_COMPLETION": {"USE_SEEV1": True,
                                             "VRES": 0.4}}))
    rs = np.random.RandomState(0)
    objs = [rs.randn(60, 3).astype(np.float32) * 0.4 + [30.0, 0, 0]]
    labels = [np.array([30.0, 0, 0, 4.2, 2.0, 1.6, 0.0], np.float32)]
    ret = see.complete_gt_pts(objs, labels)
    assert ret["all_instances"] is not None
    assert len(ret["clustered"][0]) > len(objs[0])   # densified at 30 m

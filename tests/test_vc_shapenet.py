"""VC-ShapeNet generator: raycast + sample a synthetic cube 'car'."""
import os
import numpy as np

from seevcn_tpu.models.vcn import vc_shapenet as VS


def _make_cube_obj(path, size=(4.0, 1.8, 1.5)):
    sx, sy, sz = size[0] / 2, size[1] / 2, size[2] / 2
    # shapenet frame: y up, -z forward; our loader maps -z->x, -x->y, y->z
    v = []
    for x in (-sx, sx):
        for y in (-sy, sy):
            for z in (-sz, sz):
                v.append((y, z, -x))  # inverse of the loader's axis swap
    faces = [(1, 2, 4), (1, 4, 3), (5, 7, 8), (5, 8, 6),  # two x faces
             (1, 5, 6), (1, 6, 2), (3, 4, 8), (3, 8, 7),
             (1, 3, 7), (1, 7, 5), (2, 6, 8), (2, 8, 4)]
    with open(path, "w") as f:
        for p in v:
            f.write("v %f %f %f\n" % p)
        for a, b, c in faces:
            f.write("f %d %d %d\n" % (a, b, c))


def test_load_and_normalize(tmp_path):
    p = tmp_path / "cube.obj"
    _make_cube_obj(str(p))
    verts, faces = VS.load_obj(str(p))
    assert faces.shape == (12, 3)
    norm = VS.normalize_car_mesh(verts, target_length=4.2)
    np.testing.assert_allclose(norm[:, 0].max() - norm[:, 0].min(), 4.2, atol=1e-6)


def test_raycast_hits_visible_faces(tmp_path):
    p = tmp_path / "cube.obj"
    _make_cube_obj(str(p))
    verts, faces = VS.load_obj(str(p))
    verts = VS.normalize_car_mesh(verts)
    placed = VS.transform_mesh(verts, np.array([10, 0, 0, 4.2, 0, 0, 0.0]))
    pts = VS.raycast_mesh(placed, faces, az_res_deg=0.5, el_res_deg=0.5)
    assert len(pts) > 50
    # only the near face (x ~ 10 - 2.1) is visible from the origin
    assert pts[:, 0].max() < 10.0
    np.testing.assert_allclose(pts[:, 0].min(), 10 - 2.1, atol=0.05)


def test_sample_surface_uniform(tmp_path):
    p = tmp_path / "cube.obj"
    _make_cube_obj(str(p))
    verts, faces = VS.load_obj(str(p))
    pts = VS.sample_surface(verts, faces, 2000)
    assert pts.shape == (2000, 3)
    # all points on the cube surface (one coord at a bound)
    b = np.abs(verts).max(0)
    on_surf = np.isclose(np.abs(pts), b[None, :] * np.ones_like(pts), atol=1e-4)
    assert on_surf.any(axis=1).mean() > 0.99


def test_generate_dataset_consumable(tmp_path):
    from seevcn_tpu.models.vcn.dataset import VCDataset

    p = tmp_path / "cube.obj"
    _make_cube_obj(str(p))
    poses = [np.array([12, 2, 0, 4.2, 0, 0, 0.4]),
             np.array([8, -3, 0, 4.0, 0, 0, -0.8])]
    out = tmp_path / "vc"
    VS.generate_vc_dataset([str(p)], poses, str(out), logger=lambda s: None)
    ds = VCDataset(str(out), n_points=128, n_complete=256)
    assert len(ds) == 2
    item = ds[0]
    assert item["input"].shape == (128, 3)
    assert item["gt_boxes"][3] > 3.5  # plausible car length


def test_normalize_object_pose_and_object_scaling():
    """PCN-style pose normalization + canonical-frame object scaling
    (reference data_transforms.py:287-317, 400-424)."""
    from seevcn_tpu.models.vcn.transforms import (NormalizeObjectPose,
                                                  RandomObjectScaling)
    from seevcn_tpu.geom.boxes import boxes_to_corners_3d
    import jax.numpy as jnp

    box = np.array([5.0, 2.0, -0.5, 4.2, 1.9, 1.6, 0.7], np.float32)
    corners = np.asarray(boxes_to_corners_3d(jnp.asarray(box[None])))[0]
    rs = np.random.RandomState(0)
    pts = rs.randn(200, 3).astype(np.float32) * 0.5 + box[:3]

    npose = NormalizeObjectPose({"input_keys": {"ptcloud": "partial",
                                                "bbox": "bbox_pts"}})
    out = npose(pts, bbox_pts=corners)
    # normalized: roughly centered, unit-ish scale
    assert np.abs(out.mean(0)).max() < 0.5
    assert np.abs(out).max() < 2.0

    scaler = RandomObjectScaling({"scale_range": (0.5, 0.6)},
                                 rng=np.random.default_rng(0))
    gt = box.copy()
    done = False
    for _ in range(20):          # enable fires with prob 0.5
        gt2 = box.copy()
        p2 = scaler(pts.copy(), gt_box=gt2)
        if not np.allclose(gt2[3:6], box[3:6]):
            done = True
            assert (gt2[3:6] < box[3:6]).all()      # shrink-only range
            # points moved toward the box center in the canonical frame
            assert np.linalg.norm(p2 - box[:3], axis=1).mean() < \
                np.linalg.norm(pts - box[:3], axis=1).mean()
            break
    assert done, "scaling never enabled in 20 tries"


def test_populate_scene_and_occlusion(tmp_path):
    """Scene generation (reference dataset_functions.py:265-462): poses from
    real-frame infos, pole/sign distractors, occlusion-aware raycast."""
    p = tmp_path / "cube.obj"
    _make_cube_obj(str(p))
    verts, faces = VS.load_obj(str(p))
    verts = VS.normalize_car_mesh(verts)

    # a car directly behind another (same bearing) must lose points
    near = np.array([8, 0, 0, 4.2, 0, 0, 0.0])
    far = np.array([20, 0, 0, 4.2, 0, 0, 0.0])
    cars = []
    for pose in (near, far):
        placed = VS.transform_mesh(verts, pose)
        dims = verts.max(0) - verts.min(0)
        s = pose[3] / dims[0]
        cars.append({"verts": placed, "faces": faces,
                     "gtbox": np.array([*pose[:3], pose[3], dims[1] * s,
                                        dims[2] * s, pose[6]])})
    sverts, sfaces = VS.populate_scene(cars, rng=np.random.default_rng(0),
                                       random_poles_pct=0.0)
    rays = VS.cast_rays_at_point(sverts, sfaces, far[:3], fov_deg=60,
                                 height_px=80)
    far_pts = rays[VS.points_in_box7(rays, cars[1]["gtbox"])]
    # occluded: the far car is fully shadowed by the near one
    solo = VS.cast_rays_at_point(cars[1]["verts"], faces, far[:3],
                                 fov_deg=60, height_px=80)
    assert len(far_pts) < 0.3 * len(solo)

    # poles add geometry
    v2, f2 = VS.populate_scene(cars, sign_boxes=np.array([[5, 5, 0, .2, .2, 2, 0]]),
                               rng=np.random.default_rng(0), random_poles_pct=1.0)
    assert len(v2) > len(sverts) and len(f2) > len(sfaces)


def test_frames_from_infos_filters():
    infos = [
        {"annos": {"name": np.array(["Vehicle", "Vehicle", "Sign", "Cyclist"]),
                   "gt_boxes_lidar": np.array([
                       [10, 0, 1, 4.2, 1.9, 1.6, 0.0],
                       [12, 2, 1, 4.0, 1.0, 1.5, 0.3],   # width<1.5: dropped
                       [5, 5, 1, 0.3, 0.3, 0.6, 0.0],
                       [3, 1, 1, 1.8, 0.6, 1.7, 0.0]])}},
        {"annos": {"name": np.array(["Pedestrian"]),
                   "gt_boxes_lidar": np.zeros((1, 7))}},
    ]
    frames = VS.frames_from_infos(infos, lidar_height=2.4)
    assert len(frames) == 1
    assert frames[0]["cars"].shape == (1, 7)
    np.testing.assert_allclose(frames[0]["cars"][0, 2], 1 - 2.4)
    assert frames[0]["signs"].shape == (1, 7)


def test_generate_scene_dataset_consumable(tmp_path):
    from seevcn_tpu.models.vcn.dataset import VCDataset

    p = tmp_path / "cube.obj"
    _make_cube_obj(str(p))
    frames = [{"cars": np.array([[9, 1.5, 0, 4.2, 1.9, 1.5, 0.2],
                                 [14, -4, 0, 4.0, 1.8, 1.5, -0.5]]),
               "signs": np.array([[6, 6, 0, 0.3, 0.3, 0.6, 0.0]])},
              {"cars": np.array([[11, -2, 0, 4.1, 1.8, 1.5, 1.0]]),
               "signs": np.zeros((0, 7))},
              {"cars": np.array([[7, 3, 0, 4.3, 1.9, 1.5, -1.2]]),
               "signs": np.zeros((0, 7))}]
    out = tmp_path / "vcs"
    exported = VS.generate_vc_dataset_scenes(
        [str(p)], frames, str(out), nviews=3, n_complete=512,
        height_px=64, min_pts=10, logger=lambda s: None)
    assert exported["model0000"] == 3
    ds = VCDataset(str(out), n_points=128, n_complete=256)
    assert len(ds) == 3
    item = ds[0]
    assert item["input"].shape == (128, 3)
    # partial points sit inside the gt box (+slack)
    gtb = np.asarray(item["gt_boxes"])
    import pickle
    with open(out / "model0000" / "labels.pkl", "rb") as f:
        labels = pickle.load(f)
    for k, lab in labels.items():
        pts = np.load(out / "model0000" / "partial" / (k + ".npy"))
        # generator filters in float64; labels store float32 — inflate
        # the recheck box so exact-boundary points don't flip
        box = lab["gtbox"].astype(np.float64).copy()
        box[3:6] += 1e-2
        assert VS.points_in_box7(pts, box).all()
        assert lab["num_pts"] == len(pts)


def test_generated_complete_is_view_frame(tmp_path):
    """The per-view surface export must sit AT the gt box (view frame),
    not at the canonical origin — VCN losses chamfer view-frame coarse
    predictions against 'complete', so a canonical complete trains
    completions toward the origin (frame-mismatch regression test)."""
    from seevcn_tpu.models.vcn.dataset import VCDataset

    p = tmp_path / "cube.obj"
    _make_cube_obj(str(p))
    poses = [np.array([15, 4, 0.3, 4.2, 0, 0, 0.7])]
    out = tmp_path / "vc"
    VS.generate_vc_dataset([str(p)], poses, str(out), n_complete=2048,
                           logger=lambda s: None)
    ds = VCDataset(str(out), n_points=128, n_complete=512)
    item = ds[0]
    centroid = item["complete"].mean(axis=0)
    gt = item["gt_boxes"]
    # centroid of the placed cube surface == box center (within sampling)
    np.testing.assert_allclose(centroid, gt[:3], atol=0.3)
    # and the partial view overlaps it (same frame)
    assert np.linalg.norm(item["input"].mean(0) - gt[:3]) < 3.0

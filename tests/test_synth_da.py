"""Spinning-lidar DA frame generator (data/synth_da.py) + the DA
experiment's lidar-box -> KITTI-anno conversion."""
import sys

import numpy as np

from seevcn_tpu.data.synth_da import (generate_da_set, lidar_ray_dirs,
                                      spinning_lidar_frame)


def test_ray_dirs_beam_structure():
    dirs = lidar_ray_dirs(16, azim_res_deg=0.5)
    elev = np.rad2deg(np.arcsin(dirs[:, 2]))
    uniq = np.unique(np.round(elev, 3))
    assert len(uniq) == 16
    assert abs(uniq.min() - (-24.8)) < 0.01 and abs(uniq.max() - 2.0) < 0.01
    assert np.allclose(np.linalg.norm(dirs, axis=1), 1.0, atol=1e-6)


def test_frame_beam_count_controls_density():
    """Same scene statistics, 4x beams -> ~4x points (the beam-count
    domain shift is real)."""
    f64 = spinning_lidar_frame(np.random.RandomState(0), n_beams=64,
                               azim_res_deg=0.5, n_cars=2)
    f16 = spinning_lidar_frame(np.random.RandomState(0), n_beams=16,
                               azim_res_deg=0.5, n_cars=2)
    assert f64["n_pts"] > 2.5 * f16["n_pts"]
    # ground points lie on the plane z = -1.73 (+- noise)
    for f in (f64, f16):
        pts = f["points"][f["valid"]]
        ground = pts[pts[:, 2] < -1.5]
        assert len(ground) > 100
        assert abs(np.median(ground[:, 2]) + 1.73) < 0.05


def test_cross_object_occlusion_exact():
    """A wall-width car directly in front of another removes the far
    car's points (merged-scene z-buffer, ADVICE r3 #5 class of bug)."""
    from seevcn_tpu.models.vcn import vc_shapenet as VS

    rng = np.random.RandomState(1)
    # place two cars manually through the private helpers: near car at
    # x=8 directly ahead, far car at x=16 on the same ray path
    verts1, faces1 = VS.procedural_car_mesh(rng)
    verts2, faces2 = VS.procedural_car_mesh(rng)

    def place(verts, x):
        c = verts - (verts.max(0) + verts.min(0)) / 2
        dims = verts.max(0) - verts.min(0)
        return c + [x, 0.0, -1.73 + dims[2] / 2], dims

    p1, d1 = place(verts1, 8.0)
    p2, d2 = place(verts2, 16.0)
    merged_v, merged_f = VS._merge_meshes([(p1, faces1), (p2, faces2)])
    dirs = lidar_ray_dirs(64, azim_res_deg=0.3, azim_fov=(-20, 20))
    t = VS.cast_rays_t(merged_v, merged_f, np.zeros(3), dirs)
    hits = dirs[np.isfinite(t)] * t[np.isfinite(t), None]
    box2 = np.array([16.0, 0.0, -1.73 + d2[2] / 2, d2[0], d2[1], d2[2], 0.0])
    far_hits = VS.points_in_box7(hits, box2)
    # the far car is heavily shadowed: casting it ALONE yields many more
    t_alone = VS.cast_rays_t(p2, faces2, np.zeros(3), dirs)
    alone = np.isfinite(t_alone).sum()
    assert far_hits.sum() < 0.35 * alone, (int(far_hits.sum()), int(alone))


def test_generate_da_set_shapes_and_boxes():
    pts, val, gtb, gtm = generate_da_set(5, 2, 16, azim_res_deg=0.6,
                                         max_pts=4000)
    assert pts.shape == (2, 4000, 3) and val.shape == (2, 4000)
    assert gtb.shape == (2, 8, 8) and gtm.shape == (2, 8)
    assert (gtb[gtm][:, 7] == 1.0).all()          # class id column
    assert gtm.sum() >= 2


def test_lidar_box_anno_roundtrip():
    """da_experiment's lidar->camera anno conversion must invert the
    evaluator's _camera_to_lidar_like map exactly (else the AP numbers
    measure the conversion, not the detector)."""
    sys.path.insert(0, "/root/repo/scripts")
    from da_experiment import _lidar_boxes_to_annos

    from seevcn_tpu.data.kitti.eval import _camera_to_lidar_like

    rng = np.random.RandomState(2)
    boxes = np.zeros((12, 7), np.float32)
    boxes[:, 0] = rng.uniform(3, 45, 12)
    boxes[:, 1] = rng.uniform(-15, 15, 12)
    boxes[:, 2] = rng.uniform(-1.8, -0.3, 12)
    boxes[:, 3] = rng.uniform(3.5, 4.8, 12)
    boxes[:, 4] = rng.uniform(1.6, 2.0, 12)
    boxes[:, 5] = rng.uniform(1.4, 2.1, 12)
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 12)
    anno = _lidar_boxes_to_annos(boxes)
    back = _camera_to_lidar_like(anno)
    np.testing.assert_allclose(back[:, :6], boxes[:, :6], atol=1e-5)
    dyaw = (back[:, 6] - boxes[:, 6] + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(dyaw, 0.0, atol=1e-5)

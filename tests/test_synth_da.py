"""Spinning-lidar DA frame generator (data/synth_da.py) + the DA
experiment's lidar-box -> KITTI-anno conversion."""
import sys

import numpy as np
import pytest

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


@pytest.mark.slow
def test_eval_batch_parity(tmp_path, monkeypatch):
    """cmd_eval's chunked (one-readback-per-B-frames) path must produce
    byte-identical AP/detection counts to the per-frame path, including
    the padded tail chunk (n=5 with B=3 pads the last chunk by repeating
    its first frame, whose outputs must be discarded)."""
    import argparse
    import json
    import pickle

    sys.path.insert(0, "/root/repo/scripts")
    import da_experiment as DA

    import jax
    import jax.numpy as jnp
    from seevcn_tpu.models.detectors.second import build_detector

    real_cfg = DA.da_detector_cfg

    def tiny_cfg(max_pts, mode="zfold"):
        cfg = real_cfg(max_pts, mode)
        # shrink the grid (64 x 64 x 40) so the CPU forward is cheap
        cfg.DATA_CONFIG.POINT_CLOUD_RANGE = [0, -6.4, -3, 12.8, 6.4, 1]
        cfg.DATA_CONFIG.DATA_PROCESSOR[0].MAX_NUMBER_OF_VOXELS = {
            "train": 2000, "test": 2000}
        return cfg

    monkeypatch.setattr(DA, "da_detector_cfg", tiny_cfg)

    rng = np.random.RandomState(7)
    n, p = 5, 800
    pts = np.zeros((n, p, 3), np.float32)
    pts[..., 0] = rng.uniform(0.5, 12.0, (n, p))
    pts[..., 1] = rng.uniform(-6.0, 6.0, (n, p))
    pts[..., 2] = rng.uniform(-2.5, 0.5, (n, p))
    valid = np.ones((n, p), bool)
    gtb = np.zeros((n, 2, 8), np.float32)
    gtb[..., 0] = rng.uniform(3, 10, (n, 2))
    gtb[..., 1] = rng.uniform(-4, 4, (n, 2))
    gtb[..., 2] = -1.0
    gtb[..., 3:6] = [4.2, 1.9, 1.8]
    gtb[..., 7] = 1
    gtm = np.ones((n, 2), bool)
    set_path = tmp_path / "set.npz"
    np.savez(set_path, points=pts, valid=valid, gt_boxes=gtb, gt_mask=gtm)

    cfg = tiny_cfg(p)
    model, _ = build_detector(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(pts[:1]), jnp.asarray(valid[:1]),
                           train=False)
    ckpt_path = tmp_path / "ckpt.pkl"
    with open(ckpt_path, "wb") as f:
        pickle.dump({"params": variables["params"],
                     "batch_stats": variables["batch_stats"],
                     "cfg_mode": "zfold"}, f)

    def run(batch, out):
        args = argparse.Namespace(
            cpu=False, ckpt=str(ckpt_path), set=str(set_path), mode="zfold",
            score_thresh=0.0, eval_batch=batch, out_json=str(out))
        return DA.cmd_eval(args)

    s1 = run(1, tmp_path / "b1.json")
    s3 = run(3, tmp_path / "b3.json")
    assert s1["n_dets"] > 0
    assert s1["n_dets"] == s3["n_dets"]
    assert s1["ap_3d_07_r40"] == s3["ap_3d_07_r40"]
    assert s1["ap_bev_07_r40"] == s3["ap_bev_07_r40"]
    j1 = json.load(open(tmp_path / "b1.json"))
    j3 = json.load(open(tmp_path / "b3.json"))
    assert j1["ap_3d_07_r40"] == j3["ap_3d_07_r40"]

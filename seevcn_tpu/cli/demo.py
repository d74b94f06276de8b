"""End-to-end demo: the reference demo/demo.ipynb as a CLI.

Pipeline (cells 0-9 of the notebook): demo pcd + json calib [+ COCO masks]
-> frustum isolation -> VCN completion -> point replacement -> SECOND-IoU
detection -> BEV plot with boxes saved as png.

Without instance masks (the reference generates them live with HTC), pass
--masks <camera>=<coco.json>; otherwise the completion stage is skipped and
the detector runs on the raw cloud.

Usage:
  python -m seevcn_tpu.cli.demo --root /root/reference/demo/demo_data \
      [--masks front=masks.json] [--vcn_ckpt VCN_VC.pth] \
      [--det_ckpt waymo_secondiou_see_vcn.pth] [--out demo_out]
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--frame", type=int, default=0)
    p.add_argument("--masks", nargs="*", default=[],
                   help="camera=coco.json pairs")
    p.add_argument("--vcn_ckpt", default=None)
    p.add_argument("--det_ckpt", default=None)
    p.add_argument("--shift_coor", nargs=3, type=float, default=[0.0, 0.0, 1.8])
    p.add_argument("--score_thresh", type=float, default=0.3)
    p.add_argument("--out", default="demo_out")
    return p.parse_args(argv)


def main(argv=None):
    import jax

    from ..data.demo_dataset import DemoObjects
    from ..see.pipeline import SEEVCN
    from ..utils.config import Cfg

    args = parse_args(argv)
    masks = dict(kv.split("=", 1) for kv in args.masks)
    data_obj = DemoObjects(args.root, masks=masks)
    os.makedirs(args.out, exist_ok=True)

    points = data_obj.get_pointcloud(args.frame)
    completed_pts = None
    frame_points = points

    if masks and args.vcn_ckpt:
        see = SEEVCN(Cfg({
            "PC_ISOLATION": {"MIN_LIDAR_PTS": 30, "EPS_SCALING": 4.0,
                             "MIN_EPS": 0.3, "MAX_EPS": 1.0},
            "SURFACE_COMPLETION": {"VRES": 0.4, "VCN": {
                "MODEL": "VCN_VC", "CKPT_PATH": args.vcn_ckpt,
                "NORM_WITH_GT": False, "SEL_K_NEAREST": 30,
                "CLUSTER_EPS": 0.4, "BATCH_SIZE_LIMIT": 32}}}),
            data_obj=data_obj)
        proj = see.get_det_instances(args.frame)
        instances = see.isolate_det_pts(proj)
        ret = see.complete_det_pts(instances)
        completed_pts = ret["all_instances"]
        frame_points = see.replace_with_completed_pts(points, completed_pts)
        print(f"completed {len(instances)} instances "
              f"({0 if completed_pts is None else len(completed_pts)} pts)")

    boxes = scores = None
    if args.det_ckpt:
        import jax.numpy as jnp

        from __graft_entry__ import _mini_detector_cfg
        from ..models.detectors.second import build_detector, post_processing
        from ..utils.ckpt_compat import load_detector_checkpoint

        cfg = _mini_detector_cfg()
        model, dcfg = build_detector(cfg)
        variables = jax.device_put(load_detector_checkpoint(args.det_ckpt,
                                                            cfg.MODEL.NAME))
        pts = frame_points[:, :3] + np.asarray(args.shift_coor, np.float32)
        p = np.zeros((1, 60000, 3), np.float32)
        n = min(len(pts), 60000)
        p[0, :n] = pts[:n]
        valid = np.zeros((1, 60000), bool)
        valid[0, :n] = True
        out = jax.jit(lambda v, p, m: model.apply(v, p, m, train=False))(
            variables, jnp.asarray(p), jnp.asarray(valid))
        post = post_processing(out, cfg.MODEL.POST_PROCESSING, 1, True)
        m = np.asarray(post["pred_mask"][0]) & \
            (np.asarray(post["pred_scores"][0]) > args.score_thresh)
        boxes = np.asarray(post["pred_boxes"][0])[m]
        boxes[:, :3] -= np.asarray(args.shift_coor)
        scores = np.asarray(post["pred_scores"][0])[m]
        print(f"detected {len(boxes)} objects")

    from ..utils.viz import save_bev
    from ..utils.viz3d import save_scene_html

    path = save_bev(os.path.join(args.out, f"frame_{args.frame:06d}.png"),
                    frame_points, boxes=boxes, scores=scores,
                    completed=completed_pts)
    print(f"wrote {path}")
    html = save_scene_html(
        os.path.join(args.out, f"frame_{args.frame:06d}.html"),
        frame_points, ref_boxes=boxes, ref_scores=scores)
    print(f"wrote {html}")


if __name__ == "__main__":
    main()

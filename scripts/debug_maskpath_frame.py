"""Dump one maskpath harness frame's DET-path internals: detections,
where their members/cores land in 3D, which cluster the vote picks, and
the GT boxes — to localize a wrong-instance completion (round-5 frame 0).

Usage: python scripts/debug_maskpath_frame.py --ckpt ... [--frame 0] [--cpu]
"""
import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--frame", type=int, default=0)
    ap.add_argument("--image_size", type=int, nargs=2, default=(384, 512))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--score_thresh", type=float, default=0.3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    import cv2
    import jax.numpy as jnp

    from seevcn_tpu.models.seg2d.backend import JaxMaskRCNNBackend
    from seevcn_tpu.models.seg2d.synthetic import scene_to_bgr, synth_frame3d
    from seevcn_tpu.see import device_pipeline as DP

    h, w = args.image_size
    backend = JaxMaskRCNNBackend(args.ckpt, score_thresh=args.score_thresh)
    rng = np.random.RandomState(args.seed)

    D, PATCH = 8, 56
    for fi in range(args.frame + 1):
        img, pts, gt_boxes, calib, vis_masks = synth_frame3d(h, w, rng)
    print(f"frame {args.frame}: {len(pts)} pts, {len(gt_boxes)} gt boxes")
    for i, b in enumerate(gt_boxes):
        print(f"  gt[{i}]: ctr=({b[0]:.1f},{b[1]:.1f},{b[2]:.1f}) "
              f"lwh=({b[3]:.1f},{b[4]:.1f},{b[5]:.1f}) yaw={b[6]:.2f}")

    dets = backend(scene_to_bgr(img))
    print(f"{len(dets)} detections at score>={args.score_thresh}, "
          f"{len(vis_masks)} gt vis masks")
    for i, d in enumerate(dets):
        for j, vm in enumerate(vis_masks):
            inter = (d["mask"] & vm).sum()
            union = (d["mask"] | vm).sum()
            if union and inter / union > 0.05:
                print(f"  det[{i}] vs gtmask[{j}]: IoU={inter/union:.3f} "
                      f"(det px={int(d['mask'].sum())}, "
                      f"gt px={int(vm.sum())})")

    boxes = np.zeros((D, 4), np.float32)
    patches = np.zeros((D, PATCH, PATCH), np.float32)
    scores = np.zeros((D,), np.float32)
    for i, d in enumerate(dets[:D]):
        m = d["mask"]
        ys, xs = np.nonzero(m)
        if len(xs) == 0:
            continue
        boxes[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
        crop = m[ys.min():ys.max() + 1, xs.min():xs.max() + 1]
        patches[i] = cv2.resize(crop.astype(np.float32), (PATCH, PATCH))
        scores[i] = d["score"]
        print(f"  det[{i}]: box={boxes[i].astype(int).tolist()} "
              f"score={d['score']:.3f} mask_px={int(m.sum())}")

    proj = jnp.asarray(calib["P2"])
    l2c = jnp.asarray(calib["lidar_to_cam"])
    cam_pts = jnp.asarray(pts) @ l2c.T
    valid = jnp.ones(len(pts), bool)
    member, core = DP.mask_membership(
        cam_pts, valid, proj, jnp.asarray(boxes), jnp.asarray(patches),
        jnp.asarray(scores), score_thresh=0.0, mask_thresh=0.5,
        image_size=(h, w), shrink_pct=3.0, core_shrink_pct=20.0)
    member, core = np.asarray(member), np.asarray(core)
    for i in range(len(dets[:D])):
        mem, cor = member[i], core[i]
        if mem.sum() == 0:
            print(f"  det[{i}]: 0 member points")
            continue
        mp = pts[mem][:, :3]
        print(f"  det[{i}]: members={int(mem.sum())} core={int(cor.sum())} "
              f"member ctr=({mp[:,0].mean():.1f},{mp[:,1].mean():.1f},"
              f"{mp[:,2].mean():.1f}) depth range "
              f"[{np.linalg.norm(mp,axis=1).min():.1f},"
              f"{np.linalg.norm(mp,axis=1).max():.1f}] m")
        if cor.sum():
            cp = pts[cor][:, :3]
            print(f"           core ctr=({cp[:,0].mean():.1f},"
                  f"{cp[:,1].mean():.1f},{cp[:,2].mean():.1f})")

    # per-cluster anatomy of det 0 (same adaptive eps as the pipeline)
    from seevcn_tpu.ops.clustering import dbscan
    mem0 = member[0]
    mp = pts[mem0][:, :3]
    if len(mp):
        centroid = mp.mean(0)
        rng_c = float(np.linalg.norm(centroid))
        eps = float(np.clip(rng_c * np.tan(np.radians(0.4)) * 4.0, 0.3, 1.0))
        print(f"  det[0] anatomy: centroid range={rng_c:.1f} eps~{eps:.2f}")
        labels = np.asarray(dbscan(jnp.asarray(mp), eps, min_points=3,
                                   valid=jnp.ones(len(mp), bool)))
        core0 = core[0][mem0]
        for lab in np.unique(labels):
            if lab < 0:
                continue
            sel = labels == lab
            c = mp[sel].mean(0)
            print(f"    cluster {lab}: n={int(sel.sum())} "
                  f"core={int((sel & core0).sum())} "
                  f"ctr=({c[0]:.1f},{c[1]:.1f},{c[2]:.1f}) "
                  f"range={np.linalg.norm(mp[sel], axis=1).mean():.1f}")

    iso, ok = DP.isolate_and_resample(
        jnp.asarray(pts), jnp.asarray(member), max_instance_pts=2048,
        out_pts=1024, core_membership=jnp.asarray(core))
    iso, ok = np.asarray(iso), np.asarray(ok)
    for i in range(len(dets[:D])):
        if not ok[i]:
            print(f"  iso[{i}]: invalid")
            continue
        c = iso[i].mean(0)
        print(f"  iso[{i}]: cluster ctr=({c[0]:.1f},{c[1]:.1f},{c[2]:.1f})")
        dmin = min(np.linalg.norm(c[:2] - b[:2]) for b in gt_boxes)
        print(f"           nearest gt ctr dist (BEV): {dmin:.1f} m")


if __name__ == "__main__":
    main()

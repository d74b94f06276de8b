"""Measure the DET-path (trained seg2d masks) against the GT-path (hull
masks) through the SAME SEE device pipeline on 3D-consistent synthetic
frames (VERDICT r2 missing #3 / next #5: "measure the masks->detector
impact").

The reference compares its config-1 (GT isolation) and config-2 (DET
isolation via HTC masks) preprocessing paths (see/SEE_VCN.py:117-265).
No pretrained detector ships in this egress-less environment, so the
downstream quality proxies are geometric:
  - membership IoU: per-frame IoU of the RAW point sets selected by DET
    vs GT masks. Structurally depressed: the DET mask silhouette admits
    occluded background points behind the object (no depth test), while
    the GT path is 3D-box membership; the clustering step is what
    removes the bleed-through, so also report
  - isolated-set IoU (isoIoU): IoU of the unique source points each
    path's isolation actually feeds the VCN — the real "isolation input
    agreement" number,
  - completed-cloud chamfer: symmetric chamfer between the two paths'
    spliced output clouds (the detector INPUT the two configs produce),
  - in-box fraction: of the completed points each path ADDS, the
    fraction landing inside a true GT 3D box (are completions on cars?).

Usage: python scripts/measure_maskpath_impact.py --ckpt runs/seg2d.ckpt
           [--frames 8] [--image_size 384 512] [--vcn_ckpt path]
"""
import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def build_pipeline(vcn_ckpt=None):
    import jax
    import jax.numpy as jnp

    from seevcn_tpu.models.vcn.nets import build_vcn
    from seevcn_tpu.ops.clustering import largest_cluster_batch
    from seevcn_tpu.ops.sampling import partial_mesh_batch
    from seevcn_tpu.see import device_pipeline as DP

    vcn = build_vcn("VCN_VC")
    if vcn_ckpt and vcn_ckpt.endswith(".pkl"):    # VCNTrainer native save
        import pickle
        with open(vcn_ckpt, "rb") as f:
            d = pickle.load(f)
        vcn_vars = d.get("variables", d)
    elif vcn_ckpt:                                 # reference .pth schema
        from seevcn_tpu.utils.ckpt_compat import load_vcn_checkpoint
        vcn_vars = load_vcn_checkpoint(vcn_ckpt, "VCN_VC")
    else:
        vcn_vars = vcn.init(jax.random.PRNGKey(0),
                            {"input": jnp.zeros((1, 1024, 3))})

    def run(pts, valid, proj, l2c, boxes, masks, scores, image_size):
        cam_pts = pts @ l2c.T
        # 3% mask shrink: the reference's SHRINK_MASK_PERCENTAGE in
        # every DET config (cfgs/*-DET_*.yaml)
        member, core = DP.mask_membership(cam_pts, valid, proj, boxes,
                                          masks, scores, score_thresh=0.0,
                                          mask_thresh=0.5,
                                          image_size=image_size,
                                          shrink_pct=3.0,
                                          core_shrink_pct=20.0)
        return _tail(vcn, vcn_vars, pts, valid, member, core)

    def run_gt(pts, valid, gt_boxes, gt_valid):
        # the reference's config-1 GT path extracts points IN the gt
        # boxes (ground-lifted 0.1 m, SEE_VCN.py:46-56 get_pcd_gtboxes),
        # not mask frustums
        from seevcn_tpu.geom.boxes import points_in_boxes
        lifted = gt_boxes.at[:, 2].add(0.05).at[:, 5].add(-0.1)
        member = points_in_boxes(pts[:, :3], lifted)       # (D, P)
        member = member & gt_valid[:, None] & valid[None, :]
        return _tail(vcn, vcn_vars, pts, valid, member)

    def _tail(vcn, vcn_vars, pts, valid, member, core=None):
        # core bits (20%-shrunk mask interior) pick the object cluster;
        # without them a loose mask's frustum lets a larger background
        # structure win the largest-cluster vote (round-5 frame 0)
        iso, ok = DP.isolate_and_resample(pts, member,
                                          max_instance_pts=2048,
                                          out_pts=1024,
                                          core_membership=core)
        ret = vcn.apply(vcn_vars, {"input": iso})
        surface = partial_mesh_batch(iso, ret["coarse"], k=30,
                                     surface_pts=1024)
        completed = largest_cluster_batch(surface, eps=0.4, min_points=2,
                                          total_pts=1024)
        # reject completions that left their observed points behind (the
        # frame-0 wrong-instance failure, BASELINE.md round-5 table)
        ok = DP.completion_sanity_mask(iso, completed, ok, max_dist=2.0)
        new_pts, new_valid = DP.replace_with_completed(
            pts, valid, completed, ok, point_dist_thresh=0.1)
        return member, iso, ok, completed, new_pts, new_valid

    return (jax.jit(run, static_argnames=("image_size",)),
            jax.jit(run_gt))


def in_box_fraction(pts, boxes):
    """Fraction of pts inside any (x, y, z, L, W, H, yaw) box (z-up)."""
    if len(pts) == 0:
        return float("nan")
    hit = np.zeros(len(pts), bool)
    for x, y, z, L, W, H, yaw in boxes:
        d = pts - [x, y, z]
        ca, sa = np.cos(-yaw), np.sin(-yaw)
        lx = d[:, 0] * ca - d[:, 1] * sa
        ly = d[:, 0] * sa + d[:, 1] * ca
        hit |= ((np.abs(lx) <= L / 2 + 0.2) & (np.abs(ly) <= W / 2 + 0.2) &
                (np.abs(d[:, 2]) <= H / 2 + 0.3))
    return float(hit.mean())


def chamfer_np(a, b):
    if len(a) == 0 or len(b) == 0:
        return float("nan")
    d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    return float(np.sqrt(d2.min(1)).mean() + np.sqrt(d2.min(0)).mean()) / 2


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--image_size", type=int, nargs=2, default=(384, 512))
    ap.add_argument("--vcn_ckpt", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--score_thresh", type=float, default=0.3)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (quality metrics are "
                         "platform-independent; lets the measure run "
                         "while the chip is busy)")
    args = ap.parse_args(argv)

    if args.cpu:
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        # the environment's sitecustomize re-registers the tunnel
        # backend and wins the env-var fight; the config API doesn't
        jax.config.update("jax_platforms", "cpu")

    import cv2
    import jax.numpy as jnp

    from seevcn_tpu.models.seg2d.backend import JaxMaskRCNNBackend
    from seevcn_tpu.models.seg2d.synthetic import scene_to_bgr, synth_frame3d

    h, w = args.image_size
    backend = JaxMaskRCNNBackend(args.ckpt, score_thresh=args.score_thresh)
    pipe, pipe_gt = build_pipeline(args.vcn_ckpt)
    rng = np.random.RandomState(args.seed)

    D, PATCH = 8, 56
    ious, chs, inbox_det, inbox_gt, det_counts = [], [], [], [], []
    iso_ious = []
    for fi in range(args.frames):
        img, pts, gt_boxes, calib, vis_masks = synth_frame3d(h, w, rng)
        valid = np.ones(len(pts), bool)

        def to_fixed(mask_list):
            """[(mask_hw bool, score)] -> (D,4) boxes, (D,56,56) patches,
            (D,) scores (zero-padded)."""
            boxes = np.zeros((D, 4), np.float32)
            patches = np.zeros((D, PATCH, PATCH), np.float32)
            scores = np.zeros((D,), np.float32)
            for i, (m, s) in enumerate(mask_list[:D]):
                ys, xs = np.nonzero(m)
                if len(xs) == 0:
                    continue
                x1, y1 = xs.min(), ys.min()
                x2, y2 = xs.max() + 1, ys.max() + 1
                boxes[i] = [x1, y1, x2, y2]
                crop = m[y1:y2, x1:x2].astype(np.float32)
                patches[i] = cv2.resize(crop, (PATCH, PATCH))
                scores[i] = s
            return boxes, patches, scores

        dets = backend(scene_to_bgr(img))
        det_list = [(d["mask"], d["score"]) for d in dets]
        det_counts.append(len(det_list))

        proj = jnp.asarray(calib["P2"])
        l2c = jnp.asarray(calib["lidar_to_cam"])
        outs = {}
        # GT path = points in ground-lifted gt boxes (reference config 1)
        gtb = np.zeros((D, 7), np.float32)
        gtv = np.zeros((D,), bool)
        gtb[:len(gt_boxes)] = gt_boxes[:D]
        gtv[:len(gt_boxes)] = True
        outs["gt"] = pipe_gt(jnp.asarray(pts), jnp.asarray(valid),
                             jnp.asarray(gtb), jnp.asarray(gtv))
        boxes, patches, scores = to_fixed(det_list)
        outs["det"] = pipe(jnp.asarray(pts), jnp.asarray(valid), proj,
                           l2c, jnp.asarray(boxes), jnp.asarray(patches),
                           jnp.asarray(scores), (h, w))

        m_gt = np.asarray(outs["gt"][0]).any(0)
        m_det = np.asarray(outs["det"][0]).any(0)
        union = (m_gt | m_det).sum()
        ious.append((m_gt & m_det).sum() / union if union else float("nan"))

        def iso_set(out):
            """Unique source points each path's isolation actually feeds
            the VCN (iso is tiled, so dedupe by rounded coordinate)."""
            iso, ok = np.asarray(out[1]), np.asarray(out[2])
            sel = iso[ok].reshape(-1, 3)
            return {tuple(q) for q in np.round(sel, 4).tolist()}

        s_gt, s_det = iso_set(outs["gt"]), iso_set(outs["det"])
        iso_union = len(s_gt | s_det)
        iso_ious.append(len(s_gt & s_det) / iso_union if iso_union
                        else float("nan"))

        def added(out):
            new_pts, new_valid = np.asarray(out[4]), np.asarray(out[5])
            return new_pts[len(pts):][new_valid[len(pts):]]

        a_gt, a_det = added(outs["gt"]), added(outs["det"])
        chs.append(chamfer_np(a_det, a_gt))
        inbox_gt.append(in_box_fraction(a_gt, gt_boxes))
        inbox_det.append(in_box_fraction(a_det, gt_boxes))
        print(f"frame {fi}: dets={det_counts[-1]} memberIoU={ious[-1]:.3f} "
              f"isoIoU={iso_ious[-1]:.3f} "
              f"chamfer(det,gt)={chs[-1]:.3f} m inbox gt/det="
              f"{inbox_gt[-1]:.3f}/{inbox_det[-1]:.3f}", flush=True)

    def m(x):
        x = [v for v in x if np.isfinite(v)]
        return float(np.mean(x)) if x else float("nan")

    print(f"\nSUMMARY frames={args.frames} mean_dets={np.mean(det_counts):.1f} "
          f"memberIoU={m(ious):.3f} isoIoU={m(iso_ious):.3f} "
          f"chamfer={m(chs):.3f} m "
          f"inbox_gt={m(inbox_gt):.3f} inbox_det={m(inbox_det):.3f}")


if __name__ == "__main__":
    main()

"""The DA demonstration: does SEE completion transfer detection across a
scan-pattern shift? (VERDICT r3 #1 — the system's purpose,
/root/reference/README.md:11.)

Protocol (the reference's source->target recipe at synthetic scale):
  raw detector:  train SECOND-IoU on RAW 64-beam source frames,
                 eval KITTI Car 3D AP@0.7 on RAW 16-beam target frames.
  see detector:  complete every frame through the device SEE pipeline
                 (GT-path isolation -> VCN_VC -> partial-mesh -> replace,
                 exactly measure_maskpath_impact's pipe_gt; the reference
                 completes the source domain with GT boxes, SEE_VCN.py:46-82),
                 train on completed source, eval on completed target.
  claim:         AP(see on target) > AP(raw on target), while both are
                 comparable on the source val (the shift, not capacity,
                 is what the raw detector loses to).

Subcommands:
  complete --set runs/da/src_train.npz --vcn runs/vcn_da/ckpt-best.pkl
  train    --train runs/da/src_train[.completed].npz --out runs/da/det_raw
  eval     --ckpt runs/da/det_raw/ckpt.pkl --set runs/da/tgt_val[.completed].npz

Everything is fixed-shape and jitted; runs on the TPU chip by default,
--cpu for the virtual-device CPU path.
"""
import argparse
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _force_cpu():
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("SEEVCN_NO_JAX_CACHE", "1")
    import jax

    jax.config.update("jax_platforms", "cpu")


def da_detector_cfg(max_pts: int, mode: str = "zfold"):
    """SECOND-IoU over the DA frame envelope (x<=48, |y|<=19.2):
    grid 240 x 192 x 40 at voxel [0.2, 0.2, 0.1] — a real (if compact)
    SECOND config, model block after source-waymo/second_iou.yaml (the
    z=40 depth matches the KITTI-grid convention: three stride-2 stages
    + the (3,1,1)-stride-(2,1,1) final conv need z/8 >= 3)."""
    from __graft_entry__ import _mini_detector_cfg

    cfg = _mini_detector_cfg()
    cfg.DATA_CONFIG.POINT_CLOUD_RANGE = [0, -19.2, -3, 48.0, 19.2, 1]
    proc = cfg.DATA_CONFIG.DATA_PROCESSOR[0]
    proc.VOXEL_SIZE = [0.2, 0.2, 0.1]
    proc.MAX_NUMBER_OF_VOXELS = {"train": 16000, "test": 20000}
    head = cfg.MODEL.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG[0]
    head["anchor_sizes"] = [[4.2, 1.9, 2.0]]
    head["anchor_bottom_heights"] = [-1.75]
    head["matched_threshold"] = 0.6
    head["unmatched_threshold"] = 0.45
    cfg.MODEL.BACKBONE_3D["MODE"] = mode
    cfg.MODEL.POST_PROCESSING.SCORE_THRESH = 0.1
    return cfg


def load_set(path):
    d = np.load(path)
    return (d["points"].astype(np.float32), d["valid"],
            d["gt_boxes"].astype(np.float32), d["gt_mask"])


# --------------------------------------------------------------------------- #
# completion (GT-path SEE through the device pipeline)
# --------------------------------------------------------------------------- #

def cmd_complete(args):
    if args.cpu:
        _force_cpu()
    import jax
    import jax.numpy as jnp

    from seevcn_tpu.geom.boxes import points_in_boxes
    from seevcn_tpu.models.vcn.nets import build_vcn
    from seevcn_tpu.ops.clustering import largest_cluster_batch
    from seevcn_tpu.ops.sampling import partial_mesh_batch
    from seevcn_tpu.see import device_pipeline as DP

    model_name = getattr(args, "model", "VCN_VC")
    vcn = build_vcn(model_name)
    init_in = {"input": jnp.zeros((1, 1024, 3))}
    if model_name == "VCN_CN":
        init_in["gt_boxes"] = jnp.asarray([[0, 0, 0, 4.2, 1.9, 1.6, 0.0]],
                                          jnp.float32)
    if args.vcn:
        with open(args.vcn, "rb") as f:
            d = pickle.load(f)
        vcn_vars = d.get("variables", d)
    else:
        vcn_vars = vcn.init(jax.random.PRNGKey(0), init_in)

    @jax.jit
    def complete_frame(pts, valid, gt_boxes, gt_mask):
        # reference config-1 GT path: points in ground-lifted gt boxes
        # (SEE_VCN.py:46-56 get_pcd_gtboxes)
        lifted = gt_boxes[:, :7].at[:, 2].add(0.05).at[:, 5].add(-0.1)
        member = points_in_boxes(pts[:, :3], lifted)          # (D, P)
        member = member & gt_mask[:, None] & valid[None, :]
        iso, ok = DP.isolate_and_resample(pts, member,
                                          max_instance_pts=2048,
                                          out_pts=1024)
        in_dict = {"input": iso}
        if model_name == "VCN_CN":
            # the reference completes the SOURCE domain with VCN-CN,
            # canonicalizing by the GT box (VCN_CN.py:111-156) — no
            # regressed-pose placement noise on the training side.
            # Padding rows have all-zero boxes; clamp dims so the
            # canonicalization never divides by zero (those instances are
            # already ok=False and their output is dropped).
            g7 = gt_boxes[:, :7]
            g7 = g7.at[:, 3:6].set(jnp.maximum(g7[:, 3:6], 0.1))
            in_dict["gt_boxes"] = g7
        ret = vcn.apply(vcn_vars, in_dict)
        surface = partial_mesh_batch(iso, ret["coarse"], k=30,
                                     surface_pts=1024)
        completed = largest_cluster_batch(surface, eps=0.4, min_points=2,
                                          total_pts=1024)
        # drop completions that left their observed points behind (VCN
        # placement failure guard; BASELINE.md round-5 maskpath table)
        ok = DP.completion_sanity_mask(iso, completed, ok, max_dist=2.0)
        new_pts, new_valid = DP.replace_with_completed(
            pts, valid, completed, ok, point_dist_thresh=0.1)
        # two stacked outputs (tunnel readbacks cost ~50-100 ms/array)
        frame_out = jnp.concatenate(
            [new_pts, new_valid.astype(jnp.float32)[:, None]], axis=1)
        comp_out = jnp.concatenate(
            [completed.reshape(-1, 3),
             jnp.repeat(ok, completed.shape[1]).astype(
                 jnp.float32)[:, None]], axis=1)
        return frame_out, comp_out

    pts, val, gtb, gtm = load_set(args.set)
    n, p, _ = pts.shape
    d_inst, k = gtb.shape[1], 1024
    out_pts = np.zeros((n, p + d_inst * k, 3), np.float32)
    out_val = np.zeros((n, p + d_inst * k), bool)
    inbox_fracs = []
    t0 = time.time()
    from seevcn_tpu.utils import tunnel
    dog = tunnel.Watchdog(deadline_s=900.0, what="completion readback")
    for i in range(n):
        frame_out, comp_out = complete_frame(jnp.asarray(pts[i]),
                                             jnp.asarray(val[i]),
                                             jnp.asarray(gtb[i]),
                                             jnp.asarray(gtm[i]))
        frame_out = np.asarray(frame_out)
        dog.beat()
        out_pts[i], out_val[i] = frame_out[:, :3], frame_out[:, 3] > 0.5
        # diagnostic: fraction of ADDED points inside a true gt box
        comp_out = np.asarray(comp_out)
        comp = comp_out[:, :3].reshape(d_inst, k, 3)
        ok = comp_out[:, 3].reshape(d_inst, k)[:, 0] > 0.5
        added = comp[ok & np.asarray(gtm[i][:len(ok)])].reshape(-1, 3)
        if len(added):
            from seevcn_tpu.models.vcn.vc_shapenet import points_in_box7
            hit = np.zeros(len(added), bool)
            for b in gtb[i][gtm[i]]:
                bb = b[:7].copy()
                bb[3:6] += 0.4
                hit |= points_in_box7(added, bb)
            inbox_fracs.append(float(hit.mean()))
        if (i + 1) % 16 == 0:
            print(f"  complete {i+1}/{n} ({time.time()-t0:.0f}s)",
                  flush=True)
    dog.stop()
    out = getattr(args, "out", None) or args.set.replace(
        ".npz", ".completed.npz")
    np.savez_compressed(out, points=out_pts, valid=out_val, gt_boxes=gtb,
                        gt_mask=gtm)
    ib = float(np.mean(inbox_fracs)) if inbox_fracs else float("nan")
    print(f"wrote {out}; in-box fraction of added points: {ib:.3f}",
          flush=True)


# --------------------------------------------------------------------------- #
# training
# --------------------------------------------------------------------------- #

def cmd_train(args):
    if args.cpu:
        _force_cpu()
    import jax
    import jax.numpy as jnp

    from seevcn_tpu.models.detectors.second import build_detector
    from seevcn_tpu.train.train import create_train_state, make_train_step

    from functools import partial

    pts, val, gtb, gtm = load_set(args.train)
    n, p, _ = pts.shape
    print(f"train set {args.train}: {n} frames x {p} pts", flush=True)
    cfg = da_detector_cfg(p, mode=args.mode)
    if args.bf16:
        cfg.MODEL.BACKBONE_3D["DTYPE"] = "bfloat16"
    # remat is a pure recompute-vs-save scheduling knob (loss/params
    # identical — tests/test_train_sharded.py::test_remat_policy_parity);
    # "none" is ~30% faster when the activations fit (this mini grid does)
    cfg.MODEL.BACKBONE_3D["REMAT"] = getattr(args, "remat", "layer")
    model, dcfg = build_detector(cfg)

    B = args.batch
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(pts[:1]), jnp.asarray(val[:1]),
                           train=False)
    state = create_train_state(model, variables, cfg.OPTIMIZATION,
                               total_steps=args.steps)
    inner = make_train_step(model, jit=False)

    # whole dataset device-resident, batch sampling/flip ON DEVICE:
    # through the TPU tunnel any per-step host upload or tiny host op
    # costs 100-200 ms of dispatch — the step itself must be the only
    # per-iteration work (verify-skill gotcha; profile_train.py pattern).
    # CRITICAL: the dataset arrays are jit ARGUMENTS, not closure
    # captures — a closed-over device array is baked into the jaxpr as a
    # constant and serialized into the remote_compile payload; at the
    # 2,048-frame config that is ~540 MB and the tunnel rejects it with
    # HTTP 413 (runs/da_tpu_runbook3.log — four runs died on it).
    gt8 = np.concatenate([gtb[..., :7], gtb[..., 7:8]], -1)
    d_pts = jax.device_put(pts)
    d_val = jax.device_put(val)
    d_gt = jax.device_put(gt8.astype(np.float32))
    base = jax.random.PRNGKey(args.seed)
    flip_p = jnp.asarray([1.0, -1.0, 1.0], jnp.float32)
    flip_g = jnp.asarray([1, -1, 1, 1, 1, 1, -1, 1], jnp.float32)

    @partial(jax.jit, donate_argnums=(0,))
    def step2(state, dp, dv, dg):
        r = jax.random.fold_in(base, state.step)
        r_idx, r_flip, r_step = jax.random.split(r, 3)
        idx = jax.random.randint(r_idx, (B,), 0, n)
        flip = jax.random.bernoulli(r_flip)            # world y-flip
        bp = dp[idx] * jnp.where(flip, flip_p, 1.0)
        bg = dg[idx] * jnp.where(flip, flip_g, 1.0)
        return inner(state, bp, dv[idx], bg, r_step)

    os.makedirs(args.out, exist_ok=True)
    ck_path = os.path.join(args.out, "ckpt.pkl")
    start = 0
    if getattr(args, "resume", False) and os.path.exists(ck_path):
        # crash-resume (tunnel flakes kill long runs): the ckpt carries
        # opt_state + step, and step2 folds rng from state.step, so the
        # resumed trajectory continues the original sampling stream.
        # A truncated pickle (kill mid-dump) falls back to a fresh start
        # instead of crashing every retry (ADVICE r4 #1).
        try:
            with open(ck_path, "rb") as f:
                ck = pickle.load(f)
        except Exception as e:
            print(f"resume skipped: {ck_path} unreadable ({e}); "
                  "starting fresh", flush=True)
            ck = {}
        if "opt_state" in ck and ck.get("total_steps") == args.steps:
            state = state.replace(
                step=jnp.asarray(ck["step"], jnp.int32),
                params=jax.device_put(ck["params"]),
                batch_stats=jax.device_put(ck["batch_stats"]),
                opt_state=jax.device_put(ck["opt_state"]))
            start = int(ck["step"])
            print(f"resumed {ck_path} at step {start}", flush=True)

    from seevcn_tpu.utils import tunnel

    t0 = time.time()
    losses = []
    # hung-readback watchdog: the gating float() below can block FOREVER
    # on a wedged tunnel with no exception (det_raw3 stalled 27 min at
    # step 6400 this way); a missed beat hard-exits EXIT_TRANSIENT so the
    # runbook resumes from ckpt.pkl in minutes, not the 2 h timeout.
    # Deadline covers remote compile + the slowest log_every gap.
    # 1800 s: the measured first beat (remote compile + 50 steps) at the
    # 4,096-frame config is ~900 s (runs/da3/det_raw3.log), so a 900 s
    # deadline would race a HEALTHY compile; 2x headroom.
    dog = tunnel.Watchdog(deadline_s=1800.0, what="train-step readback")
    for it in range(start, args.steps):
        try:
            state, metrics = step2(state, d_pts, d_val, d_gt)
        except Exception as e:
            kind = tunnel.classify_tunnel_error(e)
            if kind == "payload_too_large":
                # deterministic — print the cause, never retry (r4 burned
                # 4 blind retries / 47 min on this exact failure)
                cb = None
                try:
                    cb = tunnel.jaxpr_const_bytes(step2, state, d_pts,
                                                  d_val, d_gt)
                except Exception:
                    pass
                print(tunnel.explain_tunnel_error(e, cb), flush=True)
                raise SystemExit(tunnel.EXIT_PERMANENT)
            if kind == "transient":
                print(tunnel.explain_tunnel_error(e), flush=True)
                print(f"(died at step {it}; re-run with --resume)",
                      flush=True)
                raise SystemExit(tunnel.EXIT_TRANSIENT)
            raise
        if (it + 1) % args.log_every == 0:
            loss = float(metrics["loss"])              # gates the stream
            dog.beat()
            losses.append(loss)
            print(f"step {it+1}/{args.steps} loss {loss:.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        if (it + 1) % args.ckpt_every == 0 or it + 1 == args.steps:
            ck = {"params": jax.device_get(state.params),
                  "batch_stats": jax.device_get(state.batch_stats),
                  "opt_state": jax.device_get(state.opt_state),
                  "step": int(it + 1), "total_steps": args.steps,
                  "cfg_mode": args.mode}
            # atomic: a kill mid-dump must not destroy the resume artifact
            with open(ck_path + ".tmp", "wb") as f:
                pickle.dump(ck, f)
            os.replace(ck_path + ".tmp", ck_path)
            dog.beat()
    dog.stop()
    print(f"done: final losses {losses[-3:]}", flush=True)


# --------------------------------------------------------------------------- #
# evaluation (KITTI Car 3D AP, golden-parity evaluator)
# --------------------------------------------------------------------------- #

def _lidar_boxes_to_annos(boxes, scores=None):
    """lidar (x, y, z, L, W, H, yaw) -> KITTI camera-format anno dict
    (inverse of data/kitti/eval.py _camera_to_lidar_like; bbox faked tall
    so no difficulty bucket ignores it)."""
    n = len(boxes)
    if n == 0:
        anno = {k: np.zeros((0,)) for k in
                ("truncated", "occluded", "alpha", "rotation_y", "score")}
        anno["name"] = np.zeros((0,), "<U10")
        anno["bbox"] = np.zeros((0, 4))
        anno["dimensions"] = np.zeros((0, 3))
        anno["location"] = np.zeros((0, 3))
        return anno
    x, y, z = boxes[:, 0], boxes[:, 1], boxes[:, 2]
    L, W, H = boxes[:, 3], boxes[:, 4], boxes[:, 5]
    yaw = boxes[:, 6]
    loc = np.stack([-y, H / 2 - z, x], 1)
    dims = np.stack([L, H, W], 1)
    ry = -yaw - np.pi / 2
    anno = {"name": np.array(["Car"] * n),
            "truncated": np.zeros(n), "occluded": np.zeros(n, np.int32),
            "alpha": np.full(n, -10.0), "rotation_y": ry,
            "bbox": np.tile([0.0, 0.0, 300.0, 150.0], (n, 1)),
            "dimensions": dims, "location": loc}
    anno["score"] = scores if scores is not None else np.ones(n)
    return anno


def cmd_eval(args):
    if args.cpu:
        _force_cpu()
    import jax
    import jax.numpy as jnp

    from seevcn_tpu.data.kitti.eval import get_official_eval_result
    from seevcn_tpu.models.detectors.second import (build_detector,
                                                    post_processing)

    pts, val, gtb, gtm = load_set(args.set)
    n, p, _ = pts.shape
    with open(args.ckpt, "rb") as f:
        ck = pickle.load(f)
    cfg = da_detector_cfg(p, mode=ck.get("cfg_mode", args.mode))
    model, dcfg = build_detector(cfg)
    variables = {"params": ck["params"], "batch_stats": ck["batch_stats"]}
    variables = jax.device_put(variables)

    B = max(1, int(getattr(args, "eval_batch", 8)))

    @jax.jit
    def infer(v, points, valid):
        out = model.apply(v, points, valid, train=False)
        pp = post_processing(out, cfg.MODEL.POST_PROCESSING, 1,
                             has_roi_head=True)
        # ONE stacked (B, K, 10) output: per-array readbacks through the
        # tunnel cost ~50-100 ms each regardless of size (verify-skill
        # gotcha), so pack a whole chunk of frames into one readback
        return jnp.concatenate(
            [pp["pred_boxes"], pp["pred_scores"][..., None],
             pp["pred_labels"].astype(jnp.float32)[..., None],
             pp["pred_mask"].astype(jnp.float32)[..., None]], axis=2)

    gt_annos, dt_annos = [], []
    t0 = time.time()
    from seevcn_tpu.utils import tunnel
    dog = tunnel.Watchdog(deadline_s=900.0, what="eval readback")
    for c0 in range(0, n, B):
        idx = np.arange(c0, min(c0 + B, n))
        # pad the tail chunk by repeating its first frame (discarded below)
        pad = np.concatenate([idx, np.full(B - len(idx), idx[0])])
        packed = np.asarray(infer(variables, jnp.asarray(pts[pad]),
                                  jnp.asarray(val[pad])))
        dog.beat()
        for j, i in enumerate(idx):
            fr = packed[j]
            m = fr[:, 9] > 0.5
            boxes, scores = fr[m, :7], fr[m, 7]
            keep = scores > args.score_thresh
            dt_annos.append(_lidar_boxes_to_annos(boxes[keep], scores[keep]))
            gt_annos.append(_lidar_boxes_to_annos(gtb[i][gtm[i]][:, :7]))
        done = idx[-1] + 1
        if done % 32 < B:
            print(f"  eval {done}/{n} ({time.time()-t0:.0f}s)", flush=True)
    dog.stop()

    report, result = get_official_eval_result(gt_annos, dt_annos, ("Car",))
    print(report)
    summary = {"set": args.set, "ckpt": args.ckpt,
               "ap_3d_07_r40": result["Car"]["3d"][0],
               "ap_bev_07_r40": result["Car"]["bev"][0],
               "n_frames": n,
               "n_dets": int(sum(len(a["score"]) for a in dt_annos))}
    print(json.dumps(summary))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(summary, f, indent=1)
    return summary


def main(argv=None):
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("complete")
    c.add_argument("--set", required=True)
    c.add_argument("--vcn", default=None)
    c.add_argument("--model", default="VCN_VC",
                   choices=["VCN_VC", "VCN_CN"],
                   help="VCN_CN = reference source-domain (GT-canonical) "
                        "completion; VCN_VC = self-regressed pose")
    c.add_argument("--out", default=None,
                   help="output npz (default: <set>.completed.npz)")
    c.add_argument("--cpu", action="store_true")
    c.set_defaults(fn=cmd_complete)

    t = sub.add_parser("train")
    t.add_argument("--train", required=True)
    t.add_argument("--out", required=True)
    t.add_argument("--steps", type=int, default=3000)
    t.add_argument("--batch", type=int, default=4)
    t.add_argument("--mode", default="zfold")
    t.add_argument("--remat", default="layer",
                   choices=["layer", "dots", "none"])
    t.add_argument("--bf16", action="store_true")
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--log_every", type=int, default=50)
    t.add_argument("--ckpt_every", type=int, default=500)
    t.add_argument("--resume", action="store_true")
    t.add_argument("--cpu", action="store_true")
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser("eval")
    e.add_argument("--ckpt", required=True)
    e.add_argument("--set", required=True)
    e.add_argument("--mode", default="zfold")
    e.add_argument("--score_thresh", type=float, default=0.3)
    e.add_argument("--eval_batch", type=int, default=8,
                   help="frames per device dispatch (one tunnel readback "
                        "per chunk instead of per frame)")
    e.add_argument("--out_json", default=None)
    e.add_argument("--cpu", action="store_true")
    e.set_defaults(fn=cmd_eval)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()

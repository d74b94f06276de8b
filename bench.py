"""Benchmark: FULL SEE-VCN inference pipeline, frames/sec/chip.

Measures the BASELINE metric end-to-end on one chip — every stage of the
reference pipeline (SURVEY §0: masks -> isolation -> VCN -> detector) at
the reference's eval capacity:

  1. 2D instance masks: native Mask R-CNN forward on a 384x1280 camera
     image (the generate_masks.py stage; HTC inference in the reference).
  2. SEE isolation: camera projection + per-detection mask membership
     (bilinear 28x28 patch lookup), fixed-capacity instance gather,
     adaptive-eps device DBSCAN + largest cluster + resample to 1024
     (SEE_VCN.py get_det_instances/isolate_det_pts).
  3. VCN surface completion of 32 isolated objects + partial-mesh k-NN
     selection + largest-cluster filter (models/VCN.py:43-104).
  4. Point replacement: fused min-distance drop + splice
     (SEE_VCN.py:247-265).
  5. SECOND-IoU detector on the completed cloud: in-jit voxelization
     (150k+32k points, voxel [0.1, 0.1, 0.15], 90k max voxels,
     sc_kitti_dataset.yaml:31-37) -> sparse backbone (active-column +
     z-folded MXU execution) -> BEV -> anchor head -> IoU rcnn -> NMS,
     with the source-waymo/second_iou.yaml MODEL block.

MEASUREMENT SEMANTICS (round-2 correction, kept): on the tunneled `axon`
TPU backend, jax.block_until_ready returns at ENQUEUE. The timer therefore
gates on a host readback of a scalar reduced from the final iteration's
outputs; the device stream executes in order, so that read completes only
after every enqueued iteration has truly executed.

vs_baseline: the reference publishes NO benchmark numbers (BASELINE.md)
and its CUDA stack cannot run here, so vs_baseline is null and the metric
is the raw measured frames/s/chip. Per-stage breakdown goes to stderr.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

# Bounded retry around backend init (VERDICT r3 #2): the tunneled axon
# backend intermittently fails init with "UNAVAILABLE" or hangs; one such
# flake produced an empty BENCH_r03.json. Probe in a SUBPROCESS (a failed
# init can be cached inside a process) with backoff, then run the real
# benchmark once the backend answers. If every probe fails, fall through
# and attempt the run anyway — worst case matches today's behavior.
_PROBE_SCHEDULE_S = (0, 20, 45, 90, 180, 300)   # ~10.5 min total


def _backend_ready(timeout_s: float = 75.0) -> bool:
    code = "import jax; print(len(jax.devices()))"
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True, env=os.environ.copy())
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def wait_for_backend():
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return  # CPU runs never flake
    for i, delay in enumerate(_PROBE_SCHEDULE_S):
        if delay:
            print(f"bench: backend unavailable, retry {i}/"
                  f"{len(_PROBE_SCHEDULE_S) - 1} in {delay}s", file=sys.stderr)
            time.sleep(delay)
        if _backend_ready():
            return
    print("bench: backend never answered; attempting run anyway",
          file=sys.stderr)


def chip_canary(N=4096, CHAIN=8, reps=10):
    """Chip-health canary (VERDICT r4 #1/#3): a fixed-size bf16 GEMM
    TFLOP/s probe + trivial-dispatch round-trip latency, recorded in the
    output JSON. When a driver capture disagrees with a builder capture,
    these two numbers say whether the chip/tunnel was degraded (canary
    low/slow) or the pipeline regressed (canary healthy). TPU v5e peak is
    ~394 bf16 TFLOP/s; a healthy tunnel round-trips a trivial dispatch in
    ~10-20 ms; the round-4 driver capture (4.26 fps vs builder 6.35)
    would have shown ~5-16x dispatch latency."""
    import jax
    import jax.numpy as jnp

    a = jnp.ones((N, N), jnp.bfloat16)
    # row-stochastic b keeps the chained product at magnitude 1 (bf16)
    b = jnp.full((N, N), 1.0 / N, jnp.bfloat16)

    @jax.jit
    def gemm_chain(x, m):
        for _ in range(CHAIN):
            x = x @ m
        return x.sum()

    # pre-stage the per-rep inputs as device buffers BEFORE timing: a
    # host-scalar perturbation inside the loop costs an upload round
    # trip per rep on the tunneled backend, which at ~130 ms RTT
    # dominates the ~55 ms of GEMM compute and made a healthy chip read
    # ~5 TFLOP/s (round-5 capture). 10 reps amortize the single final
    # readback RTT to ~13 ms/rep.
    xs = [jax.device_put(a + jnp.bfloat16(i * 2 ** -8)) for i in range(reps)]
    float(gemm_chain(xs[0], b))                   # compile + warm
    t0 = time.time()
    for x in xs:
        out = gemm_chain(x, b)
    float(out)                                    # gates the stream
    dt = (time.time() - t0) / reps
    tflops = CHAIN * 2 * N ** 3 / dt / 1e12

    @jax.jit
    def triv(x):
        return x + 1.0

    bufs = [jax.device_put(jnp.float32(i)) for i in range(8)]
    float(triv(bufs[0]))                          # compile
    lat = []
    for z in bufs:
        t0 = time.time()
        float(triv(z))                            # dispatch+exec+readback
        lat.append(time.time() - t0)
    lat.sort()
    dispatch_ms = lat[len(lat) // 2] * 1e3
    print(f"canary: GEMM {tflops:.1f} bf16 TFLOP/s, "
          f"dispatch round-trip {dispatch_ms:.1f} ms", file=sys.stderr)
    return round(tflops, 1), round(dispatch_ms, 1)


def main():
    wait_for_backend()
    import jax
    import jax.numpy as jnp

    canary_tflops, canary_dispatch_ms = chip_canary()

    from __graft_entry__ import _flagship_detector_cfg
    from seevcn_tpu.models.detectors.second import (build_detector,
                                                    post_processing)
    from seevcn_tpu.models.seg2d.backend import build_seg2d, init_seg2d
    from seevcn_tpu.models.seg2d.maskrcnn import Seg2DConfig
    from seevcn_tpu.models.vcn.nets import build_vcn
    from seevcn_tpu.ops.clustering import largest_cluster_batch
    from seevcn_tpu.ops.sampling import partial_mesh_batch
    from seevcn_tpu.see import device_pipeline as DP

    rng = np.random.RandomState(0)
    B = 1   # dense-mode activations at eval capacity fill HBM at B>1 (f32)
    D = 32  # instances completed per frame (reference VCN batch cap)
    P = 150000

    # --- stage 1: 2D instance masks -------------------------------------
    seg_cfg = Seg2DConfig(image_size=(384, 1280), max_detections=D)
    seg_model, _ = build_seg2d(seg_cfg)
    seg_vars = init_seg2d(seg_model)
    image = jnp.asarray(rng.rand(1, 384, 1280, 3).astype(np.float32))

    @jax.jit
    def mask_stage(variables, img):
        out = seg_model.apply(variables, img, train=False)
        return (out["det_boxes"][0], out["det_masks"][0],
                out["det_scores"][0])

    # --- stage 2: isolation ----------------------------------------------
    # KITTI P2-style projection (fx ~ 720, image 1280x384)
    proj = jnp.asarray(np.array([[720.0, 0.0, 640.0, 0.0],
                                 [0.0, 720.0, 190.0, 0.0],
                                 [0.0, 0.0, 1.0, 0.0]], np.float32))
    # camera frame: lidar x->depth, y->-u, z->-v (KITTI-ish rect chain)
    lidar_to_cam = jnp.asarray(np.array(
        [[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]], np.float32))

    @jax.jit
    def see_stage(pts, v, boxes, masks, scores):
        cam_pts = pts @ lidar_to_cam.T
        # production DET path: 3% shrink (the reference's
        # SHRINK_MASK_PERCENTAGE) + 20% mask-core cluster voting (the
        # round-5 wrong-instance guard)
        member, core = DP.mask_membership(cam_pts, v, proj, boxes, masks,
                                          scores, score_thresh=0.0,
                                          mask_thresh=0.5,
                                          image_size=(384, 1280),
                                          shrink_pct=3.0,
                                          core_shrink_pct=20.0)
        iso, ok = DP.isolate_and_resample(pts, member,
                                          max_instance_pts=2048,
                                          out_pts=1024,
                                          core_membership=core)
        return iso, ok, iso.sum()

    # --- stage 3: VCN completion -----------------------------------------
    vcn = build_vcn("VCN_VC")
    vcn_vars = vcn.init(jax.random.PRNGKey(0),
                        {"input": jnp.zeros((D, 1024, 3))})

    @jax.jit
    def vcn_stage(variables, pc):
        ret = vcn.apply(variables, {"input": pc})
        surface = partial_mesh_batch(pc, ret["coarse"], k=30,
                                     surface_pts=1024)
        out = largest_cluster_batch(surface, eps=0.4, min_points=2,
                                    total_pts=1024)
        # production path includes the wrong-instance completion guard
        sane = DP.completion_sanity_mask(pc, out, jnp.ones(out.shape[0],
                                                           bool))
        return out, sane, out.sum()

    # --- stage 4: replacement --------------------------------------------
    @jax.jit
    def replace_stage(pts, v, completed, ok):
        new_pts, new_valid = DP.replace_with_completed(
            pts, v, completed, ok, point_dist_thresh=0.1)
        return new_pts, new_valid, new_pts.sum()

    # --- stage 5: detector -----------------------------------------------
    cfg = _flagship_detector_cfg()
    model, dcfg = build_detector(cfg)
    pts = np.zeros((B, P, 3), np.float32)
    pts[:, :, 0] = rng.uniform(1, 69, (B, P))
    pts[:, :, 1] = rng.uniform(-39, 39, (B, P))
    pts[:, :, 2] = rng.uniform(-2.9, 0.9, (B, P))
    jp, jv = jnp.asarray(pts), jnp.ones((B, P), bool)
    variables = jax.jit(lambda p, v: model.init(
        {"params": jax.random.PRNGKey(0)}, p, v, train=False))(
        jp[:1, :2048], jv[:1, :2048])

    @jax.jit
    def det_stage(variables, p, m):
        out = model.apply(variables, p, m, train=False)
        pp = post_processing(out, cfg.MODEL.POST_PROCESSING, 1,
                             has_roi_head=True)
        return pp, pp["pred_scores"].sum()

    # the full frame as ONE jit: host dispatch through the tunnel costs
    # ~13 ms per call (measured trivial-jit floor), so five per-stage
    # dispatches would add ~65 ms/frame of pure host overhead — and the
    # fused single-process path is the design the 5x target assumes
    # (SURVEY §7.1)
    @jax.jit
    def frame_fused(seg_v, vcn_v, det_v, img, p, v):
        boxes, masks, scores = mask_stage(seg_v, img)
        iso, ok, s2 = see_stage(p[0], v[0], boxes, masks, scores)
        completed, sane, s3 = vcn_stage(vcn_v, iso)
        new_pts, new_valid, s4 = replace_stage(p[0], v[0], completed,
                                               ok & sane)
        pp, s5 = det_stage(det_v, new_pts[None], new_valid[None])
        return s2, s3, s4, s5

    def frame(img, p, v):
        return frame_fused(seg_vars, vcn_vars, variables, img, p, v)

    # warmup/compile, gate on readback
    gates = frame(image, jp, jv)
    _ = [float(g) for g in gates]

    # distinct device buffers per iteration: no runtime result caching
    n_iters = 12
    perturb = jax.jit(lambda p, e: p.at[..., 2].add(e))
    det_inputs = [perturb(jp, 1e-4 * i) for i in range(n_iters)]
    img_inputs = [perturb(image, 1e-4 * i) for i in range(n_iters)]
    _ = float(np.asarray(det_inputs[-1][0, 0, 2]))  # materialized

    # per-stage gated breakdown (each stage timed alone, chained buffers)
    stage_times = {}
    boxes, masks, scores = mask_stage(seg_vars, image)
    iso, ok, _ = see_stage(jp[0], jv[0], boxes, masks, scores)
    completed, sane_c, _ = vcn_stage(vcn_vars, iso)
    ok = ok & sane_c
    new_pts, new_valid, _ = replace_stage(jp[0], jv[0], completed, ok)
    det_in = [perturb(new_pts[None], 1e-4 * i) for i in range(n_iters)]
    _ = float(np.asarray(det_in[-1][0, 0, 2]))
    for name, fn, inputs in (
        ("masks", lambda i: mask_stage(seg_vars, img_inputs[i])[2],
         None),
        ("isolation", lambda i: see_stage(det_inputs[i][0], jv[0], boxes,
                                          masks, scores)[2], None),
        ("vcn", lambda i: vcn_stage(vcn_vars, iso + 1e-4 * i)[2], None),
        ("replace", lambda i: replace_stage(det_inputs[i][0], jv[0],
                                            completed, ok)[2], None),
        # distinct pre-built buffers like every other stage: identical
        # arguments must never be re-timed (runtime result caching)
        ("detector", lambda i: det_stage(variables, det_in[i % len(det_in)],
                                         new_valid[None])[1], None),
    ):
        out = fn(0)
        float(np.asarray(out).sum())
        t0 = time.time()
        for i in range(n_iters):
            out = fn(i % n_iters)
        float(np.asarray(out).sum())
        stage_times[name] = (time.time() - t0) / n_iters

    for name, t in stage_times.items():
        print(f"stage {name}: {t * 1e3:.1f} ms", file=sys.stderr)

    # e2e: the BASELINE metric. This loop is CROSS-FRAME PIPELINED
    # (VERDICT r3 #3): each frame is one async dispatch (~13 ms host/tunnel
    # cost) and the device stream executes in order, so frame N+1's
    # dispatch overlaps frame N's execution; the single readback at the
    # end gates the whole stream. Frames are independent, so this is the
    # deployment shape (the reference's sc_multiproc worker pool streams
    # frames the same way).
    t0 = time.time()
    for i in range(n_iters):
        gates = frame(img_inputs[i], det_inputs[i], jv)
    total = sum(float(g) for g in gates[-1:])  # gates the enqueued stream
    dt = (time.time() - t0) / n_iters
    print(f"e2e: {dt * 1e3:.1f} ms/frame", file=sys.stderr)

    # unpipelined contrast: gate EVERY frame on a host readback before
    # dispatching the next (serialized dispatch -> execute -> readback).
    # The delta quantifies what the streaming loop gets for free; recorded
    # in BASELINE.md per VERDICT r3 #3.
    t0 = time.time()
    for i in range(n_iters):
        gates = frame(img_inputs[i], det_inputs[i], jv)
        _ = float(gates[-1])
    dt_seq = (time.time() - t0) / n_iters
    print(f"e2e unpipelined (per-frame readback gate): "
          f"{dt_seq * 1e3:.1f} ms/frame "
          f"(pipelining saves {max(dt_seq - dt, 0) * 1e3:.1f} ms/frame)",
          file=sys.stderr)

    fps = B / dt
    print(json.dumps({
        "metric": "see_vcn_full_pipeline_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": None,
        # chip-health canary (VERDICT r4 #3): THIS tunnel chip sustains
        # ~20 TFLOP/s on a clean bf16 GEMM chain and ~15-30 ms dispatch
        # round-trip (BASELINE.md); far below that means the capture ran
        # on a degraded/contended tunnel, not a code regression
        "canary_gemm_bf16_tflops": canary_tflops,
        "canary_dispatch_roundtrip_ms": canary_dispatch_ms,
        "pipelined_ms_per_frame": round(dt * 1e3, 1),
        "serialized_ms_per_frame": round(dt_seq * 1e3, 1),
        "stage_ms": {k: round(v * 1e3, 1) for k, v in stage_times.items()},
    }))


if __name__ == "__main__":
    main()

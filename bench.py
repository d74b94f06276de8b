"""Benchmark: end-to-end SEE-VCN inference pipeline, frames/sec/chip.

Measures the device path of BASELINE config 1/3 on one chip at the
REFERENCE'S eval capacity: per frame, VCN surface completion of 32 isolated
objects (forward + partial-mesh + largest-cluster) followed by the
SECOND-IoU detector (in-jit voxelization -> dense-masked sparse backbone ->
BEV -> anchor head -> IoU rcnn -> NMS) at the sc_kitti eval budget — a
150k-point cloud, voxel [0.1, 0.1, 0.15], 90,000 max voxels
(sc_kitti_dataset.yaml:31-37) — with the source-waymo/second_iou.yaml
MODEL block.

MEASUREMENT SEMANTICS (important, changed in round 2): on the tunneled
`axon` TPU backend, jax.block_until_ready returns when work is ENQUEUED
remotely, not when it completes (verified: block=0.9 ms while the actual
value readback gated 12 s of real compute). All round-1-style timings
therefore measured dispatch latency, not execution. This benchmark gates
on a host readback of a scalar reduced from the final iteration's outputs;
the device stream executes in order, so that read completes only after
every enqueued iteration has truly executed. n_iters amortizes the single
readback round-trip.

vs_baseline: the reference repo publishes NO benchmark numbers
(BASELINE.md) and its CUDA stack cannot run in this environment, so no
honest reference anchor exists; vs_baseline is null and the metric is the
raw measured frames/s/chip.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_detector_cfg
    from seevcn_tpu.models.detectors.second import build_detector, post_processing
    from seevcn_tpu.models.vcn.nets import build_vcn
    from seevcn_tpu.ops.clustering import largest_cluster_batch
    from seevcn_tpu.ops.sampling import partial_mesh_batch

    rng = np.random.RandomState(0)
    B = 1   # the dense-masked backbone at eval capacity fills HBM at B>1

    # --- VCN stage: 32 objects/frame -------------------------------------
    vcn = build_vcn("VCN_VC")
    obj_pts = jnp.asarray(rng.randn(32 * B, 1024, 3).astype(np.float32) * 1.5
                          + np.array([15, 2, 0], np.float32))
    vcn_vars = vcn.init(jax.random.PRNGKey(0), {"input": obj_pts[:32]})

    @jax.jit
    def vcn_stage(variables, pc):
        ret = vcn.apply(variables, {"input": pc})
        surface = partial_mesh_batch(pc, ret["coarse"], k=30, surface_pts=1024)
        out = largest_cluster_batch(surface, eps=0.4, min_points=2,
                                    total_pts=1024)
        return out, out.sum()

    # --- detector stage ----------------------------------------------------
    cfg = _flagship_detector_cfg()
    model, dcfg = build_detector(cfg)
    P = 150000
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

    # warmup/compile — gate on real completion via scalar readbacks
    _, cs = vcn_stage(vcn_vars, obj_pts)
    _, ds = det_stage(variables, jp, jv)
    float(cs), float(ds)

    # distinct device buffers per iteration so no identical-argument
    # execution can be served from any runtime cache
    n_iters = 16
    perturb = jax.jit(lambda p, e: p.at[..., 2].add(e))
    det_inputs = [perturb(jp, 1e-4 * i) for i in range(n_iters)]
    vcn_inputs = [perturb(obj_pts, 1e-4 * i) for i in range(n_iters)]
    _ = [float(x[0, 0, 2]) for x in det_inputs[-1:]]   # inputs materialized

    t0 = time.time()
    for i in range(n_iters):
        _, cs = vcn_stage(vcn_vars, vcn_inputs[i])
        _, ds = det_stage(variables, det_inputs[i], jv)
    total = float(cs) + float(ds)       # gates the whole enqueued stream
    dt = (time.time() - t0) / n_iters

    fps = B / dt
    print(json.dumps({
        "metric": "see_vcn_e2e_inference_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()

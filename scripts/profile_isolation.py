"""Readback-gated timing of the SEE isolation sub-stages at bench shapes."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def gated(fn, inputs, n_iters=8):
    outs = fn(*inputs[0])
    float(np.asarray(outs).sum())
    t0 = time.time()
    for i in range(n_iters):
        outs = fn(*inputs[i % len(inputs)])
    float(np.asarray(outs).sum())
    return (time.time() - t0) / n_iters


def main():
    import jax
    import jax.numpy as jnp

    from seevcn_tpu.ops.clustering import dbscan, largest_cluster_mask
    from seevcn_tpu.ops.sampling import tile_to_n
    from seevcn_tpu.see import device_pipeline as DP

    rng = np.random.RandomState(0)
    P, D, M = 150000, 32, 2048
    pts = jnp.asarray(rng.uniform(-40, 40, (P, 3)).astype(np.float32))
    valid = jnp.ones((P,), bool)
    proj = jnp.asarray(np.array([[720.0, 0, 640, 0], [0, 720.0, 190, 0],
                                 [0, 0, 1, 0]], np.float32))
    boxes = jnp.asarray(rng.uniform(0, 300, (D, 4)).astype(np.float32))
    boxes = boxes.at[:, 2:].add(300.0)
    masks = jnp.asarray(rng.rand(D, 28, 28).astype(np.float32))
    scores = jnp.ones((D,), jnp.float32)

    f_mem = jax.jit(lambda p, v: DP.mask_membership(
        p, v, proj, boxes, masks, scores, score_thresh=0.0).sum())
    t = gated(f_mem, [(pts + 1e-4 * i, valid) for i in range(4)])
    print(f"mask_membership bilinear (D={D}, P={P}): {t*1e3:.1f} ms",
          flush=True)

    f_mem2 = jax.jit(lambda p, v: DP.mask_membership(
        p, v, proj, boxes, masks, scores, score_thresh=0.0,
        image_size=(384, 1280)).sum())
    t = gated(f_mem2, [(pts + 1e-4 * i, valid) for i in range(4)])
    print(f"mask_membership canvas: {t*1e3:.1f} ms", flush=True)

    f_ras = jax.jit(lambda b: DP.rasterize_masks(
        b, masks, scores, (384, 1280), 0.0).sum())
    t = gated(f_ras, [(boxes + 1e-3 * i,) for i in range(4)])
    print(f"rasterize_masks alone: {t*1e3:.1f} ms", flush=True)

    member = DP.mask_membership(pts, valid, proj, boxes, masks, scores,
                                score_thresh=0.0)

    f_nz = jax.jit(lambda mm: jax.vmap(
        lambda row: jnp.nonzero(row, size=M, fill_value=-1)[0])(mm).sum())
    t = gated(f_nz, [(member,)] * 4)
    print(f"per-instance nonzero gather: {t*1e3:.1f} ms", flush=True)

    ipts = jnp.asarray(rng.randn(D, M, 3).astype(np.float32))
    ivalid = jnp.asarray(rng.rand(D, M) < 0.5)

    f_db = jax.jit(lambda p, v: jax.vmap(
        lambda pp, vv: dbscan(pp, 0.5, min_points=3, valid=vv))(p, v).sum())
    t = gated(f_db, [(ipts + 1e-4 * i, ivalid) for i in range(4)])
    print(f"dbscan (D={D}, M={M}): {t*1e3:.1f} ms", flush=True)

    f_lc = jax.jit(lambda p, v: jax.vmap(
        lambda pp, vv: tile_to_n(pp, vv, 1024)[0])(p, v).sum())
    t = gated(f_lc, [(ipts + 1e-4 * i, ivalid) for i in range(4)])
    print(f"tile_to_n 1024: {t*1e3:.1f} ms", flush=True)

    f_iso = jax.jit(lambda p, mm: DP.isolate_and_resample(
        p, mm, max_instance_pts=M, out_pts=1024)[0].sum())
    t = gated(f_iso, [(pts + 1e-4 * i, member) for i in range(4)])
    print(f"isolate_and_resample full: {t*1e3:.1f} ms", flush=True)

    # same with a 1024 instance cap
    f_iso2 = jax.jit(lambda p, mm: DP.isolate_and_resample(
        p, mm, max_instance_pts=1024, out_pts=1024)[0].sum())
    t = gated(f_iso2, [(pts + 1e-4 * i, member) for i in range(4)])
    print(f"isolate_and_resample cap1024: {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()

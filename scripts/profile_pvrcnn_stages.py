"""Attribute the PV-RCNN eval forward cost at capacity: FPS keypoints,
VSA per source, ROI grid pool — each gated separately."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def gated(fn, inputs, n_iters=5):
    out = fn(*inputs[0])
    float(np.asarray(out).sum())
    t0 = time.time()
    for i in range(n_iters):
        out = fn(*inputs[i % len(inputs)])
    float(np.asarray(out).sum())
    return (time.time() - t0) / n_iters


def main():
    import jax
    import jax.numpy as jnp

    from seevcn_tpu.ops.pointnet2 import (ball_query, grid_ball_query,
                                          group_features)
    from seevcn_tpu.ops.sampling import farthest_point_sample

    rng = np.random.RandomState(0)
    P, K = 150000, 4096
    pts = jnp.asarray(np.stack([
        rng.uniform(1, 69, P), rng.uniform(-39, 39, P),
        rng.uniform(-2.9, 0.9, P)], 1).astype(np.float32))
    valid = jnp.ones((P,), bool)

    f_fps = jax.jit(lambda p: farthest_point_sample(p, K, valid).sum())
    t = gated(f_fps, [(pts + 1e-4 * i,) for i in range(3)])
    print(f"FPS {K} of {P}: {t*1e3:.1f} ms", flush=True)

    kp = np.asarray(pts)[rng.choice(P, K, replace=False)]
    kp = jnp.asarray(kp)

    for radius, ns in ((0.4, 16), (0.8, 16), (1.2, 16), (2.4, 16),
                       (4.8, 16)):
        f_bq = jax.jit(lambda q, s: grid_ball_query(
            q, s, radius, ns, valid)[0].sum())
        t = gated(f_bq, [(kp + 1e-4 * i, pts) for i in range(3)])
        print(f"grid_ball_query r={radius} ns={ns} K={K} N={P}: "
              f"{t*1e3:.1f} ms", flush=True)

    # voxel supports (x_conv buffers): N = 90k
    N2 = 90112
    sup2 = jnp.asarray(np.stack([
        rng.uniform(1, 69, N2), rng.uniform(-39, 39, N2),
        rng.uniform(-2.9, 0.9, N2)], 1).astype(np.float32))
    v2 = jnp.ones((N2,), bool)
    f_bq2 = jax.jit(lambda q, s: grid_ball_query(q, s, 1.2, 16, v2)[0].sum())
    t = gated(f_bq2, [(kp + 1e-4 * i, sup2) for i in range(3)])
    print(f"grid_ball_query voxel support N={N2}: {t*1e3:.1f} ms", flush=True)

    # ROI grid pool shape: 27648 queries over 4096 keypoints (dense path)
    qg = jnp.asarray(rng.uniform(0, 70, (27648, 3)).astype(np.float32))
    kv = jnp.ones((K,), bool)
    f_roi = jax.jit(lambda q, s: ball_query(q, s, 1.6, 16, kv)[0].sum())
    t = gated(f_roi, [(qg + 1e-4 * i, kp) for i in range(3)])
    print(f"roi-grid dense ball_query 27648 x {K}: {t*1e3:.1f} ms",
          flush=True)

    # grouping gather at VSA shapes
    idx, v = grid_ball_query(kp, pts, 1.2, 16, valid)
    f_gr = jax.jit(lambda s: group_features(idx, v, kp, s).sum())
    t = gated(f_gr, [(pts + 1e-4 * i,) for i in range(3)])
    print(f"group_features K={K} ns=16: {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()

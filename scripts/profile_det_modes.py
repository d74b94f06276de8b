"""Detector e2e at eval capacity: sweep backbone MODE x DTYPE x batch."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_detector_cfg
    from seevcn_tpu.models.detectors.second import (build_detector,
                                                    post_processing)

    rng = np.random.RandomState(0)
    P = 150000

    for mode, dtype, B in (("zfold", "float32", 1),
                           ("hybrid", "float32", 1),
                           ("zfold", "bfloat16", 1),
                           ("hybrid", "bfloat16", 1),
                           ("hybrid", "bfloat16", 2),
                           ("zfold", "bfloat16", 2)):
        cfg = _flagship_detector_cfg()
        cfg.MODEL.BACKBONE_3D["MODE"] = mode
        cfg.MODEL.BACKBONE_3D["DTYPE"] = dtype
        model, dcfg = build_detector(cfg)
        pts = np.zeros((B, P, 3), np.float32)
        pts[:, :, 0] = rng.uniform(1, 69, (B, P))
        pts[:, :, 1] = rng.uniform(-39, 39, (B, P))
        pts[:, :, 2] = rng.uniform(-2.9, 0.9, (B, P))
        jp, jv = jnp.asarray(pts), jnp.ones((B, P), bool)
        try:
            variables = jax.jit(lambda p, v: model.init(
                {"params": jax.random.PRNGKey(0)}, p, v, train=False))(
                jp[:1, :2048], jv[:1, :2048])

            @jax.jit
            def det(v, p, m):
                out = model.apply(v, p, m, train=False)
                pp = post_processing(out, cfg.MODEL.POST_PROCESSING, 1,
                                     has_roi_head=True)
                return pp["pred_scores"].sum()

            s = det(variables, jp, jv)
            float(s)
            inputs = [jax.jit(lambda p, e: p.at[..., 2].add(e))(jp, 1e-4 * i)
                      for i in range(4)]
            float(np.asarray(inputs[-1][0, 0, 2]))
            n = 8
            t0 = time.time()
            for i in range(n):
                s = det(variables, inputs[i % 4], jv)
            float(s)
            dt = (time.time() - t0) / n
            print(f"{mode:7s} {dtype:9s} B={B}: {dt*1e3:7.1f} ms "
                  f"({B/dt:5.2f} fr/s)", flush=True)
        except Exception as e:
            print(f"{mode:7s} {dtype:9s} B={B}: FAILED {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()

"""Gated train-step timing at the reference train budget (80k voxels,
B=1) + coarse stage attribution (VERDICT r2 #7: 361 ms -> < 250 ms)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def gated(fn, inputs, n_iters=6):
    out = fn(*inputs[0])
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
    t0 = time.time()
    for i in range(n_iters):
        out = fn(*inputs[i % len(inputs)])
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
    return (time.time() - t0) / n_iters


import jax  # noqa: E402


def main():
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_detector_cfg
    from seevcn_tpu.models.detectors.second import build_detector
    from seevcn_tpu.train.train import create_train_state, make_train_step

    cfg = _flagship_detector_cfg()
    rng = np.random.RandomState(0)
    B, P = 1, 150000
    pts = np.zeros((B, P, 3), np.float32)
    pts[:, :, 0] = rng.uniform(1, 69, (B, P))
    pts[:, :, 1] = rng.uniform(-39, 39, (B, P))
    pts[:, :, 2] = rng.uniform(-2.9, 0.9, (B, P))
    gt = np.zeros((B, 12, 8), np.float32)
    for i in range(12):
        gt[:, i] = [5 + 5 * i, (-1) ** i * 10, -1, 4.2, 2.0, 1.6, 0.3, 1]
    jp, jv, jg = jnp.asarray(pts), jnp.ones((B, P), bool), jnp.asarray(gt)

    # (mode, 3D dtype, BEV dtype, remat): round-4 levers are bf16 in the
    # BEV backbone + heads during training (VERDICT r3 #6) and the remat
    # policy — "layer" recomputes every conv in the backward (4x conv
    # FLOPs fwd+bwd); "dots" saves conv outputs (minimal 3x); "none"
    # saves everything
    def _parse_sweep(a):
        parts = a.split(",")
        if len(parts) != 4:
            raise SystemExit(
                f"bad sweep {a!r}: expected MODE,DTYPE3D,DTYPEBEV,REMAT "
                "(e.g. hybrid,bfloat16,bfloat16,none)")
        return tuple(parts)

    sweeps = [_parse_sweep(a) for a in sys.argv[1:]] if len(sys.argv) > 1 else [
        ("hybrid", "bfloat16", "bfloat16", "layer"),
        ("hybrid", "bfloat16", "bfloat16", "dots"),
        ("hybrid", "bfloat16", "bfloat16", "none"),
        ("zfold", "bfloat16", "bfloat16", "dots"),
    ]
    for mode, dtype, bev_dtype, remat in sweeps:
        cfg.MODEL.BACKBONE_3D["MODE"] = mode
        cfg.MODEL.BACKBONE_3D["DTYPE"] = dtype
        cfg.MODEL.BACKBONE_3D["REMAT"] = remat
        cfg.MODEL.BACKBONE_2D["DTYPE"] = bev_dtype
        cfg.DATA_CONFIG.DATA_PROCESSOR[0].MAX_NUMBER_OF_VOXELS["train"] = 80000
        model, dcfg = build_detector(cfg)
        try:
            variables = model.init({"params": jax.random.PRNGKey(0)},
                                   jp[:, :4096], jv[:, :4096], train=False)
            state = create_train_state(model, variables, cfg.OPTIMIZATION,
                                       total_steps=100)
            step = make_train_step(model, donate=False)
            key = jax.random.PRNGKey(1)
            inputs = [(state, jax.jit(lambda p, e: p.at[..., 2].add(e))(
                jp, 1e-4 * i), jv, jg, key) for i in range(3)]
            t = gated(lambda s, p, v, g, k: step(s, p, v, g, k)[1]["loss"],
                      inputs)
            print(f"train step {mode} {dtype} bev={bev_dtype} "
                  f"remat={remat}: {t*1e3:.1f} ms", flush=True)
        except Exception as e:
            print(f"train step {mode} {dtype} bev={bev_dtype} "
                  f"remat={remat}: FAILED {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()

"""Gated train-step stage attribution at the train budget (80k voxels,
B=1): times value_and_grad of truncated losses to split the 291 ms step
(VERDICT r2 #7) into (voxelize+backbone3d+BEV2d) vs (heads+assign+rcnn)
vs optimizer overhead.
"""
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
    mode = sys.argv[1] if len(sys.argv) > 1 else "hybrid"
    cfg.MODEL.BACKBONE_3D["MODE"] = mode
    cfg.MODEL.BACKBONE_3D["DTYPE"] = "bfloat16"
    cfg.DATA_CONFIG.DATA_PROCESSOR[0].MAX_NUMBER_OF_VOXELS["train"] = 80000
    model, dcfg = build_detector(cfg)

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

    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jp[:, :4096], jv[:, :4096], train=False)
    state = create_train_state(model, variables, cfg.OPTIMIZATION,
                               total_steps=100)
    key = jax.random.PRNGKey(1)
    perturb = jax.jit(lambda p, e: p.at[..., 2].add(e))
    pts_in = [perturb(jp, 1e-4 * i) for i in range(3)]

    def fwd_out(params, p, k):
        out, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            p, jv, gt_boxes=jg, train=True, rng=k,
            rngs={"dropout": jax.random.fold_in(k, 1)},
            mutable=["batch_stats"])
        return out

    # A: voxelize + backbone3d + BEV fwd+bwd only
    @jax.jit
    def vg_bev(params, p, k):
        def f(pp):
            return fwd_out(pp, p, k)["spatial_features_2d"].astype(
                jnp.float32).sum()
        l, g = jax.value_and_grad(f)(params)
        return l + sum(jnp.abs(x).astype(jnp.float32).sum()
                       for x in jax.tree_util.tree_leaves(g)[:1])

    # B: full loss fwd+bwd (adds heads + target assign + rcnn)
    @jax.jit
    def vg_full(params, p, k):
        def f(pp):
            out = fwd_out(pp, p, k)
            loss, _ = model.loss(out, jg)
            return loss
        l, g = jax.value_and_grad(f)(params)
        return l + sum(jnp.abs(x).astype(jnp.float32).sum()
                       for x in jax.tree_util.tree_leaves(g)[:1])

    # C: the real train step (adds optimizer + batch_stats plumbing)
    step = make_train_step(model, donate=False)

    a = gated(lambda p, k: vg_bev(state.params, p, k),
              [(x, key) for x in pts_in])
    print(f"[{mode}] A voxelize+bb3d+bev2d fwd+bwd: {a*1e3:.1f} ms",
          flush=True)
    b = gated(lambda p, k: vg_full(state.params, p, k),
              [(x, key) for x in pts_in])
    print(f"[{mode}] B full-loss fwd+bwd: {b*1e3:.1f} ms "
          f"(heads+assign+rcnn = {(b-a)*1e3:.1f})", flush=True)
    c = gated(lambda p, k: step(state, p, jv, jg, k)[1]["loss"],
              [(x, key) for x in pts_in])
    print(f"[{mode}] C train step: {c*1e3:.1f} ms "
          f"(optimizer+stats = {(c-b)*1e3:.1f})", flush=True)


if __name__ == "__main__":
    main()

"""Per-stage gated profiling of the flagship backbone at eval capacity.

Each measurement enqueues n_iters runs on distinct buffers and gates on a
host readback of a scalar reduced from the LAST iteration's output (the
tunneled axon backend's block_until_ready returns at enqueue — BASELINE.md).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def gated(fn, inputs, n_iters=8):
    outs = fn(*inputs[0])
    _gate(outs)
    t0 = time.time()
    for i in range(n_iters):
        outs = fn(*inputs[i % len(inputs)])
    _gate(outs)
    return (time.time() - t0) / n_iters


def _gate(outs):
    import jax

    leaves = jax.tree_util.tree_leaves(outs)
    s = sum(float(np.asarray(l.sum().astype("float32"))) if hasattr(l, "sum")
            else 0.0 for l in leaves[:1])
    return s


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_detector_cfg
    from seevcn_tpu.models.detectors.second import build_detector
    from seevcn_tpu.ops import sparse as SP
    from seevcn_tpu.ops.voxelize import voxelize_batch

    cfg = _flagship_detector_cfg()
    pcr = cfg.DATA_CONFIG.POINT_CLOUD_RANGE
    vsz = cfg.DATA_CONFIG.DATA_PROCESSOR[0].VOXEL_SIZE
    maxv = 90000
    B, P = 1, 150000
    rng = np.random.RandomState(0)
    pts = np.zeros((B, P, 3), np.float32)
    pts[:, :, 0] = rng.uniform(1, 69, (B, P))
    pts[:, :, 1] = rng.uniform(-39, 39, (B, P))
    pts[:, :, 2] = rng.uniform(-2.9, 0.9, (B, P))
    jp = jnp.asarray(pts)
    jv = jnp.ones((B, P), bool)

    vox = jax.jit(lambda p, v: voxelize_batch(
        p, v, point_cloud_range=pcr, voxel_size=vsz, max_voxels=maxv,
        max_points_per_voxel=5))
    feats, coords, mask = vox(jp, jv)
    print("voxelize:", gated(lambda p, v: vox(p, v)[0],
                             [(jp + 1e-4 * i, jv) for i in range(4)]) * 1e3,
          "ms; active voxels:", int(np.asarray(mask.sum())))

    nz, ny, nx = 27, 800, 704
    st = SP.SparseTensor(feats, coords, mask, (nz, ny, nx), B)

    # BEV-column occupancy (how much an occupancy-tiled conv can skip)
    occ_cols = jax.jit(lambda c, m: jnp.zeros((ny, nx), bool).at[
        jnp.where(m, c[:, 2], 0), jnp.where(m, c[:, 3], 0)].max(m))(coords, mask)
    oc = np.asarray(occ_cols)
    print(f"BEV col occupancy: {oc.mean():.3f}")
    for t in (8, 16, 32):
        tiles = oc.reshape(ny // t, t, nx // t, t).any(axis=(1, 3))
        print(f"  {t}x{t} tile occupancy: {tiles.mean():.3f} "
              f"({tiles.sum()} tiles)")

    # --- backbone stage timings, zfold mode, f32 vs bf16 ------------------
    from seevcn_tpu.models.modules.backbone3d import VoxelBackBone8x

    for mode, dtype in (("zfold", "float32"), ("hybrid", "float32"),
                        ("hybrid", "bfloat16")):
        bb = VoxelBackBone8x(input_channels=3, mode=mode, dtype=dtype)
        vars_bb = jax.jit(lambda f, c, m: bb.init(
            jax.random.PRNGKey(0),
            SP.SparseTensor(f, c, m, (nz, ny, nx), B), train=False))(
            feats, coords, mask)

        @jax.jit
        def run_bb(variables, f, c, m):
            out = bb.apply(variables,
                           SP.SparseTensor(f, c, m, (nz, ny, nx), B),
                           train=False)
            return out["encoded_spconv_tensor"].features

        ins = [(vars_bb, feats + 1e-4 * i, coords, mask) for i in range(4)]
        t = gated(lambda v, f, c, m: run_bb(v, f, c, m), ins)
        print(f"backbone {mode} {dtype}: {t * 1e3:.1f} ms")

    # full detector e2e for reference
    model, dcfg = build_detector(cfg)
    variables = jax.jit(lambda p, v: model.init(
        {"params": jax.random.PRNGKey(0)}, p, v, train=False))(
        jp[:1, :2048], jv[:1, :2048])

    @jax.jit
    def det(variables, p, m):
        out = model.apply(variables, p, m, train=False)
        return out["batch_cls_preds"]

    t = gated(lambda v, p, m: det(v, p, m),
              [(variables, jp + 1e-4 * i, jv) for i in range(4)])
    print(f"detector e2e: {t * 1e3:.1f} ms")


if __name__ == "__main__":
    main()

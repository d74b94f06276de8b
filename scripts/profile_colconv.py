"""Microbenchmark the active-column conv pieces at eval capacity."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def gated(fn, inputs, n_iters=8):
    import jax
    outs = fn(*inputs[0])
    jax.tree_util.tree_leaves(outs)[0].sum().block_until_ready()
    float(np.asarray(jax.tree_util.tree_leaves(outs)[0].sum()))
    t0 = time.time()
    for i in range(n_iters):
        outs = fn(*inputs[i % len(inputs)])
    float(np.asarray(jax.tree_util.tree_leaves(outs)[0].sum()))
    return (time.time() - t0) / n_iters


def main():
    import jax
    import jax.numpy as jnp

    from seevcn_tpu.ops import sparse as SP
    from seevcn_tpu.ops.voxelize import voxelize_batch

    rng = np.random.RandomState(0)
    M, Z, C = 90112, 27, 16
    ZC = Z * C

    for dt in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.randn(M, 9 * ZC).astype(np.float32)).astype(dt)
        w = jnp.asarray(rng.randn(9 * ZC, ZC).astype(np.float32) * 0.01).astype(dt)
        mm = jax.jit(lambda a, b: jnp.matmul(a, b, preferred_element_type=dt))
        t = gated(mm, [(x + i * 1e-3, w) for i in range(4)])
        gf = 2 * M * 9 * ZC * ZC / 1e9
        print(f"GEMM (M={M},K={9*ZC},N={ZC}) {dt.__name__}: {t*1e3:.2f} ms "
              f"({gf/t/1e3:.1f} TFLOP/s)")

    # gather of 9 neighbor rows (random indices = worst case)
    feats = jnp.asarray(rng.randn(M, ZC).astype(np.float32))
    nbr = jnp.asarray(rng.randint(-1, M, (M, 9)).astype(np.int32))

    @jax.jit
    def gath(f, nb):
        g = jnp.where((nb >= 0)[..., None], f[jnp.clip(nb, 0, M - 1)], 0.0)
        return g.reshape(M, -1)

    t = gated(gath, [(feats + i * 1e-3, nbr) for i in range(4)])
    print(f"gather (M,9,{ZC}) f32: {t*1e3:.2f} ms")

    # fused gather+GEMM (what _col_conv_core compiles to)
    w32 = jnp.asarray(rng.randn(9 * ZC, ZC).astype(np.float32) * 0.01)

    @jax.jit
    def gg(f, nb, w):
        g = jnp.where((nb >= 0)[..., None], f[jnp.clip(nb, 0, M - 1)], 0.0)
        return jnp.matmul(g.reshape(M, -1), w)

    t = gated(gg, [(feats + i * 1e-3, nbr, w32) for i in range(4)])
    print(f"gather+GEMM f32: {t*1e3:.2f} ms")

    # to_col_tensor / col_to_zfold at capacity
    B, P = 1, 150000
    pts = np.zeros((B, P, 3), np.float32)
    pts[:, :, 0] = rng.uniform(1, 69, (B, P))
    pts[:, :, 1] = rng.uniform(-39, 39, (B, P))
    pts[:, :, 2] = rng.uniform(-2.9, 0.9, (B, P))
    f, c, m = voxelize_batch(jnp.asarray(pts), jnp.ones((B, P), bool),
                             point_cloud_range=[0, -40, -3, 70.4, 40, 1],
                             voxel_size=[0.1, 0.1, 0.15], max_voxels=90000,
                             max_points_per_voxel=5)
    tct = jax.jit(lambda f, c, m: SP.to_col_tensor(
        SP.SparseTensor(f, c, m, (27, 800, 704), B)))
    t = gated(tct, [(f + i * 1e-4, c, m) for i in range(4)])
    print(f"to_col_tensor: {t*1e3:.2f} ms")
    ct = tct(f, c, m)
    ct16 = SP.ColTensor(jnp.zeros((ct.features.shape[0], ZC)) + 0.1,
                        ct.zocc, ct.coords, ct.mask, ct.colmap, Z, C)

    # gather with REAL neighbor indices (locality!)
    nbr_real = SP._col_neighbors(ct16, 3, 3, 1, 1)
    t = gated(gath, [(feats + i * 1e-3, nbr_real) for i in range(4)])
    print(f"gather real-nbr f32: {t*1e3:.2f} ms")
    t = gated(gg, [(feats + i * 1e-3, nbr_real, w32) for i in range(4)])
    print(f"gather+GEMM real-nbr f32: {t*1e3:.2f} ms")
    c2z = jax.jit(lambda ft: SP.col_to_zfold(ct16._replace(features=ft)))
    t = gated(c2z, [(ct16.features + i * 1e-3,) for i in range(4)])
    print(f"col_to_zfold (ZC={ZC}): {t*1e3:.2f} ms")

    # one full col_subm_conv 16->16
    wconv = jnp.asarray(rng.randn(27, 16, 16).astype(np.float32) * 0.05)
    csc = jax.jit(lambda ft: SP.col_subm_conv(
        ct16._replace(features=ft), wconv, 16).features)
    t = gated(csc, [(ct16.features + i * 1e-3,) for i in range(4)])
    print(f"col_subm_conv 16->16: {t*1e3:.2f} ms")

    # zfold reference for the same conv
    zt = SP.col_to_zfold(ct16)
    zfc = jax.jit(lambda ft: SP.zfold_conv(
        zt._replace(features=ft), wconv, 16, kernel_size=3, padding=1,
        subm=True).features)
    t = gated(zfc, [(zt.features + i * 1e-3,) for i in range(4)])
    print(f"zfold_conv 16->16 (dense 800x704): {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()

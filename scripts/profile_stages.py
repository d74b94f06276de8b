"""Dispatch-floor + per-stage backbone timing (truncated-graph method).

Each measurement is one jit call per iteration, gated on a host readback,
8 iterations; the dispatch floor (trivial jit) is printed first so real
compute = measured - floor.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def gated(fn, inputs, n_iters=8):
    outs = fn(*inputs[0])
    float(np.asarray(outs.sum() if hasattr(outs, "sum") else outs))
    t0 = time.time()
    for i in range(n_iters):
        outs = fn(*inputs[i % len(inputs)])
    float(np.asarray(outs.sum() if hasattr(outs, "sum") else outs))
    return (time.time() - t0) / n_iters


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from seevcn_tpu.models.modules.backbone3d import SpConvLayer
    from seevcn_tpu.ops import sparse as SP
    from seevcn_tpu.ops.voxelize import voxelize_batch

    # dispatch floor
    triv = jax.jit(lambda x: x + 1.0)
    xs = [jnp.ones((8, 128)) * i for i in range(4)]
    print(f"dispatch floor (trivial jit): {gated(triv, [(x,) for x in xs])*1e3:.2f} ms")

    rng = np.random.RandomState(0)
    B, P = 1, 150000
    pts = np.zeros((B, P, 3), np.float32)
    pts[:, :, 0] = rng.uniform(1, 69, (B, P))
    pts[:, :, 1] = rng.uniform(-39, 39, (B, P))
    pts[:, :, 2] = rng.uniform(-2.9, 0.9, (B, P))
    f, c, m = voxelize_batch(jnp.asarray(pts), jnp.ones((B, P), bool),
                             point_cloud_range=[0, -40, -3, 70.4, 40, 1],
                             voxel_size=[0.1, 0.1, 0.15], max_voxels=90000,
                             max_points_per_voxel=5)
    st = SP.SparseTensor(f, c, m, (27, 800, 704), B)

    class Stage1(nn.Module):
        mode: str = "zfold"
        upto: int = 99          # how many stages

        @nn.compact
        def __call__(self, st, train=False):
            if self.mode == "hybrid":
                x = SP.to_col_tensor(st)
            else:
                x = SP.to_zfold_tensor(st)
            if self.upto == 0:       # conversion only
                return (x.features if self.mode != "hybrid"
                        else SP.col_to_zfold(x).features)
            x = SpConvLayer(16, subm=True, padding=1, name="conv_input")(x, train)
            x = SpConvLayer(16, subm=True, padding=1, name="conv1_0")(x, train)
            if isinstance(x, SP.ColTensor):
                x = SP.col_to_zfold(x)
            if self.upto == 1:
                return x.features
            x = SpConvLayer(32, subm=False, stride=2, padding=1,
                            name="conv2_down")(x, train)
            x = SpConvLayer(32, subm=True, padding=1, name="conv2_0")(x, train)
            x = SpConvLayer(32, subm=True, padding=1, name="conv2_1")(x, train)
            if self.upto == 2:
                return x.features
            x = SpConvLayer(64, subm=False, stride=2, padding=1,
                            name="conv3_down")(x, train)
            x = SpConvLayer(64, subm=True, padding=1, name="conv3_0")(x, train)
            x = SpConvLayer(64, subm=True, padding=1, name="conv3_1")(x, train)
            if self.upto == 3:
                return x.features
            x = SpConvLayer(64, subm=False, stride=2, padding=(0, 1, 1),
                            name="conv4_down")(x, train)
            x = SpConvLayer(64, subm=True, padding=1, name="conv4_0")(x, train)
            x = SpConvLayer(64, subm=True, padding=1, name="conv4_1")(x, train)
            x = SpConvLayer(128, subm=False, kernel_size=(3, 1, 1),
                            stride=(2, 1, 1), padding=0, name="conv_out")(x, train)
            return x.features

    for mode in ("zfold", "hybrid"):
        for upto in (0, 1, 2, 3, 99):
            mod = Stage1(mode=mode, upto=upto)
            v = jax.jit(lambda f, c, m: mod.init(
                jax.random.PRNGKey(0),
                SP.SparseTensor(f, c, m, (27, 800, 704), B)))(f, c, m)
            run = jax.jit(lambda vv, ff: mod.apply(
                vv, SP.SparseTensor(ff, c, m, (27, 800, 704), B)).sum())
            t = gated(run, [(v, f + 1e-4 * i) for i in range(4)])
            print(f"{mode} upto={upto}: {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()

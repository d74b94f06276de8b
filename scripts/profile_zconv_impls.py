"""Gated per-signature comparison of zfold_conv impls (band / zblock /
zgroup) at the flagship eval-capacity shapes. See profile_backbone.py for
the readback-gate rationale."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from seevcn_tpu.ops import sparse as SP

    rng = np.random.RandomState(0)
    # (name, subm, kernel, stride, padding, cin, cout, z, Y, X)
    sigs = [
        ("conv_input", True, 3, 1, 1, 3, 16, 27, 800, 704),
        ("conv1_0", True, 3, 1, 1, 16, 16, 27, 800, 704),
        ("conv2_down", False, 3, 2, 1, 16, 32, 27, 800, 704),
        ("conv2_subm", True, 3, 1, 1, 32, 32, 14, 400, 352),
        ("conv3_down", False, 3, 2, 1, 32, 64, 14, 400, 352),
        ("conv3_subm", True, 3, 1, 1, 64, 64, 7, 200, 176),
        ("conv4_down", False, 3, 2, (0, 1, 1), 64, 64, 7, 200, 176),
        ("conv4_subm", True, 3, 1, 1, 64, 64, 3, 100, 88),
        ("conv_out", False, (3, 1, 1), (2, 1, 1), 0, 64, 128, 3, 100, 88),
    ]
    dtype = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    n_iters = 8
    totals = {}
    for name, subm, ks, st_, pad, cin, cout, z, yy, xx in sigs:
        feats = jnp.asarray(
            rng.randn(1, yy, xx, z * cin).astype(np.float32), dtype)
        occ = jnp.asarray(rng.rand(1, yy, xx, z) < 0.2)
        zt = SP.ZFoldTensor(feats * 0 + feats, occ, z, cin)
        k3 = SP._as3(ks)
        k = k3[0] * k3[1] * k3[2]
        w = jnp.asarray(rng.randn(k, cin, cout).astype(np.float32) * 0.1)
        row = {}
        if "--sweep-g" in sys.argv:
            variants = [("band", "band", None)] + [
                (f"zb{g}", "zblock", g) for g in (4, 6, 8, 14, 16, 30)]
        else:
            variants = [("band", "band", None), ("zblock", "zblock", None),
                        ("zgroup", "zgroup", None)]
        for vname, impl, g in variants:
            f = jax.jit(lambda ft, w_, impl=impl, g=g: SP.zfold_conv(
                zt._replace(features=ft), w_, cout, kernel_size=ks,
                stride=st_, padding=pad, subm=subm,
                impl=impl, zblock_g=g).features)
            ins = [(feats + jnp.asarray(1e-4 * i, dtype), w)
                   for i in range(4)]
            out = f(*ins[0])
            float(np.asarray(out.astype(jnp.float32).sum()))
            t0 = time.time()
            for i in range(n_iters):
                out = f(*ins[i % 4])
            float(np.asarray(out.astype(jnp.float32).sum()))
            row[vname] = (time.time() - t0) / n_iters * 1e3
            totals[vname] = totals.get(vname, 0.0) + row[vname]
        print(f"{name:12s} " + "  ".join(
            f"{k_}={v:6.1f}ms" for k_, v in row.items()), flush=True)
    print("TOTAL        " + "  ".join(
        f"{k_}={v:6.1f}ms" for k_, v in totals.items()))


if __name__ == "__main__":
    main()

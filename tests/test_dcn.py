"""Deformable conv v1/v2 parity vs a direct numpy implementation of the
published equation (Dai 2017 / Zhu 2019), plus the zero-offset == plain
conv identity and differentiability."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seevcn_tpu.ops.dcn import (deform_conv2d, deform_conv2d_output_size,
                                modulated_deform_conv2d)


def _np_bilinear(img, y, x):
    """Zero-padded bilinear sample of img (H, W, C) at float (y, x)."""
    H, W, _ = img.shape
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    out = 0.0
    for yy, wy in ((y0, 1 - (y - y0)), (y0 + 1, y - y0)):
        for xx, wx in ((x0, 1 - (x - x0)), (x0 + 1, x - x0)):
            if 0 <= yy < H and 0 <= xx < W:
                out = out + wy * wx * img[yy, xx]
    return out


def _np_deform_conv(x, offset, mask, weight, stride, padding, dilation, dg):
    """Direct per-output-pixel loop implementation (the spec, not fast)."""
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    Cg = Cin // dg
    Ho = deform_conv2d_output_size(H, kh, stride, padding, dilation)
    Wo = deform_conv2d_output_size(W, kw, stride, padding, dilation)
    out = np.zeros((B, Ho, Wo, Cout), np.float64)
    off = offset.reshape(B, Ho, Wo, dg, K, 2)
    msk = None if mask is None else mask.reshape(B, Ho, Wo, dg, K)
    for b in range(B):
        for i in range(Ho):
            for j in range(Wo):
                col = np.zeros((K, Cin), np.float64)
                for k in range(K):
                    a, c = k // kw, k % kw
                    for g in range(dg):
                        y = i * stride - padding + a * dilation + off[b, i, j, g, k, 0]
                        xx = j * stride - padding + c * dilation + off[b, i, j, g, k, 1]
                        s = _np_bilinear(x[b, :, :, g * Cg:(g + 1) * Cg], y, xx)
                        if msk is not None:
                            s = s * msk[b, i, j, g, k]
                        col[k, g * Cg:(g + 1) * Cg] = s
                out[b, i, j] = np.einsum(
                    "kc,kco->o", col,
                    weight.astype(np.float64).reshape(K, Cin, Cout))
    return out


@pytest.mark.parametrize("stride,padding,dilation,dg,modulated", [
    (1, 1, 1, 1, True),
    (2, 1, 1, 1, True),
    (1, 2, 2, 1, False),
    (1, 1, 1, 2, True),
])
def test_deform_conv_matches_spec(stride, padding, dilation, dg, modulated):
    rng = np.random.RandomState(0)
    B, H, W, Cin, Cout, k = 2, 9, 11, 4, 6, 3
    K = k * k
    Ho = deform_conv2d_output_size(H, k, stride, padding, dilation)
    Wo = deform_conv2d_output_size(W, k, stride, padding, dilation)
    x = rng.randn(B, H, W, Cin).astype(np.float32)
    w = (rng.randn(k, k, Cin, Cout) * 0.2).astype(np.float32)
    off = (rng.randn(B, Ho, Wo, dg * K * 2) * 2.0).astype(np.float32)
    msk = rng.rand(B, Ho, Wo, dg * K).astype(np.float32) if modulated else None

    ref = _np_deform_conv(x, off, msk, w, stride, padding, dilation, dg)
    got = modulated_deform_conv2d(
        jnp.asarray(x), jnp.asarray(off),
        None if msk is None else jnp.asarray(msk), jnp.asarray(w),
        stride=stride, padding=padding, dilation=dilation, deform_groups=dg)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_zero_offset_equals_plain_conv():
    """dp = 0, m = 1 must reduce exactly to the ordinary convolution."""
    rng = np.random.RandomState(1)
    B, H, W, Cin, Cout, k = 2, 12, 10, 8, 16, 3
    x = rng.randn(B, H, W, Cin).astype(np.float32)
    w = (rng.randn(k, k, Cin, Cout) * 0.2).astype(np.float32)
    Ho = Wo = None
    for stride, padding in ((1, 1), (2, 1)):
        Ho = deform_conv2d_output_size(H, k, stride, padding, 1)
        Wo = deform_conv2d_output_size(W, k, stride, padding, 1)
        off = np.zeros((B, Ho, Wo, k * k * 2), np.float32)
        got = deform_conv2d(jnp.asarray(x), jnp.asarray(off), jnp.asarray(w),
                            stride=stride, padding=padding)
        want = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (stride, stride),
            [(padding, padding)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_integer_offset_shifts_receptive_field():
    """A constant integer offset (0, +1) must equal the conv of the
    x-shifted input (zero-fill at the seam)."""
    rng = np.random.RandomState(2)
    B, H, W, Cin, Cout, k = 1, 8, 8, 3, 5, 3
    x = rng.randn(B, H, W, Cin).astype(np.float32)
    w = (rng.randn(k, k, Cin, Cout) * 0.2).astype(np.float32)
    off = np.zeros((B, H, W, k * k * 2), np.float32)
    off[..., 1::2] = 1.0                                  # dx = +1 every tap
    got = deform_conv2d(jnp.asarray(x), jnp.asarray(off), jnp.asarray(w),
                        stride=1, padding=1)
    x_shift = np.concatenate([x[:, :, 1:], np.zeros_like(x[:, :, :1])], 2)
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x_shift), jnp.asarray(w), (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    # column 0 differs BY DESIGN: the deform offset re-enters the valid
    # map (samples x[:, 0]) where the shifted-conv reference zero-pads —
    # offsets are applied to the true sampling position, not clipped to
    # the nominal padded window
    np.testing.assert_allclose(np.asarray(got)[:, :, 1:],
                               np.asarray(want)[:, :, 1:],
                               rtol=1e-5, atol=1e-5)


def test_deform_conv_differentiable():
    rng = np.random.RandomState(3)
    B, H, W, Cin, Cout, k = 1, 6, 6, 4, 4, 3
    x = jnp.asarray(rng.randn(B, H, W, Cin).astype(np.float32))
    w = jnp.asarray((rng.randn(k, k, Cin, Cout) * 0.2).astype(np.float32))
    off = jnp.asarray((rng.randn(B, H, W, k * k * 2) * 0.5).astype(np.float32))
    msk = jnp.asarray(rng.rand(B, H, W, k * k).astype(np.float32))

    @jax.jit
    def f(x, off, msk, w):
        return (modulated_deform_conv2d(x, off, msk, w, stride=1,
                                        padding=1) ** 2).sum()

    grads = jax.grad(f, argnums=(0, 1, 2, 3))(x, off, msk, w)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).sum()) > 0


def test_seg2d_backbone_with_dcn_trains():
    """dcn_stages=(False, True, True, True) (the reference HTC's
    dconv_c3-c5 pattern) must build, forward, and take one gradient step."""
    import optax
    from test_seg2d import _tiny_cfg, _synthetic_batch
    from seevcn_tpu.models.seg2d.backend import build_seg2d, init_seg2d
    from dataclasses import replace

    cfg = replace(_tiny_cfg(), dcn_stages=(False, True, True, True))
    model, logic = build_seg2d(cfg)
    imgs, gtb, gtl, gtv, gtm = _synthetic_batch(np.random.RandomState(0), cfg)
    variables = init_seg2d(model)
    assert any("offset_conv" in "/".join(map(str, p)) for p in
               jax.tree_util.tree_leaves_with_path(variables["params"])
               for p in [p[0]]), "DCN offset convs must exist in params"
    rng = jax.random.PRNGKey(1)

    @jax.jit
    def step(params, batch_stats):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, *batch,
                train=True, rng=rng, mutable=["batch_stats"])
            loss, _ = model.loss(out, gtb, gtl, gtv, gtm, rng)
            return loss
        return jax.value_and_grad(loss_fn)(params)

    batch = (imgs, gtb, gtl, gtv, gtm)
    loss, grads = step(variables["params"], variables["batch_stats"])
    assert np.isfinite(float(loss))
    gsum = sum(float(jnp.abs(g).sum()) for g in
               jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gsum) and gsum > 0

"""Deformable convolution v1/v2 (modulated) — TPU-native.

Re-specifies the mmcv CUDA ops the reference's HTC-with-DCN detector2d
stack depends on (`modulated_deform_conv` / `deform_conv`, used via
mmdet's `dcn=dict(type='DCN', deform_groups=1)` in
/root/reference/see/detector2d/mmdetection/configs/htc/
htc_x101_64x4d_fpn_dconv_c3-c5_mstrain_400_1400_16x1_20e_coco.py).

Published semantics (Dai et al. 2017; Zhu et al. 2019):

    y(p) = sum_k w_k * m_k(p) * x(p0 + p_k + dp_k(p))

with bilinear sampling, zero outside the feature map, per-position learned
offsets dp_k and (v2 only) modulation scalars m_k in [0, 1].

TPU-first design: instead of the CUDA kernel's per-thread im2col, the op
builds the offset-im2col tensor with FOUR batched gathers (the bilinear
corners, each one `take_along_axis` over the flattened H*W axis) and
finishes with ONE einsum that XLA lowers to a single MXU GEMM of
(B*Ho*Wo, K*Cin) x (K*Cin, Cout). Everything is statically shaped and
fully differentiable (the corner gathers transpose to scatter-adds under
autodiff), so it jits into training steps unchanged.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def deform_conv2d_output_size(in_size: int, k: int, stride: int,
                              padding: int, dilation: int) -> int:
    return (in_size + 2 * padding - dilation * (k - 1) - 1) // stride + 1


def modulated_deform_conv2d(x, offset, mask, weight, bias=None, *,
                            stride=1, padding=0, dilation=1,
                            deform_groups: int = 1):
    """Deformable conv v2 (v1 when ``mask is None``), NHWC.

    Args:
      x: (B, H, W, Cin) input features.
      offset: (B, Ho, Wo, deform_groups * K * 2) learned offsets, mmcv
        channel order [dy_0, dx_0, dy_1, dx_1, ...] per deform group, with
        taps k = a * kw + b scanned row-major over the kernel window.
      mask: (B, Ho, Wo, deform_groups * K) modulation scalars (already
        sigmoid-ed), or None for v1 semantics (m_k = 1).
      weight: (kh, kw, Cin, Cout) — flax/lax HWIO layout.
      bias: optional (Cout,).
      stride / padding / dilation: int or (h, w) pairs.
      deform_groups: input channels are split into this many groups, each
        sampled with its own offset field (mmcv `deform_groups`).

    Returns (B, Ho, Wo, Cout).
    """
    B, H, W, Cin = x.shape
    kh, kw, wcin, Cout = weight.shape
    assert wcin == Cin, f"weight Cin {wcin} != input Cin {Cin}"
    K = kh * kw
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    DG = deform_groups
    assert Cin % DG == 0, "Cin must divide deform_groups"
    Cg = Cin // DG
    Ho = deform_conv2d_output_size(H, kh, sh, ph, dh)
    Wo = deform_conv2d_output_size(W, kw, sw, pw, dw)
    assert offset.shape == (B, Ho, Wo, DG * K * 2), offset.shape
    if mask is not None:
        assert mask.shape == (B, Ho, Wo, DG * K), mask.shape

    f32 = jnp.promote_types(x.dtype, jnp.float32)
    off = offset.astype(f32).reshape(B, Ho, Wo, DG, K, 2)
    dy, dx = off[..., 0], off[..., 1]

    # sampling positions: p0 (output-position origin) + p_k (tap) + dp_k
    oy = (jnp.arange(Ho, dtype=f32) * sh - ph)[:, None, None, None]
    ox = (jnp.arange(Wo, dtype=f32) * sw - pw)[None, :, None, None]
    ky = (jnp.arange(K) // kw).astype(f32) * dh      # (K,)
    kx = (jnp.arange(K) % kw).astype(f32) * dw
    ys = oy[None] + ky[None, None, None, None] + dy   # (B, Ho, Wo, DG, K)
    xs = ox[None] + kx[None, None, None, None] + dx

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0

    xg = x.reshape(B, H * W, DG, Cg)

    def corner(yc, xc, w):
        # one bilinear corner: gather + zero-outside masking; the gather's
        # VJP is a scatter-add, so the whole op trains
        valid = (yc >= 0) & (yc <= H - 1) & (xc >= 0) & (xc <= W - 1)
        yi = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
        xi = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
        flat = yi * W + xi                            # (B, Ho, Wo, DG, K)
        w = (w * valid.astype(f32))[..., None]        # (B, Ho, Wo, DG, K, 1)
        outs = []
        for g in range(DG):
            idx = flat[:, :, :, g, :].reshape(B, -1)  # (B, Ho*Wo*K)
            got = jnp.take_along_axis(
                xg[:, :, g, :], idx[..., None], axis=1)
            outs.append(got.reshape(B, Ho, Wo, K, Cg).astype(f32)
                        * w[:, :, :, g])
        return jnp.stack(outs, axis=3)                # (B, Ho, Wo, DG, K, Cg)

    samples = (corner(y0, x0, (1 - wy) * (1 - wx)) +
               corner(y0, x0 + 1, (1 - wy) * wx) +
               corner(y0 + 1, x0, wy * (1 - wx)) +
               corner(y0 + 1, x0 + 1, wy * wx))

    if mask is not None:
        m = mask.astype(f32).reshape(B, Ho, Wo, DG, K)
        samples = samples * m[..., None]

    # (B, Ho, Wo, DG, K, Cg) -> (B, Ho, Wo, K, DG*Cg): group-major channel
    # order matches the weight's Cin layout
    samples = samples.transpose(0, 1, 2, 4, 3, 5).reshape(B, Ho, Wo, K, Cin)
    w_kc = weight.astype(f32).reshape(K, Cin, Cout)
    out = jnp.einsum("bhwkc,kco->bhwo", samples, w_kc,
                     precision=jax.lax.Precision.HIGHEST)
    if bias is not None:
        out = out + bias.astype(f32)
    return out.astype(x.dtype)


def deform_conv2d(x, offset, weight, bias=None, *, stride=1, padding=0,
                  dilation=1, deform_groups: int = 1):
    """Deformable conv v1 (no modulation) — mmcv `deform_conv2d`."""
    return modulated_deform_conv2d(
        x, offset, None, weight, bias, stride=stride, padding=padding,
        dilation=dilation, deform_groups=deform_groups)

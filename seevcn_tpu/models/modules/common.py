"""Shared NN building blocks for the detector stack."""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    """BatchNorm over (N, C) rows with a validity mask.

    The detector's sparse tensors are fixed-capacity padded buffers; padding
    rows must not contaminate batch statistics. Matches the reference's
    BatchNorm1d(eps=1e-3, momentum=0.01) on voxel features
    (spconv_backbone.py:73) — torch momentum 0.01 == flax momentum 0.99.
    """
    epsilon: float = 1e-3
    momentum: float = 0.99

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", nn.initializers.zeros, None, (c,))
        ra_var = self.variable("batch_stats", "var", nn.initializers.ones, None, (c,))

        if train:
            m = mask.astype(x.dtype)[:, None]
            cnt = jnp.maximum(m.sum(), 1.0)
            mean = (x * m).sum(axis=0) / cnt
            var = (((x - mean) ** 2) * m).sum(axis=0) / cnt
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return jnp.where(mask[:, None], y, 0.0)


class ConvBlock2d(nn.Module):
    """Conv2d(bias=False) + BN(eps 1e-3, mom 0.01) + ReLU, NHWC.

    ``dtype`` sets the conv COMPUTE dtype only (params stay float32; BN
    statistics run in float32 because flax promotes back through the f32
    scale/bias) — the MXU bf16 path for training at capacity."""
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int | str = 1
    dtype: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.padding if isinstance(self.padding, str) else \
            [(self.padding, self.padding)] * 2
        dt = jnp.dtype(self.dtype) if self.dtype is not None else None
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=pad,
                    use_bias=False, dtype=dt, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, name="bn")(x)
        return nn.relu(x)


class DeconvBlock2d(nn.Module):
    """ConvTranspose2d(bias=False) + BN + ReLU, NHWC."""
    features: int
    stride: int = 1
    dtype: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = jnp.dtype(self.dtype) if self.dtype is not None else None
        x = nn.ConvTranspose(self.features, (self.stride, self.stride),
                             strides=(self.stride, self.stride), padding="VALID",
                             use_bias=False, dtype=dt,
                             name="deconv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, name="bn")(x)
        return nn.relu(x)


class DeformConv2d(nn.Module):
    """Deformable conv layer with self-predicted offsets (+ modulation when
    ``modulated``) — the mmcv ``ModulatedDeformConvPack``/``DeformConvPack``
    analog the reference's HTC-with-DCN backbone uses
    (configs/htc/htc_x101_64x4d_fpn_dconv_c3-c5_*.py, `dcn=dict(type='DCN',
    deform_groups=1)`). The offset conv is zero-initialized so the layer
    starts as a plain convolution (v2 modulation starts at sigmoid(0)=0.5).
    Compute lives in ops/dcn.py (4 bilinear-corner gathers + one MXU GEMM).
    """
    channels: int
    kernel_size: int = 3
    stride: int = 1
    deform_groups: int = 1
    modulated: bool = False      # DCN (v1) by default, matching the config
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        from ...ops.dcn import modulated_deform_conv2d

        k = self.kernel_size
        K = k * k
        dg = self.deform_groups
        n_off = dg * K * (3 if self.modulated else 2)
        om = nn.Conv(n_off, (k, k), strides=self.stride,
                     padding=k // 2,
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros,
                     name="offset_conv")(x)
        offset = om[..., :dg * K * 2]
        mask = jax.nn.sigmoid(om[..., dg * K * 2:]) if self.modulated \
            else None
        w = self.param("kernel", nn.initializers.variance_scaling(
            1.0, "fan_in", "truncated_normal"),
            (k, k, x.shape[-1], self.channels))
        b = self.param("bias", nn.initializers.zeros, (self.channels,)) \
            if self.use_bias else None
        return modulated_deform_conv2d(
            x, offset, mask, w, b, stride=self.stride, padding=k // 2,
            deform_groups=dg)

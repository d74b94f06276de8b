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

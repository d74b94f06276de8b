"""Dense 2D BEV backbone (NHWC flax convs).

Reference: detector3d/pcdet/models/backbones_2d/base_bev_backbone.py:6-112 —
per level: strided 3x3 conv + LAYER_NUMS[i] 3x3 convs (all conv-BN-ReLU,
bias-free), then a transposed-conv upsample per level, channel concat.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .common import ConvBlock2d, DeconvBlock2d


class BaseBEVBackbone(nn.Module):
    layer_nums: Sequence[int]
    layer_strides: Sequence[int]
    num_filters: Sequence[int]
    upsample_strides: Sequence[int] = ()
    num_upsample_filters: Sequence[int] = ()
    # conv compute dtype (BACKBONE_2D.DTYPE: bfloat16 for MXU training);
    # params and BN statistics stay float32
    dtype: str | None = None

    @property
    def num_bev_features(self) -> int:
        if self.num_upsample_filters:
            return int(sum(self.num_upsample_filters))
        return int(self.num_filters[-1])

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        ups = []
        for i, n_layers in enumerate(self.layer_nums):
            x = ConvBlock2d(self.num_filters[i], stride=self.layer_strides[i],
                            dtype=dt, name=f"block{i}_down")(x, train)
            for k in range(n_layers):
                x = ConvBlock2d(self.num_filters[i], dtype=dt,
                                name=f"block{i}_{k}")(x, train)
            if self.upsample_strides:
                s = self.upsample_strides[i]
                if s >= 1:
                    up = DeconvBlock2d(self.num_upsample_filters[i], stride=int(s),
                                       dtype=dt, name=f"deblock{i}")(x, train)
                else:
                    inv = int(np.round(1 / s))
                    up = ConvBlock2d(self.num_upsample_filters[i], kernel=inv,
                                     stride=inv, padding=0, dtype=dt,
                                     name=f"deblock{i}")(x, train)
                ups.append(up)
            else:
                ups.append(x)
        out = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
        if len(self.upsample_strides) > len(self.layer_nums):
            out = DeconvBlock2d(out.shape[-1], stride=int(self.upsample_strides[-1]),
                                dtype=dt, name="deblock_final")(out, train)
        return out

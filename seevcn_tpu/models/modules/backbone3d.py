"""Sparse 3D backbones on the gather-GEMM-scatter sparse ops.

Re-implements the reference spconv backbones
(detector3d/pcdet/models/backbones_3d/spconv_backbone.py:69-293) TPU-first:
each SubMConv3d/SparseConv3d becomes a rulebook gather + one MXU GEMM; BN is
mask-aware over the fixed-capacity voxel buffers.

Channel plan (VoxelBackBone8x): in -> 16 -> 16 | s2 32 (x3) | s2 64 (x3) |
s2(z0 pad) 64 (x3) | (3,1,1)s(2,1,1) 128. Stage strides 1/2/4/8 match
multi_scale_3d_strides for downstream PFE/ROI consumers.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops import sparse as SP
from .common import MaskedBatchNorm


class SpConvLayer(nn.Module):
    """One sparse conv + masked BN + ReLU."""
    out_channels: int
    kernel_size: tuple | int = 3
    stride: tuple | int = 1
    padding: tuple | int = 0
    subm: bool = True
    out_capacity: int | None = None
    use_relu: bool = True

    @nn.compact
    def __call__(self, st: SP.SparseTensor, train: bool = False) -> SP.SparseTensor:
        ks = SP._as3(self.kernel_size)
        k = ks[0] * ks[1] * ks[2]
        cin = st.features.shape[-1]
        w = self.param("kernel", nn.initializers.variance_scaling(
            1.0, "fan_in", "truncated_normal"), (k, cin, self.out_channels))
        if self.subm:
            out = SP.subm_conv3d(st, w, kernel_size=ks, padding=self.padding)
        else:
            out = SP.sparse_conv3d(st, w, kernel_size=ks, stride=self.stride,
                                   padding=self.padding,
                                   out_capacity=self.out_capacity)
        feats = MaskedBatchNorm(name="bn")(out.features, out.mask, train)
        if self.use_relu:
            feats = nn.relu(feats)
        return out._replace(features=feats)


class VoxelBackBone8x(nn.Module):
    """Reference VoxelBackBone8x (spconv_backbone.py:69-180).

    Capacities per stage are static; stage i capacity defaults to the input
    voxel capacity (active sets shrink after stride-2 stages in practice).
    """
    input_channels: int = 4
    capacities: Sequence[int] | None = None  # per strided stage (conv2..conv_out)

    @nn.compact
    def __call__(self, st: SP.SparseTensor, train: bool = False):
        cap = self.capacities or [st.features.shape[0]] * 4

        x = SpConvLayer(16, subm=True, padding=1, name="conv_input")(st, train)
        x_conv1 = SpConvLayer(16, subm=True, padding=1, name="conv1_0")(x, train)

        x = SpConvLayer(32, subm=False, stride=2, padding=1,
                        out_capacity=cap[0], name="conv2_down")(x_conv1, train)
        x = SpConvLayer(32, subm=True, padding=1, name="conv2_0")(x, train)
        x_conv2 = SpConvLayer(32, subm=True, padding=1, name="conv2_1")(x, train)

        x = SpConvLayer(64, subm=False, stride=2, padding=1,
                        out_capacity=cap[1], name="conv3_down")(x_conv2, train)
        x = SpConvLayer(64, subm=True, padding=1, name="conv3_0")(x, train)
        x_conv3 = SpConvLayer(64, subm=True, padding=1, name="conv3_1")(x, train)

        x = SpConvLayer(64, subm=False, stride=2, padding=(0, 1, 1),
                        out_capacity=cap[2], name="conv4_down")(x_conv3, train)
        x = SpConvLayer(64, subm=True, padding=1, name="conv4_0")(x, train)
        x_conv4 = SpConvLayer(64, subm=True, padding=1, name="conv4_1")(x, train)

        out = SpConvLayer(128, subm=False, kernel_size=(3, 1, 1), stride=(2, 1, 1),
                          padding=0, out_capacity=cap[3], name="conv_out")(x_conv4, train)

        return {
            "encoded_spconv_tensor": out,
            "encoded_spconv_tensor_stride": 8,
            "multi_scale_3d_features": {
                "x_conv1": x_conv1, "x_conv2": x_conv2,
                "x_conv3": x_conv3, "x_conv4": x_conv4,
            },
            "multi_scale_3d_strides": {"x_conv1": 1, "x_conv2": 2,
                                       "x_conv3": 4, "x_conv4": 8},
        }


class SparseBasicBlock(nn.Module):
    """Residual subm block (spconv_backbone.py:33-66)."""
    channels: int

    @nn.compact
    def __call__(self, st: SP.SparseTensor, train: bool = False) -> SP.SparseTensor:
        out = SpConvLayer(self.channels, subm=True, padding=1, name="conv1")(st, train)
        out2 = SpConvLayer(self.channels, subm=True, padding=1, use_relu=False,
                           name="conv2")(out, train)
        feats = nn.relu(out2.features + st.features)
        feats = jnp.where(st.mask[:, None], feats, 0.0)
        return out2._replace(features=feats)


class VoxelResBackBone8x(nn.Module):
    """Reference VoxelResBackBone8x (spconv_backbone.py:183-293)."""
    input_channels: int = 4
    capacities: Sequence[int] | None = None

    @nn.compact
    def __call__(self, st: SP.SparseTensor, train: bool = False):
        cap = self.capacities or [st.features.shape[0]] * 4

        x = SpConvLayer(16, subm=True, padding=1, name="conv_input")(st, train)
        x = SparseBasicBlock(16, name="conv1_0")(x, train)
        x_conv1 = SparseBasicBlock(16, name="conv1_1")(x, train)

        x = SpConvLayer(32, subm=False, stride=2, padding=1,
                        out_capacity=cap[0], name="conv2_down")(x_conv1, train)
        x = SparseBasicBlock(32, name="conv2_0")(x, train)
        x_conv2 = SparseBasicBlock(32, name="conv2_1")(x, train)

        x = SpConvLayer(64, subm=False, stride=2, padding=1,
                        out_capacity=cap[1], name="conv3_down")(x_conv2, train)
        x = SparseBasicBlock(64, name="conv3_0")(x, train)
        x_conv3 = SparseBasicBlock(64, name="conv3_1")(x, train)

        x = SpConvLayer(128, subm=False, stride=2, padding=(0, 1, 1),
                        out_capacity=cap[2], name="conv4_down")(x_conv3, train)
        x = SparseBasicBlock(128, name="conv4_0")(x, train)
        x_conv4 = SparseBasicBlock(128, name="conv4_1")(x, train)

        out = SpConvLayer(128, subm=False, kernel_size=(3, 1, 1), stride=(2, 1, 1),
                          padding=0, out_capacity=cap[3], name="conv_out")(x_conv4, train)

        return {
            "encoded_spconv_tensor": out,
            "encoded_spconv_tensor_stride": 8,
            "multi_scale_3d_features": {
                "x_conv1": x_conv1, "x_conv2": x_conv2,
                "x_conv3": x_conv3, "x_conv4": x_conv4,
            },
            "multi_scale_3d_strides": {"x_conv1": 1, "x_conv2": 2,
                                       "x_conv3": 4, "x_conv4": 8},
        }

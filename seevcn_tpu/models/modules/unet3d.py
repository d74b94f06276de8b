"""UNetV2 sparse encoder-decoder (PartA2 backbone).

Reference: detector3d/pcdet/models/backbones_3d/spconv_unet.py:49-212 —
VoxelBackBone8x-style encoder + a decoder of UR blocks: lateral residual
block, concat with the bottom-up path, merge conv, channel-reduction
residual, then an inverse sparse conv back onto the previous stage's active
set (shared indice keys == our target-tensor coords).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...ops import sparse as SP
from .backbone3d import SparseBasicBlock, SpConvLayer
from .common import MaskedBatchNorm


class SpInverseConvLayer(nn.Module):
    """Inverse sparse conv + BN + ReLU onto a target active set."""
    out_channels: int
    kernel_size: tuple | int = 3
    stride: tuple | int = 1
    padding: tuple | int = 0

    @nn.compact
    def __call__(self, st: SP.SparseTensor, target: SP.SparseTensor,
                 train: bool = False) -> SP.SparseTensor:
        ks = SP._as3(self.kernel_size)
        k = ks[0] * ks[1] * ks[2]
        cin = st.features.shape[-1]
        w = self.param("kernel", nn.initializers.variance_scaling(
            1.0, "fan_in", "truncated_normal"), (k, cin, self.out_channels))
        out = SP.sparse_inverse_conv3d(st, w, target, kernel_size=ks,
                                       stride=self.stride, padding=self.padding)
        feats = MaskedBatchNorm(name="bn")(out.features, out.mask, train)
        return out._replace(features=nn.relu(feats))


def channel_reduction(st: SP.SparseTensor, out_channels: int) -> SP.SparseTensor:
    n, c = st.features.shape
    assert c % out_channels == 0
    return st._replace(features=st.features.reshape(
        n, out_channels, -1).sum(axis=2))


class URBlock(nn.Module):
    """One decoder stage (spconv_unet.py:135-143)."""
    channels: int
    out_channels: int
    inv_kernel: tuple | int = 3
    inv_stride: tuple | int = 1
    inv_padding: tuple | int = 0
    last_subm: bool = False   # top stage uses a subm conv instead of inverse

    @nn.compact
    def __call__(self, x_lateral: SP.SparseTensor, x_bottom: SP.SparseTensor,
                 target: SP.SparseTensor | None, train: bool = False):
        x_trans = SparseBasicBlock(self.channels, name="conv_t")(x_lateral, train)
        cat = x_trans._replace(features=jnp.concatenate(
            [x_bottom.features, x_trans.features], axis=1))
        x_m = SpConvLayer(self.channels, subm=True, padding=1,
                          name="conv_m")(cat, train)
        red = channel_reduction(cat, self.channels)
        merged = x_m._replace(features=x_m.features + red.features)
        if self.last_subm:
            return SpConvLayer(self.out_channels, subm=True, padding=1,
                               name="conv_inv")(merged, train)
        return SpInverseConvLayer(self.out_channels, kernel_size=self.inv_kernel,
                                  stride=self.inv_stride,
                                  padding=self.inv_padding,
                                  name="conv_inv")(merged, target, train)


class UNetV2(nn.Module):
    """Encoder (VoxelBackBone8x layout) + UR decoder; outputs per-voxel
    features at input resolution plus the stride-8 encoded tensor.

    mode='zfold'/'hybrid'/'dense' runs the ENCODER on the fast dense MXU
    lowerings (see ops/sparse) and extracts fixed-capacity SparseTensor
    views at the four stage boundaries; the decoder's inverse convs need
    exact index reuse, so they always run on the rulebook path over those
    extracted active sets (VERDICT r2 #3)."""
    input_channels: int = 4
    return_encoded: bool = True
    mode: str = "sparse"
    dtype: str = "float32"
    # extraction headroom over the input voxel count: strided convs can
    # EXPAND the active set (ADVICE r3); audit with SP.active_count
    extract_capacity_mult: float = 1.5

    @nn.compact
    def __call__(self, st: SP.SparseTensor, train: bool = False):
        cap = st.features.shape[0]
        ecap = int(round(cap * self.extract_capacity_mult))
        bsz = st.batch_size
        x = st
        if self.mode == "hybrid":
            ct = SP.to_col_tensor(st)
            x = ct._replace(features=ct.features.astype(jnp.dtype(self.dtype)))
        elif self.mode == "zfold":
            x = SP.to_zfold_tensor(st, dtype=jnp.dtype(self.dtype))
        elif self.mode == "dense":
            dt = SP.to_dense_tensor(st)
            x = dt._replace(features=dt.features.astype(jnp.dtype(self.dtype)))
        fast = self.mode != "sparse"

        def extract(t):
            s = SP.as_sparse(t, bsz, ecap)
            return s._replace(features=s.features.astype(jnp.float32))

        x = SpConvLayer(16, subm=True, padding=1, name="conv_input")(x, train)
        x_conv1 = SpConvLayer(16, subm=True, padding=1, name="conv1_0")(x, train)
        if isinstance(x_conv1, SP.ColTensor):
            x_conv1 = SP.col_to_zfold(x_conv1)
        x = SpConvLayer(32, subm=False, stride=2, padding=1, out_capacity=cap,
                        name="conv2_down")(x_conv1, train)
        x = SpConvLayer(32, subm=True, padding=1, name="conv2_0")(x, train)
        x_conv2 = SpConvLayer(32, subm=True, padding=1, name="conv2_1")(x, train)
        x = SpConvLayer(64, subm=False, stride=2, padding=1, out_capacity=cap,
                        name="conv3_down")(x_conv2, train)
        x = SpConvLayer(64, subm=True, padding=1, name="conv3_0")(x, train)
        x_conv3 = SpConvLayer(64, subm=True, padding=1, name="conv3_1")(x, train)
        x = SpConvLayer(64, subm=False, stride=2, padding=(0, 1, 1),
                        out_capacity=cap, name="conv4_down")(x_conv3, train)
        x = SpConvLayer(64, subm=True, padding=1, name="conv4_0")(x, train)
        x_conv4 = SpConvLayer(64, subm=True, padding=1, name="conv4_1")(x, train)

        out = {}
        if self.return_encoded:
            enc = SpConvLayer(128, subm=False, kernel_size=(3, 1, 1),
                              stride=(2, 1, 1), padding=0, out_capacity=cap,
                              name="conv_out")(x_conv4, train)
            out["encoded_spconv_tensor"] = enc
            out["encoded_spconv_tensor_stride"] = 8
        if fast:
            # bridge the fast encoder to the rulebook decoder
            x_conv1 = extract(x_conv1)
            x_conv2 = extract(x_conv2)
            x_conv3 = extract(x_conv3)
            x_conv4 = extract(x_conv4)

        # decoder: 4 -> 3 -> 2 -> 1
        x_up4 = URBlock(64, 64, inv_stride=2, inv_padding=(0, 1, 1),
                        name="up4")(x_conv4, x_conv4, x_conv3, train)
        x_up3 = URBlock(64, 32, inv_stride=2, inv_padding=1,
                        name="up3")(x_conv3, x_up4, x_conv2, train)
        x_up2 = URBlock(32, 16, inv_stride=2, inv_padding=1,
                        name="up2")(x_conv2, x_up3, x_conv1, train)
        x_up1 = URBlock(16, 16, last_subm=True,
                        name="up1")(x_conv1, x_up2, None, train)

        out["point_features"] = x_up1          # SparseTensor at stride 1
        out["multi_scale_3d_features"] = {
            "x_conv1": x_conv1, "x_conv2": x_conv2,
            "x_conv3": x_conv3, "x_conv4": x_conv4}
        return out

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
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import sparse as SP
from .common import MaskedBatchNorm


class DenseMaskedBatchNorm(nn.Module):
    """MaskedBatchNorm for dense-masked tensors: inputs are pre-zeroed
    outside ``occ`` so the masked moments are plain sums / E[x^2]-mean^2
    (identical statistics, no (N, C) flatten + mask multiply over the full
    grid). Variable names match MaskedBatchNorm so the two execution modes
    share checkpoints."""
    epsilon: float = 1e-3
    momentum: float = 0.99

    @nn.compact
    def __call__(self, x, occ, train: bool = False):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                nn.initializers.zeros, None, (c,))
        ra_var = self.variable("batch_stats", "var",
                               nn.initializers.ones, None, (c,))
        if train:
            axes = tuple(range(x.ndim - 1))
            # f32 accumulation regardless of the activation dtype
            cnt = jnp.maximum(occ.sum().astype(jnp.float32), 1.0)
            mean = x.sum(axis=axes, dtype=jnp.float32) / cnt
            var = jnp.maximum(
                (x.astype(jnp.float32) ** 2).sum(axis=axes) / cnt
                - mean ** 2, 0.0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + \
                    (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + \
                    (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(
            var + self.epsilon) * scale + bias
        y = y.astype(x.dtype)
        return y * occ[..., None].astype(y.dtype)


def _remat_wrap(cls, remat: str):
    """Wrap a layer class per the REMAT policy (dense execution modes only).

    "layer": full per-layer remat — backward recomputes each layer's
      forward (conv runs 4x FLOPs fwd+bwd instead of 3x) but only layer
      INPUTS are saved. Required at eval capacity (dense f32 activations
      are ~1.4 GB each; saving all intermediates needs 20.3 GB).
    "dots": remat with the dots-saveable policy — conv/GEMM outputs are
      saved, only cheap elementwise (BN/ReLU) recomputes, so convs run
      the minimal 3x FLOPs. The right default at the 80k-voxel train
      budget in bf16.
    "none": no remat — everything XLA wants saved is saved.
    """
    if remat == "none":
        return cls
    if remat == "dots":
        return nn.remat(
            cls, static_argnums=(2,),
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    return nn.remat(cls, static_argnums=(2,))


class SpConvLayer(nn.Module):
    """One sparse conv + masked BN + ReLU. Accepts a SparseTensor
    (rulebook gather-GEMM path) or a DenseTensor (masked dense conv3d on
    the MXU — same math, see ops/sparse.DenseTensor)."""
    out_channels: int
    kernel_size: tuple | int = 3
    stride: tuple | int = 1
    padding: tuple | int = 0
    subm: bool = True
    out_capacity: int | None = None
    use_relu: bool = True

    @nn.compact
    def __call__(self, st, train: bool = False):
        ks = SP._as3(self.kernel_size)
        k = ks[0] * ks[1] * ks[2]
        cin = st.channels if isinstance(st, (SP.ZFoldTensor, SP.ColTensor)) \
            else st.features.shape[-1]
        w = self.param("kernel", nn.initializers.variance_scaling(
            1.0, "fan_in", "truncated_normal"), (k, cin, self.out_channels))
        if isinstance(st, SP.ColTensor):
            # active-column layout: only submanifold convs (the active set
            # is invariant); strided convs convert to zfold at the caller
            assert self.subm, "ColTensor supports submanifold convs only"
            out = SP.col_subm_conv(st, w, self.out_channels, kernel_size=ks,
                                   padding=self.padding)
            m = out.features.shape[0]
            f = out.features.reshape(m, out.z, self.out_channels)
            f = DenseMaskedBatchNorm(name="bn")(f, out.zocc, train)
            if self.use_relu:
                f = nn.relu(f)
            f = f.astype(st.features.dtype)
            return out._replace(features=f.reshape(m, -1))
        if isinstance(st, SP.ZFoldTensor):
            # 'auto' (zblock for deep-z subm convs) wins FORWARD only; the
            # per-block convs make the filter-grad backward slower than the
            # single banded conv (train step 425 vs 361 ms measured), so
            # training pins the band
            out = SP.zfold_conv(st, w, self.out_channels, kernel_size=ks,
                                stride=self.stride, padding=self.padding,
                                subm=self.subm,
                                impl="band" if train else "auto")
            b, yy, xx, _ = out.features.shape
            f = out.features.reshape(b, yy, xx, out.z, self.out_channels)
            f = DenseMaskedBatchNorm(name="bn")(f, out.occ, train)
            if self.use_relu:
                f = nn.relu(f)
            f = f.astype(st.features.dtype)
            return out._replace(
                features=f.reshape(b, yy, xx, out.z * self.out_channels))
        if isinstance(st, SP.DenseTensor):
            # conv3d lowering is the fast FORWARD; its backward materializes
            # 16x-padded transposed copies (7.5 GB at eval capacity), so
            # training uses the z-decomposed 2D lowering (same math)
            impl = "2d" if train else "conv3d"
            if self.subm:
                out = SP.dense_subm_conv3d(st, w, kernel_size=ks,
                                           padding=self.padding, impl=impl)
            else:
                out = SP.dense_sparse_conv3d(st, w, kernel_size=ks,
                                             stride=self.stride,
                                             padding=self.padding, impl=impl)
            feats = DenseMaskedBatchNorm(name="bn")(out.features, out.occ,
                                                    train)
            if self.use_relu:
                feats = nn.relu(feats)
            # keep the input activation dtype between layers (bf16 when the
            # backbone runs in mixed precision; convs accumulate f32)
            return out._replace(features=feats.astype(st.features.dtype))
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
    mode: str = "sparse"        # "dense": masked conv3d on the MXU;
    # "zfold": z folded into conv2d channels; "hybrid": stage-1 subm convs
    # run in the active-column layout (~15% BEV occupancy -> ~6.7x fewer
    # stage-1 FLOPs), then zfold for the strided stages where occupancy
    # saturates
    dtype: str = "float32"      # dense-mode activation dtype; "bfloat16"
    # halves HBM (convs still accumulate f32) — needed to TRAIN at the
    # reference eval capacity on a 16 GB chip
    remat: str = "layer"        # "layer" | "dots" | "none" (see _remat_wrap)

    @nn.compact
    def __call__(self, st, train: bool = False):
        if isinstance(st, SP.SparseTensor):
            if self.mode in ("zfold", "hybrid"):
                if self.mode == "hybrid":
                    ct = SP.to_col_tensor(st)
                    st = ct._replace(features=ct.features.astype(
                        jnp.dtype(self.dtype)))
                else:
                    st = SP.to_zfold_tensor(st, dtype=jnp.dtype(self.dtype))
            elif self.mode == "dense":
                st = SP.to_dense_tensor(st)
                st = st._replace(features=st.features.astype(
                    jnp.dtype(self.dtype)))
        dense = isinstance(st, (SP.DenseTensor, SP.ZFoldTensor,
                                SP.ColTensor))
        cap = [0] * 4 if dense else \
            (self.capacities or [st.features.shape[0]] * 4)
        # dense activations at eval capacity are ~1.4 GB each — remat every
        # layer so the backward recomputes instead of saving all 12 of them
        # (without this a B=1 train step needs 20.3 GB of 15.75 GB HBM);
        # the train budget (80k voxels, bf16, hybrid) fits REMAT: dots
        Layer = _remat_wrap(SpConvLayer, self.remat) if dense \
            else SpConvLayer

        x = Layer(16, subm=True, padding=1, name="conv_input")(st, train)
        x_conv1 = Layer(16, subm=True, padding=1, name="conv1_0")(x, train)

        if isinstance(x_conv1, SP.ColTensor):
            x_conv1 = SP.col_to_zfold(x_conv1)
        x = Layer(32, subm=False, stride=2, padding=1,
                  out_capacity=cap[0], name="conv2_down")(x_conv1, train)
        x = Layer(32, subm=True, padding=1, name="conv2_0")(x, train)
        x_conv2 = Layer(32, subm=True, padding=1, name="conv2_1")(x, train)

        x = Layer(64, subm=False, stride=2, padding=1,
                  out_capacity=cap[1], name="conv3_down")(x_conv2, train)
        x = Layer(64, subm=True, padding=1, name="conv3_0")(x, train)
        x_conv3 = Layer(64, subm=True, padding=1, name="conv3_1")(x, train)

        x = Layer(64, subm=False, stride=2, padding=(0, 1, 1),
                  out_capacity=cap[2], name="conv4_down")(x_conv3, train)
        x = Layer(64, subm=True, padding=1, name="conv4_0")(x, train)
        x_conv4 = Layer(64, subm=True, padding=1, name="conv4_1")(x, train)

        out = Layer(128, subm=False, kernel_size=(3, 1, 1), stride=(2, 1, 1),
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
    """Residual subm block (spconv_backbone.py:33-66). Works on either
    execution form (SparseTensor rulebook / DenseTensor masked-dense)."""
    channels: int

    @nn.compact
    def __call__(self, st, train: bool = False):
        out = SpConvLayer(self.channels, subm=True, padding=1, name="conv1")(st, train)
        out2 = SpConvLayer(self.channels, subm=True, padding=1, use_relu=False,
                           name="conv2")(out, train)
        feats = nn.relu(out2.features + st.features)
        if isinstance(st, SP.ZFoldTensor):
            b, yy, xx, _ = feats.shape
            f5 = feats.reshape(b, yy, xx, st.z, st.channels)
            f5 = f5 * st.occ[..., None].astype(f5.dtype)
            feats = f5.reshape(b, yy, xx, st.z * st.channels)
        elif isinstance(st, SP.DenseTensor):
            feats = feats * st.occ[..., None].astype(feats.dtype)
        else:
            feats = jnp.where(st.mask[:, None], feats, 0.0)
        return out2._replace(features=feats)


class VoxelResBackBone8x(nn.Module):
    """Reference VoxelResBackBone8x (spconv_backbone.py:183-293)."""
    input_channels: int = 4
    capacities: Sequence[int] | None = None
    mode: str = "sparse"        # "dense": masked conv3d (see VoxelBackBone8x)
    dtype: str = "float32"
    remat: str = "layer"        # "layer" | "dots" | "none" (see _remat_wrap)

    @nn.compact
    def __call__(self, st, train: bool = False):
        if isinstance(st, SP.SparseTensor):
            if self.mode == "zfold":
                st = SP.to_zfold_tensor(st, dtype=jnp.dtype(self.dtype))
            elif self.mode == "dense":
                st = SP.to_dense_tensor(st)
                st = st._replace(features=st.features.astype(
                    jnp.dtype(self.dtype)))
        dense = isinstance(st, (SP.DenseTensor, SP.ZFoldTensor))
        cap = [0] * 4 if dense else \
            (self.capacities or [st.features.shape[0]] * 4)
        Layer = _remat_wrap(SpConvLayer, self.remat) if dense \
            else SpConvLayer
        Block = _remat_wrap(SparseBasicBlock, self.remat) if dense \
            else SparseBasicBlock

        x = Layer(16, subm=True, padding=1, name="conv_input")(st, train)
        x = Block(16, name="conv1_0")(x, train)
        x_conv1 = Block(16, name="conv1_1")(x, train)

        x = Layer(32, subm=False, stride=2, padding=1,
                  out_capacity=cap[0], name="conv2_down")(x_conv1, train)
        x = Block(32, name="conv2_0")(x, train)
        x_conv2 = Block(32, name="conv2_1")(x, train)

        x = Layer(64, subm=False, stride=2, padding=1,
                  out_capacity=cap[1], name="conv3_down")(x_conv2, train)
        x = Block(64, name="conv3_0")(x, train)
        x_conv3 = Block(64, name="conv3_1")(x, train)

        x = Layer(128, subm=False, stride=2, padding=(0, 1, 1),
                  out_capacity=cap[2], name="conv4_down")(x_conv3, train)
        x = Block(128, name="conv4_0")(x, train)
        x_conv4 = Block(128, name="conv4_1")(x, train)

        out = Layer(128, subm=False, kernel_size=(3, 1, 1), stride=(2, 1, 1),
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


class FocalSparseConv(nn.Module):
    """Focals Conv block (reference focal_sparse_conv/focal_sparse_conv.py:
    9-169, arXiv:2204.12463), used by VoxelBackBone8xFocal
    (spconv_backbone_focal.py:101-176).

    A SubM feature conv plus a 27-channel SubM importance conv. The CENTER
    importance (sigmoid) gates each voxel's features; the TOPK most
    important voxels dilate — each spawns the neighbor offsets whose
    predicted offset-importance clears THRESHOLD, carrying the gated parent
    features scaled by that offset importance. New voxels merge into the
    active set by sort-dedupe (existing voxels win duplicates), keeping the
    ascending-key invariant. Fixed shapes: output capacity = input capacity
    + TOPK * 26.

    Returns (SparseTensor, {"importance", "coords", "mask"}) — the caller
    adds the box-of-points BCE on the importances (reference
    loss_box_of_pts).
    """
    channels: int
    topk: int = 128
    threshold: float = 0.5

    @nn.compact
    def __call__(self, st: SP.SparseTensor, train: bool = False):
        cin = st.features.shape[-1]
        w = self.param("kernel", nn.initializers.variance_scaling(
            1.0, "fan_in", "truncated_normal"), (27, cin, self.channels))
        out = SP.subm_conv3d(st, w, kernel_size=3, padding=1)
        feats = MaskedBatchNorm(name="bn")(out.features, out.mask, train)
        feats = nn.relu(feats)

        w_imp = self.param("kernel_imp", nn.initializers.variance_scaling(
            1.0, "fan_in", "truncated_normal"), (27, cin, 27))
        imps = SP.subm_conv3d(st, w_imp, kernel_size=3, padding=1).features
        center_imp = jax.nn.sigmoid(imps[:, 13])            # offset (0,0,0)
        feats = feats * jnp.where(st.mask, center_imp, 0.0)[:, None]

        # --- dilation: topk foreground voxels spawn thresholded neighbors --
        nz, ny, nx = st.spatial_shape
        score = jnp.where(st.mask, center_imp, -1.0)
        _, top_idx = jax.lax.top_k(score, min(self.topk, score.shape[0]))
        offs = SP._offsets((3, 3, 3))                       # (27, 3)
        noncenter = jnp.concatenate([jnp.arange(13), jnp.arange(14, 27)])
        p_coords = st.coords[top_idx]                        # (K, 4)
        p_feats = feats[top_idx]                             # (K, C)
        p_imps = jax.nn.sigmoid(imps[top_idx][:, noncenter]) # (K, 26)
        p_ok = st.mask[top_idx] & (score[top_idx] > float(self.threshold))
        n_zyx = p_coords[:, None, 1:4] + offs[noncenter][None]     # (K, 26, 3)
        dims = jnp.asarray([nz, ny, nx], jnp.int32)
        inb = jnp.all((n_zyx >= 0) & (n_zyx < dims), axis=-1)
        cand_ok = inb & p_ok[:, None] & (p_imps > float(self.threshold))
        ckey = ((p_coords[:, 0:1] * nz + n_zyx[..., 0]) * ny + n_zyx[..., 1]) \
            * nx + n_zyx[..., 2]
        big = jnp.int32(np.iinfo(np.int32).max)
        # drop candidates already active (existing voxels win)
        in_keys = SP.linear_key(st.coords, st.spatial_shape, st.mask)
        _, exists = SP._lookup(in_keys, ckey.reshape(-1).astype(jnp.int32))
        cand_ok = cand_ok & ~exists.reshape(cand_ok.shape)
        ckey = jnp.where(cand_ok, ckey.astype(jnp.int32), big).reshape(-1)
        cand_feats = (p_feats[:, None, :] * p_imps[..., None]).reshape(
            ckey.shape[0], -1)

        extra = p_coords.shape[0] * 26
        order = jnp.argsort(ckey)
        skey = ckey[order]
        head = jnp.concatenate([jnp.ones((1,), bool),
                                skey[1:] != skey[:-1]]) & (skey < big)
        rank = jnp.cumsum(head) - 1
        rank_w = jnp.where(head, jnp.minimum(rank, extra), extra)
        new_keys = jnp.full((extra + 1,), big, jnp.int32).at[rank_w].min(skey)
        new_feats = jnp.zeros((extra + 1, feats.shape[-1]), feats.dtype) \
            .at[rank_w].set(cand_feats[order])
        new_keys, new_feats = new_keys[:extra], new_feats[:extra]
        new_mask = new_keys < big
        kk = jnp.where(new_mask, new_keys, 0)
        nxc = kk % nx
        rem = kk // nx
        nyc = rem % ny
        rem = rem // ny
        nzc = rem % nz
        nbc = rem // nz
        new_coords = jnp.stack([nbc, nzc, nyc, nxc], axis=1).astype(jnp.int32)

        # --- merge + global re-sort (keys disjoint by construction) --------
        all_keys = jnp.concatenate([in_keys, new_keys])
        all_feats = jnp.concatenate([feats, new_feats])
        all_coords = jnp.concatenate([st.coords, new_coords])
        all_mask = jnp.concatenate([st.mask, new_mask])
        perm = jnp.argsort(all_keys)
        merged = SP.SparseTensor(all_feats[perm], all_coords[perm],
                                 all_mask[perm], st.spatial_shape,
                                 st.batch_size)
        aux = {"importance": center_imp, "coords": st.coords, "mask": st.mask}
        return merged, aux


class VoxelBackBone8xFocal(nn.Module):
    """VoxelBackBone8x with FocalSparseConv blocks after stages 1-3
    (spconv_backbone_focal.py:101-176; SPECIAL_CONV_LIST there)."""
    input_channels: int = 4
    capacities: Sequence[int] | None = None
    topk: int = 128
    threshold: float = 0.5

    @nn.compact
    def __call__(self, st: SP.SparseTensor, train: bool = False):
        cap = self.capacities or [st.features.shape[0]] * 4
        focal_aux = []

        x = SpConvLayer(16, subm=True, padding=1, name="conv_input")(st, train)
        x, aux = FocalSparseConv(16, topk=self.topk, threshold=self.threshold,
                                 name="focal1")(x, train)
        focal_aux.append({**aux, "stride": 1})
        x_conv1 = SpConvLayer(16, subm=True, padding=1, name="conv1_0")(x, train)

        x = SpConvLayer(32, subm=False, stride=2, padding=1,
                        out_capacity=cap[0], name="conv2_down")(x_conv1, train)
        x = SpConvLayer(32, subm=True, padding=1, name="conv2_0")(x, train)
        x, aux = FocalSparseConv(32, topk=self.topk, threshold=self.threshold,
                                 name="focal2")(x, train)
        focal_aux.append({**aux, "stride": 2})
        x_conv2 = SpConvLayer(32, subm=True, padding=1, name="conv2_1")(x, train)

        x = SpConvLayer(64, subm=False, stride=2, padding=1,
                        out_capacity=cap[1], name="conv3_down")(x_conv2, train)
        x = SpConvLayer(64, subm=True, padding=1, name="conv3_0")(x, train)
        x, aux = FocalSparseConv(64, topk=self.topk, threshold=self.threshold,
                                 name="focal3")(x, train)
        focal_aux.append({**aux, "stride": 4})
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
            "focal_aux": focal_aux,
        }

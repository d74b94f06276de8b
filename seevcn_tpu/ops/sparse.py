"""Sparse 3D convolution as gather-GEMM-scatter, pure XLA.

This is the TPU replacement for spconv (SURVEY.md §2.2): the reference's
VoxelBackBone8x depends on SubMConv3d / SparseConv3d CUDA kernels
(detector3d/pcdet/models/backbones_3d/spconv_backbone.py:69-180). TPUs have
no scatter-heavy sparse runtime, so active voxels live in fixed-capacity,
key-sorted buffers and every conv becomes:

  1. rulebook build — for each (output voxel, kernel offset) compute the
     input coordinate and find it by binary search over the sorted keys
     (jnp.searchsorted); misses gather zeros,
  2. one big GEMM — gathered (V, K*Cin) x weight (K*Cin, Cout) rides the MXU,

with strided convs additionally generating their output active set by
sort-dedupe of all (input x offset) candidate positions. Fixed capacities +
validity masks keep every shape static.

Key invariant: rows are sorted ascending by linearized key
((b*nz+z)*ny+y)*nx+x, invalid rows at the end (key = BIG). Both
``voxelize_batch`` and ``sparse_conv`` produce this ordering.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class SparseTensor(NamedTuple):
    features: jax.Array       # (N, C)
    coords: jax.Array         # (N, 4) int32 [b, z, y, x]
    mask: jax.Array           # (N,) bool
    spatial_shape: tuple      # (nz, ny, nx) static
    batch_size: int           # static


def _as3(v) -> tuple:
    if isinstance(v, (tuple, list)):
        assert len(v) == 3
        return tuple(int(x) for x in v)
    return (int(v),) * 3


def linear_key(coords: jax.Array, spatial_shape, valid: jax.Array) -> jax.Array:
    nz, ny, nx = spatial_shape
    key = ((coords[:, 0] * nz + coords[:, 1]) * ny + coords[:, 2]) * nx + coords[:, 3]
    big = jnp.int32(np.iinfo(np.int32).max)
    return jnp.where(valid, key.astype(jnp.int32), big)


def make_sparse_tensor(features, coords, mask, spatial_shape, batch_size) -> SparseTensor:
    nz, ny, nx = (int(s) for s in spatial_shape)
    assert batch_size * nz * ny * nx < np.iinfo(np.int32).max, \
        "linear keys overflow int32; shrink batch or grid"
    return SparseTensor(features, coords, mask, (nz, ny, nx), int(batch_size))


def _offsets(kernel_size, dtype=jnp.int32):
    """Kernel offsets in z-major order, matching the (kz, ky, kx, in, out)
    -> (K, in, out) weight flattening in ckpt_compat.spconv3d_weight."""
    kz, ky, kx = kernel_size
    oz, oy, ox = np.meshgrid(np.arange(kz), np.arange(ky), np.arange(kx), indexing="ij")
    return jnp.asarray(np.stack([oz.ravel(), oy.ravel(), ox.ravel()], axis=1), dtype)


def _lookup(keys_sorted: jax.Array, queries: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Binary search: (M,) queries into (N,) ascending keys. Returns
    (row index clipped, found mask)."""
    idx = jnp.searchsorted(keys_sorted, queries)
    idx_c = jnp.clip(idx, 0, keys_sorted.shape[0] - 1)
    found = keys_sorted[idx_c] == queries
    return idx_c, found


def _gather_gemm(st: SparseTensor, out_coords: jax.Array, out_mask: jax.Array,
                 weight: jax.Array, kernel_size, stride, padding,
                 in_keys: jax.Array) -> jax.Array:
    """Compute y(p) = sum_k W[k] x(p*stride - pad + k) for active outputs."""
    k = weight.shape[0]
    cin = weight.shape[1]
    offs = _offsets(kernel_size)                              # (K, 3)
    stride = jnp.asarray(_as3(stride), jnp.int32)
    pad = jnp.asarray(_as3(padding), jnp.int32)

    zyx = out_coords[:, 1:4]                                  # (V, 3)
    in_zyx = zyx[:, None, :] * stride - pad + offs[None]      # (V, K, 3)
    nz, ny, nx = st.spatial_shape
    dims = jnp.asarray([nz, ny, nx], jnp.int32)
    inb = jnp.all((in_zyx >= 0) & (in_zyx < dims), axis=-1)   # (V, K)

    b = out_coords[:, 0:1]                                    # (V, 1)
    q = ((b * nz + in_zyx[..., 0]) * ny + in_zyx[..., 1]) * nx + in_zyx[..., 2]
    big = jnp.int32(np.iinfo(np.int32).max)
    q = jnp.where(inb & out_mask[:, None], q.astype(jnp.int32), big)

    idx, found = _lookup(in_keys, q.reshape(-1))              # (V*K,)
    gathered = jnp.where(found[:, None], st.features[idx], 0.0)
    gathered = gathered.reshape(-1, k * cin)                  # (V, K*Cin)
    return jnp.matmul(gathered, weight.reshape(k * cin, -1),
                      preferred_element_type=jnp.float32)


def subm_conv3d(st: SparseTensor, weight: jax.Array,
                kernel_size=3, padding=1) -> SparseTensor:
    """Submanifold conv: output active set == input active set (SubMConv3d)."""
    ks = _as3(kernel_size)
    assert weight.shape[0] == ks[0] * ks[1] * ks[2], (weight.shape, ks)
    in_keys = linear_key(st.coords, st.spatial_shape, st.mask)
    feats = _gather_gemm(st, st.coords, st.mask, weight, ks, 1, padding, in_keys)
    feats = jnp.where(st.mask[:, None], feats, 0.0)
    return st._replace(features=feats)


@partial(jax.jit, static_argnames=("kernel_size", "stride", "padding", "out_capacity",
                                   "spatial_shape", "batch_size"))
def _sparse_conv_impl(features, coords, mask, weight, *, kernel_size, stride,
                      padding, out_capacity, spatial_shape, batch_size):
    st = SparseTensor(features, coords, mask, spatial_shape, batch_size)
    ks = kernel_size
    sz, sy, sx = _as3(stride)
    pz, py, px = _as3(padding)
    nz, ny, nx = st.spatial_shape
    oz_dim = (nz + 2 * pz - ks[0]) // sz + 1
    oy_dim = (ny + 2 * py - ks[1]) // sy + 1
    ox_dim = (nx + 2 * px - ks[2]) // sx + 1
    out_shape = (oz_dim, oy_dim, ox_dim)

    # --- output active set: dedupe all (input x kernel offset) candidates ---
    offs = _offsets(ks)                                        # (K, 3)
    zyx = st.coords[:, 1:4]
    num = zyx[:, None, :] + jnp.asarray([pz, py, px]) - offs[None]   # (N, K, 3)
    strides = jnp.asarray([sz, sy, sx], jnp.int32)
    divisible = jnp.all(num % strides == 0, axis=-1)
    out_zyx = num // strides
    odims = jnp.asarray(out_shape, jnp.int32)
    inb = jnp.all((out_zyx >= 0) & (out_zyx < odims), axis=-1)
    cand_ok = divisible & inb & st.mask[:, None]               # (N, K)

    b = st.coords[:, 0:1, None]                                # (N, 1, 1)
    ckey = ((b[:, :, 0] * oz_dim + out_zyx[..., 0]) * oy_dim + out_zyx[..., 1]) \
        * ox_dim + out_zyx[..., 2]
    big = jnp.int32(np.iinfo(np.int32).max)
    ckey = jnp.where(cand_ok, ckey.astype(jnp.int32), big).reshape(-1)

    skey = jnp.sort(ckey)
    head = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]]) & (skey < big)
    rank = jnp.cumsum(head) - 1
    rank = jnp.where(head & (rank < out_capacity), rank, out_capacity)
    out_keys = jnp.full((out_capacity + 1,), big, jnp.int32).at[rank].min(skey)
    out_keys = out_keys[:out_capacity]                         # ascending, BIG-padded
    out_mask = out_keys < big

    # decode keys back to coords
    okey = jnp.where(out_mask, out_keys, 0)
    ox = okey % ox_dim
    rem = okey // ox_dim
    oy = rem % oy_dim
    rem = rem // oy_dim
    oz = rem % oz_dim
    ob = rem // oz_dim
    out_coords = jnp.stack([ob, oz, oy, ox], axis=1).astype(jnp.int32)

    in_keys = linear_key(st.coords, st.spatial_shape, st.mask)
    feats = _gather_gemm(st, out_coords, out_mask, weight, ks,
                         (sz, sy, sx), (pz, py, px), in_keys)
    feats = jnp.where(out_mask[:, None], feats, 0.0)
    return feats, out_coords, out_mask


def sparse_conv3d(st: SparseTensor, weight: jax.Array, kernel_size=3,
                  stride=1, padding=0, out_capacity: int | None = None) -> SparseTensor:
    """Strided/regular sparse conv (SparseConv3d): the active set dilates to
    every output position any input touches, then gather-GEMM as usual."""
    ks = _as3(kernel_size)
    assert weight.shape[0] == ks[0] * ks[1] * ks[2], (weight.shape, ks)
    if out_capacity is None:
        out_capacity = st.features.shape[0]
    sz, sy, sx = _as3(stride)
    pz, py, px = _as3(padding)
    nz, ny, nx = st.spatial_shape
    out_shape = ((nz + 2 * pz - ks[0]) // sz + 1,
                 (ny + 2 * py - ks[1]) // sy + 1,
                 (nx + 2 * px - ks[2]) // sx + 1)
    feats, coords, mask = _sparse_conv_impl(
        st.features, st.coords, st.mask, weight, kernel_size=ks,
        stride=(sz, sy, sx), padding=(pz, py, px), out_capacity=int(out_capacity),
        spatial_shape=st.spatial_shape, batch_size=st.batch_size)
    return SparseTensor(feats, coords, mask, out_shape, st.batch_size)


def to_dense(st: SparseTensor) -> jax.Array:
    """(B, nz, ny, nx, C) dense scatter (spconv SparseConvTensor.dense())."""
    nz, ny, nx = st.spatial_shape
    c = st.features.shape[-1]
    dense = jnp.zeros((st.batch_size, nz, ny, nx, c), st.features.dtype)
    b, z, y, x = (jnp.where(st.mask, st.coords[:, i], 0) for i in range(4))
    feats = jnp.where(st.mask[:, None], st.features, 0.0)
    return dense.at[b, z, y, x].add(feats)  # sorted-unique keys: add == set


def sparse_inverse_conv3d(st: SparseTensor, weight: jax.Array,
                          target: SparseTensor, kernel_size=3,
                          stride=1, padding=0) -> SparseTensor:
    """Inverse (transposed) sparse conv: produce features AT the coords of
    ``target`` (the pre-downsample tensor) from the downsampled ``st`` —
    spconv's SparseInverseConv3d with a shared indice_key
    (spconv_backbone.py post_act_block conv_type='inverseconv').

    out(p) = sum_k W[k] * in((p + pad - k) / stride)   [when divisible]
    """
    ks = _as3(kernel_size)
    k = ks[0] * ks[1] * ks[2]
    cin = st.features.shape[-1]
    assert weight.shape[0] == k, (weight.shape, ks)
    sz, sy, sx = _as3(stride)
    pz, py, px = _as3(padding)

    offs = _offsets(ks)                                   # (K, 3)
    strides = jnp.asarray([sz, sy, sx], jnp.int32)
    pads = jnp.asarray([pz, py, px], jnp.int32)
    zyx = target.coords[:, 1:4]
    num = zyx[:, None, :] + pads - offs[None]             # (V, K, 3)
    divisible = jnp.all(num % strides == 0, axis=-1)
    q_zyx = num // strides
    nz, ny, nx = st.spatial_shape
    dims = jnp.asarray([nz, ny, nx], jnp.int32)
    inb = jnp.all((q_zyx >= 0) & (q_zyx < dims), axis=-1) & divisible

    b = target.coords[:, 0:1]
    q = ((b * nz + q_zyx[..., 0]) * ny + q_zyx[..., 1]) * nx + q_zyx[..., 2]
    big = jnp.int32(np.iinfo(np.int32).max)
    q = jnp.where(inb & target.mask[:, None], q.astype(jnp.int32), big)

    in_keys = linear_key(st.coords, st.spatial_shape, st.mask)
    idx, found = _lookup(in_keys, q.reshape(-1))
    gathered = jnp.where(found[:, None], st.features[idx], 0.0)
    gathered = gathered.reshape(-1, k * cin)
    feats = jnp.matmul(gathered, weight.reshape(k * cin, -1),
                       preferred_element_type=jnp.float32)
    feats = jnp.where(target.mask[:, None], feats, 0.0)
    return target._replace(features=feats)

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


def _lookup(keys_sorted: jax.Array, queries: jax.Array,
            key_space: int | None = None) -> tuple[jax.Array, jax.Array]:
    """(M,) queries into (N,) ascending keys -> (row index, found mask).

    Two lowerings of the same lookup:
      * ``key_space`` given and affordable — build a dense key->row map
        with ONE N-row scatter, then each query is a single gather.
        The searchsorted path was the round-2 bottleneck (log N sequential
        compare passes per query; 9.7M queries x 19 gathers ~ 1.4 s per
        conv at capacity); the map path replaces every binary search with
        one HBM read.
      * fallback — jnp.searchsorted binary search.

    The BIG padding sentinel never counts as found — otherwise invalid
    queries "hit" the first padded row and autodiff leaks gradient into
    it.
    """
    big = jnp.int32(_BIG)
    if key_space is not None and key_space <= _DENSE_MAP_MAX_SPACE:
        n = keys_sorted.shape[0]
        kvalid = keys_sorted < big
        safe = jnp.where(kvalid, keys_sorted, key_space)
        dmap = jnp.full((key_space + 1,), -1, jnp.int32).at[safe].max(
            jnp.where(kvalid, jnp.arange(n, dtype=jnp.int32), -1))
        q = jnp.where(queries == big, key_space,
                      jnp.clip(queries, 0, key_space))
        idx = dmap[q]
        found = (idx >= 0) & (queries != big)
        return jnp.maximum(idx, 0), found
    idx = jnp.searchsorted(keys_sorted, queries)
    idx_c = jnp.clip(idx, 0, keys_sorted.shape[0] - 1)
    found = (keys_sorted[idx_c] == queries) & (queries != big)
    return idx_c, found


_BIG = np.iinfo(np.int32).max

# dense key->row maps above this key-space size fall back to searchsorted
# (the map is int32: 1<<24 keys = 67 MB, transient)
_DENSE_MAP_MAX_SPACE = 1 << 24


def _key_space(spatial_shape, batch_size: int) -> int:
    nz, ny, nx = spatial_shape
    return int(batch_size) * int(nz) * int(ny) * int(nx)


def _conv_queries(coords, valid, offs, stride, pad, src_shape) -> jax.Array:
    """Query keys for y(p) = sum_k W[k] x(p*stride - pad + off_k):
    (V, K) int32 keys into the source key space, BIG where invalid."""
    stride = jnp.asarray(_as3(stride), jnp.int32)
    pad = jnp.asarray(_as3(pad), jnp.int32)
    zyx = coords[:, 1:4]
    t = zyx[:, None, :] * stride - pad + offs[None]           # (V, K, 3)
    nz, ny, nx = src_shape
    dims = jnp.asarray([nz, ny, nx], jnp.int32)
    inb = jnp.all((t >= 0) & (t < dims), axis=-1)
    b = coords[:, 0:1]
    q = ((b * nz + t[..., 0]) * ny + t[..., 1]) * nx + t[..., 2]
    return jnp.where(inb & valid[:, None], q.astype(jnp.int32),
                     jnp.int32(_BIG))


def _invconv_queries(coords, valid, offs, stride, pad, src_shape) -> jax.Array:
    """Query keys for y(p) = sum_k W[k] x((p + pad - off_k) / stride)
    [divisibility-masked] — the inverse-conv gather, and the input-gradient
    gather of the strided conv."""
    stride = jnp.asarray(_as3(stride), jnp.int32)
    pad = jnp.asarray(_as3(pad), jnp.int32)
    zyx = coords[:, 1:4]
    num = zyx[:, None, :] + pad - offs[None]                  # (V, K, 3)
    divisible = jnp.all(num % stride == 0, axis=-1)
    t = num // stride
    nz, ny, nx = src_shape
    dims = jnp.asarray([nz, ny, nx], jnp.int32)
    inb = jnp.all((t >= 0) & (t < dims), axis=-1) & divisible
    b = coords[:, 0:1]
    q = ((b * nz + t[..., 0]) * ny + t[..., 1]) * nx + t[..., 2]
    return jnp.where(inb & valid[:, None], q.astype(jnp.int32),
                     jnp.int32(_BIG))


def _gather_matmul(features, weight, q, keys, out_mask, key_space=None):
    """gather rows of ``features`` by looking q up in keys, one MXU GEMM.
    weight (K, Cin, Cout); returns (V, Cout)."""
    k, cin, cout = weight.shape
    idx, found = _lookup(keys, q.reshape(-1), key_space)
    g = jnp.where(found[:, None], features[idx], 0.0).reshape(-1, k * cin)
    y = jnp.matmul(g, weight.reshape(k * cin, cout),
                   preferred_element_type=jnp.float32)
    return jnp.where(out_mask[:, None], y, 0.0)


def _float0_like(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _conv_core(in_space, out_space, features, weight, q_fwd, q_bwd,
               in_keys, out_keys, in_mask, out_mask):
    """Gather-GEMM with a scatter-free backward.

    in_space/out_space: static linear-key-space sizes for the dense-map
    lookup (None -> searchsorted).

    Autodiff of the gather would emit a (V·K)-row duplicate-index
    scatter-add for d(features), which XLA serializes on TPU (measured:
    a flagship-capacity train step at 12 s/step). The input gradient is
    instead ANOTHER gather-GEMM — the transposed conv:
      dx[j] = sum_k W[k]^T dy[p(j, k)]
    where q_bwd[j, k] keys the output position p with input j at tap k.
    dW re-gathers the forward rows: dW = gathered^T dy (one MXU GEMM).
    """
    return _gather_matmul(features, weight, q_fwd, in_keys, out_mask,
                          in_space)


def _conv_core_fwd(in_space, out_space, features, weight, q_fwd, q_bwd,
                   in_keys, out_keys, in_mask, out_mask):
    y = _gather_matmul(features, weight, q_fwd, in_keys, out_mask, in_space)
    return y, (features, weight, q_fwd, q_bwd, in_keys, out_keys,
               in_mask, out_mask)


def _conv_core_bwd(in_space, out_space, res, dy):
    features, weight, q_fwd, q_bwd, in_keys, out_keys, in_mask, out_mask = res
    k, cin, cout = weight.shape
    dy = jnp.where(out_mask[:, None], dy, 0.0)

    # dW = gathered^T dy (rematerialized gather; (K*Cin, Vout)x(Vout, Cout))
    idx, found = _lookup(in_keys, q_fwd.reshape(-1), in_space)
    g = jnp.where(found[:, None], features[idx], 0.0).reshape(-1, k * cin)
    dw = jnp.matmul(g.T, dy, preferred_element_type=jnp.float32)
    dw = dw.reshape(k, cin, cout)

    # dx via the transposed-conv gather (no scatter)
    idx2, found2 = _lookup(out_keys, q_bwd.reshape(-1), out_space)
    gdy = jnp.where(found2[:, None], dy[idx2], 0.0).reshape(-1, k * cout)
    wt = jnp.transpose(weight, (0, 2, 1)).reshape(k * cout, cin)
    dx = jnp.matmul(gdy, wt, preferred_element_type=jnp.float32)
    dx = jnp.where(in_mask[:, None], dx, 0.0)

    return (dx, dw, _float0_like(q_fwd), _float0_like(q_bwd),
            _float0_like(in_keys), _float0_like(out_keys),
            _float0_like(in_mask), _float0_like(out_mask))


_conv_core.defvjp(_conv_core_fwd, _conv_core_bwd)


def _gather_gemm(st: SparseTensor, out_coords: jax.Array, out_mask: jax.Array,
                 weight: jax.Array, kernel_size, stride, padding,
                 in_keys: jax.Array, out_spatial_shape=None,
                 out_keys: jax.Array | None = None) -> jax.Array:
    """Compute y(p) = sum_k W[k] x(p*stride - pad + k) for active outputs."""
    k = weight.shape[0]
    cin = weight.shape[1]
    offs = _offsets(kernel_size)                              # (K, 3)
    w3 = weight.reshape(k, cin, -1)
    q_fwd = _conv_queries(out_coords, out_mask, offs, stride, padding,
                          st.spatial_shape)
    out_spatial_shape = out_spatial_shape or st.spatial_shape
    if out_keys is None:
        out_keys = linear_key(out_coords, out_spatial_shape, out_mask)
    q_bwd = _invconv_queries(st.coords, st.mask, offs, stride, padding,
                             out_spatial_shape)
    return _conv_core(_key_space(st.spatial_shape, st.batch_size),
                      _key_space(out_spatial_shape, st.batch_size),
                      st.features, w3, q_fwd, q_bwd, in_keys, out_keys,
                      st.mask, out_mask)


def subm_conv3d(st: SparseTensor, weight: jax.Array,
                kernel_size=3, padding=1) -> SparseTensor:
    """Submanifold conv: output active set == input active set (SubMConv3d)."""
    ks = _as3(kernel_size)
    assert weight.shape[0] == ks[0] * ks[1] * ks[2], (weight.shape, ks)
    in_keys = linear_key(st.coords, st.spatial_shape, st.mask)
    feats = _gather_gemm(st, st.coords, st.mask, weight, ks, 1, padding,
                         in_keys, out_keys=in_keys)
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

    out_space = _key_space(out_shape, batch_size)
    if out_space <= _DENSE_MAP_MAX_SPACE:
        # sort-free dedupe: scatter candidates onto a dense occupancy
        # plane, then raster-scan the first out_capacity active keys —
        # ascending for free, no (N*K)-element bitonic sort
        ok = ckey < big
        occ = jnp.zeros((out_space + 1,), bool).at[
            jnp.where(ok, ckey, out_space)].max(ok)[:out_space]
        (keyidx,) = jnp.nonzero(occ, size=out_capacity, fill_value=-1)
        out_keys = jnp.where(keyidx >= 0, keyidx, big).astype(jnp.int32)
    else:
        skey = jnp.sort(ckey)
        head = jnp.concatenate([jnp.ones((1,), bool),
                                skey[1:] != skey[:-1]]) & (skey < big)
        rank = jnp.cumsum(head) - 1
        rank = jnp.where(head & (rank < out_capacity), rank, out_capacity)
        out_keys = jnp.full((out_capacity + 1,), big,
                            jnp.int32).at[rank].min(skey)
        out_keys = out_keys[:out_capacity]     # ascending, BIG-padded
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
                         (sz, sy, sx), (pz, py, px), in_keys,
                         out_spatial_shape=out_shape, out_keys=out_keys)
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


class DenseTensor(NamedTuple):
    """Dense-masked execution form of a SparseTensor: padded positions hold
    zeros and ``occ`` marks the active set. At point-cloud densities
    (~0.5-5% of the voxel grid) TPUs run the SAME submanifold/strided conv
    math orders of magnitude faster as masked dense conv3d on the MXU than
    as rulebook gathers (measured: jnp.searchsorted lookups alone cost
    ~1.4 s per conv at 360k voxels x 27 taps; dense conv3d is ~2 ms)."""
    features: jax.Array       # (B, nz, ny, nx, C), zero outside occ
    occ: jax.Array            # (B, nz, ny, nx) bool


def to_dense_tensor(st: SparseTensor) -> DenseTensor:
    nz, ny, nx = st.spatial_shape
    occ = jnp.zeros((st.batch_size, nz, ny, nx), bool)
    b, z, y, x = (jnp.where(st.mask, st.coords[:, i], 0) for i in range(4))
    occ = occ.at[b, z, y, x].max(st.mask)
    return DenseTensor(to_dense(st), occ)


def _dense_conv(x: jax.Array, w: jax.Array, stride, pad,
                impl: str) -> jax.Array:
    """Masked-dense conv kernels, two lowerings of identical math:

    * ``conv3d`` — one NDHWC conv3d. Fastest FORWARD on the measured chip
      (42.7 ms stage-1 conv; the 2D decomposition measures 1.5x slower fwd
      due to pad/slice materialization). BUT its backward materializes
      transposed copies with a pathological {C-minor, B-sublane} layout —
      16x padding expansion, two 7.5 GB temps at eval capacity.
    * ``2d`` — kz z-shifted conv2d calls (z folded into the batch dim).
      Standard conv2d backward layouts; the training-time choice.
    """
    b, z, yy, xx, cin = x.shape
    kz = w.shape[0]
    sz, sy, sx = stride
    pz, py, px = pad
    # output dtype follows the input dtype (MXU still accumulates f32);
    # a forced f32 preferred_element_type breaks the filter-gradient
    # transpose rule under bf16 activations (cotangent/operand mismatch)
    if impl == "conv3d":
        return jax.lax.conv_general_dilated(
            x, w, window_strides=stride, padding=[(p, p) for p in pad],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    # one conv2d over ALL z planes per z-tap, then combine with z-shifted
    # output slices: out[zo] = sum_dz conv2d(x, w[dz])[zo*sz - pz + dz].
    # No full-tensor jnp.pad — input z-padding materializes 4.6x-padded
    # layouts in the backward (measured OOM).
    zo = (z + 2 * pz - kz) // sz + 1
    planes = x.reshape(b * z, yy, xx, cin)
    out = None
    for dz in range(kz):
        y2 = jax.lax.conv_general_dilated(
            planes, w[dz], window_strides=(sy, sx),
            padding=[(py, py), (px, px)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y2 = y2.reshape(b, z, y2.shape[1], y2.shape[2], -1)
        # z-plane index of the contribution to output zo: zi = zo*sz - pz + dz
        zi0 = -pz + dz                       # zi at zo = 0
        # valid zo range: 0 <= zi < z
        lo = max(0, -(zi0 // sz) if zi0 < 0 else 0)
        while lo * sz + zi0 < 0:
            lo += 1
        hi = zo
        while hi > 0 and (hi - 1) * sz + zi0 >= z:
            hi -= 1
        if lo >= hi:
            continue
        sl = jax.lax.slice_in_dim(y2, lo * sz + zi0,
                                  (hi - 1) * sz + zi0 + 1, sz, axis=1)
        pad_cfg = ((0, 0), (lo, zo - hi), (0, 0), (0, 0), (0, 0))
        contrib = jnp.pad(sl, pad_cfg)
        out = contrib if out is None else out + contrib
    return out


def dense_subm_conv3d(dt: DenseTensor, weight: jax.Array,
                      kernel_size=3, padding=1,
                      impl: str = "conv3d") -> DenseTensor:
    """Submanifold conv, dense-masked: conv then restrict to the active
    set. Numerically identical to subm_conv3d — inactive inputs are zero so
    they contribute nothing, and the output mask IS the submanifold rule."""
    ks = _as3(kernel_size)
    pad = _as3(padding)
    cin = dt.features.shape[-1]
    w = weight.reshape(*ks, cin, -1).astype(dt.features.dtype)
    y = _dense_conv(dt.features, w, (1, 1, 1), pad, impl)
    return DenseTensor(y * dt.occ[..., None].astype(y.dtype), dt.occ)


def dense_sparse_conv3d(dt: DenseTensor, weight: jax.Array, kernel_size=3,
                        stride=1, padding=0,
                        impl: str = "conv3d") -> DenseTensor:
    """Strided conv, dense-masked: the output active set is every position
    whose window touches an active input (spconv SparseConv3d semantics —
    and unlike the fixed-capacity sparse path, nothing is ever truncated)."""
    ks = _as3(kernel_size)
    st3 = _as3(stride)
    pad = _as3(padding)
    cin = dt.features.shape[-1]
    w = weight.reshape(*ks, cin, -1).astype(dt.features.dtype)
    y = _dense_conv(dt.features, w, st3, pad, impl)
    occ = jax.lax.reduce_window(
        dt.occ, False, jax.lax.bitwise_or,
        window_dimensions=(1,) + ks, window_strides=(1,) + st3,
        padding=[(0, 0)] + [(p, p) for p in pad])
    return DenseTensor(y * occ[..., None].astype(y.dtype), occ)


class ZFoldTensor(NamedTuple):
    """Dense-masked tensor with z folded into channels: features
    (B, Y, X, Z*C) with z-major channel blocks, occ (B, Y, X, Z).

    On the measured chip, conv3d at C=16 wastes 7/8 of the 128-wide lanes;
    folding z turns the 3D conv into a single 2D conv with a block-banded
    (Zin*Cin, Zout*Cout) channel matrix — measured 25.5 ms vs 42.7 ms for
    the stage-1 conv. The z taps become matrix structure:
      W2[ky, kx, zi*Cin + ci, zo*Cout + co] = W[dz, ky, kx, ci, co]
      where zi = zo*stride_z - pad_z + dz.
    """
    features: jax.Array
    occ: jax.Array
    z: int                      # static z extent
    channels: int               # static true channel count


# z/channels must stay STATIC under jit/remat (they size parameter shapes),
# so register them as pytree aux data instead of leaves
jax.tree_util.register_pytree_node(
    ZFoldTensor,
    lambda t: ((t.features, t.occ), (t.z, t.channels)),
    lambda aux, ch: ZFoldTensor(ch[0], ch[1], aux[0], aux[1]))


def to_zfold_tensor(st: SparseTensor, dtype=jnp.float32) -> ZFoldTensor:
    dt = to_dense_tensor(st)
    b, z, yy, xx, c = dt.features.shape
    feats = jnp.transpose(dt.features, (0, 2, 3, 1, 4)).reshape(
        b, yy, xx, z * c).astype(dtype)
    occ = jnp.transpose(dt.occ, (0, 2, 3, 1))
    return ZFoldTensor(feats, occ, z, c)


def _zfold_weight(weight: jax.Array, kz: int, zin: int, zout: int,
                  sz: int, pz: int):
    """(K, Cin, Cout) rulebook weight -> banded (ky, kx, Zin*Cin, Zout*Cout)
    + the (Zout, Zin) z-adjacency used for occupancy propagation."""
    k, cin, cout = weight.shape
    ky = kx = int(round((k // kz) ** 0.5))
    w5 = weight.reshape(kz, ky, kx, cin, cout)
    sel = np.zeros((zout, kz, zin), np.float32)
    for zo in range(zout):
        for dz in range(kz):
            zi = zo * sz - pz + dz
            if 0 <= zi < zin:
                sel[zo, dz, zi] = 1.0
    s = jnp.asarray(sel)
    # W2[a, b, (zi, ci), (zo, co)] = sum_dz sel[zo, dz, zi] w5[dz, a, b, ci, co]
    w2 = jnp.einsum("zdi,dabco->abiczo", s, w5, precision="highest")
    w2 = w2.reshape(ky, kx, zin * cin, zout * cout)
    zadj = jnp.asarray((sel.sum(axis=1) > 0).astype(np.float32))  # (Zout, Zin)
    return w2, zadj


def _zgroup_weight(weight: jax.Array, kz: int, G: int, sz: int):
    """(K, Cin, Cout) rulebook weight -> (ky, kx, S*Cin, G*Cout) slab
    weight shared by every z-group, S = (G-1)*sz + kz slab planes.

    Local mapping: output plane l (0..G-1) of a group reads slab planes
    l*sz + dz, dz in 0..kz-1 (the slab starts at global z g*G*sz - pz, so
    the pad offset cancels out of the local index).
    """
    k, cin, cout = weight.shape
    ky = kx = int(round((k // kz) ** 0.5))
    s = (G - 1) * sz + kz
    sel = np.zeros((G, kz, s), np.float32)
    for l in range(G):
        for dz in range(kz):
            sel[l, dz, l * sz + dz] = 1.0
    w5j = weight.reshape(kz, ky, kx, cin, cout)
    w2 = jnp.einsum("lds,dabco->absclo", jnp.asarray(sel), w5j,
                    precision="highest")
    return w2.reshape(ky, kx, s * cin, G * cout), s


def _zgroup_pick(zin: int, zout: int, cout: int, kz: int, sz: int):
    """Group size G for impl='zgroup' (targets G*Cout ~ 128 output
    lanes). MEASURED (v5e, bf16, reference eval shapes): despite the
    ~2-3x structural-FLOP saving, zgroup LOSES to the full band at every
    backbone signature except conv4_down (35.6 vs 29.0 ms stage-1 subm;
    23.0 vs 14.7 conv2_down; 13.2 vs 9.8 stage-2) — the single big
    (Zin*Cin -> Zout*Cout) conv2d runs at ~65 TFLOP/s bf16 while the
    slab-batched form pays the slab stack + output transpose and tiles
    worse. 'auto' therefore always picks the band; 'zgroup' stays for
    shapes where slabs win (deep z, wide C)."""
    G = max(1, min(128 // max(cout, 1), zout))
    del zin, kz, sz
    return G


def _zblock_blocks(zin: int, zout: int, cout: int, kz: int, sz: int,
                   pz: int, g: int | None = None):
    """Contiguous output-z blocks for impl='zblock' and each block's input
    z band: [(zo0, zo1, zi_lo, zi_hi), ...]. Block size targets G*Cout ~
    128 output lanes (full MXU width per block)."""
    if g is None:
        g = max(1, 128 // max(cout, 1))
    blocks = []
    for zo0 in range(0, zout, g):
        zo1 = min(zo0 + g, zout)
        zi_lo = max(0, zo0 * sz - pz)
        zi_hi = min(zin, (zo1 - 1) * sz - pz + kz)
        blocks.append((zo0, zo1, zi_lo, zi_hi))
    return blocks


def zfold_conv(zt: ZFoldTensor, weight: jax.Array, out_channels: int,
               kernel_size=3, stride=1, padding=0,
               subm: bool = False, impl: str = "auto",
               zblock_g: int | None = None) -> ZFoldTensor:
    """Sub-manifold or strided conv on the z-folded layout.

    impl='band': ONE conv2d with the full (Zin*Cin, Zout*Cout) banded
    channel matrix — ~Zin/kz structural-zero overhead. impl='zgroup':
    batch z into groups of G output planes (G*Cout ~ 128 lanes), each
    group a conv2d over its (G-1)*sz+kz-plane input slab — the slab
    weight is shared so all groups run as one conv2d with batch
    B*ngroups; structural overhead drops to S/(G*... ~ kz/sz per plane.
    impl='zblock': same G-plane output blocks but as SEPARATE conv2ds,
    each slicing only its banded input-channel range from the canvas and
    its (band, G*Cout) sub-matrix from the banded weight — none of
    zgroup's slab-stack copies or output transposes, structural zeros cut
    to ~(G*sz+kz)/(G*kz) per block.
    'auto' picks by a MEASURED table (v5e, bf16, reference eval shapes,
    scripts/profile_zconv_impls.py): zblock wins the deep-z submanifold
    convs (stage-1 subm 26.7 vs 30.7 ms, stage-2 subm 8.9 vs 14.0) and
    ties or loses elsewhere (small-cin input conv, strided downs) where
    the single banded conv2d's better tiling beats the FLOP saving.
    """
    ks = _as3(kernel_size)
    sz, sy, sx = (1, 1, 1) if subm else _as3(stride)
    pz, py, px = _as3(padding)
    zin = zt.z
    zout = zin if subm else (zin + 2 * pz - ks[0]) // sz + 1
    cin = zt.channels
    if impl == "auto" and subm and cin >= 16 and zin >= 14:
        impl = "zblock"
    if impl == "zblock":
        w2, zadj = _zfold_weight(weight, ks[0], zin, zout, sz, pz)
        w2 = w2.astype(zt.features.dtype)
        cout = out_channels
        ys = []
        for zo0, zo1, zi_lo, zi_hi in _zblock_blocks(
                zin, zout, cout, ks[0], sz, pz, g=zblock_g):
            ys.append(jax.lax.conv_general_dilated(
                zt.features[..., zi_lo * cin:zi_hi * cin],
                w2[:, :, zi_lo * cin:zi_hi * cin, zo0 * cout:zo1 * cout],
                window_strides=(sy, sx), padding=[(py, py), (px, px)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
        y = jnp.concatenate(ys, axis=-1) if len(ys) > 1 else ys[0]
        return _zfold_finish(zt, y, zadj, ks, sy, sx, py, px, zout,
                             out_channels, subm)
    G = None if impl in ("auto", "band") else \
        _zgroup_pick(zin, zout, out_channels, ks[0], sz)
    if G is not None:
        b, yy, xx, _ = zt.features.shape
        ngroups = -(-zout // G)
        w2g, s = _zgroup_weight(weight, ks[0], G, sz)
        # slab g covers global planes [g*G*sz - pz, g*G*sz - pz + s)
        front = pz
        back = (ngroups - 1) * G * sz - pz + s - zin
        f = jnp.pad(zt.features, ((0, 0), (0, 0), (0, 0),
                                  (front * cin, max(back, 0) * cin)))
        slabs = jnp.stack([f[..., g * G * sz * cin:
                             (g * G * sz + s) * cin]
                           for g in range(ngroups)], axis=1)
        y = jax.lax.conv_general_dilated(
            slabs.reshape(b * ngroups, yy, xx, s * cin),
            w2g.astype(zt.features.dtype), window_strides=(sy, sx),
            padding=[(py, py), (px, px)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        oy, ox = y.shape[1], y.shape[2]
        y = y.reshape(b, ngroups, oy, ox, G * out_channels)
        y = jnp.transpose(y, (0, 2, 3, 1, 4)).reshape(
            b, oy, ox, ngroups * G * out_channels)[..., :zout * out_channels]
        _, zadj = _zfold_weight(weight, ks[0], zin, zout, sz, pz)
    else:
        w2, zadj = _zfold_weight(weight, ks[0], zin, zout, sz, pz)
        y = jax.lax.conv_general_dilated(
            zt.features, w2.astype(zt.features.dtype),
            window_strides=(sy, sx), padding=[(py, py), (px, px)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return _zfold_finish(zt, y, zadj, ks, sy, sx, py, px, zout,
                         out_channels, subm)


def _zfold_finish(zt: ZFoldTensor, y: jax.Array, zadj: jax.Array, ks,
                  sy: int, sx: int, py: int, px: int, zout: int,
                  out_channels: int, subm: bool) -> ZFoldTensor:
    """Shared zfold_conv tail: occupancy propagation + output masking."""
    if subm:
        occ = zt.occ
    else:
        spat = jax.lax.reduce_window(
            zt.occ, False, jax.lax.bitwise_or,
            window_dimensions=(1, ks[1], ks[2], 1),
            window_strides=(1, sy, sx, 1),
            padding=[(0, 0), (py, py), (px, px), (0, 0)])
        occ = jnp.einsum("byxi,zi->byxz", spat.astype(jnp.float32),
                         zadj) > 0
    b, yy, xx, _ = y.shape
    y = y.reshape(b, yy, xx, zout, out_channels) * \
        occ[..., None].astype(y.dtype)
    return ZFoldTensor(y.reshape(b, yy, xx, zout * out_channels), occ,
                       zout, out_channels)


class ColTensor(NamedTuple):
    """Active-BEV-column execution form: features live in a compact
    (M, Z*C) buffer holding only OCCUPIED BEV columns (z-major channel
    blocks, like ZFoldTensor), plus a dense (B, ny, nx) int32 map from BEV
    position to column row (-1 where empty) for neighbor lookup.

    Why: at the reference eval budget (90k voxels over a 704x800 BEV,
    sc_kitti_dataset.yaml:31-37) only ~15% of BEV columns are occupied, but
    the occupancy is spatially scattered — 16x16 tiles are ~100% touched —
    so tile-level skipping buys nothing while COLUMN-level gather-GEMM cuts
    stage-1 conv FLOPs ~6.7x. Submanifold convs keep the active set fixed
    (spconv SubMConv3d semantics), so a whole subm stage runs in this
    layout with one neighbor map.
    """
    features: jax.Array       # (M, Z*C)
    zocc: jax.Array           # (M, Z) bool per-column z occupancy
    coords: jax.Array         # (M, 3) int32 [b, y, x]
    mask: jax.Array           # (M,) bool valid column
    colmap: jax.Array         # (B, ny, nx) int32 row index, -1 empty
    z: int
    channels: int


jax.tree_util.register_pytree_node(
    ColTensor,
    lambda t: ((t.features, t.zocc, t.coords, t.mask, t.colmap),
               (t.z, t.channels)),
    lambda aux, ch: ColTensor(*ch, aux[0], aux[1]))


def to_col_tensor(st: SparseTensor, capacity: int | None = None) -> ColTensor:
    """SparseTensor -> compact column buffer, SORT-FREE.

    Column ranks come from a cumsum over the dense BEV occupancy plane in
    raster order (b, y, x) — a 563k-element scan instead of a 90k argsort
    (XLA's TPU sort is bitonic and cost ~16 ms here; the scan is ~1 ms).
    capacity defaults to the voxel capacity (a column needs >=1 voxel, so
    n_cols <= n_voxels and nothing is ever truncated at that bound).
    """
    nz, ny, nx = st.spatial_shape
    n, c = st.features.shape
    m = int(capacity or n)
    assert st.batch_size * ny * nx < _BIG
    flat2d = (st.coords[:, 0] * ny + st.coords[:, 2]) * nx + st.coords[:, 3]
    flat2d = jnp.where(st.mask, flat2d, 0)
    occ2d = jnp.zeros((st.batch_size * ny * nx,), bool).at[flat2d].max(st.mask)
    ranks2d = jnp.cumsum(occ2d.astype(jnp.int32)) - 1    # rank in raster order
    # overflow columns (rank >= m, only possible with an explicit small
    # capacity) must map to -1/empty — aliasing them onto row m-1 would
    # make neighbor gathers read a DIFFERENT column's features
    colmap = jnp.where(occ2d & (ranks2d < m), ranks2d, -1).reshape(
        st.batch_size, ny, nx)

    rank = jnp.where(st.mask, ranks2d[flat2d], m)        # (N,) per voxel row
    overflow = rank >= m
    rank = jnp.where(overflow, m, rank)
    z_s = jnp.where(st.mask, st.coords[:, 1], 0)
    flat = jnp.where(rank < m, rank * nz + z_s, m * nz)
    # (rank, z) pairs are unique across valid rows -> dup-free scatters
    col_feats = jnp.zeros((m * nz + 1, c), st.features.dtype).at[flat].add(
        jnp.where((rank < m)[:, None], st.features, 0.0),
        mode="drop")[:m * nz]
    zocc = jnp.zeros((m * nz + 1,), bool).at[flat].max(
        rank < m)[:m * nz].reshape(m, nz)
    byx = jnp.stack([st.coords[:, 0], st.coords[:, 2], st.coords[:, 3]],
                    axis=1)
    ccoords = jnp.full((m + 1, 3), -1, jnp.int32).at[rank].max(
        jnp.where((rank < m)[:, None], byx, -1))[:m]
    cmask = ccoords[:, 0] >= 0
    ccoords = jnp.maximum(ccoords, 0).astype(jnp.int32)
    return ColTensor(col_feats.reshape(m, nz * c), zocc, ccoords, cmask,
                     colmap, nz, c)


def _col_neighbors(ct: ColTensor, ky: int, kx: int, py: int, px: int):
    """(M, ky*kx) row indices of each column's spatial neighbors, -1 miss."""
    _, ny, nx = ct.colmap.shape
    dy, dx = np.meshgrid(np.arange(ky) - py, np.arange(kx) - px,
                         indexing="ij")
    offs = jnp.asarray(np.stack([dy.ravel(), dx.ravel()], 1), jnp.int32)
    yy = ct.coords[:, 1:2] + offs[None, :, 0]              # (M, K2)
    xx = ct.coords[:, 2:3] + offs[None, :, 1]
    inb = (yy >= 0) & (yy < ny) & (xx >= 0) & (xx < nx) & ct.mask[:, None]
    nbr = ct.colmap[ct.coords[:, 0:1],
                    jnp.clip(yy, 0, ny - 1), jnp.clip(xx, 0, nx - 1)]
    return jnp.where(inb, nbr, -1)


@jax.custom_vjp
def _col_conv_core(features, w2flat, nbr):
    """y[m] = concat_tap(x[nbr[m, tap]]) @ w2flat, misses gather zeros.

    Scatter-free custom VJP: autodiff of the gather would emit an (M*K2)-row
    duplicate-index scatter-add for dx (serialized on TPU — the round-2
    rulebook lesson); instead dx is ANOTHER neighbor gather with flipped
    taps, exploiting that for symmetric subm stencils
    nbr_flip(t)[m] = nbr[8 - t][m].
    """
    return _col_conv_fwd_impl(features, w2flat, nbr)


def _col_conv_fwd_impl(features, w2flat, nbr):
    m, zc = features.shape
    k2 = nbr.shape[1]
    g = jnp.where((nbr >= 0)[..., None],
                  features[jnp.clip(nbr, 0, m - 1)], 0.0)
    return jnp.matmul(g.reshape(m, k2 * zc), w2flat,
                      preferred_element_type=features.dtype)


def _col_conv_fwd(features, w2flat, nbr):
    return _col_conv_fwd_impl(features, w2flat, nbr), (features, w2flat, nbr)


def _col_conv_bwd(res, dy):
    features, w2flat, nbr = res
    m, zc = features.shape
    k2 = nbr.shape[1]
    zco = dy.shape[1]
    # dW = g^T dy (rematerialized gather)
    g = jnp.where((nbr >= 0)[..., None],
                  features[jnp.clip(nbr, 0, m - 1)], 0.0)
    dw = jnp.matmul(g.reshape(m, k2 * zc).T, dy,
                    preferred_element_type=jnp.float32).astype(w2flat.dtype)
    # dx[j] = sum_t W[t]^T dy[nbr[j, K2-1-t]] (flipped-stencil gather)
    nbr_f = nbr[:, ::-1]
    gdy = jnp.where((nbr_f >= 0)[..., None],
                    dy[jnp.clip(nbr_f, 0, m - 1)], 0.0)
    wt = jnp.transpose(w2flat.reshape(k2, zc, zco), (0, 2, 1)).reshape(
        k2 * zco, zc)
    dx = jnp.matmul(gdy.reshape(m, k2 * zco), wt,
                    preferred_element_type=jnp.float32).astype(features.dtype)
    return dx, dw, np.zeros(nbr.shape, dtype=jax.dtypes.float0)


_col_conv_core.defvjp(_col_conv_fwd, _col_conv_bwd)


def _zdec_combine(y3):
    """(M, Z, 3, C) per-(z, dz) partials -> (M, Z, C):
    y[zo] = y3[zo-1, 0] + y3[zo, 1] + y3[zo+1, 2] (kz=3, pz=1)."""
    y = y3[:, :, 1]
    y = y + jnp.pad(y3[:, :-1, 0], ((0, 0), (1, 0), (0, 0)))
    y = y + jnp.pad(y3[:, 1:, 2], ((0, 0), (0, 1), (0, 0)))
    return y


def _col_zdec_impl(features, w2, nbr):
    """Forward of the z-decomposed column conv: gather 9 spatial
    neighbors, ONE (M*Z, 9*Cin) x (9*Cin, 3*Cout) GEMM, then combine the
    three z-shifted partial sums. Identical math to the banded
    (Z*Cin, Z*Cout) formulation but without its (Z-kz)/Z structural-zero
    FLOPs (~9x at Z=27, kz=3)."""
    m, zc = features.shape
    cin = w2.shape[0] // 9
    z = zc // cin
    cout = w2.shape[1] // 3
    g = jnp.where((nbr >= 0)[..., None],
                  features[jnp.clip(nbr, 0, m - 1)], 0.0)     # (M, 9, Z*C)
    g = g.reshape(m, 9, z, cin).transpose(0, 2, 1, 3).reshape(
        m * z, 9 * cin)
    y3 = jnp.matmul(g, w2, preferred_element_type=features.dtype)
    y3 = y3.reshape(m, z, 3, cout)
    return _zdec_combine(y3).reshape(m, z * cout)


@jax.custom_vjp
def _col_zdec_core(features, w2, nbr):
    return _col_zdec_impl(features, w2, nbr)


def _col_zdec_fwd(features, w2, nbr):
    return _col_zdec_impl(features, w2, nbr), (features, w2, nbr)


def _col_zdec_bwd(res, dy):
    features, w2, nbr = res
    m, zc = features.shape
    cin = w2.shape[0] // 9
    z = zc // cin
    cout = w2.shape[1] // 3
    dy = dy.reshape(m, z, cout)

    # dy3[z, dz] = dy[z + 1 - dz] (adjoint of _zdec_combine)
    dy3 = jnp.stack([
        jnp.pad(dy[:, 1:], ((0, 0), (0, 1), (0, 0))),         # dz=0
        dy,                                                   # dz=1
        jnp.pad(dy[:, :-1], ((0, 0), (1, 0), (0, 0))),        # dz=2
    ], axis=2)                                                # (M, Z, 3, Co)

    # dW2 = G^T dY3 (gather rematerialized)
    g = jnp.where((nbr >= 0)[..., None],
                  features[jnp.clip(nbr, 0, m - 1)], 0.0)
    g = g.reshape(m, 9, z, cin).transpose(0, 2, 1, 3).reshape(
        m * z, 9 * cin)
    dw2 = jnp.matmul(g.T, dy3.reshape(m * z, 3 * cout),
                     preferred_element_type=jnp.float32).astype(w2.dtype)

    # dx = conv of dy with the flipped-transposed stencil (flip spatial
    # taps AND dz inside W', swap cin/cout); the symmetric-stencil
    # identity {m : nbr[m, t] = j} = {nbr[j, 8-t]} folds the neighbor
    # flip into the already-flipped W', so the gather uses nbr as-is
    w4 = w2.reshape(9, cin, 3, cout)
    w2t = w4[::-1, :, ::-1, :].transpose(0, 3, 2, 1).reshape(
        9 * cout, 3 * cin)
    dx = _col_zdec_impl(dy.reshape(m, z * cout).astype(features.dtype),
                        w2t.astype(features.dtype), nbr)
    return dx, dw2, np.zeros(nbr.shape, dtype=jax.dtypes.float0)


_col_zdec_core.defvjp(_col_zdec_fwd, _col_zdec_bwd)


def col_subm_conv(ct: ColTensor, weight: jax.Array, out_channels: int,
                  kernel_size=3, padding=1, impl: str = "banded") -> ColTensor:
    """Submanifold conv in the active-column layout: output active set ==
    input active set (3D voxels), so zocc and the neighbor map carry over.
    Numerically identical to subm_conv3d / zfold_conv(subm=True).

    impl='zdec' decomposes z out of the GEMM for the (3,3,3)/pad-1
    stencil — only the true sparse-conv FLOPs instead of the banded
    matrix's ~(Z-kz)/Z structural zeros. MEASURED SLOWER on the target
    chip (stage-1 pair 99.5 ms vs 47.7 ms banded at eval capacity): the
    (M, 9, Z, 16)->(M, Z, 9*16) transpose and the N=48-lane GEMM lose
    more to layout passes at C=16 than the 9x structural zeros cost on
    the fully-utilized banded GEMM. Kept for larger-C shapes; 'banded' is
    the default."""
    ks = _as3(kernel_size)
    pz, py, px = _as3(padding)
    # the custom VJPs compute the input gradient via the FLIPPED tap map
    # (nbr[:, ::-1]), which is the true transpose only for odd, centered
    # stencils — reject anything else rather than return silently wrong
    # gradients
    assert ks[1] % 2 == 1 and ks[2] % 2 == 1 and \
        py == (ks[1] - 1) // 2 and px == (ks[2] - 1) // 2, \
        f"col_subm_conv needs an odd centered (ky, kx) stencil, got " \
        f"kernel={ks} padding={(pz, py, px)}"
    nbr = _col_neighbors(ct, ks[1], ks[2], py, px)
    if impl == "zdec" and ks == (3, 3, 3) and (pz, py, px) == (1, 1, 1):
        k, cin, cout = weight.shape
        # W2[tap*Cin+ci, dz*Cout+co] = weight[dz*9 + tap, ci, co]
        # (z-major tap order per _offsets)
        w2 = weight.reshape(3, 9, cin, cout).transpose(1, 2, 0, 3).reshape(
            9 * cin, 3 * cout).astype(ct.features.dtype)
        y = _col_zdec_core(ct.features, w2, nbr)
    else:
        w2, _ = _zfold_weight(weight, ks[0], ct.z, ct.z, 1, pz)
        w2flat = w2.reshape(ks[1] * ks[2] * ct.z * ct.channels,
                            ct.z * out_channels).astype(ct.features.dtype)
        y = _col_conv_core(ct.features, w2flat, nbr)
    m = y.shape[0]
    y = y.reshape(m, ct.z, out_channels) * ct.zocc[..., None].astype(y.dtype)
    return ct._replace(features=y.reshape(m, ct.z * out_channels),
                       channels=out_channels)


def col_to_zfold(ct: ColTensor) -> ZFoldTensor:
    """Scatter the compact columns back onto the dense BEV plane."""
    b, ny, nx = ct.colmap.shape
    zc = ct.features.shape[1]
    feats = jnp.zeros((b, ny, nx, zc), ct.features.dtype)
    bb = jnp.where(ct.mask, ct.coords[:, 0], 0)
    yy = jnp.where(ct.mask, ct.coords[:, 1], 0)
    xx = jnp.where(ct.mask, ct.coords[:, 2], 0)
    src = jnp.where(ct.mask[:, None], ct.features, 0.0)
    feats = feats.at[bb, yy, xx].add(src)      # unique rows: add == set
    occ = jnp.zeros((b, ny, nx, ct.z), bool)
    occ = occ.at[bb, yy, xx].max(ct.zocc & ct.mask[:, None])
    return ZFoldTensor(feats, occ, ct.z, ct.channels)


def zfold_to_sparse(zt: ZFoldTensor, batch_size: int,
                    capacity: int) -> SparseTensor:
    """Extract the active voxels of a zfold tensor into a fixed-capacity,
    key-sorted SparseTensor — the bridge that lets multi-scale consumers
    (PV-RCNN VSA, ROI grid pooling, UNet decoders) read voxel coords off
    the FAST dense-execution backbone instead of forcing the whole
    backbone onto the rulebook path (VERDICT r2 #3).

    Rows come out sorted by the z-major linear key ((b*nz+z)*ny+y)*nx+x
    (the SparseTensor invariant) because occupancy is scanned in that
    transpose order.
    """
    b, yy, xx, zc = zt.features.shape
    z, c = zt.z, zt.channels
    # (B, Z, Y, X) flat order == ascending linear key order
    occ_t = jnp.transpose(zt.occ, (0, 3, 1, 2)).reshape(-1)
    (flat_idx,) = jnp.nonzero(occ_t, size=capacity, fill_value=-1)
    valid = flat_idx >= 0
    fi = jnp.maximum(flat_idx, 0)
    xi = fi % xx
    rem = fi // xx
    yi = rem % yy
    rem = rem // yy
    zi = rem % z
    bi = rem // z
    coords = jnp.stack([bi, zi, yi, xi], axis=1).astype(jnp.int32)
    f5 = zt.features.reshape(b, yy, xx, z, c)
    feats = f5[bi, yi, xi, zi]
    feats = jnp.where(valid[:, None], feats, 0.0)
    return SparseTensor(feats, jnp.where(valid[:, None], coords, 0), valid,
                        (z, yy, xx), batch_size)


def dense_to_sparse(dt: DenseTensor, capacity: int) -> SparseTensor:
    """DenseTensor -> fixed-capacity key-sorted SparseTensor (see
    zfold_to_sparse)."""
    b, nz, ny, nx, c = dt.features.shape
    occ_flat = dt.occ.reshape(-1)          # (B, Z, Y, X) already key order
    (flat_idx,) = jnp.nonzero(occ_flat, size=capacity, fill_value=-1)
    valid = flat_idx >= 0
    fi = jnp.maximum(flat_idx, 0)
    xi = fi % nx
    rem = fi // nx
    yi = rem % ny
    rem = rem // ny
    zi = rem % nz
    bi = rem // nz
    coords = jnp.stack([bi, zi, yi, xi], axis=1).astype(jnp.int32)
    feats = jnp.where(valid[:, None], dt.features[bi, zi, yi, xi], 0.0)
    return SparseTensor(feats, jnp.where(valid[:, None], coords, 0), valid,
                        (nz, ny, nx), b)


def col_to_sparse(ct: ColTensor, batch_size: int,
                  capacity: int) -> SparseTensor:
    """ColTensor -> SparseTensor via the zfold plane (column buffers are
    only used for stage-1 subm convs, whose extraction happens rarely)."""
    return zfold_to_sparse(col_to_zfold(ct), batch_size, capacity)


def as_sparse(t, batch_size: int, capacity: int) -> SparseTensor:
    """Any execution-layout tensor -> key-sorted SparseTensor view.

    ``capacity`` must cover the layout's TRUE active count: jnp.nonzero
    truncates by raster order, so an undersized capacity silently drops
    the highest-key actives (ADVICE r3: a strided conv can EXPAND the
    active set — up to 8 outputs per isolated input voxel at stride-2
    k3). Callers size it via an EXTRACT_CAPACITY_MULT over the input
    voxel count and can audit with ``active_count(t)`` (asserted in
    tests/test_sparse.py)."""
    if isinstance(t, SparseTensor):
        return t
    if isinstance(t, ZFoldTensor):
        return zfold_to_sparse(t, batch_size, capacity)
    if isinstance(t, DenseTensor):
        return dense_to_sparse(t, capacity)
    if isinstance(t, ColTensor):
        return col_to_sparse(t, batch_size, capacity)
    raise TypeError(type(t))


def active_count(t) -> "jax.Array":
    """True number of active voxels of any execution-layout tensor — the
    overflow audit for as_sparse (active_count(t) <= extraction capacity
    must hold or actives were silently dropped)."""
    if isinstance(t, SparseTensor):
        return t.mask.sum()
    if isinstance(t, ZFoldTensor):
        return t.occ.sum()
    if isinstance(t, DenseTensor):
        return t.occ.sum()
    if isinstance(t, ColTensor):
        return (t.zocc & t.mask[:, None]).sum()
    raise TypeError(type(t))


def zfold_height_compression(zt: ZFoldTensor) -> jax.Array:
    """-> (B, Y, X, C*Z) with the reference's (c*Z + z) channel order."""
    b, yy, xx, _ = zt.features.shape
    f = zt.features.reshape(b, yy, xx, zt.z, zt.channels)
    return jnp.transpose(f, (0, 1, 2, 4, 3)).reshape(
        b, yy, xx, zt.channels * zt.z)


def dense_height_compression(dt: DenseTensor) -> jax.Array:
    """(B, nz, ny, nx, C) -> (B, ny, nx, C*nz) with the SAME (c*nz + z)
    channel order as map_to_bev.height_compression (ckpt-compatible)."""
    b, nz, ny, nx, c = dt.features.shape
    return jnp.transpose(dt.features, (0, 2, 3, 4, 1)).reshape(
        b, ny, nx, c * nz)


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

    offs = _offsets(ks)                                   # (K, 3)
    # gather FROM the downsampled st at (p + pad - off)/stride; the input
    # gradient gathers FROM the target space at j*stride - pad + off (the
    # regular-conv query) — the exact adjoint pair of _gather_gemm
    q_fwd = _invconv_queries(target.coords, target.mask, offs, stride,
                             padding, st.spatial_shape)
    q_bwd = _conv_queries(st.coords, st.mask, offs, stride, padding,
                          target.spatial_shape)
    in_keys = linear_key(st.coords, st.spatial_shape, st.mask)
    out_keys = linear_key(target.coords, target.spatial_shape, target.mask)
    feats = _conv_core(_key_space(st.spatial_shape, st.batch_size),
                       _key_space(target.spatial_shape, target.batch_size),
                       st.features, weight.reshape(k, cin, -1), q_fwd, q_bwd,
                       in_keys, out_keys, st.mask, target.mask)
    return target._replace(features=feats)

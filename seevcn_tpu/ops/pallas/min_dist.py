"""Pallas TPU kernel: fused row-wise minimum squared distance.

``min_sqdist(a (N,3), b (M,3)) -> (N,)`` computes
``min_j ||a_i - b_j||^2`` WITHOUT materializing the (N, M) distance matrix
in HBM. XLA's formulation (matmul -> elementwise -> reduce) writes the full
N*M f32 product to HBM first — at the SEE replacement stage's scale
(120k x 20k = 9.6 GB of traffic) that is the pipeline's bandwidth wall;
this kernel keeps each (TN, TM) tile in VMEM, does the Gram matmul on the
MXU, and carries a running (TN,) minimum across the M-tiles.

Grid: (N/TN, M/TM), M innermost. The output block index ignores the M axis,
so the same VMEM block is revisited across the M sweep (TPU grids execute
sequentially) — initialize at j==0, min-update afterwards.

Used by ops.sampling.within_radius_mask and ops.chamfer on TPU for large
problems; the ``interpret=True`` path keeps CPU tests exact.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

TN = 1024  # query rows per tile (1-D f32 outputs tile T(1024) on TPU)
TM = 1024  # support rows per tile


def _kernel_diff(a_ref, b_ref, out_ref):
    j = pl.program_id(1)

    a = a_ref[:]                       # (TN, 4) padded xyz
    b = b_ref[:]                       # (TM, 4)
    # difference form on the VPU — exact, but 9 VPU passes per element
    d = jnp.zeros((a.shape[0], b.shape[0]), jnp.float32)
    for c in range(3):
        diff = a[:, c:c + 1] - b[:, c:c + 1].T             # (TN, TM)
        d = d + diff * diff
    tile_min = jnp.min(d, axis=1)                          # (TN,)

    @pl.when(j == 0)
    def _():
        out_ref[:] = tile_min

    @pl.when(j > 0)
    def _():
        out_ref[:] = jnp.minimum(out_ref[:], tile_min)


def _make_kernel_diff_pruned(r2: float):
    """Tile-pruned diff kernel: each (i, j) pair first separation-tests the
    two tiles' AABBs (from SMEM); pairs farther apart than ``sqrt(r2)``
    skip the (TN, TM) distance sweep entirely. Pruned pairs leave the
    running minimum untouched, so the result is exact for every query
    whose true nearest b lies within the radius — the only queries a
    within-radius test cares about. Skipped-everything rows stay at 1e18.
    """
    def kernel(abox_ref, bbox_ref, a_ref, b_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.full(out_ref.shape, 1e18, jnp.float32)

        i = pl.program_id(0)
        gap2 = jnp.float32(0.0)
        for c in range(3):
            g = jnp.maximum(
                jnp.maximum(abox_ref[i, c] - bbox_ref[j, 3 + c],
                            bbox_ref[j, c] - abox_ref[i, 3 + c]), 0.0)
            gap2 = gap2 + g * g

        @pl.when(gap2 <= r2)
        def _():
            a = a_ref[:]
            b = b_ref[:]
            d = jnp.zeros((a.shape[0], b.shape[0]), jnp.float32)
            for c in range(3):
                diff = a[:, c:c + 1] - b[:, c:c + 1].T
                d = d + diff * diff
            out_ref[:] = jnp.minimum(out_ref[:], jnp.min(d, axis=1))

    return kernel


def _kernel_gram(a_ref, b_ref, out_ref):
    """Gram form on the MXU: d = |a|^2 - 2 a.b + |b|^2.

    The cross term rides the MXU at f32 precision (HIGHEST — TPU
    multi-pass; bf16 single-pass would be catastrophic after the
    cancellation). The wrapper centres coordinates on b's mean first so
    |a|^2+|b|^2 stays small and the f32 cancellation error stays ~1e-4 at
    lidar ranges — well under the 0.1 m replacement threshold this kernel
    serves. Measured: the VPU difference form ran 27 ms at the replacement
    stage's 150k x 33k; the MXU form is the matmul-rate path.
    """
    j = pl.program_id(1)
    a = a_ref[:]                       # (TN, 4), 4th coord zero
    b = b_ref[:]                       # (TM, 4)
    ab = jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    a2 = jnp.sum(a * a, axis=1, keepdims=True)             # (TN, 1)
    b2 = jnp.sum(b * b, axis=1)[None, :]                   # (1, TM)
    d = jnp.maximum(a2 - 2.0 * ab + b2, 0.0)
    tile_min = jnp.min(d, axis=1)                          # (TN,)

    @pl.when(j == 0)
    def _():
        out_ref[:] = tile_min

    @pl.when(j > 0)
    def _():
        out_ref[:] = jnp.minimum(out_ref[:], tile_min)


@partial(jax.jit, static_argnames=("interpret", "form", "prune_radius"))
def min_sqdist(a: jax.Array, b: jax.Array, b_valid: jax.Array | None = None,
               interpret: bool = False, form: str = "diff",
               prune_radius: float | None = None) -> jax.Array:
    """a (N, 3), b (M, 3) -> (N,) min squared distance to any (valid) b.

    Invalid/padding b rows are pushed to +1e18 so they never win the min.
    form='diff' (default) is the exact VPU difference form; 'gram' runs
    the cross term on the MXU with b-mean centring — MEASURED SLOWER at
    the replacement stage's K=4 (51.7 ms vs 27 ms): a K=4 matmul uses
    ~3% of the 128-deep systolic array, so the MXU loses to 9 VPU passes.

    ``prune_radius`` (diff form only): skip tile pairs whose AABBs are
    farther apart than the radius — distances are then only guaranteed
    exact when they are <= prune_radius (others may read 1e18), which is
    precisely the contract a within-radius test needs. At the SEE
    replacement stage (150k scan vs 32 clustered car surfaces) most of
    the (147 x 32) tile grid prunes away. A hash-grid candidate-pruning
    formulation was also measured here: 56 ms — the (N, 27*cap) bucket
    row gathers serialize on TPU, losing to the brute-force sweep.
    """
    n, m = a.shape[0], b.shape[0]
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if form == "gram":
        # centre on the valid b cloud so the Gram cancellation stays
        # benign (computed BEFORE invalid rows get pushed far away)
        if b_valid is None:
            centre = jnp.mean(b, axis=0)
        else:
            cnt = jnp.maximum(b_valid.sum(), 1)
            centre = jnp.where(b_valid[:, None], b, 0.0).sum(axis=0) / cnt
        centre = jnp.clip(centre, -1e4, 1e4)
        a = a - centre
        b = b - centre
    if b_valid is not None:
        # push invalid rows far away instead of masking inside the kernel
        b = jnp.where(b_valid[:, None], b, 1e9)

    pad_n = (-n) % TN
    pad_m = (-m) % TM
    a_p = jnp.pad(a, ((0, pad_n), (0, 1)))   # xyz -> xyz0
    b_p = jnp.pad(b, ((0, pad_m), (0, 1)))
    # padding b rows at the end would yield distance ~0 to padded a rows only;
    # push them away so they never contaminate real queries
    if pad_m:
        b_p = b_p.at[m:, :3].set(1e9)

    grid = (a_p.shape[0] // TN, b_p.shape[0] // TM)
    if prune_radius is not None and form == "diff":
        from jax.experimental.pallas import tpu as pltpu

        def tile_boxes(x, t):
            xt = x[:, :3].reshape(-1, t, 3)
            return jnp.concatenate([xt.min(axis=1), xt.max(axis=1)], axis=1)

        # padded a rows (zeros) only widen the last tile's box: conservative
        abox = tile_boxes(a_p, TN)                          # (gi, 6)
        bbox = tile_boxes(b_p, TM)                          # (gj, 6)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM) if not interpret \
            else pl.BlockSpec(memory_space=None)
        out = pl.pallas_call(
            _make_kernel_diff_pruned(float(prune_radius) ** 2),
            grid=grid,
            in_specs=[smem, smem,
                      pl.BlockSpec((TN, 4), lambda i, j: (i, 0)),
                      pl.BlockSpec((TM, 4), lambda i, j: (j, 0))],
            out_specs=pl.BlockSpec((TN,), lambda i, j: (i,)),
            out_shape=jax.ShapeDtypeStruct((a_p.shape[0],), jnp.float32),
            interpret=interpret,
        )(abox, bbox, a_p, b_p)
        return out[:n]
    out = pl.pallas_call(
        _kernel_gram if form == "gram" else _kernel_diff,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TN, 4), lambda i, j: (i, 0)),
            pl.BlockSpec((TM, 4), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((TN,), lambda i, j: (i,)),
        out_shape=jax.ShapeDtypeStruct((a_p.shape[0],), jnp.float32),
        interpret=interpret,
    )(a_p, b_p)
    return out[:n]


def min_sqdist_reference(a, b, b_valid=None):
    """XLA reference for testing."""
    d = jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, axis=-1)
    if b_valid is not None:
        d = jnp.where(b_valid[None, :], d, jnp.inf)
    return jnp.min(d, axis=1)

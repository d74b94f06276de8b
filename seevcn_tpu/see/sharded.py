"""SEE completion stage sharded over the device mesh.

The reference parallelizes SEE preprocessing over frames with a host
worker pool (see/surface_completion/sc_multiproc.py:65-94 — each worker
runs isolate -> VCN -> replace on its slice of the frame list). The TPU
expression of the same structure (SURVEY §5) is one SPMD program: frames
stacked on the leading axis and sharded over the mesh's 'dp' axis, VCN
parameters replicated. Frames are independent, so XLA partitions the
vmapped program with ZERO collectives — each dp shard completes its own
frames, and throughput scales linearly with dp until host IO saturates.

This module builds that program for the reference's config-1 GT path
(points in ground-lifted gt boxes, SEE_VCN.py:46-56 get_pcd_gtboxes),
which is the path the source-domain preprocessing sweep runs at scale.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geom.boxes import points_in_boxes
from ..ops.clustering import largest_cluster_batch
from ..ops.sampling import partial_mesh_batch
from ..parallel.mesh import batch_sharding, replicated
from . import device_pipeline as DP


def _complete_one_frame(vcn, vcn_vars, pts, valid, gt_boxes, gt_mask,
                        out_pts: int, sanity_max_dist: float):
    """GT-path completion of ONE frame (P, 3) -> spliced (P + D*K, 3/4)."""
    lifted = gt_boxes[:, :7].at[:, 2].add(0.05).at[:, 5].add(-0.1)
    member = points_in_boxes(pts[:, :3], lifted)            # (D, P)
    member = member & gt_mask[:, None] & valid[None, :]
    iso, ok = DP.isolate_and_resample(pts, member,
                                      max_instance_pts=2048,
                                      out_pts=out_pts)
    ret = vcn.apply(vcn_vars, {"input": iso})
    surface = partial_mesh_batch(iso, ret["coarse"], k=30,
                                 surface_pts=out_pts)
    completed = largest_cluster_batch(surface, eps=0.4, min_points=2,
                                      total_pts=out_pts)
    ok = DP.completion_sanity_mask(iso, completed, ok,
                                   max_dist=sanity_max_dist)
    new_pts, new_valid = DP.replace_with_completed(
        pts, valid, completed, ok, point_dist_thresh=0.1)
    return new_pts, new_valid, ok


def make_sharded_completion(mesh, vcn, out_pts: int = 1024,
                            sanity_max_dist: float = 2.0):
    """Jitted frames-over-dp SEE completion batch.

    Returns ``fn(vcn_vars, pts (F, P, 3), valid (F, P), gt_boxes
    (F, D, >=7), gt_mask (F, D)) -> (new_pts (F, P + D*K, 3), new_valid,
    inst_ok (F, D))`` with the frame axis sharded over the mesh's 'dp'
    axis and ``vcn_vars`` replicated. F must be divisible by the dp size.
    """
    per_frame = partial(_complete_one_frame, vcn, out_pts=out_pts,
                        sanity_max_dist=sanity_max_dist)

    def batch_fn(vcn_vars, pts, valid, gt_boxes, gt_mask):
        return jax.vmap(
            lambda p, v, g, m: per_frame(vcn_vars, p, v, g, m))(
            pts, valid, gt_boxes, gt_mask)

    bsh, rep = batch_sharding(mesh), replicated(mesh)
    return jax.jit(batch_fn,
                   in_shardings=(rep, bsh, bsh, bsh, bsh),
                   out_shardings=(bsh, bsh, bsh))

"""Fused on-device SEE DET path: masks -> membership -> isolation -> VCN
input -> replacement, all fixed-shape jittable ops.

The reference executes this path as three host programs communicating
through files (generate_masks.py -> SEE_VCN.py get_det_instances/
isolate_det_pts/replace_with_completed_pts -> detector), with per-object
CPU loops (pycocotools mask[v,u] lookups, o3d cluster_dbscan, cKDTree).
This module is the single-process device expression of the same math, the
one the e2e throughput target assumes (SURVEY §7.1 "the
masks->isolation->VCN->detector path also runs fused in one process"):

  * mask membership: camera projection (P2-style 3x4) + bilinear lookup of
    each detection's 28x28 mask patch at the point's in-box position —
    replaces annToMask + mask[v, u] (shared_utils.py:36-106) with the
    detector's native patch output (no full-resolution mask raster).
  * isolation: per-instance fixed-capacity gather + device DBSCAN with the
    reference's adaptive eps (eps_scaling * range * tan(vres),
    SEE_VCN.py:167-171) + largest-cluster + tile-resample to 1024.
  * replacement: fused min-distance test (Pallas on TPU) + concat, the
    device form of o3d compute_point_cloud_distance (SEE_VCN.py:247-265).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.clustering import dbscan, largest_cluster_mask
from ..ops.sampling import tile_to_n, within_radius_mask


def project_points(points: jax.Array, proj: jax.Array):
    """points (P, 3) x proj (3, 4) -> (u, v, depth) each (P,)."""
    uvw = points @ proj[:, :3].T + proj[:, 3]
    depth = uvw[:, 2]
    safe = jnp.where(jnp.abs(depth) > 1e-6, depth, 1e-6)
    return uvw[:, 0] / safe, uvw[:, 1] / safe, depth


def _bilinear_patch(patch: jax.Array, fy: jax.Array, fx: jax.Array):
    """Sample (mh, mw) patch at fractional (fy, fx), zero outside."""
    mh, mw = patch.shape
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, mh - 1)
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, mw - 1)
    y1 = jnp.clip(y0 + 1, 0, mh - 1)
    x1 = jnp.clip(x0 + 1, 0, mw - 1)
    wy = jnp.clip(fy - y0, 0.0, 1.0)
    wx = jnp.clip(fx - x0, 0.0, 1.0)
    v = (patch[y0, x0] * (1 - wy) * (1 - wx) + patch[y1, x0] * wy * (1 - wx)
         + patch[y0, x1] * (1 - wy) * wx + patch[y1, x1] * wy * wx)
    inb = (fy >= -0.5) & (fy <= mh - 0.5) & (fx >= -0.5) & (fx <= mw - 0.5)
    return jnp.where(inb, v, 0.0)


def mask_membership(points: jax.Array, valid: jax.Array, proj: jax.Array,
                    det_boxes: jax.Array, det_masks: jax.Array,
                    det_scores: jax.Array, score_thresh: float = 0.5,
                    mask_thresh: float = 0.5) -> jax.Array:
    """(D, P) bool: which in-FOV points fall inside each detection's mask.

    det_boxes (D, 4) xyxy in image coords, det_masks (D, mh, mw) patch
    probabilities (Mask R-CNN native output), det_scores (D,).
    """
    u, v, depth = project_points(points[:, :3], proj)
    in_front = depth > 0.1

    def one(box, patch, score):
        x1, y1, x2, y2 = box
        bw = jnp.maximum(x2 - x1, 1e-3)
        bh = jnp.maximum(y2 - y1, 1e-3)
        mh, mw = patch.shape
        fx = (u - x1) / bw * mw - 0.5
        fy = (v - y1) / bh * mh - 0.5
        val = _bilinear_patch(patch, fy, fx)
        keep = (val >= mask_thresh) & (score >= score_thresh)
        return keep & in_front & valid

    return jax.vmap(one)(det_boxes, det_masks, det_scores)


@partial(jax.jit, static_argnames=("max_instance_pts", "out_pts"))
def isolate_and_resample(points: jax.Array, membership: jax.Array,
                         eps_scaling: float = 4.0, min_eps: float = 0.3,
                         max_eps: float = 1.0, vres_deg: float = 0.4,
                         min_cluster: int = 10,
                         max_instance_pts: int = 2048,
                         out_pts: int = 1024):
    """membership (D, P) -> per-instance largest-DBSCAN-cluster points
    tiled to ``out_pts``: (D, out_pts, 3) + (D,) instance validity.

    Device analog of SEE_VCN.isolate_det_pts (SEE_VCN.py:144-181): the
    adaptive eps comes from the instance centroid range; instances whose
    largest cluster is under ``min_cluster`` points are flagged invalid.
    """
    d, p = membership.shape

    def one(member):
        idx = jnp.nonzero(member, size=max_instance_pts, fill_value=-1)[0]
        iv = idx >= 0
        pts = jnp.where(iv[:, None], points[jnp.maximum(idx, 0), :3], 0.0)
        centroid = pts.sum(0) / jnp.maximum(iv.sum(), 1)
        rng_ = jnp.linalg.norm(centroid)
        eps = jnp.clip(eps_scaling * rng_ * jnp.tan(
            jnp.deg2rad(vres_deg)), min_eps, max_eps)
        labels = dbscan(pts, eps, min_points=3, valid=iv)
        cmask = largest_cluster_mask(labels) & iv
        ok = cmask.sum() > min_cluster
        out, _ = tile_to_n(pts, cmask, out_pts)
        return out, ok

    return jax.vmap(one)(membership)


def replace_with_completed(points: jax.Array, valid: jax.Array,
                           completed: jax.Array, inst_valid: jax.Array,
                           point_dist_thresh: float = 0.1):
    """Splice completed surfaces into the frame cloud, fixed shape.

    points (P, 3), completed (D, K, 3), inst_valid (D,) ->
    ((P + D*K, 3) cloud, (P + D*K,) validity): original points within
    ``point_dist_thresh`` of any completed point are dropped
    (SEE_VCN.py:247-265) and the completed points appended.
    """
    d, k, _ = completed.shape
    flat = completed.reshape(d * k, 3)
    flat_valid = jnp.repeat(inst_valid, k)
    near = within_radius_mask(points[:, :3], flat, point_dist_thresh,
                              b_valid=flat_valid)
    new_pts = jnp.concatenate([points[:, :3], flat], axis=0)
    new_valid = jnp.concatenate([valid & ~near, flat_valid])
    return new_pts, new_valid

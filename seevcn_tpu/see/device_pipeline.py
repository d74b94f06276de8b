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

from ..ops.chamfer import chamfer_sq
from ..ops.clustering import (dbscan, largest_cluster_mask,
                              nearest_core_cluster_mask)
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


def rasterize_masks(det_boxes: jax.Array, det_masks: jax.Array,
                    det_scores: jax.Array, image_size: tuple,
                    score_thresh: float = 0.5,
                    mask_thresh: float = 0.5,
                    shrink_pct: float = 0.0) -> jax.Array:
    """Paste all D<=32 detection mask patches onto ONE (H, W) int32 bit
    canvas (bit d set where instance d's mask covers the pixel).

    The patch -> image resize is two small matmuls per instance
    (A_y @ patch @ A_x^T with per-instance bilinear weight matrices built
    by broadcast comparisons), so no gathers at all; this mirrors the
    reference's full-resolution mask raster (annToMask) that mask[v, u]
    indexes (shared_utils.py:104-115).

    ``shrink_pct`` scales each mask toward its box center by that
    percentage before pasting — the reference's SHRINK_MASK_PERCENTAGE
    (3 in every DET config; shared_utils.shrink_instance_masks scales
    polygon coords by (1 - pct/100) about the centroid). Trims boundary
    pixels whose frustums catch background/ground points.
    """
    h, w = image_size
    d, mh, mw = det_masks.shape
    assert d <= 32, "bit canvas holds up to 32 instances"
    if shrink_pct:
        s = 1.0 - shrink_pct / 100.0
        cx = (det_boxes[:, 0] + det_boxes[:, 2]) / 2
        cy = (det_boxes[:, 1] + det_boxes[:, 3]) / 2
        det_boxes = jnp.stack(
            [cx + (det_boxes[:, 0] - cx) * s, cy + (det_boxes[:, 1] - cy) * s,
             cx + (det_boxes[:, 2] - cx) * s, cy + (det_boxes[:, 3] - cy) * s],
            axis=1)

    ys = jnp.arange(h, dtype=jnp.float32)[:, None]            # (H, 1)
    xs = jnp.arange(w, dtype=jnp.float32)[:, None]            # (W, 1)
    ksy = jnp.arange(mh, dtype=jnp.float32)[None, :]          # (1, mh)
    ksx = jnp.arange(mw, dtype=jnp.float32)[None, :]          # (1, mw)

    def one(box, patch, score):
        x1, y1, x2, y2 = box
        bw = jnp.maximum(x2 - x1, 1e-3)
        bh = jnp.maximum(y2 - y1, 1e-3)
        fy = (ys + 0.5 - y1) / bh * mh - 0.5                  # (H, 1)
        fx = (xs + 0.5 - x1) / bw * mw - 0.5                  # (W, 1)
        ay = jnp.maximum(0.0, 1.0 - jnp.abs(fy - ksy))        # (H, mh)
        ax = jnp.maximum(0.0, 1.0 - jnp.abs(fx - ksx))        # (W, mw)
        # clamp-to-edge at the patch border (matches bilinear w/ clipping)
        ay = ay.at[:, 0].add(jnp.maximum(0.0, -fy[:, 0]))
        ay = ay.at[:, mh - 1].add(jnp.maximum(0.0, fy[:, 0] - (mh - 1)))
        ax = ax.at[:, 0].add(jnp.maximum(0.0, -fx[:, 0]))
        ax = ax.at[:, mw - 1].add(jnp.maximum(0.0, fx[:, 0] - (mw - 1)))
        inb_y = (fy[:, 0] >= -0.5) & (fy[:, 0] <= mh - 0.5)
        inb_x = (fx[:, 0] >= -0.5) & (fx[:, 0] <= mw - 0.5)
        val = (ay @ patch @ ax.T)                             # (H, W)
        on = (val >= mask_thresh) & (score >= score_thresh)
        return on & inb_y[:, None] & inb_x[None, :]

    bits = jax.vmap(one)(det_boxes, det_masks, det_scores)    # (D, H, W)
    weights = (1 << jnp.arange(d, dtype=jnp.int32))[:, None, None]
    return jnp.sum(bits.astype(jnp.int32) * weights, axis=0)  # (H, W)


def mask_membership(points: jax.Array, valid: jax.Array, proj: jax.Array,
                    det_boxes: jax.Array, det_masks: jax.Array,
                    det_scores: jax.Array, score_thresh: float = 0.5,
                    mask_thresh: float = 0.5,
                    image_size: tuple | None = None,
                    shrink_pct: float = 0.0,
                    core_shrink_pct: float | None = None) -> jax.Array:
    """(D, P) bool: which in-FOV points fall inside each detection's mask.

    det_boxes (D, 4) xyxy in image coords, det_masks (D, mh, mw) patch
    probabilities (Mask R-CNN native output), det_scores (D,).

    With ``image_size`` the masks are rasterized once onto a 32-bit canvas
    and each point costs ONE integer gather (the reference's mask[v, u]
    semantics, shared_utils.py:113-115) — 128x fewer gathers than the
    per-instance bilinear path (measured 199 ms -> the canvas path at
    bench shapes), which remains as the fallback when no image size is
    given.

    ``core_shrink_pct`` (canvas path only) additionally returns a second
    membership computed at that much heavier shrink — the mask CORE.
    Points in the core are near-certainly on the detected object (our
    from-scratch 28x28 masks leak background at their edges in a way the
    reference's 1400-px HTC masks don't); ``isolate_and_resample`` uses
    the core bits to pick the object cluster instead of blindly taking
    the largest. Returns (member, core) when set.
    """
    u, v, depth = project_points(points[:, :3], proj)
    in_front = depth > 0.1

    if image_size is not None:
        canvas = rasterize_masks(det_boxes, det_masks, det_scores,
                                 image_size, score_thresh, mask_thresh,
                                 shrink_pct=shrink_pct)
        h, w = image_size
        # floor, not round: the reference indexes mask[int(v), int(u)]
        # (shared_utils.py:113-115) — truncation semantics
        ui = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, w - 1)
        vi = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, h - 1)
        in_img = (u >= 0) & (u < w) & (v >= 0) & (v < h)
        bits = canvas[vi, ui]                                  # (P,) int32
        ok = in_front & valid & in_img
        d = det_masks.shape[0]
        sel = (bits[None, :] >> jnp.arange(d, dtype=jnp.int32)[:, None]) & 1
        member = (sel > 0) & ok[None, :]
        if core_shrink_pct is None:
            return member
        core_canvas = rasterize_masks(det_boxes, det_masks, det_scores,
                                      image_size, score_thresh, mask_thresh,
                                      shrink_pct=core_shrink_pct)
        cbits = core_canvas[vi, ui]
        csel = (cbits[None, :] >> jnp.arange(d, dtype=jnp.int32)[:, None]) & 1
        return member, (csel > 0) & ok[None, :]

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

    member = jax.vmap(one)(det_boxes, det_masks, det_scores)
    if core_shrink_pct is not None:
        return member, member        # bilinear fallback has no shrink path
    return member


@partial(jax.jit, static_argnames=("max_instance_pts", "out_pts"))
def isolate_and_resample(points: jax.Array, membership: jax.Array,
                         eps_scaling: float = 4.0, min_eps: float = 0.3,
                         max_eps: float = 1.0, vres_deg: float = 0.4,
                         min_cluster: int = 10,
                         max_instance_pts: int = 2048,
                         out_pts: int = 1024,
                         core_membership: jax.Array | None = None):
    """membership (D, P) -> per-instance largest-DBSCAN-cluster points
    tiled to ``out_pts``: (D, out_pts, 3) + (D,) instance validity.

    ``core_membership`` (same (D, P) shape, from mask_membership's
    core_shrink_pct) switches the cluster vote from plain size to the
    nearest-surface core rule (``nearest_core_cluster_mask``): seed on
    the NEAREST cluster holding a substantial share of the core points,
    then merge nearby core-supported fragments. This stops background
    that lidar-camera parallax pushes inside the mask silhouette —
    always FARTHER than the object — from out-voting the object itself
    (the round-5 frame-0 wrong-instance failure mode, BASELINE.md
    round-5 maskpath table).

    Device analog of SEE_VCN.isolate_det_pts (SEE_VCN.py:144-181): the
    adaptive eps comes from the instance centroid range; instances whose
    largest cluster is under ``min_cluster`` points are flagged invalid.
    """
    d, p = membership.shape
    m = max_instance_pts
    # two-stage compaction: a SINGLE any-member pass over the full P first
    # (the per-instance (D, P) cumsum was measured at ~47 ms at bench
    # shapes regardless of formulation), then the per-instance ranking
    # runs over only the candidate subset. The cap bounds the (D, cand)
    # rank-cumsum + scatter (the stage's cost driver, ~18 ms at 64k).
    # It must cover the D*m per-instance budget: jnp.nonzero truncates
    # by point index (scan order), so an undersized cap can zero out a
    # late-in-scan instance ENTIRELY in crowded frames (a 32k cap was
    # measured ~11 ms faster but silently drops instances once mask
    # unions exceed it; correctness wins).
    cand_cap = min(p, max(2 * d * m, 1 << 12) if d * m < 1 << 16
                   else 1 << 16)
    anybit = membership.any(axis=0)                          # (P,)
    (cand,) = jnp.nonzero(anybit, size=cand_cap, fill_value=-1)
    cvalid = cand >= 0
    csafe = jnp.maximum(cand, 0)
    mem_c = membership[:, csafe] & cvalid[None, :]           # (D, Pc)
    pc = cand_cap

    rank = jnp.cumsum(mem_c, axis=1, dtype=jnp.int32) - 1
    ok = mem_c & (rank < m)
    tgt = jnp.where(ok, jnp.arange(d, dtype=jnp.int32)[:, None] * m + rank,
                    d * m)
    src = jnp.broadcast_to(csafe[None, :], (d, pc))
    gathered = jnp.full((d * m + 1,), -1, jnp.int32).at[tgt.reshape(-1)].max(
        jnp.where(ok, src, -1).reshape(-1))
    inst_idx = gathered[:d * m].reshape(d, m)

    def one(idx, core_row):
        iv = idx >= 0
        pts = jnp.where(iv[:, None], points[jnp.maximum(idx, 0), :3], 0.0)
        centroid = pts.sum(0) / jnp.maximum(iv.sum(), 1)
        rng_ = jnp.linalg.norm(centroid)
        eps = jnp.clip(eps_scaling * rng_ * jnp.tan(
            jnp.deg2rad(vres_deg)), min_eps, max_eps)
        # 8 propagation rounds: pointer jumping reaches 2^8-hop chains,
        # far beyond a car-sized cluster at eps >= 0.3 m (each round
        # re-reads the (m, m) adjacency, so rounds are the cost driver)
        labels = dbscan(pts, eps, min_points=3, valid=iv, n_iters=8)
        if core_membership is None:
            cmask = largest_cluster_mask(labels) & iv
        else:
            # nearest-surface core vote: the detected object is the
            # nearest cluster with substantial core support (parallax
            # background leakage is farther by construction); nearby
            # core-supported fragments of the same object are merged
            cmask = nearest_core_cluster_mask(
                labels, core_row[jnp.maximum(idx, 0)] & iv, pts) & iv
        ok = cmask.sum() > min_cluster
        out, _ = tile_to_n(pts, cmask, out_pts)
        return out, ok

    core_rows = (core_membership if core_membership is not None
                 else membership)      # unused rows in the None branch
    return jax.vmap(one)(inst_idx, core_rows)


def completion_sanity_mask(observed: jax.Array, completed: jax.Array,
                           inst_valid: jax.Array,
                           max_dist: float = 2.0) -> jax.Array:
    """Reject completions that left their observed instance behind.

    observed (D, N, 3) isolated instance points (zero rows = padding),
    completed (D, K, 3), inst_valid (D,) -> (D,) bool, False where the
    mean nearest-observed-point distance of the completed surface exceeds
    ``max_dist`` meters.

    Guards the failure measured in runs/maskpath_base_r4.log frame 0: a
    wrong-instance mask association fed VCN an inconsistent point set and
    the regressed pose placed the completed surface 29 m from the GT car
    (in-box fraction 0.000). A completion that is not within a couple of
    meters of the points it was predicted FROM can only hurt the spliced
    cloud — the reference has no analog because its per-object CPU path
    never exhibits this (o3d cluster + cKDTree keep association local;
    cf. SEE_VCN.py:247-265 replace semantics).
    """
    obs_valid = jnp.any(observed != 0.0, axis=-1)              # (D, N)
    d1, _ = chamfer_sq(completed, observed, valid2=obs_valid)  # (D, K)
    mean_nn = jnp.sqrt(jnp.maximum(d1, 0.0)).mean(axis=-1)     # (D,)
    has_obs = obs_valid.any(axis=-1)
    return inst_valid & has_obs & (mean_nn <= max_dist)


def replace_with_completed(points: jax.Array, valid: jax.Array,
                           completed: jax.Array, inst_valid: jax.Array,
                           point_dist_thresh: float = 0.1,
                           cand_cap: int = 32768):
    """Splice completed surfaces into the frame cloud, fixed shape.

    points (P, 3), completed (D, K, 3), inst_valid (D,) ->
    ((P + D*K, 3) cloud, (P + D*K,) validity): original points within
    ``point_dist_thresh`` of any completed point are dropped
    (SEE_VCN.py:247-265) and the completed points appended.

    Only points inside some instance's (AABB + thresh) can be dropped, so
    the min-distance sweep runs on that compacted subset (~20x fewer
    queries at scene scale) instead of the full cloud — the full-cloud
    Pallas sweep measured 27 ms at 150k x 33k; AABB tile-pruning inside
    the kernel could not help because a scan's query tiles span the whole
    scene. ``cand_cap`` bounds the subset; on overflow the excess points
    are conservatively KEPT (never wrongly dropped).
    """
    d, k, _ = completed.shape
    p = points.shape[0]
    flat = completed.reshape(d * k, 3)
    flat_valid = jnp.repeat(inst_valid, k)
    if p > 4 * cand_cap:
        r = point_dist_thresh
        lo = jnp.where(inst_valid[:, None],
                       completed.min(axis=1) - r, jnp.inf)     # (D, 3)
        hi = jnp.where(inst_valid[:, None],
                       completed.max(axis=1) + r, -jnp.inf)
        in_box = ((points[:, None, :3] >= lo[None]) &
                  (points[:, None, :3] <= hi[None])).all(-1)   # (P, D)
        (cand,) = jnp.nonzero(in_box.any(axis=1) & valid, size=cand_cap,
                              fill_value=-1)
        cok = cand >= 0
        sub = points[jnp.maximum(cand, 0), :3]
        near_sub = within_radius_mask(sub, flat, r, b_valid=flat_valid)
        near = jnp.zeros((p,), bool).at[jnp.maximum(cand, 0)].max(
            near_sub & cok)
    else:
        near = within_radius_mask(points[:, :3], flat, point_dist_thresh,
                                  b_valid=flat_valid)
    new_pts = jnp.concatenate([points[:, :3], flat], axis=0)
    new_valid = jnp.concatenate([valid & ~near, flat_valid])
    return new_pts, new_valid

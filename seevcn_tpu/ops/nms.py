"""Fixed-shape rotated NMS on device.

Replaces the reference's ``nms_gpu`` / ``nms_normal_gpu`` (64-box bitmask
CUDA kernel, iou3d_nms_kernel.cu:270-312) and the Python selection logic in
``pcdet/models/model_utils/model_nms_utils.py:6-66``.

Design: scores -> top-k (pre_maxsize) -> one (K, K) rotated-IoU matrix ->
sequential greedy suppression with a ``fori_loop`` over rows (each step is a
K-wide vector op) -> fixed-size ``(post_maxsize,)`` index buffer + validity
mask. Everything statically shaped, so it jits once and runs entirely on
device.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .iou3d import boxes_iou_bev
from ..geom.boxes import boxes_iou_normal, boxes3d_to_aligned_bev

NEG_INF = -1e9


def _greedy_suppress(overlap: jax.Array, valid: jax.Array, thresh: float) -> jax.Array:
    """Greedy NMS given a (K, K) overlap matrix for score-sorted boxes.

    valid: (K,) initial validity (score-thresholded / padding). Returns the
    keep mask (K,).
    """
    k = overlap.shape[0]
    suppress = overlap > thresh
    idx = jnp.arange(k)

    def body(i, keep):
        # if box i survives, suppress all lower-scored boxes overlapping it
        row = suppress[i] & (idx > i)
        return jnp.where(keep[i], keep & ~row, keep)

    # unroll amortizes per-iteration control-flow cost over straight-line code
    return jax.lax.fori_loop(0, k, body, valid, unroll=32)


@partial(jax.jit, static_argnames=("pre_maxsize", "post_maxsize", "use_bev_aligned", "row_chunk"))
def nms_bev(boxes: jax.Array, scores: jax.Array, thresh: float,
            pre_maxsize: int = 4096, post_maxsize: int = 500,
            score_thresh: float | None = None,
            valid_mask: jax.Array | None = None,
            use_bev_aligned: bool = False,
            row_chunk: int | None = None):
    """Rotated-BEV NMS.

    Args:
      boxes: (N, 7) [x y z dx dy dz heading]
      scores: (N,)
      thresh: IoU suppression threshold
      score_thresh: optional pre-filter (reference class_agnostic_nms)
      valid_mask: optional (N,) bool marking real (non-padding) boxes
      use_bev_aligned: use axis-aligned nearest-BEV IoU (nms_normal_gpu
        analog) instead of exact rotated IoU

    Returns:
      (indices (post_maxsize,) into the input arrays,
       keep_mask (post_maxsize,) bool,
       kept_scores (post_maxsize,))
    """
    n = boxes.shape[0]
    k = min(pre_maxsize, n)

    ok = jnp.isfinite(scores)
    if valid_mask is not None:
        ok = ok & valid_mask
    if score_thresh is not None:
        ok = ok & (scores >= score_thresh)  # reference uses >= (model_nms_utils)
    masked_scores = jnp.where(ok, scores, NEG_INF)

    top_scores, order = jax.lax.top_k(masked_scores, k)
    sboxes = boxes[order]
    top_valid = top_scores > NEG_INF / 2

    if use_bev_aligned:
        bev = boxes3d_to_aligned_bev(sboxes)
        overlap = boxes_iou_normal(bev, bev)
    else:
        if row_chunk is None and k > 2048:
            row_chunk = 512  # bound the pairwise temp buffers
        overlap = boxes_iou_bev(sboxes, sboxes, row_chunk=row_chunk)

    keep = _greedy_suppress(overlap, top_valid, thresh)

    # compact kept entries (already score-ordered) into post_maxsize slots
    pos = jnp.arange(k)
    sort_key = jnp.where(keep, pos, k + pos)
    compact = jnp.argsort(sort_key)[:post_maxsize]
    out_idx = order[compact]
    out_keep = keep[compact]
    out_scores = jnp.where(out_keep, top_scores[compact], NEG_INF)
    return out_idx, out_keep, out_scores


def class_agnostic_nms(box_scores: jax.Array, box_preds: jax.Array, nms_config,
                       score_thresh: float | None = None,
                       valid_mask: jax.Array | None = None):
    """Config-driven wrapper matching model_nms_utils.class_agnostic_nms."""
    return nms_bev(
        box_preds, box_scores,
        thresh=float(nms_config.NMS_THRESH),
        pre_maxsize=int(nms_config.NMS_PRE_MAXSIZE),
        post_maxsize=int(nms_config.NMS_POST_MAXSIZE),
        score_thresh=score_thresh,
        valid_mask=valid_mask,
        use_bev_aligned=nms_config.get("NMS_TYPE", "nms_gpu") == "nms_normal_gpu",
    )

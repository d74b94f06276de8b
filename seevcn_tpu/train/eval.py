"""Detector evaluation loop.

Reference: detector3d/tools/eval_utils/eval_utils.py:22-121 — batched
inference, recall records at IoU thresholds, prediction-dict generation,
dataset.evaluation dispatch. Multi-host result merging uses
process_allgather instead of the reference's tmpdir-pickle gather
(common_utils.merge_results_dist:211-232).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models.detectors.second import post_processing
from ..ops.iou3d import boxes_iou3d


def recall_record(pred_boxes, pred_mask, gt_boxes, gt_mask, thresh_list):
    """Per-frame recall counts (detector3d_template.py:286-328)."""
    iou = boxes_iou3d(gt_boxes[:, :7], pred_boxes[:, :7])
    iou = jnp.where(pred_mask[None, :], iou, 0.0)
    best = iou.max(axis=1)
    out = {}
    for t in thresh_list:
        out[f"recalled_{t}"] = jnp.sum((best > t) & gt_mask)
    out["num_gt"] = gt_mask.sum()
    return out


def eval_one_epoch(model, cfg, variables, dataset, batch_size: int = 1,
                   logger=print, max_frames: int | None = None):
    """-> (ap_report_str, ap_dict, recall_dict). dataset must implement
    __getitem__/__len__/generate_prediction_dicts/evaluation."""
    post_cfg = cfg.MODEL.POST_PROCESSING
    has_roi = "ROI_HEAD" in cfg.MODEL
    thresh_list = [float(t) for t in post_cfg.get("RECALL_THRESH_LIST",
                                                  [0.3, 0.5, 0.7])]

    @jax.jit
    def step(variables, points, valid, gt_boxes, gt_mask):
        out = model.apply(variables, points, valid, train=False)
        preds = post_processing(out, post_cfg, len(cfg.CLASS_NAMES), has_roi,
                                points=points, points_valid=valid,
                                class_names=list(cfg.CLASS_NAMES))
        rec = jax.vmap(lambda pb, pm, gb, gm: recall_record(
            pb, pm, gb, gm, thresh_list))(
            preds["pred_boxes"], preds["pred_mask"],
            gt_boxes[..., :7], gt_mask)
        return preds, rec

    det_annos = []
    recall = {f"recalled_{t}": 0 for t in thresh_list}
    recall["num_gt"] = 0
    n = len(dataset) if max_frames is None else min(max_frames, len(dataset))
    t_start = time.time()
    frame_indices = []
    # multi-host: strided frame shard per process (the reference's padded
    # DistributedSampler, datasets/__init__.py:35-55); results merged below
    rank, world = jax.process_index(), jax.process_count()
    my_frames = list(range(rank, n, world))
    for s in range(0, len(my_frames), batch_size):
        idx = my_frames[s:s + batch_size]
        while len(idx) < batch_size:
            idx.append(idx[-1])  # pad the tail batch
        frames = [dataset[i] for i in idx]
        batch = {k: np.stack([f[k] for f in frames]) for k in
                 ("points", "points_valid", "gt_boxes", "gt_mask")}
        preds, rec = step(variables, jnp.asarray(batch["points"]),
                          jnp.asarray(batch["points_valid"]),
                          jnp.asarray(batch["gt_boxes"]),
                          jnp.asarray(batch["gt_mask"]))
        preds = jax.tree.map(np.asarray, preds)
        for k in recall:
            recall[k] += int(np.asarray(rec[k]).sum())
        for bi, fi in enumerate(idx):
            if fi in frame_indices:
                continue
            frame_indices.append(fi)
            m = preds["pred_mask"][bi]
            det_annos.append({
                "pred_boxes": preds["pred_boxes"][bi][m],
                "pred_scores": preds["pred_scores"][bi][m],
                "pred_labels": preds["pred_labels"][bi][m]})
    dt = time.time() - t_start
    logger(f"eval: {len(frame_indices)} frames, "
           f"{dt / max(len(frame_indices), 1):.4f} sec_per_example")

    annos = dataset.generate_prediction_dicts(frame_indices, det_annos,
                                              cfg.CLASS_NAMES)
    if world > 1:
        # merge (frame, anno) pairs + recall counts across processes
        # (replaces common_utils.merge_results_dist tmpdir pickles +
        # eval_utils.py:41-48)
        from ..parallel.collectives import merge_results_dist

        pairs = merge_results_dist(list(zip(frame_indices, annos)))
        pairs.sort(key=lambda p: p[0])
        frame_indices = [p[0] for p in pairs][:n]
        annos = [p[1] for p in pairs][:n]
        merged_recall = merge_results_dist([recall])
        recall = {k: sum(r[k] for r in merged_recall) for k in recall}
    for t in thresh_list:
        r = recall[f"recalled_{t}"] / max(recall["num_gt"], 1)
        logger(f"recall_{t}: {r:.4f}")
    result = dataset.evaluation(annos, cfg.CLASS_NAMES)
    if result is None or result[0] is None:
        return None, {}, recall
    report, ap_dict = result
    logger(report)
    return report, ap_dict, recall

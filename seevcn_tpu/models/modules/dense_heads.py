"""Anchor-based dense head.

Reference: AnchorHeadSingle (dense_heads/anchor_head_single.py:7-75) on top
of AnchorHeadTemplate (anchor_head_template.py:11-272): 1x1 conv heads for
class / box / direction, focal + sin-diff smooth-L1 + dir CE losses, and
anchor decoding for prediction.

Anchors are static numpy constants folded into the jitted graph; the target
assigner runs as part of the training step (fixed shapes, on device).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..losses import sigmoid_focal_loss, weighted_cross_entropy, weighted_smooth_l1
from ...geom.transforms import limit_period
from .anchors import AxisAlignedTargetAssigner, generate_anchors, get_direction_targets
from .box_coder import build_box_coder


class AnchorHeadSingle(nn.Module):
    """1x1 conv heads over BEV features (NHWC)."""
    num_class: int
    num_anchors_per_location: int
    code_size: int
    num_dir_bins: int = 0  # 0 = no direction classifier

    @nn.compact
    def __call__(self, bev: jax.Array, train: bool = False):
        a, c = self.num_anchors_per_location, self.num_class
        cls_preds = nn.Conv(a * c, (1, 1), name="conv_cls")(bev)
        box_preds = nn.Conv(a * self.code_size, (1, 1), name="conv_box")(bev)
        out = {"cls_preds": cls_preds, "box_preds": box_preds}
        if self.num_dir_bins:
            out["dir_cls_preds"] = nn.Conv(a * self.num_dir_bins, (1, 1),
                                           name="conv_dir_cls")(bev)
        return out


class AnchorHeadLogic:
    """Stateless companion: anchors, target assignment, losses, decoding.

    Mirrors AnchorHeadTemplate's non-parametric logic so it can be shared by
    every anchor-based detector without living inside a linen module.
    """

    def __init__(self, model_cfg, num_class: int, class_names: Sequence[str],
                 grid_size, point_cloud_range):
        self.model_cfg = model_cfg
        self.num_class = num_class
        self.class_names = list(class_names)
        tcfg = model_cfg.TARGET_ASSIGNER_CONFIG
        self.box_coder = build_box_coder(
            tcfg.BOX_CODER, **tcfg.get("BOX_CODER_CONFIG", {}))
        acfg = model_cfg.ANCHOR_GENERATOR_CONFIG

        anchors, self.num_anchors_per_location_list = generate_anchors(
            acfg, grid_size, point_cloud_range, anchor_ndim=self.box_coder.code_size)
        self.anchors_flat = anchors                       # (A_total, ndim) numpy
        self.num_anchors_per_location = int(sum(self.num_anchors_per_location_list))

        # per-anchor-class views for the assigner: (A_i, ndim), flattened in
        # (z, y, x, size, rot) order. The flat layout is per-location
        # interleaved across classes, so rebuild per-class splits:
        self._per_class_anchors = self._split_per_class(acfg, grid_size,
                                                        point_cloud_range)
        if tcfg.get("NAME", "AxisAlignedTargetAssigner") == "ATSS":
            # anchor_head_template.py:55-60
            from .anchors import ATSSTargetAssigner

            self.assigner = ATSSTargetAssigner(
                topk=int(tcfg.TOPK), box_coder=self.box_coder,
                match_height=bool(tcfg.get("MATCH_HEIGHT", False)))
        else:
            self.assigner = AxisAlignedTargetAssigner(
                acfg, tcfg, class_names, self.box_coder,
                match_height=bool(tcfg.get("MATCH_HEIGHT", False)))

        self.use_dir = model_cfg.get("USE_DIRECTION_CLASSIFIER", False)
        self.dir_offset = float(model_cfg.get("DIR_OFFSET", 0.78539))
        self.dir_limit_offset = float(model_cfg.get("DIR_LIMIT_OFFSET", 0.0))
        self.num_dir_bins = int(model_cfg.get("NUM_DIR_BINS", 2)) if self.use_dir else 0
        self.loss_weights = model_cfg.LOSS_CONFIG.LOSS_WEIGHTS

    def _split_per_class(self, acfg, grid_size, point_cloud_range):
        per = []
        for cfg in acfg:
            a, _ = generate_anchors([cfg], grid_size, point_cloud_range,
                                    anchor_ndim=self.box_coder.code_size)
            # reshape to (locations, per_loc, ndim) for interleaved re-concat
            npl = len(cfg["anchor_sizes"]) * len(cfg["anchor_rotations"]) * \
                len(cfg["anchor_bottom_heights"])
            per.append(a.reshape(-1, npl, a.shape[-1]))
        return per

    # ------------------------------------------------------------------ #
    def assign_targets(self, gt_boxes: jax.Array) -> dict:
        anchors = [jnp.asarray(a) for a in self._per_class_anchors]
        return self.assigner.assign(anchors, gt_boxes)

    def loss(self, preds: dict, targets: dict) -> tuple[jax.Array, dict]:
        cls_preds = preds["cls_preds"]
        box_preds = preds["box_preds"]
        b = cls_preds.shape[0]
        cls_preds = cls_preds.reshape(b, -1, self.num_class)
        box_preds = box_preds.reshape(b, -1, self.box_coder.code_size)

        labels = targets["box_cls_labels"]           # (B, A)
        reg_targets = targets["box_reg_targets"]     # (B, A, code)

        cared = labels >= 0
        positives = labels > 0
        negatives = labels == 0
        pos_norm = jnp.maximum(positives.sum(axis=1, keepdims=True), 1.0)
        cls_weights = (negatives + positives).astype(jnp.float32) / pos_norm
        reg_weights = positives.astype(jnp.float32) / pos_norm

        cls_targets = jnp.where(cared, labels, 0)
        if self.num_class == 1:
            cls_targets = jnp.where(positives, 1, 0)
        one_hot = jax.nn.one_hot(cls_targets, self.num_class + 1)[..., 1:]
        cls_loss = sigmoid_focal_loss(cls_preds, one_hot, cls_weights).sum() / b
        cls_loss = cls_loss * float(self.loss_weights["cls_weight"])

        # sin-difference angle encoding (anchor_head_template.py:137-144)
        anchors = jnp.asarray(self.anchors_flat)[None]
        sin_p = jnp.sin(box_preds[..., 6:7]) * jnp.cos(reg_targets[..., 6:7])
        sin_t = jnp.cos(box_preds[..., 6:7]) * jnp.sin(reg_targets[..., 6:7])
        bp = jnp.concatenate([box_preds[..., :6], sin_p, box_preds[..., 7:]], -1)
        bt = jnp.concatenate([reg_targets[..., :6], sin_t, reg_targets[..., 7:]], -1)
        loc_loss = weighted_smooth_l1(
            bp, bt, reg_weights,
            code_weights=self.loss_weights["code_weights"]).sum() / b
        loc_loss = loc_loss * float(self.loss_weights["loc_weight"])

        tb = {"rpn_loss_cls": cls_loss, "rpn_loss_loc": loc_loss}
        total = cls_loss + loc_loss

        if self.use_dir and "dir_cls_preds" in preds:
            dir_logits = preds["dir_cls_preds"].reshape(b, -1, self.num_dir_bins)
            dir_t = get_direction_targets(anchors, reg_targets,
                                          self.dir_offset, self.num_dir_bins)
            dir_one_hot = jax.nn.one_hot(dir_t, self.num_dir_bins)
            w = positives.astype(jnp.float32)
            w = w / jnp.maximum(w.sum(axis=-1, keepdims=True), 1.0)
            dir_loss = weighted_cross_entropy(dir_logits, dir_one_hot, w).sum() / b
            dir_loss = dir_loss * float(self.loss_weights["dir_weight"])
            tb["rpn_loss_dir"] = dir_loss
            total = total + dir_loss

        tb["rpn_loss"] = total
        return total, tb

    def predict_boxes(self, preds: dict) -> tuple[jax.Array, jax.Array]:
        """-> (batch_cls_preds (B, A, ncls), batch_box_preds (B, A, 7+C))."""
        cls_preds = preds["cls_preds"]
        b = cls_preds.shape[0]
        anchors = jnp.asarray(self.anchors_flat)[None]
        cls_preds = cls_preds.reshape(b, -1, self.num_class)
        box_preds = preds["box_preds"].reshape(b, -1, self.box_coder.code_size)
        boxes = self.box_coder.decode(box_preds, anchors)

        if self.use_dir and "dir_cls_preds" in preds:
            dir_preds = preds["dir_cls_preds"].reshape(b, -1, self.num_dir_bins)
            dir_labels = jnp.argmax(dir_preds, axis=-1)
            period = 2 * np.pi / self.num_dir_bins
            rot = limit_period(boxes[..., 6] - self.dir_offset,
                               self.dir_limit_offset, period)
            boxes = boxes.at[..., 6].set(
                rot + self.dir_offset + period * dir_labels.astype(boxes.dtype))
        return cls_preds, boxes


class AnchorHeadMulti(nn.Module):
    """Grouped multi-head anchors (anchor_head_multi.py:SingleHead).

    Each head group scores ONLY its CLASS_NAMES_EACH_HEAD classes over its
    own anchors; group outputs are scattered back into the global
    per-location anchor layout (location-major, per-location anchors in
    class order) so AnchorHeadLogic's assignment/loss/decode run unchanged.
    Out-of-group class columns are filled with a -1e4 constant (sigmoid -> 0,
    zero gradient), matching the per-head class restriction.
    """
    num_class: int
    code_size: int
    num_dir_bins: int
    per_class_anchors: tuple   # anchors-per-location for each class, in order
    groups: tuple              # tuple of tuples of class indices (contiguous)
    shared_conv_channels: int = 64

    @nn.compact
    def __call__(self, bev: jax.Array, train: bool = False):
        x = bev
        if self.shared_conv_channels:
            # reference: Conv2d(bias=False) + BN(eps 1e-3, mom 0.01) + ReLU
            x = nn.Conv(self.shared_conv_channels, (3, 3), use_bias=False,
                        name="shared_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, name="shared_bn")(x)
            x = nn.relu(x)
        b, h, w, _ = x.shape
        neg = jnp.float32(-1e4)
        cls_parts, box_parts, dir_parts = [], [], []
        for gi, grp in enumerate(self.groups):
            n_cls = len(grp)
            a_g = int(sum(self.per_class_anchors[c] for c in grp))
            cls = nn.Conv(a_g * n_cls, (1, 1), name=f"head{gi}_conv_cls")(x)
            box = nn.Conv(a_g * self.code_size, (1, 1),
                          name=f"head{gi}_conv_box")(x)
            cls = cls.reshape(b, h, w, a_g, n_cls)
            full = jnp.full((b, h, w, a_g, self.num_class), neg)
            for ci, c in enumerate(grp):
                full = full.at[..., c].set(cls[..., ci])
            cls_parts.append(full)
            box_parts.append(box.reshape(b, h, w, a_g, self.code_size))
            if self.num_dir_bins:
                d = nn.Conv(a_g * self.num_dir_bins, (1, 1),
                            name=f"head{gi}_conv_dir_cls")(x)
                dir_parts.append(d.reshape(b, h, w, a_g, self.num_dir_bins))
        cls_preds = jnp.concatenate(cls_parts, axis=3)
        box_preds = jnp.concatenate(box_parts, axis=3)
        out = {"cls_preds": cls_preds.reshape(b, h, w, -1),
               "box_preds": box_preds.reshape(b, h, w, -1)}
        if self.num_dir_bins:
            out["dir_cls_preds"] = jnp.concatenate(dir_parts,
                                                   axis=3).reshape(b, h, w, -1)
        return out


def build_anchor_head(head_cfg, logic, num_class: int, class_names,
                      name: str = "dense_head"):
    """NAME-dispatched dense-head module (AnchorHeadSingle|AnchorHeadMulti)."""
    if head_cfg.get("NAME", "AnchorHeadSingle") == "AnchorHeadMulti":
        groups_names = [list(g) for g in head_cfg.CLASS_NAMES_EACH_HEAD]
        names = list(class_names)
        flat = [n for g in groups_names for n in g]
        assert flat == names, (
            "CLASS_NAMES_EACH_HEAD must partition CLASS_NAMES in order "
            f"(got {flat} vs {names})")
        idx = {n: i for i, n in enumerate(names)}
        groups = tuple(tuple(idx[n] for n in g) for g in groups_names)
        return AnchorHeadMulti(
            num_class=num_class,
            code_size=logic.box_coder.code_size,
            num_dir_bins=logic.num_dir_bins,
            per_class_anchors=tuple(int(v) for v in
                                    logic.num_anchors_per_location_list),
            groups=groups,
            shared_conv_channels=int(head_cfg.get("SHARED_CONV_NUM_FILTER",
                                                  64)),
            name=name)
    return AnchorHeadSingle(
        num_class=num_class,
        num_anchors_per_location=logic.num_anchors_per_location,
        code_size=logic.box_coder.code_size,
        num_dir_bins=logic.num_dir_bins, name=name)

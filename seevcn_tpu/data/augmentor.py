"""Data augmentation.

Device-side, jitted, fixed-shape versions of the reference's host augmentor
(detector3d/pcdet/datasets/augmentor/augmentor_utils.py:10-160 +
data_augmentor.py:43-100): random world flip/rotation/scaling and SEE-VCN's
domain-adaptation ``random_object_scaling`` (shrinks each object's points +
box by a per-object factor, cfg source-waymo/second_iou.yaml:14-16).

All functions take (rng, points (P,3+C), valid (P,), gt_boxes (M,7+),
gt_mask (M,)) and return updated (points, gt_boxes); they compose into one
jitted ``augment_frame``. Host-side GT-database sampling (DataBaseSampler)
lives in ``GTDatabaseSampler`` below.
"""
from __future__ import annotations

import pickle
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..geom.boxes import points_in_boxes
from ..geom.transforms import rotate_points_along_z


def random_flip_along_x(rng, points, gt_boxes):
    enable = jax.random.bernoulli(rng)
    pts = jnp.where(enable, points.at[:, 1].multiply(-1)[:], points)
    gbs = jnp.where(enable,
                    gt_boxes.at[:, 1].multiply(-1).at[:, 6].multiply(-1)[:],
                    gt_boxes)
    return pts, gbs


def random_flip_along_y(rng, points, gt_boxes):
    enable = jax.random.bernoulli(rng)
    flipped = gt_boxes.at[:, 0].multiply(-1)
    flipped = flipped.at[:, 6].set(-(flipped[:, 6] + jnp.pi))
    pts = jnp.where(enable, points.at[:, 0].multiply(-1)[:], points)
    gbs = jnp.where(enable, flipped[:], gt_boxes)
    return pts, gbs


def global_rotation(rng, points, gt_boxes, rot_range):
    ang = jax.random.uniform(rng, (), minval=rot_range[0], maxval=rot_range[1])
    pts = rotate_points_along_z(points[None], ang[None])[0]
    centers = rotate_points_along_z(gt_boxes[None, :, :3], ang[None])[0]
    gbs = gt_boxes.at[:, :3].set(centers).at[:, 6].add(ang)
    return pts, gbs


def global_scaling(rng, points, gt_boxes, scale_range):
    s = jax.random.uniform(rng, (), minval=scale_range[0], maxval=scale_range[1])
    pts = points.at[:, :3].multiply(s)
    gbs = gt_boxes.at[:, :6].multiply(s)
    return pts, gbs


def random_object_scaling(rng, points, gt_boxes, gt_mask, scale_range):
    """Per-object uniform scaling about the box frame (scale_pre_object).

    SEE-VCN uses shrink-only ranges (<= 0.95), so the reference's
    overlap-conflict retry and background-point removal for enlarging never
    trigger; this implementation assumes scale <= 1 and documents that.
    """
    m = gt_boxes.shape[0]
    scales = jax.random.uniform(rng, (m,), minval=scale_range[0],
                                maxval=scale_range[1])
    inside = points_in_boxes(points[:, :3], gt_boxes[:, :7]) & gt_mask[:, None]  # (M, P)
    box_of_point = jnp.argmax(inside, axis=0)
    in_any = inside.any(axis=0)

    c = gt_boxes[box_of_point, :3]
    ry = gt_boxes[box_of_point, 6]
    s = scales[box_of_point]
    local = rotate_points_along_z((points[:, :3] - c)[:, None, :], -ry)[:, 0]
    local = local * s[:, None]
    back = rotate_points_along_z(local[:, None, :], ry)[:, 0]
    # keep objects grounded: center z rises by (new_dz - dz)/2 in the
    # reference; for point transforms that is equivalent to scaling about the
    # (shifted) center — reproduce by shifting points like the boxes below
    dz_shift = (gt_boxes[box_of_point, 5] * (s - 1)) / 2
    new_xyz = back + c + jnp.stack([jnp.zeros_like(dz_shift),
                                    jnp.zeros_like(dz_shift), dz_shift], axis=1)
    pts = points.at[:, :3].set(jnp.where(in_any[:, None], new_xyz, points[:, :3]))

    gbs = gt_boxes.at[:, 3:6].multiply(
        jnp.where(gt_mask, scales, 1.0)[:, None])
    gbs = gbs.at[:, 2].add(jnp.where(gt_mask, gt_boxes[:, 5] * (scales - 1) / 2, 0.0))
    return pts, gbs


@partial(jax.jit, static_argnames=("aug_list",))
def augment_frame(rng, points, valid, gt_boxes, gt_mask, aug_list: tuple):
    """aug_list: tuple of (name, params-tuple) — static config.

    Supported names: random_object_scaling, random_world_flip (params =
    axes), random_world_rotation, random_world_scaling.
    """
    rngs = jax.random.split(rng, len(aug_list) + 2)
    for i, (name, params) in enumerate(aug_list):
        r = rngs[i]
        if name == "random_object_scaling":
            points, gt_boxes = random_object_scaling(r, points, gt_boxes,
                                                     gt_mask, params)
        elif name == "random_world_flip":
            sub = jax.random.split(r, len(params))
            for ax, rr in zip(params, sub):
                if ax == "x":
                    points, gt_boxes = random_flip_along_x(rr, points, gt_boxes)
                else:
                    points, gt_boxes = random_flip_along_y(rr, points, gt_boxes)
        elif name == "random_world_rotation":
            points, gt_boxes = global_rotation(r, points, gt_boxes, params)
        elif name == "random_world_scaling":
            points, gt_boxes = global_scaling(r, points, gt_boxes, params)
        else:
            raise NotImplementedError(name)
    return points, gt_boxes


def aug_list_from_cfg(aug_cfg) -> tuple:
    """DATA_AUGMENTOR config block -> static aug_list tuple (gt_sampling is
    handled host-side by GTDatabaseSampler, not here)."""
    out = []
    disable = set(aug_cfg.get("DISABLE_AUG_LIST", []))
    for a in aug_cfg.get("AUG_CONFIG_LIST", []):
        name = a["NAME"]
        if name in disable or name == "gt_sampling":
            continue
        if name == "random_object_scaling":
            out.append((name, tuple(a["SCALE_UNIFORM_NOISE"])))
        elif name == "random_world_flip":
            out.append((name, tuple(a["ALONG_AXIS_LIST"])))
        elif name == "random_world_rotation":
            r = a["WORLD_ROT_ANGLE"]
            r = r if isinstance(r, (list, tuple)) else [-r, r]
            out.append((name, tuple(r)))
        elif name == "random_world_scaling":
            out.append((name, tuple(a["WORLD_SCALE_RANGE"])))
    return tuple(out)


class GTDatabaseSampler:
    """Host-side GT-database paste augmentation (reference DataBaseSampler,
    datasets/augmentor/database_sampler.py:15-422): samples stored objects
    per class and pastes their points + boxes into the frame, rejecting
    samples whose boxes collide with existing ones (aligned-BEV IoU > 0)."""

    def __init__(self, root_path, sampler_cfg, class_names):
        self.root_path = root_path
        self.class_names = list(class_names)
        self.sample_groups = {}
        for g in sampler_cfg["SAMPLE_GROUPS"]:
            name, num = g.split(":")
            if name in self.class_names:
                self.sample_groups[name] = int(num)
        self.infos = {c: [] for c in self.class_names}
        for db_path in sampler_cfg["DB_INFO_PATH"]:
            with open(f"{root_path}/{db_path}", "rb") as f:
                infos = pickle.load(f)
            for c in self.class_names:
                self.infos[c].extend(infos.get(c, []))
        filt = sampler_cfg.get("PREPARE", {}).get("filter_by_min_points", [])
        for rule in filt:
            name, num = rule.split(":")
            if name in self.infos:
                self.infos[name] = [i for i in self.infos[name]
                                    if i["num_points_in_gt"] >= int(num)]
        self.num_point_features = int(sampler_cfg.get("NUM_POINT_FEATURES", 4))
        self.rng = np.random.default_rng(0)

    def _bev_overlap(self, boxes_a, boxes_b):
        from ..geom.boxes import boxes3d_nearest_bev_iou
        import jax.numpy as jnp

        return np.asarray(boxes3d_nearest_bev_iou(
            jnp.asarray(boxes_a, jnp.float32), jnp.asarray(boxes_b, jnp.float32)))

    def __call__(self, points, gt_boxes, gt_names):
        new_boxes = [gt_boxes]
        new_names = list(gt_names)
        new_points = [points]
        existing = gt_boxes
        for cls, num in self.sample_groups.items():
            pool = self.infos.get(cls, [])
            if not pool:
                continue
            take = max(0, num - int((np.asarray(gt_names) == cls).sum()))
            picks = self.rng.choice(len(pool), size=min(take, len(pool)),
                                    replace=False)
            cand = [pool[i] for i in picks]
            boxes = np.stack([c["box3d_lidar"] for c in cand]) if cand else \
                np.zeros((0, 7))
            if len(boxes) and len(existing):
                iou = self._bev_overlap(boxes[:, :7], existing[:, :7])
                ok = iou.max(axis=1) == 0
                cand = [c for c, o in zip(cand, ok) if o]
                boxes = boxes[ok]
            for c, b in zip(cand, boxes):
                obj = np.fromfile(f"{self.root_path}/{c['path']}",
                                  dtype=np.float32).reshape(
                                      -1, self.num_point_features)
                obj[:, :3] += b[:3]
                new_points.append(obj[:, :points.shape[1]])
                new_boxes.append(b[None, :gt_boxes.shape[1]])
                new_names.append(cls)
            if len(boxes):
                existing = np.concatenate([existing, boxes[:, :existing.shape[1]]])
        return (np.concatenate(new_points), np.concatenate(new_boxes),
                np.array(new_names))

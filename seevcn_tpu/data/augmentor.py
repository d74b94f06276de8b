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
    """aug_list: tuple of (name, params) — static config.

    Supported names: random_object_scaling, random_world_flip (params =
    axes), random_world_rotation, random_world_scaling,
    random_world_translation, random_local_translation,
    random_local_rotation, random_local_scaling,
    random_world_frustum_dropout, random_local_frustum_dropout.
    Returns (points, valid, gt_boxes, gt_mask) — frustum dropouts shrink
    the validity masks instead of the arrays (fixed shapes).
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
        elif name == "random_world_translation":
            points, gt_boxes = random_world_translation(
                r, points, gt_boxes, params[0], params[1])
        elif name == "random_local_translation":
            points, gt_boxes = random_local_translation(
                r, points, gt_boxes, gt_mask, params[0], params[1])
        elif name == "random_local_rotation":
            points, gt_boxes = random_local_rotation(r, points, gt_boxes,
                                                     gt_mask, params)
        elif name == "random_local_scaling":
            points, gt_boxes = random_local_scaling(r, points, gt_boxes,
                                                    gt_mask, params)
        elif name == "random_world_frustum_dropout":
            points, valid, gt_boxes, gt_mask = random_world_frustum_dropout(
                r, points, valid, gt_boxes, gt_mask, params[0], params[1])
        elif name == "random_local_frustum_dropout":
            points, valid, gt_boxes, gt_mask = random_local_frustum_dropout(
                r, points, valid, gt_boxes, gt_mask, params[0], params[1])
        elif name == "random_local_pyramid_aug":
            points, valid, gt_boxes, gt_mask = random_local_pyramid_aug(
                r, points, valid, gt_boxes, gt_mask, params)
        else:
            raise NotImplementedError(name)
    return points, valid, gt_boxes, gt_mask


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
        elif name == "random_world_translation":
            std = a["NOISE_TRANSLATE_STD"]
            std = std if isinstance(std, (list, tuple)) else [std] * 3
            out.append((name, (tuple(float(v) for v in std),
                               tuple(a.get("ALONG_AXIS_LIST", ["x", "y", "z"])))))
        elif name == "random_local_translation":
            out.append((name, (tuple(a["LOCAL_TRANSLATION_RANGE"]),
                               tuple(a.get("ALONG_AXIS_LIST", ["x", "y", "z"])))))
        elif name == "random_local_rotation":
            rr = a["LOCAL_ROT_ANGLE"]
            rr = rr if isinstance(rr, (list, tuple)) else [-rr, rr]
            out.append((name, tuple(rr)))
        elif name == "random_local_scaling":
            out.append((name, tuple(a["LOCAL_SCALE_RANGE"])))
        elif name in ("random_world_frustum_dropout",
                      "random_local_frustum_dropout"):
            out.append((name, (tuple(a["INTENSITY_RANGE"]),
                               tuple(a.get("DIRECTION",
                                           ["top", "bottom", "left",
                                            "right"])))))
        elif name == "random_local_pyramid_aug":
            out.append((name, (float(a.get("DROP_PROB", 0.25)),
                               float(a.get("SPARSIFY_PROB", 0.05)),
                               int(a.get("SPARSIFY_MAX_NUM", 50)),
                               float(a.get("SWAP_PROB", 0.1)))))
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


# ---------------------------------------------------------------------------
# world translation / frustum dropout / local (per-object) augs
# (augmentor_utils.py:203-560, data_augmentor.py:117-218)
# ---------------------------------------------------------------------------
def random_world_translation(rng, points, gt_boxes, stds, axes):
    """Gaussian world shift per listed axis (random_translation_along_*)."""
    offs = jax.random.normal(rng, (3,)) * jnp.asarray(stds)
    sel = jnp.asarray([1.0 if ax in axes else 0.0 for ax in "xyz"])
    offs = offs * sel
    return points.at[:, :3].add(offs), gt_boxes.at[:, :3].add(offs)


def _in_box_mask(points, box):
    """(P, 3+) points inside one (7,) box -> (P,) bool (get_points_in_box)."""
    local = rotate_points_along_z((points[:, :3] - box[:3])[None],
                                  -box[6][None])[0]
    return (jnp.abs(local[:, 0]) <= box[3] / 2) & \
           (jnp.abs(local[:, 1]) <= box[4] / 2) & \
           (jnp.abs(local[:, 2]) <= box[5] / 2)


def _scan_boxes(points, gt_boxes, gt_mask, per_box_fn, rng):
    """Sequentially apply per_box_fn(points, box, key) over valid boxes —
    matches the reference's in-place loop semantics for overlapping boxes."""
    keys = jax.random.split(rng, gt_boxes.shape[0])

    def body(pts, xs):
        box, ok, key = xs
        new_pts, new_box = per_box_fn(pts, box, key)
        pts = jnp.where(ok, new_pts, pts)
        box = jnp.where(ok, new_box, box)
        return pts, box

    points, boxes = jax.lax.scan(body, points, (gt_boxes, gt_mask, keys))
    return points, boxes


def random_local_translation(rng, points, gt_boxes, gt_mask, offset_range,
                             axes):
    """Per-object uniform shift (random_local_translation_along_*)."""
    sel = jnp.asarray([1.0 if ax in axes else 0.0 for ax in "xyz"])

    def per_box(pts, box, key):
        off = jax.random.uniform(key, (3,), minval=offset_range[0],
                                 maxval=offset_range[1]) * sel
        inb = _in_box_mask(pts, box)
        pts = pts.at[:, :3].add(jnp.where(inb[:, None], off, 0.0))
        return pts, box.at[:3].add(off)

    pts, boxes = _scan_boxes(points, gt_boxes, gt_mask, per_box, rng)
    return pts, boxes


def random_local_rotation(rng, points, gt_boxes, gt_mask, rot_range):
    """Per-object rotation about the box centroid (local_rotation)."""

    def per_box(pts, box, key):
        ang = jax.random.uniform(key, (), minval=rot_range[0],
                                 maxval=rot_range[1])
        inb = _in_box_mask(pts, box)
        rel = pts[:, :3] - box[:3]
        rot = rotate_points_along_z(rel[None], ang[None])[0] + box[:3]
        pts = pts.at[:, :3].set(jnp.where(inb[:, None], rot, pts[:, :3]))
        return pts, box.at[6].add(ang)

    return _scan_boxes(points, gt_boxes, gt_mask, per_box, rng)


def random_local_scaling(rng, points, gt_boxes, gt_mask, scale_range):
    """Per-object scaling about the box centroid (local_scaling)."""

    def per_box(pts, box, key):
        s = jax.random.uniform(key, (), minval=scale_range[0],
                               maxval=scale_range[1])
        inb = _in_box_mask(pts, box)
        scaled = (pts[:, :3] - box[:3]) * s + box[:3]
        pts = pts.at[:, :3].set(jnp.where(inb[:, None], scaled, pts[:, :3]))
        return pts, box.at[3:6].multiply(s)

    return _scan_boxes(points, gt_boxes, gt_mask, per_box, rng)


def random_world_frustum_dropout(rng, points, valid, gt_boxes, gt_mask,
                                 intensity_range, directions):
    """global_frustum_dropout_{top,bottom,left,right}: slice off a random
    fraction of the scene along z (top/bottom) or y (left/right). Dropped
    points become invalid (fixed shape); boxes whose center falls in the
    dropped slab are masked out."""
    axis_sign = {"top": (2, +1), "bottom": (2, -1),
                 "left": (1, +1), "right": (1, -1)}
    keys = jax.random.split(rng, len(directions))
    for d, key in zip(directions, keys):
        ax, sign = axis_sign[d]
        inten = jax.random.uniform(key, (), minval=intensity_range[0],
                                   maxval=intensity_range[1])
        big = jnp.where(valid, points[:, ax], -jnp.inf).max()
        small = jnp.where(valid, points[:, ax], jnp.inf).min()
        span = big - small
        if sign > 0:
            thr = big - inten * span
            keep_p = points[:, ax] < thr
            keep_b = gt_boxes[:, ax] < thr
        else:
            thr = small + inten * span
            keep_p = points[:, ax] > thr
            keep_b = gt_boxes[:, ax] > thr
        valid = valid & keep_p
        gt_mask = gt_mask & keep_b
    return points, valid, gt_boxes, gt_mask


def random_local_frustum_dropout(rng, points, valid, gt_boxes, gt_mask,
                                 intensity_range, directions):
    """local_frustum_dropout_*: per object, drop the top/bottom/left/right
    slice of ITS points (box kept)."""
    axis_sign = {"top": (2, +1), "bottom": (2, -1),
                 "left": (1, +1), "right": (1, -1)}
    n_dir = len(directions)
    keys = jax.random.split(rng, gt_boxes.shape[0] * n_dir).reshape(
        gt_boxes.shape[0], n_dir, 2)

    def body(val, xs):
        box, ok, key = xs
        inb = _in_box_mask(points, box)
        for di, d in enumerate(directions):
            ax, sign = axis_sign[d]
            inten = jax.random.uniform(key[di], (),
                                       minval=intensity_range[0],
                                       maxval=intensity_range[1])
            # slab measured over the full box extent along the axis
            half = box[5] / 2 if ax == 2 else box[4] / 2
            top = box[ax] + half
            bot = box[ax] - half
            if sign > 0:
                thr = top - inten * (top - bot)
                drop = inb & (points[:, ax] > thr)
            else:
                thr = bot + inten * (top - bot)
                drop = inb & (points[:, ax] < thr)
            val = jnp.where(ok, val & ~drop, val)
        return val, 0

    valid, _ = jax.lax.scan(body, valid, (gt_boxes, gt_mask, keys))
    return points, valid, gt_boxes, gt_mask


def _pyramid_membership(points, box):
    """(P,) face index in [0, 6) + (P,) inside-box mask.

    A face pyramid (apex = box center, base = one face;
    augmentor_utils.get_pyramids) contains exactly the in-box points whose
    dominant normalized local axis points at that face — closed form, no
    convex hulls. Face order: +x, -x, +y, -y, +z, -z.
    """
    local = rotate_points_along_z((points[:, :3] - box[:3])[None],
                                  -box[6][None])[0]
    u = local / jnp.maximum(box[3:6] / 2, 1e-6)         # normalized [-1, 1]
    au = jnp.abs(u)
    inside = (au <= 1.0).all(axis=1)
    axis = jnp.argmax(au, axis=1)                       # 0=x, 1=y, 2=z
    pos = jnp.take_along_axis(u, axis[:, None], axis=1)[:, 0] > 0
    return axis * 2 + jnp.where(pos, 0, 1), inside


def random_local_pyramid_aug(rng, points, valid, gt_boxes, gt_mask, params):
    """local_pyramid_dropout + _sparsify + _swap (augmentor_utils.py:614-760,
    data_augmentor.py:221-238). Per gt box: with DROP_PROB drop one random
    face pyramid's points; with SPARSIFY_PROB subsample one pyramid to
    SPARSIFY_MAX_NUM points; with SWAP_PROB exchange one pyramid's points
    with a random partner box by preserving normalized box-local
    coordinates (the reference's ratio remapping expressed in the local
    frame). Fixed shape: dropped points are invalidated, not removed.
    """
    drop_prob, sp_prob, sp_num, swap_prob = (float(params[0]), float(params[1]),
                                             int(params[2]), float(params[3]))
    m = gt_boxes.shape[0]
    k_drop, k_face, k_sp, k_spface, k_rank, k_swap, k_partner, k_swface = \
        jax.random.split(rng, 8)
    drop_face = jax.random.randint(k_face, (m,), 0, 6)
    do_drop = (jax.random.uniform(k_drop, (m,)) <= drop_prob) & gt_mask
    sp_face = jax.random.randint(k_spface, (m,), 0, 6)
    do_sp = (jax.random.uniform(k_sp, (m,)) <= sp_prob) & gt_mask & ~do_drop
    swap_face = jax.random.randint(k_swface, (m,), 0, 6)
    do_swap = (jax.random.uniform(k_swap, (m,)) <= swap_prob) & gt_mask & \
        ~do_drop & ~do_sp
    partner = jax.random.permutation(k_partner, m)
    rank_key = jax.random.uniform(k_rank, (m, points.shape[0]))

    def body(carry, xs):
        pts, val = carry
        box, ok, dface, dd, sface, ds, swface, dsw, pj, rk = xs
        face, inside = _pyramid_membership(pts, box)
        # dropout
        mdrop = inside & (face == dface) & dd & ok
        val = val & ~mdrop
        # sparsify: keep sp_num random members
        msp = inside & (face == sface) & ds & ok & val
        n_in = msp.sum()
        order = jnp.where(msp, rk, 2.0)
        kth = jnp.sort(order)[jnp.minimum(sp_num, points.shape[0] - 1)]
        kill = msp & (order >= kth) & (n_in > sp_num)
        val = val & ~kill
        return (pts, val), (face, inside)

    (points, valid), (faces, insides) = jax.lax.scan(
        body, (points, valid),
        (gt_boxes, gt_mask, drop_face, do_drop, sp_face, do_sp,
         swap_face, do_swap, partner, rank_key))

    # swap: map each swapping box's chosen-pyramid points into the partner
    # box's frame (normalized local coords preserved); first box wins on
    # overlap. faces/insides: (M, P) from the scan above.
    def swap_one(pts, i):
        box = gt_boxes[i]
        pj = partner[i]
        pbox = gt_boxes[pj]
        ok = do_swap[i] & gt_mask[pj] & (pj != i)
        msk = insides[i] & (faces[i] == swap_face[i]) & ok & valid
        local = rotate_points_along_z((pts[:, :3] - box[:3])[None],
                                      -box[6][None])[0]
        u = local / jnp.maximum(box[3:6] / 2, 1e-6)
        new_local = u * pbox[3:6] / 2
        new_world = rotate_points_along_z(new_local[None],
                                          pbox[6][None])[0] + pbox[:3]
        return pts.at[:, :3].set(jnp.where(msk[:, None], new_world,
                                           pts[:, :3])), None

    points, _ = jax.lax.scan(lambda p, i: swap_one(p, i), points,
                             jnp.arange(m))
    return points, valid, gt_boxes, gt_mask

"""VC-ShapeNet dataset generation: ray-cast partial/complete car surfaces.

Reference: see/.../models/vcn/vc_shapenet/ (dataset_functions.py:326-462,
raycast_surface_from_meshes.py:16-85) — load ShapeNet car meshes, place them
at poses sampled from real driving frames, ray-cast from the sensor origin
to get realistic partial views, and densely sample the full surface for the
completion target.

The reference uses open3d's tensor raycasting; this is a self-contained
numpy Möller–Trumbore caster (vectorized triangles x rays in blocks), plus
an area-weighted surface sampler. Output layout matches
seevcn_tpu.models.vcn.dataset.VCDataset:
  out/<model>/complete.npy, out/<model>/partial/<view>.npy,
  out/<model>/labels.pkl ({view: {'gtbox': (7,)}}).
"""
from __future__ import annotations

import os
import pickle

import numpy as np


def load_obj(path: str):
    """Minimal OBJ reader -> (vertices (V,3), faces (F,3) int)."""
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("f "):
                idx = [tok.split("/")[0] for tok in line.split()[1:]]
                idx = [int(i) for i in idx]
                for k in range(1, len(idx) - 1):  # fan-triangulate
                    faces.append([idx[0] - 1, idx[k] - 1, idx[k + 1] - 1])
    return np.asarray(verts, np.float64), np.asarray(faces, np.int64)


def normalize_car_mesh(verts: np.ndarray, target_length: float = 4.2):
    """Center and scale a ShapeNet car to a realistic length; ShapeNet cars
    face +x after swapping axes (reference load_shapenet does the analog)."""
    v = verts - (verts.max(0) + verts.min(0)) / 2
    # shapenet: y up, -z forward -> lidar frame: z up, x forward
    v = np.stack([-v[:, 2], -v[:, 0], v[:, 1]], axis=1)
    scale = target_length / (v[:, 0].max() - v[:, 0].min())
    return v * scale


def transform_mesh(verts, pose):
    """pose (7,) [x y z dx dy dz heading] -> verts placed in scene (scaled
    to the box dims in x, uniform)."""
    x, y, z, dx, dy, dz, ry = pose
    s = dx / max(verts[:, 0].max() - verts[:, 0].min(), 1e-6)
    v = verts * s
    c, si = np.cos(ry), np.sin(ry)
    rot = np.array([[c, si, 0], [-si, c, 0], [0, 0, 1.0]])
    return v @ rot + np.array([x, y, z])


def raycast_mesh(verts: np.ndarray, faces: np.ndarray, origin=(0, 0, 0),
                 az_res_deg: float = 0.2, el_res_deg: float = 0.4,
                 max_range: float = 120.0, block: int = 4096):
    """Cast a lidar-like ray grid at the mesh; return hit points (N, 3).

    Ray grid spans the mesh's angular bounding box at the given azimuth /
    elevation resolution (emulating beam spacing); Möller–Trumbore over all
    triangles, nearest hit per ray.
    """
    origin = np.asarray(origin, np.float64)
    rel = verts - origin
    az = np.arctan2(rel[:, 1], rel[:, 0])
    el = np.arcsin(rel[:, 2] / np.maximum(np.linalg.norm(rel, axis=1), 1e-9))
    azs = np.arange(az.min(), az.max(), np.deg2rad(az_res_deg))
    els = np.arange(el.min(), el.max(), np.deg2rad(el_res_deg))
    if len(azs) == 0 or len(els) == 0:
        return np.zeros((0, 3), np.float32)
    A, E = np.meshgrid(azs, els)
    dirs = np.stack([np.cos(E) * np.cos(A), np.cos(E) * np.sin(A),
                     np.sin(E)], axis=-1).reshape(-1, 3)

    v0 = verts[faces[:, 0]]
    e1 = verts[faces[:, 1]] - v0
    e2 = verts[faces[:, 2]] - v0

    hits = []
    for s in range(0, len(dirs), block):
        d = dirs[s:s + block]                        # (R, 3)
        # Möller–Trumbore, (R, F) broadcast
        p = np.cross(d[:, None, :], e2[None, :, :])  # (R, F, 3)
        det = np.einsum("fk,rfk->rf", e1, p)
        inv = np.where(np.abs(det) > 1e-12, 1.0 / det, 0.0)
        t0 = origin - v0                             # (F, 3)
        u = np.einsum("fk,rfk->rf", t0, p) * inv
        q = np.cross(t0[None, :, :], e1[None, :, :])  # (1, F, 3)
        vv = np.einsum("rk,rfk->rf", d, np.broadcast_to(q, (len(d),) + q.shape[1:]))
        vv = vv * inv
        t = np.einsum("fk,rfk->rf", e2, np.broadcast_to(q, (len(d),) + q.shape[1:]))
        t = t * inv
        ok = (np.abs(det) > 1e-12) & (u >= 0) & (vv >= 0) & (u + vv <= 1) & \
            (t > 1e-6) & (t < max_range)
        t = np.where(ok, t, np.inf)
        tmin = t.min(axis=1)
        hit = np.isfinite(tmin)
        hits.append(origin + d[hit] * tmin[hit, None])
    return np.concatenate(hits).astype(np.float32) if hits else \
        np.zeros((0, 3), np.float32)


def sample_surface(verts, faces, n: int, rng=None) -> np.ndarray:
    """Area-weighted uniform surface sampling (complete target)."""
    rng = rng or np.random.default_rng(0)
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
    probs = area / max(area.sum(), 1e-12)
    fi = rng.choice(len(faces), size=n, p=probs)
    r1 = np.sqrt(rng.random(n))
    r2 = rng.random(n)
    pts = (1 - r1)[:, None] * v0[fi] + (r1 * (1 - r2))[:, None] * v1[fi] + \
        (r1 * r2)[:, None] * v2[fi]
    return pts.astype(np.float32)


def generate_vc_dataset(mesh_paths, poses, out_dir: str, views_per_pose: int = 1,
                        n_complete: int = 16384, min_partial_pts: int = 30,
                        rng=None, logger=print):
    """For each mesh: place at each pose, raycast a partial view from the
    origin, save partial/complete pairs + gt boxes (reference
    generate_dataset, dataset_functions.py:378-462)."""
    rng = rng or np.random.default_rng(0)
    for mi, mesh_path in enumerate(mesh_paths):
        verts, faces = load_obj(mesh_path)
        verts = normalize_car_mesh(verts)
        dims = verts.max(0) - verts.min(0)
        model_dir = os.path.join(out_dir, f"model{mi:04d}")
        os.makedirs(os.path.join(model_dir, "partial"), exist_ok=True)

        labels = {}
        view = 0
        for pose in poses:
            pose = np.asarray(pose, np.float64)
            placed = transform_mesh(verts, pose)
            partial = raycast_mesh(placed, faces)
            if len(partial) < min_partial_pts:
                continue
            key = f"{view:03d}"
            np.save(os.path.join(model_dir, "partial", key + ".npy"), partial)
            s = pose[3] / dims[0]  # transform_mesh scales uniformly by dx ratio
            labels[key] = {"gtbox": np.array(
                [pose[0], pose[1], pose[2],
                 dims[0] * s, dims[1] * s, dims[2] * s, pose[6]], np.float32)}
            view += 1
        # complete surface in canonical pose
        complete = sample_surface(verts, faces, n_complete, rng)
        np.save(os.path.join(model_dir, "complete.npy"), complete)
        with open(os.path.join(model_dir, "labels.pkl"), "wb") as f:
            pickle.dump(labels, f)
        logger(f"model {mi}: {view} views")

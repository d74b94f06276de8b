"""Batched VCN inference wrapper.

Device analog of the reference wrapper (see/surface_completion/models/VCN.py):
resample every isolated object to 1024 points, run the completion net in
fixed-size batches, select the predicted points near the observed ones
(partial mesh), and keep the largest cluster.

Unlike the reference (pad-to-batch + python chunk loop + per-object CPU
cKDTree/DBSCAN), everything here is one jitted fixed-shape program; ragged
object counts are handled with a validity mask instead of trimming.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.clustering import largest_cluster_batch
from ...ops.sampling import partial_mesh_batch, tile_to_n
from ...utils.ckpt_compat import load_vcn_checkpoint
from .nets import build_vcn


def resample_to_fixed(pts_list, n: int = 1024) -> np.ndarray:
    """Host-side: list of (Ni, 3) arrays -> (B, n, 3) via cyclic tiling +
    random permutation (data_transforms.py:ResamplePoints semantics)."""
    out = np.zeros((len(pts_list), n, 3), dtype=np.float32)
    for i, p in enumerate(pts_list):
        p = np.asarray(p, dtype=np.float32)[:, :3]
        if len(p) == 0:
            continue
        reps = int(np.ceil(n / len(p)))
        tiled = np.tile(p, (reps, 1))[:n]
        out[i] = np.random.default_rng(0).permutation(tiled, axis=0)
    return out


@dataclass
class VCNInference:
    """cfg mirrors the reference SEE YAML block (MODEL, CKPT_PATH,
    NORM_WITH_GT, SEL_K_NEAREST, CLUSTER_EPS, BATCH_SIZE_LIMIT)."""
    model_name: str
    variables: dict
    norm_with_gt: bool
    sel_k: int = 30
    cluster_eps: float = 0.4
    batch_size: int = 32
    num_points: int = 1024

    @classmethod
    def from_cfg(cls, cfg):
        variables = load_vcn_checkpoint(cfg.CKPT_PATH, cfg.MODEL)
        return cls(
            model_name=cfg.MODEL,
            variables=variables,
            norm_with_gt=bool(cfg.NORM_WITH_GT),
            sel_k=int(cfg.get("SEL_K_NEAREST", 30)),
            cluster_eps=float(cfg.get("CLUSTER_EPS", 0.4)),
            batch_size=int(cfg.get("BATCH_SIZE_LIMIT", 32) or 32),
        )

    def __post_init__(self):
        # pin weights on device once — numpy pytrees (transposed views from
        # the .pth import) would otherwise re-transfer host->device per call
        self.variables = jax.device_put(
            jax.tree.map(lambda a: jnp.asarray(np.ascontiguousarray(a)), self.variables))
        self._model = build_vcn(self.model_name, num_coarse=self.num_points,
                                sel_k=self.sel_k)
        self._forward = jax.jit(partial(_forward_chain,
                                        model=self._model,
                                        sel_k=self.sel_k,
                                        eps=self.cluster_eps))

    def __call__(self, pts_list, gtboxes=None):
        """pts_list: list of (Ni, 3) numpy arrays (isolated objects).

        Returns dict with 'input', 'coarse', 'surface', 'clustered'
        (each (B, 1024, 3) numpy) matching VCN.inference's out_dict.
        """
        b = len(pts_list)
        pad = (-b) % self.batch_size
        inp = resample_to_fixed(pts_list, self.num_points)
        if pad:
            inp = np.concatenate([inp, np.zeros((pad, self.num_points, 3), np.float32)])
        obj_valid = np.arange(len(inp)) < b

        gt = None
        if self.norm_with_gt:
            assert gtboxes is not None, "NORM_WITH_GT model needs gt boxes"
            gt = np.zeros((len(inp), 7), dtype=np.float32)
            gt[:b] = np.stack([np.asarray(g, dtype=np.float32)[:7] for g in gtboxes])
            gt[b:, 3:6] = 1.0  # benign pad boxes (avoid div by 0 in scale norm)

        # keep results stacked on device; ONE host readback at the end
        # (device->host transfers are the expensive edge of this pipeline)
        chunks = []
        for s in range(0, len(inp), self.batch_size):
            chunk = jnp.asarray(inp[s:s + self.batch_size])
            gchunk = jnp.asarray(gt[s:s + self.batch_size]) if gt is not None else None
            chunks.append(self._forward(self.variables, chunk, gchunk))
        stacked = np.asarray(jnp.concatenate([c for c in chunks], axis=1))  # (4, B, n, 3)
        names = ("input", "coarse", "surface", "clustered")
        return {k: stacked[i, :b] for i, k in enumerate(names)}


def _forward_chain(variables, pc, gt, *, model, sel_k, eps):
    """Returns (4, B, n, 3): [input, coarse, surface, clustered] stacked so
    the caller can read everything back in a single transfer."""
    in_dict = {"input": pc}
    if gt is not None:
        in_dict["gt_boxes"] = gt
    ret = model.apply(variables, in_dict)
    coarse = ret["coarse"]
    surface = partial_mesh_batch(pc, coarse, k=sel_k, surface_pts=coarse.shape[1])
    clustered = largest_cluster_batch(surface, eps=eps, min_points=2,
                                      total_pts=coarse.shape[1])
    return jnp.stack([pc, coarse, surface, clustered])

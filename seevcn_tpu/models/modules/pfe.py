"""Point feature extraction: VoxelSetAbstraction for PV-RCNN.

Reference: detector3d/pcdet/models/backbones_3d/pfe/voxel_set_abstraction.py
:124-411 — per frame: FPS keypoints from raw points, then aggregate
(a) bilinear BEV features at keypoint xy, (b) multi-scale SA groups over raw
points, (c) SA groups over sparse-conv voxel centers at each named stage,
concatenated and fused by a Linear+BN+ReLU to NUM_OUTPUT_FEATURES.

The reference's "stack mode" CUDA kernels become masked dense ball queries
(ops.pointnet2); per-frame support sets are selected from the global sparse
tensor by batch-id masks.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import sparse as SP
from ...ops.pointnet2 import (_GRID_BQ_MIN_SUPPORT, ball_query,
                              build_grid_table, grid_ball_query_table,
                              group_features, masked_max_pool)
from ...ops.sampling import (farthest_point_sample, grid_subsample,
                             sample_points_with_roi_mask, sector_fps_sample)
from .roi_heads import bilinear_sample


class SAGroupMLP(nn.Module):
    """Shared MLP over grouped (K, nsample, 3+C) + masked max-pool."""
    mlp: Sequence[int]

    @nn.compact
    def __call__(self, grouped, valid, train: bool = False):
        k, ns, c = grouped.shape
        x = grouped.reshape(k * ns, c)
        for i, f in enumerate(self.mlp):
            x = nn.Dense(f, use_bias=False, name=f"dense{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, name=f"bn{i}")(x)
            x = nn.relu(x)
        return masked_max_pool(x.reshape(k, ns, -1), valid)


class SALayer(nn.Module):
    """Multi-radius set abstraction around query points.

    BATCHED: new_xyz (B, K, 3), support_xyz (B, N, 3), support_feats
    (B, N, C) or None, support_valid (B, N) -> (B, K, sum(mlps[-1])).
    The neighbor gather is a pure function vmapped over the batch; the
    parametric MLPs (with BatchNorm) run on the flattened (B*K, S, C)
    tensor OUTSIDE any vmap — flax mutable state written from inside
    jax.vmap leaks tracers under an enclosing jit (jitted train steps).
    """
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    exact_ball_query: bool = False   # cfg EXACT_BALL_QUERY (ADVICE r3)

    @nn.compact
    def __call__(self, new_xyz, support_xyz, support_feats, support_valid,
                 train: bool = False):
        b, k = new_xyz.shape[:2]
        outs = []
        # one hash table per support set, shared by every radius: the
        # build (an argsort over N) dominates a grid ball query, so cell
        # = max(radii) and each radius only re-runs the cheap probe phase.
        # Capacity must be sized for the CELL, not the smallest query:
        # a max-radius cell holds ~(max_r/min_r)^2 more surface-scan
        # points than a min-radius cell, and bucket overflow drops the
        # highest-index members — which a small-radius query may need
        # for its first-N-by-index contract. Scale by the area ratio
        # (lidar points lie on ~2D surfaces), clamped for table memory.
        # table_size shrinks under PN2.table_size_for's entry budget so
        # cap=512 tables no longer cost ~0.25 GB per batch element
        # (ADVICE r3: B tables are live at once under the vmap below).
        shared_cell = float(max(self.radii))
        ratio2 = (shared_cell / max(float(min(self.radii)), 1e-3)) ** 2
        shared_cap = int(min(max(2 * max(int(n) for n in self.nsamples)
                                 * max(ratio2, 1.0), 64), 512))
        use_grid = support_xyz.shape[1] >= _GRID_BQ_MIN_SUPPORT
        if use_grid:
            from ...ops.pointnet2 import table_size_for
            tsize = table_size_for(support_xyz.shape[1], shared_cap)
            tables = jax.vmap(lambda s, v: build_grid_table(
                s, shared_cell, v, table_size=tsize,
                capacity=shared_cap))(support_xyz, support_valid)
        for i, (r, ns, mlp) in enumerate(zip(self.radii, self.nsamples, self.mlps)):
            def gather(q, sup, v, f=None, tab=None):
                if tab is not None:
                    # invalid supports never enter the table, so no
                    # re-check against v is needed here
                    idx, valid = grid_ball_query_table(
                        tab, q, shared_cell, float(r), int(ns),
                        exact=self.exact_ball_query)
                else:
                    idx, valid = ball_query(q, sup, float(r), int(ns), v,
                                            exact=self.exact_ball_query)
                return group_features(idx, valid, q, sup, f), valid

            args = (new_xyz, support_xyz, support_valid) + \
                (() if support_feats is None else (support_feats,))
            if use_grid:
                grouped, valid = jax.vmap(
                    lambda q, sup, v, *f_and_tab: gather(
                        q, sup, v, *f_and_tab[:-1], tab=f_and_tab[-1]))(
                    *args, tables)
            else:
                grouped, valid = jax.vmap(gather)(*args)
            g = grouped.reshape(b * k, *grouped.shape[2:])
            v = valid.reshape(b * k, -1)
            outs.append(SAGroupMLP(tuple(mlp), name=f"scale{i}")(g, v, train)
                        .reshape(b, k, -1))
        return jnp.concatenate(outs, axis=-1)


class VectorPoolAggregation(nn.Module):
    """One VectorPool group (reference pointnet2_stack vector_pool kernels,
    pv_rcnn_plusplus.yaml GROUP_CFG_*): neighbors within
    MAX_NEIGHBOR_DISTANCE are binned into an n1*n2*n3 local sub-voxel grid
    centered on the query; per-bin mean of [relative xyz, reduced features]
    is flattened in fixed bin order and run through POST_MLPS.

    Deviation (documented): the reference's LOCAL_AGGREGATION_TYPE
    'local_interpolation' interpolates each sub-voxel from its three nearest
    neighbors; this uses the reference's 'voxel_avg_pool' variant (per-bin
    mean) which keeps the op a single segment-mean on device.
    """
    num_local_voxel: Sequence[int]
    max_neighbor_distance: float
    nsample: int
    post_mlps: Sequence[int]
    num_reduced_channels: int

    @nn.compact
    def __call__(self, new_xyz, support_xyz, support_feats, support_valid,
                 train: bool = False):
        """BATCHED: (B, K, 3), (B, N, 3), (B, N, C)|None, (B, N) ->
        (B, K, post_mlps[-1]). Pure gather vmapped; MLPs flat (see SALayer
        note on BatchNorm under vmap)."""
        nv = tuple(int(v) for v in self.num_local_voxel)
        nbins = nv[0] * nv[1] * nv[2]
        r = float(self.max_neighbor_distance)
        b, k = new_xyz.shape[:2]

        if support_feats is not None and \
                support_feats.shape[-1] != self.num_reduced_channels:
            bs, n, c = support_feats.shape
            support_feats = nn.Dense(
                self.num_reduced_channels, use_bias=False, name="reduce")(
                support_feats.reshape(bs * n, c)).reshape(bs, n, -1)

        def gather(q, sup, v, f=None):
            idx, valid = ball_query(q, sup, r, int(self.nsample), v)
            safe = jnp.clip(idx, 0, sup.shape[0] - 1)
            rel = sup[safe] - q[:, None, :]                 # (K, S, 3)
            g = rel if f is None else jnp.concatenate([rel, f[safe]], -1)
            g = jnp.where(valid[..., None], g, 0.0)
            bin_f = (rel + r) / (2 * r)
            ib = [jnp.clip((bin_f[..., d] * nv[d]).astype(jnp.int32), 0,
                           nv[d] - 1) for d in range(3)]
            bins = (ib[0] * nv[1] + ib[1]) * nv[2] + ib[2]
            bins = jnp.where(valid, bins, nbins)
            onehot = jax.nn.one_hot(bins, nbins + 1, dtype=g.dtype)[..., :nbins]
            sums = jnp.einsum("ksb,ksc->kbc", onehot, g)
            counts = onehot.sum(axis=1)
            return sums / jnp.maximum(counts[..., None], 1.0)  # (K, nbins, C)

        if support_feats is None:
            means = jax.vmap(gather)(new_xyz, support_xyz, support_valid)
        else:
            means = jax.vmap(gather)(new_xyz, support_xyz, support_valid,
                                     support_feats)
        x = means.reshape(b * k, -1)
        for i, ch in enumerate(self.post_mlps):
            x = nn.Dense(int(ch), use_bias=False, name=f"post{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, name=f"post_bn{i}")(x)
            x = nn.relu(x)
        return x.reshape(b, k, -1)


class VectorPoolAggregationMSG(nn.Module):
    """VectorPoolAggregationModuleMSG: NUM_GROUPS VectorPool groups
    concatenated + MSG_POST_MLPS fusion."""
    group_cfgs: Sequence[dict]
    msg_post_mlps: Sequence[int]
    num_reduced_channels: int

    @nn.compact
    def __call__(self, new_xyz, support_xyz, support_feats, support_valid,
                 train: bool = False):
        outs = []
        for gi, gc in enumerate(self.group_cfgs):
            ns = int(gc.get("NEIGHBOR_NSAMPLE", -1))
            outs.append(VectorPoolAggregation(
                num_local_voxel=tuple(gc["NUM_LOCAL_VOXEL"]),
                max_neighbor_distance=float(gc["MAX_NEIGHBOR_DISTANCE"]),
                nsample=ns if ns > 0 else 32,
                post_mlps=tuple(gc["POST_MLPS"]),
                num_reduced_channels=self.num_reduced_channels,
                name=f"group{gi}")(new_xyz, support_xyz, support_feats,
                                   support_valid, train))
        x = jnp.concatenate(outs, axis=-1)
        b, k, c = x.shape
        x = x.reshape(b * k, c)
        for i, ch in enumerate(self.msg_post_mlps):
            x = nn.Dense(int(ch), use_bias=False, name=f"msg_post{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, name=f"msg_bn{i}")(x)
            x = nn.relu(x)
        return x.reshape(b, k, -1)


def build_sa_layer(sa_cfg, name: str):
    """SA_LAYER entry -> SALayer (StackSAModuleMSG) or VectorPool MSG."""
    if sa_cfg.get("NAME", "StackSAModuleMSG") == "VectorPoolAggregationModuleMSG":
        n_groups = int(sa_cfg["NUM_GROUPS"])
        groups = [dict(sa_cfg[f"GROUP_CFG_{i}"]) for i in range(n_groups)]
        return VectorPoolAggregationMSG(
            group_cfgs=tuple(groups),
            msg_post_mlps=tuple(sa_cfg.get("MSG_POST_MLPS", ())),
            num_reduced_channels=int(sa_cfg.get("NUM_REDUCED_CHANNELS", 32)),
            name=name)
    return SALayer(tuple(float(r) for r in sa_cfg["POOL_RADIUS"]),
                   tuple(int(n) for n in sa_cfg["NSAMPLE"]),
                   tuple(tuple(m) for m in sa_cfg["MLPS"]),
                   exact_ball_query=bool(sa_cfg.get("EXACT_BALL_QUERY",
                                                    False)), name=name)


class VoxelSetAbstraction(nn.Module):
    pfe_cfg: Any
    point_cloud_range: tuple
    voxel_size: tuple

    @nn.compact
    def __call__(self, points, points_valid, bev, bev_stride,
                 multi_scale_3d: dict, train: bool = False,
                 rois=None, roi_mask=None):
        """points (B, P, 3+), bev (B, H, W, C), multi_scale_3d: name ->
        SparseTensor. Returns dict with keypoints (B, K, 3),
        point_features (B, K, F), point_features_before_fusion.

        SAMPLE_METHOD FPS (default) FPS-samples raw points; SPC (PV-RCNN++,
        voxel_set_abstraction.py:206-224 sectorized_proposal_centric_sampling)
        restricts to the ROI neighbourhood (half-diagonal + radius) then
        runs azimuthal-sector quota FPS — requires ``rois`` (B, M, 7+) and
        ``roi_mask`` (B, M)."""
        cfg = self.pfe_cfg
        k = int(cfg["NUM_KEYPOINTS"])
        pcr = jnp.asarray(self.point_cloud_range)
        vs = jnp.asarray(self.voxel_size)

        # --- keypoints: per-frame (sector-)FPS over raw points -------------
        if cfg.get("SAMPLE_METHOD", "FPS") == "SPC" and rois is None:
            # the detector never passed proposals (plain PV-RCNN /
            # VoxelRCNN topology) — erroring beats silently training
            # with FPS keypoints under an SPC config
            raise ValueError(
                "PFE SAMPLE_METHOD: SPC requires a detector that feeds "
                "rois into the PFE (PV-RCNN++ topology); this detector "
                "passed none — use SAMPLE_METHOD: FPS or a ++ config")
        if cfg.get("SAMPLE_METHOD", "FPS") == "SPC" and rois is not None:
            spc = cfg["SPC_SAMPLING"]
            radius = float(spc["SAMPLE_RADIUS_WITH_ROI"])
            num_sectors = int(spc["NUM_SECTORS"])

            spc_pre_cell = float(cfg.get("FPS_PRE_GRID_CELL", 0.35))
            spc_pre_cap = 1 << 15

            def sample_one(pts, valid, r, rm):
                near = sample_points_with_roi_mask(pts[:, :3], r, rm, radius,
                                                   valid)
                # reference falls back to points[:1] when nothing is near a
                # roi; falling back to all valid points keeps K useful picks
                near = jnp.where(near.any(), near, valid)
                if spc_pre_cell > 0 and pts.shape[0] > spc_pre_cap:
                    sidx, sok = grid_subsample(pts[:, :3], near,
                                               spc_pre_cell, spc_pre_cap)
                    sub = pts[sidx, :3]
                    idx, _ = sector_fps_sample(sub, sok, k, num_sectors)
                    return sub[idx]
                idx, _ = sector_fps_sample(pts[:, :3], near, k, num_sectors)
                return pts[idx, :3]

            keypoints = jax.vmap(sample_one)(points, points_valid,
                                             rois, roi_mask)
        else:
            # big clouds: grid-dedupe to <=32k representatives first —
            # the serial FPS scan is O(K*P) (163 ms at 4096 x 150k); FPS
            # over 0.35 m-cell representatives is equivalent at keypoint
            # spacings of metres. FPS_PRE_GRID_CELL: 0 opts out.
            pre_cell = float(cfg.get("FPS_PRE_GRID_CELL", 0.35))
            pre_cap = 1 << 15

            def sample_one(pts, valid):
                if pre_cell > 0 and pts.shape[0] > pre_cap:
                    sidx, sok = grid_subsample(pts[:, :3], valid, pre_cell,
                                               pre_cap)
                    sub = pts[sidx, :3]
                    idx = farthest_point_sample(sub, k, sok)
                    return sub[idx]
                idx = farthest_point_sample(pts[:, :3], k, valid)
                return pts[idx, :3]

            keypoints = jax.vmap(sample_one)(points, points_valid)  # (B, K, 3)

        feats = []
        sources = list(cfg["FEATURES_SOURCE"])

        if "bev" in sources:
            def bev_one(kp, fmap):
                x = (kp[:, 0] - pcr[0]) / vs[0] / bev_stride
                y = (kp[:, 1] - pcr[1]) / vs[1] / bev_stride
                return bilinear_sample(fmap, jnp.stack([x, y], axis=-1))

            feats.append(jax.vmap(bev_one)(keypoints, bev))     # (B, K, Cbev)

        if "raw_points" in sources:
            sa_cfg = cfg["SA_LAYER"]["raw_points"]
            layer = build_sa_layer(sa_cfg, name="sa_raw_points")
            feats.append(layer(
                keypoints, points[..., :3],
                points[..., 3:] if points.shape[-1] > 3 else None,
                points_valid, train))

        for name in sources:
            if not name.startswith("x_conv"):
                continue
            st: SP.SparseTensor = multi_scale_3d[name]
            sa_cfg = cfg["SA_LAYER"][name]
            ds = float(sa_cfg.get("DOWNSAMPLE_FACTOR",
                                  {"x_conv1": 1, "x_conv2": 2,
                                   "x_conv3": 4, "x_conv4": 8}[name]))
            # voxel centers in metric space (coords [b, z, y, x])
            centers = jnp.stack([
                (st.coords[:, 3].astype(jnp.float32) + 0.5) * vs[0] * ds + pcr[0],
                (st.coords[:, 2].astype(jnp.float32) + 0.5) * vs[1] * ds + pcr[1],
                (st.coords[:, 1].astype(jnp.float32) + 0.5) * vs[2] * ds + pcr[2],
            ], axis=1)
            layer = build_sa_layer(sa_cfg, name=f"sa_{name}")
            bsz = keypoints.shape[0]
            frame_masks = st.mask[None] & (
                st.coords[None, :, 0] == jnp.arange(bsz)[:, None])
            sup = jnp.broadcast_to(centers, (bsz,) + centers.shape)
            fts = jnp.broadcast_to(st.features, (bsz,) + st.features.shape)
            feats.append(layer(keypoints, sup, fts, frame_masks, train))

        before_fusion = jnp.concatenate(feats, axis=-1)          # (B, K, Ctot)
        b, kk, c = before_fusion.shape
        x = before_fusion.reshape(b * kk, c)
        x = nn.Dense(int(cfg["NUM_OUTPUT_FEATURES"]), use_bias=False,
                     name="fusion_dense")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, name="fusion_bn")(x)
        x = nn.relu(x).reshape(b, kk, -1)
        return {"keypoints": keypoints, "point_features": x,
                "point_features_before_fusion": before_fusion}

"""VCN completion networks (flax), with losses.

Re-implements the two reference models TPU-first:
  * VCN_CN — GT-canonicalized completion
    (see/surface_completion/models/vcn/models/VCN_CN.py:111-157)
  * VCN_VC — viewer-centred completion with self-regressed pose
    (see/surface_completion/models/vcn/models/VCN_VC.py:110-214)

Both take fixed (B, 1024, 3) point sets (the reference resamples every
object to 1024 points before the net, models/VCN.py:52-66). Channel-last
layout so pointwise Conv1d(k=1) becomes Dense and the (B*N, C) matmuls tile
onto the MXU. BatchNorm matches torch defaults (eps 1e-5, momentum 0.1 ->
flax momentum 0.9) so imported running stats reproduce reference outputs.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...geom import transforms as T
from ...ops.chamfer import chamfer_l2
from ...ops.sampling import fps, partial_mesh_batch


def smooth_l1(pred, target, beta: float = 1.0):
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def get_dims(pts: jax.Array) -> jax.Array:
    """(B, N, 3) -> (B, 3) axis-aligned extents (bbox_utils.get_dims)."""
    return pts.max(axis=1) - pts.min(axis=1)


def get_bbox_from_keypoints(pts: jax.Array, gt_box: jax.Array) -> jax.Array:
    """Box from predicted points: mean-bounds centre, rotated extents, GT
    heading (bbox_utils.get_bbox_from_keypoints)."""
    heading = gt_box[:, -1]
    maxp = pts.max(axis=1, keepdims=True)
    minp = pts.min(axis=1, keepdims=True)
    centre = (maxp + minp) / 2
    norm = T.rotate_points_along_z(pts - centre, -heading)
    dims = get_dims(norm)
    return jnp.concatenate([centre[:, 0], dims, heading[:, None]], axis=1)


class PointMLP(nn.Module):
    """Pointwise Conv1d(k=1)+BN+ReLU stack; last layer linear (no BN/act).

    Runs on (B*N, C) internally: rank-3 x rank-2 dots trip a libtpu
    SpatialMajorConvolution fusion CHECK on v5e; flat 2D GEMMs do not, and
    tile the MXU better anyway.
    """
    features: Sequence[int]

    @nn.compact
    def __call__(self, x, train: bool = False):
        shape = x.shape
        x = x.reshape(-1, shape[-1])
        for i, f in enumerate(self.features):
            x = nn.Dense(f, name=f"dense{i}")(x)
            if i != len(self.features) - 1:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name=f"bn{i}")(x)
                x = nn.relu(x)
        return x.reshape(*shape[:-1], x.shape[-1])


class FeatureEncoder(nn.Module):
    """PCN-style two-stage point encoder (VCN_CN.py:82-107).

    (B, N, 3) -> (B, dims[-1]) global feature via shared MLPs + max-pool +
    global-local concat.
    """
    dims: Sequence[int] = (3, 128, 256, 512, 512, 1024)

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dims
        feat = PointMLP([d[1], d[2]], name="mlp_conv1")(x, train)      # (B, N, d2)
        glob = feat.max(axis=1, keepdims=True)                          # (B, 1, d2)
        feat = jnp.concatenate(
            [jnp.broadcast_to(glob, feat.shape), feat], axis=-1)        # (B, N, 2*d2)
        feat = PointMLP([d[4], d[5]], name="mlp_conv2")(feat, train)    # (B, N, d5)
        return feat.max(axis=1)                                         # (B, d5)


class FCDecoder(nn.Module):
    """fc_layers(...) MLP decoder: Linear+ReLU pairs, last linear."""
    features: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, name=f"fc{i}")(x)
            if i != len(self.features) - 1:
                x = nn.relu(x)
        return x


class VCNCN(nn.Module):
    """GT-box-canonicalized surface completion (source-domain model)."""
    num_coarse: int = 1024
    sel_k: int = 30

    @nn.compact
    def __call__(self, in_dict, train: bool = False):
        pc = in_dict["input"]          # (B, N, 3)
        gt = in_dict["gt_boxes"]       # (B, 7)
        pc_cn = T.normalize_scale(T.vc_to_cn(pc, gt), gt)

        feat = FeatureEncoder(name="encoder")(pc_cn, train)
        coarse = FCDecoder([1024, 1024, 3 * self.num_coarse], name="shape_fc")(feat)
        coarse = coarse.reshape(-1, self.num_coarse, 3)

        coarse_vc = T.cn_to_vc(T.restore_scale(coarse, gt), gt)
        return {"coarse": coarse_vc}

    def loss(self, ret, in_dict):
        losses = {}
        ds_complete = fps(in_dict["complete"], ret["coarse"].shape[1])
        losses["coarse"] = chamfer_l2(ret["coarse"], ds_complete)
        pred_surface = partial_mesh_batch(in_dict["input"], ret["coarse"], k=self.sel_k)
        gt_surface = partial_mesh_batch(in_dict["input"], ds_complete, k=self.sel_k)
        losses["partial"] = chamfer_l2(pred_surface, gt_surface)
        return losses


class VCNVC(nn.Module):
    """Viewer-centred completion with self-regressed pose (target-domain)."""
    num_coarse: int = 1024
    sel_k: int = 30

    @nn.compact
    def __call__(self, in_dict, train: bool = False):
        pc = in_dict["input"]          # (B, N, 3)

        # frustum view: rotate the object onto the +x axis
        frustum_angle = jnp.arctan2(pc[:, :, 1].mean(axis=1), pc[:, :, 0].mean(axis=1))
        pc_fview = T.rotate_points_along_z(pc, -frustum_angle)
        pts_mean = pc_fview.mean(axis=1, keepdims=True)
        centred = pc_fview - pts_mean

        # pose regression: translation residual + ortho-6D rotation
        pose_feat = PoseEncoder(name="pose_encoder")(centred)
        rel_pose = FCDecoder([512, 9], name="pose_fc")(pose_feat)
        trans = rel_pose[:, None, :3]
        centre = pts_mean + trans
        rot_mat = T.rotation_matrix_from_ortho6d(rel_pose[:, 3:9])

        pc_cn = jnp.matmul(pc_fview - centre, jnp.swapaxes(rot_mat, -1, -2),
                           precision=jax.lax.Precision.HIGHEST)

        feat = FeatureEncoder(name="encoder")(pc_cn, train)
        coarse = FCDecoder([1024, 1024, 3 * self.num_coarse], name="shape_fc")(feat)
        coarse = coarse.reshape(-1, self.num_coarse, 3)
        coarse_vc = jnp.matmul(coarse, rot_mat,
                               precision=jax.lax.Precision.HIGHEST) + centre

        return {
            "coarse": T.rotate_points_along_z(coarse_vc, frustum_angle),
            "reg_rot": jnp.matmul(rot_mat, T.rot_z(frustum_angle),
                                  precision=jax.lax.Precision.HIGHEST),
            "reg_centre": T.rotate_points_along_z(centre, frustum_angle)[:, 0],
        }

    def loss(self, ret, in_dict):
        gt = in_dict["gt_boxes"]
        losses = {}
        pred_box = get_bbox_from_keypoints(ret["coarse"], gt)
        losses["dims"] = smooth_l1(gt[:, 3:6], pred_box[:, 3:6]).mean()
        losses["translation"] = smooth_l1(gt[:, :3], ret["reg_centre"]).mean()
        # Symmetry-folded geodesic target: car footprints are near
        # pi-symmetric, so partial scans carry a heading ambiguity of pi.
        # An unfolded target makes flipped samples contribute ~pi-sized
        # gradients that fight the correctly-oriented ones (round-4 run:
        # rotation loss oscillated 0.4-0.9 for 15 epochs at ROT_ERR_RAW
        # ~0.88 while symmetric ROT_ERR sat at 0.32). Folding matches the
        # reference's intent of a flip-insensitive angle treatment (its
        # sin-based loss, models/vcn/utils/losses.py:33-45) and the box
        # IoU downstream is invariant to heading+pi anyway.
        g0 = T.geodesic_distance(ret["reg_rot"], T.rot_z(gt[:, -1]))
        g1 = T.geodesic_distance(ret["reg_rot"], T.rot_z(gt[:, -1] + jnp.pi))
        losses["rotation"] = jnp.minimum(g0, g1).mean()
        ds_complete = fps(in_dict["complete"], ret["coarse"].shape[1])
        losses["coarse"] = chamfer_l2(ret["coarse"], ds_complete)
        pred_surface = partial_mesh_batch(in_dict["input"], ret["coarse"], k=self.sel_k)
        gt_surface = partial_mesh_batch(in_dict["input"], ds_complete, k=self.sel_k)
        losses["partial"] = chamfer_l2(pred_surface, gt_surface)
        return losses


class PoseEncoder(nn.Module):
    """Conv1d(3->64->128->1024) + LeakyReLU + global max (VCN_VC.py:116-123)."""

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        x = x.reshape(b * n, c)  # 2D GEMMs (see PointMLP note)
        x = nn.leaky_relu(nn.Dense(64, name="dense0")(x), 0.01)
        x = nn.leaky_relu(nn.Dense(128, name="dense1")(x), 0.01)
        x = nn.Dense(1024, name="dense2")(x)
        return x.reshape(b, n, -1).max(axis=1)


MODELS = {"VCN_CN": VCNCN, "VCN_VC": VCNVC, "PartialSC_CN": VCNCN, "PartialSC_VC": VCNVC}


def build_vcn(name: str, **kw):
    return MODELS[name](**kw)

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seevcn_tpu.models.vcn.nets import VCNCN, VCNVC, get_bbox_from_keypoints
from seevcn_tpu.utils import ckpt_compat


def _mk_conv1d(rng, cin, cout):
    return rng.randn(cout, cin, 1).astype(np.float32) * 0.1, rng.randn(cout).astype(np.float32) * 0.1


def _mk_linear(rng, cin, cout):
    return rng.randn(cout, cin).astype(np.float32) * 0.1, rng.randn(cout).astype(np.float32) * 0.1


def _mk_bn(rng, c):
    return {
        "weight": rng.rand(c).astype(np.float32) + 0.5,
        "bias": rng.randn(c).astype(np.float32) * 0.1,
        "running_mean": rng.randn(c).astype(np.float32) * 0.1,
        "running_var": rng.rand(c).astype(np.float32) + 0.5,
    }


def make_reference_vcn_state_dict(rng, variant="CN"):
    """Synthesize a state dict with the exact key names/shapes the reference
    VCN_CN/VCN_VC modules produce (VCN_CN.py:82-118, VCN_VC.py:111-141)."""
    sd = {}

    def add_conv(prefix, cin, cout):
        w, b = _mk_conv1d(rng, cin, cout)
        sd[f"{prefix}.weight"], sd[f"{prefix}.bias"] = w, b

    def add_bn(prefix, c):
        for k, v in _mk_bn(rng, c).items():
            sd[f"{prefix}.{k}"] = v

    def add_linear(prefix, cin, cout):
        w, b = _mk_linear(rng, cin, cout)
        sd[f"{prefix}.weight"], sd[f"{prefix}.bias"] = w, b

    # encoder: FeatureEncoder([3, 128, 256, 512, 512, 1024])
    add_conv("encoder.mlp_conv1.0", 3, 128)
    add_bn("encoder.mlp_conv1.1", 128)
    add_conv("encoder.mlp_conv1.3", 128, 256)
    add_conv("encoder.mlp_conv2.0", 512, 512)
    add_bn("encoder.mlp_conv2.1", 512)
    add_conv("encoder.mlp_conv2.3", 512, 1024)
    # shape_fc: fc_layers([1024, 1024, 1024, 3072])
    add_linear("shape_fc.0", 1024, 1024)
    add_linear("shape_fc.2", 1024, 1024)
    add_linear("shape_fc.4", 1024, 3072)
    if variant == "VC":
        add_conv("pose_encoder.0", 3, 64)
        add_conv("pose_encoder.2", 64, 128)
        add_conv("pose_encoder.4", 128, 1024)
        add_linear("pose_fc.0", 1024, 512)
        add_linear("pose_fc.2", 512, 9)
    return sd


# --- independent numpy forward reading the torch-format dict directly -------

def np_conv1d(sd, p, x):  # x (B, N, C)
    return x @ sd[f"{p}.weight"][:, :, 0].T + sd[f"{p}.bias"]


def np_bn(sd, p, x, eps=1e-5):
    return (x - sd[f"{p}.running_mean"]) / np.sqrt(sd[f"{p}.running_var"] + eps) * \
        sd[f"{p}.weight"] + sd[f"{p}.bias"]


def np_linear(sd, p, x):
    return x @ sd[f"{p}.weight"].T + sd[f"{p}.bias"]


def np_encoder(sd, x):
    n = x.shape[1]
    f = np_conv1d(sd, "encoder.mlp_conv1.0", x)
    f = np.maximum(np_bn(sd, "encoder.mlp_conv1.1", f), 0)
    f = np_conv1d(sd, "encoder.mlp_conv1.3", f)
    g = f.max(axis=1, keepdims=True)
    f = np.concatenate([np.broadcast_to(g, f.shape), f], axis=-1)
    f = np_conv1d(sd, "encoder.mlp_conv2.0", f)
    f = np.maximum(np_bn(sd, "encoder.mlp_conv2.1", f), 0)
    f = np_conv1d(sd, "encoder.mlp_conv2.3", f)
    return f.max(axis=1)


def np_shape_fc(sd, x):
    x = np.maximum(np_linear(sd, "shape_fc.0", x), 0)
    x = np.maximum(np_linear(sd, "shape_fc.2", x), 0)
    return np_linear(sd, "shape_fc.4", x)


def np_vcn_cn_forward(sd, pc, gt):
    centre = gt[:, None, :3]
    a = -gt[:, -1]
    c, s = np.cos(a), np.sin(a)
    rot = np.stack([np.stack([c, s], -1), np.stack([-s, c], -1)], -2)  # (B,2,2)
    rel = pc - centre
    xy = np.einsum("bnj,bjk->bnk", rel[..., :2], rot)
    pc_cn = np.concatenate([xy, rel[..., 2:]], -1) / gt[:, 3].reshape(-1, 1, 1)
    feat = np_encoder(sd, pc_cn)
    coarse = np_shape_fc(sd, feat).reshape(len(pc), -1, 3) * gt[:, 3].reshape(-1, 1, 1)
    a = gt[:, -1]
    c, s = np.cos(a), np.sin(a)
    rot = np.stack([np.stack([c, s], -1), np.stack([-s, c], -1)], -2)
    xy = np.einsum("bnj,bjk->bnk", coarse[..., :2], rot)
    return np.concatenate([xy, coarse[..., 2:]], -1) + centre


@pytest.fixture(scope="module")
def cn_setup():
    rng = np.random.RandomState(0)
    sd = make_reference_vcn_state_dict(rng, "CN")
    variables = ckpt_compat.vcn_variables_from_torch(sd, "VCN_CN")
    pc = rng.randn(2, 64, 3).astype(np.float32) + np.array([10, 5, 0], np.float32)
    gt = np.array([[10, 5, 0, 4.2, 1.9, 1.6, 0.7],
                   [10.5, 4.5, 0, 4.0, 1.8, 1.5, -1.2]], dtype=np.float32)
    return sd, variables, pc, gt


def test_vcn_cn_matches_numpy_reference(cn_setup):
    sd, variables, pc, gt = cn_setup
    model = VCNCN(num_coarse=1024)
    out = model.apply(variables, {"input": jnp.asarray(pc), "gt_boxes": jnp.asarray(gt)})
    ref = np_vcn_cn_forward(sd, pc, gt)
    np.testing.assert_allclose(np.asarray(out["coarse"]), ref, atol=2e-3, rtol=1e-3)


def test_vcn_cn_loss_runs(cn_setup):
    sd, variables, pc, gt = cn_setup
    model = VCNCN(num_coarse=1024)
    out = model.apply(variables, {"input": jnp.asarray(pc), "gt_boxes": jnp.asarray(gt)})
    complete = jnp.asarray(np.random.RandomState(1).randn(2, 2048, 3).astype(np.float32))
    losses = model.loss(out, {"input": jnp.asarray(pc), "gt_boxes": jnp.asarray(gt),
                              "complete": complete})
    for k in ("coarse", "partial"):
        assert np.isfinite(float(losses[k]))


def test_vcn_vc_forward_and_loss():
    rng = np.random.RandomState(2)
    sd = make_reference_vcn_state_dict(rng, "VC")
    variables = ckpt_compat.vcn_variables_from_torch(sd, "VCN_VC")
    model = VCNVC(num_coarse=1024)
    pc = jnp.asarray(rng.randn(3, 128, 3).astype(np.float32) + np.array([15, -3, 0], np.float32))
    out = model.apply(variables, {"input": pc})
    assert out["coarse"].shape == (3, 1024, 3)
    assert out["reg_rot"].shape == (3, 3, 3)
    assert out["reg_centre"].shape == (3, 3)
    # regressed rotation must be a valid rotation matrix
    R = np.asarray(out["reg_rot"])[0]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    gt = jnp.asarray(np.array([[15, -3, 0, 4.2, 1.9, 1.6, 0.3]] * 3, dtype=np.float32))
    complete = jnp.asarray(rng.randn(3, 2048, 3).astype(np.float32))
    losses = model.loss(out, {"input": pc, "gt_boxes": gt, "complete": complete})
    for k in ("dims", "translation", "rotation", "coarse", "partial"):
        assert np.isfinite(float(losses[k])), k


def test_vcn_vc_equivariance_under_frustum_rotation():
    """Rotating the input about z must rotate the completed output identically
    (the frustum-view canonicalization guarantees this by construction)."""
    rng = np.random.RandomState(3)
    sd = make_reference_vcn_state_dict(rng, "VC")
    variables = ckpt_compat.vcn_variables_from_torch(sd, "VCN_VC")
    model = VCNVC(num_coarse=1024)
    pc = rng.randn(1, 128, 3).astype(np.float32) + np.array([15, 0, 0], np.float32)

    from seevcn_tpu.geom.transforms import rotate_points_along_z
    ang = jnp.asarray([0.9])
    out1 = model.apply(variables, {"input": jnp.asarray(pc)})
    out2 = model.apply(variables, {"input": rotate_points_along_z(jnp.asarray(pc), ang)})
    rotated_coarse = rotate_points_along_z(out1["coarse"], ang)
    np.testing.assert_allclose(np.asarray(out2["coarse"]), np.asarray(rotated_coarse),
                               atol=5e-3)


def test_pth_roundtrip(tmp_path):
    """Write a real .pth with torch and load through load_vcn_checkpoint."""
    import torch

    rng = np.random.RandomState(4)
    sd = make_reference_vcn_state_dict(rng, "CN")
    tsd = {"module." + k: torch.from_numpy(v) for k, v in sd.items()}
    path = tmp_path / "vcn_cn.pth"
    torch.save({"base_model": tsd, "epoch": 7}, path)
    variables = ckpt_compat.load_vcn_checkpoint(str(path), "VCN_CN")
    k = variables["params"]["encoder"]["mlp_conv1"]["dense0"]["kernel"]
    np.testing.assert_allclose(np.asarray(k), sd["encoder.mlp_conv1.0.weight"][:, :, 0].T)


def test_get_bbox_from_keypoints():
    # axis-aligned unit box of points, heading 0
    pts = jnp.asarray([[[0.0, 0, 0], [4, 2, 1]]])
    gt = jnp.asarray([[9, 9, 9, 9, 9, 9, 0.0]])
    box = np.asarray(get_bbox_from_keypoints(pts, gt))[0]
    np.testing.assert_allclose(box, [2, 1, 0.5, 4, 2, 1, 0], atol=1e-5)


def test_vcn_inference_wrapper(tmp_path):
    """End-to-end wrapper: ragged object list -> fixed outputs, via a real
    .pth on disk and the cfg-driven constructor."""
    import torch
    from seevcn_tpu.models.vcn.inference import VCNInference
    from seevcn_tpu.utils.config import Cfg

    rng = np.random.RandomState(5)
    sd = make_reference_vcn_state_dict(rng, "VC")
    path = tmp_path / "vcn_vc.pth"
    torch.save({"base_model": {k: torch.from_numpy(v) for k, v in sd.items()}}, path)

    cfg = Cfg({"MODEL": "VCN_VC", "CKPT_PATH": str(path), "NORM_WITH_GT": False,
               "SEL_K_NEAREST": 5, "CLUSTER_EPS": 0.4, "BATCH_SIZE_LIMIT": 4})
    vcn = VCNInference.from_cfg(cfg)
    pts_list = [rng.randn(n, 3).astype(np.float32) + np.array([12, 2, 0], np.float32)
                for n in (45, 200, 33, 801, 64)]  # 5 objects -> pads to 8
    out = vcn(pts_list)
    for k in ("input", "coarse", "surface", "clustered"):
        assert out[k].shape == (5, 1024, 3), k
        assert np.isfinite(out[k]).all(), k

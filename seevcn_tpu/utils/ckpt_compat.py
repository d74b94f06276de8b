"""Checkpoint compatibility: read the reference's torch ``.pth`` pickles into
flax variable pytrees.

The reference ships pretrained VCN weights as
``{'base_model': state_dict, ...}`` (see/.../models/VCN.py:35-37,
models/vcn/tools/builder.py:114-151) and OpenPCDet detector weights as
``{'model_state': state_dict, 'epoch', 'optimizer_state', 'version'}``
(detector3d/tools/train_utils/train_utils.py:145-178). torch (CPU) is used
purely as a pickle reader; all arrays leave as numpy.

Layout conventions translated here:
  * torch Conv1d(k=1) weight (out, in, 1)  -> Dense kernel (in, out)
  * torch Linear weight (out, in)          -> Dense kernel (in, out)
  * torch Conv2d weight (out, in, kh, kw)  -> flax Conv kernel (kh, kw, in, out)
  * torch BatchNorm {weight, bias, running_mean, running_var}
      -> flax BatchNorm {scale, bias} + batch_stats {mean, var}
  * spconv SubMConv3d/SparseConv3d weight: spconv 2.x native layout is
    (out, kz, ky, kx, in); spconv 1.x checkpoints store (kz, ky, kx, in, out)
    — detector3d_template.py:330-359 sniffs which by shape; we normalize to
    our rulebook layout (K, in, out) with K flattened kz*ky*kx.
"""
from __future__ import annotations

import numpy as np


def load_torch_checkpoint(path: str) -> dict:
    """Read a torch .pth pickle -> nested dict of numpy arrays."""
    import torch  # CPU-only wheel; pickle reader, never compute

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return ckpt


def _np(t) -> np.ndarray:
    import torch

    if isinstance(t, torch.Tensor):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def state_dict_to_numpy(state_dict, strip_module: bool = True) -> dict:
    out = {}
    for k, v in state_dict.items():
        if strip_module and k.startswith("module."):
            k = k[len("module."):]
        out[k] = _np(v)
    return out


# ---------------------------------------------------------------------------
# leaf converters
# ---------------------------------------------------------------------------

def conv1d_to_dense(sd: dict, prefix: str) -> dict:
    w = sd[f"{prefix}.weight"]
    assert w.ndim == 3 and w.shape[-1] == 1, f"{prefix}: {w.shape}"
    return {"kernel": w[:, :, 0].T, "bias": sd[f"{prefix}.bias"]}


def linear_to_dense(sd: dict, prefix: str) -> dict:
    w = sd[f"{prefix}.weight"]
    assert w.ndim == 2, f"{prefix}: {w.shape}"
    return {"kernel": w.T, "bias": sd[f"{prefix}.bias"]}


def conv2d_to_conv(sd: dict, prefix: str, has_bias: bool = True) -> dict:
    w = sd[f"{prefix}.weight"]
    assert w.ndim == 4, f"{prefix}: {w.shape}"
    out = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    if has_bias and f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def deconv2d_to_convtranspose(sd: dict, prefix: str, has_bias: bool = True) -> dict:
    # torch ConvTranspose2d weight: (in, out, kh, kw) -> flax (kh, kw, in, out)
    w = sd[f"{prefix}.weight"]
    assert w.ndim == 4, f"{prefix}: {w.shape}"
    out = {"kernel": np.transpose(w, (2, 3, 0, 1))}
    if has_bias and f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def bn_split(sd: dict, prefix: str):
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]}
    return params, stats


def spconv3d_weight(sd: dict, prefix: str) -> np.ndarray:
    """spconv weight -> (K, in, out) rulebook layout (K = kz*ky*kx, z-major).

    Handles both spconv 1.x (kz,ky,kx,in,out) and 2.x (out,kz,ky,kx,in)
    on-disk layouts the same way detector3d_template.py:330-359 does (by
    checking which orientation matches the conv's declared shape is not
    possible here, so we sniff: 2.x puts out_channels first).
    """
    w = sd[f"{prefix}.weight"]
    assert w.ndim == 5, f"{prefix}: {w.shape}"
    # Heuristic matching the reference loader: native spconv 2.x layout has
    # (out, kz, ky, kx, in). 1.x has (kz, ky, kx, in, out). Kernel dims are
    # small (1/3); channel dims are >= 16 in every reference model.
    if w.shape[1] <= 3 and w.shape[2] <= 3 and w.shape[3] <= 3:
        w = np.transpose(w, (1, 2, 3, 4, 0))  # -> (kz, ky, kx, in, out)
    k = w.shape[0] * w.shape[1] * w.shape[2]
    return w.reshape(k, w.shape[3], w.shape[4])


# ---------------------------------------------------------------------------
# VCN model import
# ---------------------------------------------------------------------------

def _point_mlp(sd, tp, conv_idx=(0, 3), bn_idx=(1,)):
    """Reference conv_layers/mlp_conv Sequential -> PointMLP variables."""
    params, stats = {}, {}
    for i, ci in enumerate(conv_idx):
        params[f"dense{i}"] = conv1d_to_dense(sd, f"{tp}.{ci}")
    for i, bi in enumerate(bn_idx):
        p, s = bn_split(sd, f"{tp}.{bi}")
        params[f"bn{i}"] = p
        stats[f"bn{i}"] = s
    return params, stats


def _fc_decoder(sd, tp, idxs):
    return {f"fc{i}": linear_to_dense(sd, f"{tp}.{li}") for i, li in enumerate(idxs)}


def vcn_variables_from_torch(state_dict, model_name: str) -> dict:
    """Map a reference VCN_CN/VCN_VC state dict to flax variables for
    seevcn_tpu.models.vcn.nets.{VCNCN,VCNVC}."""
    sd = state_dict_to_numpy(state_dict)

    enc1_p, enc1_s = _point_mlp(sd, "encoder.mlp_conv1")
    enc2_p, enc2_s = _point_mlp(sd, "encoder.mlp_conv2")
    params = {
        "encoder": {"mlp_conv1": enc1_p, "mlp_conv2": enc2_p},
        "shape_fc": _fc_decoder(sd, "shape_fc", (0, 2, 4)),
    }
    stats = {"encoder": {"mlp_conv1": enc1_s, "mlp_conv2": enc2_s}}

    if model_name.upper().endswith("VC"):
        params["pose_encoder"] = {
            "dense0": conv1d_to_dense(sd, "pose_encoder.0"),
            "dense1": conv1d_to_dense(sd, "pose_encoder.2"),
            "dense2": conv1d_to_dense(sd, "pose_encoder.4"),
        }
        params["pose_fc"] = _fc_decoder(sd, "pose_fc", (0, 2))
        # final_conv.* exists in reference VCN_VC but is unused in forward

    return {"params": params, "batch_stats": stats}


def load_vcn_checkpoint(path: str, model_name: str) -> dict:
    ckpt = load_torch_checkpoint(path)
    sd = ckpt.get("base_model", ckpt)
    return vcn_variables_from_torch(sd, model_name)

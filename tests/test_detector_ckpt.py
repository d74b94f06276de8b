"""OpenPCDet checkpoint import: synthesize a state dict with the exact key
names/shapes the reference SECONDNetIoU produces, import, and require the
variable tree to match model.init exactly (structure + shapes)."""
import pytest

import numpy as np
import jax
import jax.numpy as jnp

from seevcn_tpu.utils import ckpt_compat
from seevcn_tpu.models.detectors.second import build_detector
from test_detector import _mini_cfg, _fake_batch

pytestmark = pytest.mark.slow  # heavy tier: full model/backbone builds


def make_reference_second_iou_state_dict(rng, cfg):
    """Key names per reference module structure:
    VoxelBackBone8x (spconv_backbone.py:69-124), BaseBEVBackbone
    (base_bev_backbone.py:26-77), AnchorHeadSingle (anchor_head_single.py:
    17-33), SECONDHead (second_head.py:15-35 + make_fc_layers)."""
    sd = {}

    def spconv(prefix, cin, cout, k=(3, 3, 3)):
        # spconv 2.x layout (out, kz, ky, kx, in)
        sd[f"{prefix}.weight"] = rng.randn(cout, *k, cin).astype(np.float32) * 0.05

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[f"{prefix}.bias"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{prefix}.running_var"] = rng.rand(c).astype(np.float32) + 0.5

    def conv2d(prefix, cin, cout, k=3, bias=False):
        sd[f"{prefix}.weight"] = rng.randn(cout, cin, k, k).astype(np.float32) * 0.05
        if bias:
            sd[f"{prefix}.bias"] = rng.randn(cout).astype(np.float32) * 0.1

    def deconv2d(prefix, cin, cout, k):
        sd[f"{prefix}.weight"] = rng.randn(cin, cout, k, k).astype(np.float32) * 0.05

    def conv1d(prefix, cin, cout, bias=False):
        sd[f"{prefix}.weight"] = rng.randn(cout, cin, 1).astype(np.float32) * 0.05
        if bias:
            sd[f"{prefix}.bias"] = rng.randn(cout).astype(np.float32) * 0.1

    # ---- backbone_3d -----------------------------------------------------
    spconv("backbone_3d.conv_input.0", 3, 16)
    bn("backbone_3d.conv_input.1", 16)
    spconv("backbone_3d.conv1.0.0", 16, 16)
    bn("backbone_3d.conv1.0.1", 16)
    plan = {2: (16, 32), 3: (32, 64), 4: (64, 64)}
    for stage, (cin, cout) in plan.items():
        spconv(f"backbone_3d.conv{stage}.0.0", cin, cout)
        bn(f"backbone_3d.conv{stage}.0.1", cout)
        for j in (1, 2):
            spconv(f"backbone_3d.conv{stage}.{j}.0", cout, cout)
            bn(f"backbone_3d.conv{stage}.{j}.1", cout)
    spconv("backbone_3d.conv_out.0", 64, 128, k=(3, 1, 1))
    bn("backbone_3d.conv_out.1", 128)

    # ---- backbone_2d (mini cfg: LAYER_NUMS [2,2], filters [32,64]) --------
    b2 = cfg.MODEL.BACKBONE_2D
    cin = 256  # 128 ch * nz 2 after height compression
    for i, n in enumerate(b2.LAYER_NUMS):
        cout = b2.NUM_FILTERS[i]
        conv2d(f"backbone_2d.blocks.{i}.1", cin, cout)
        bn(f"backbone_2d.blocks.{i}.2", cout)
        for k in range(n):
            conv2d(f"backbone_2d.blocks.{i}.{4 + 3 * k}", cout, cout)
            bn(f"backbone_2d.blocks.{i}.{5 + 3 * k}", cout)
        cin = cout
    for i, s in enumerate(b2.UPSAMPLE_STRIDES):
        cu = b2.NUM_UPSAMPLE_FILTERS[i]
        deconv2d(f"backbone_2d.deblocks.{i}.0", b2.NUM_FILTERS[i], cu, int(s))
        bn(f"backbone_2d.deblocks.{i}.1", cu)

    # ---- dense_head --------------------------------------------------------
    c_bev = sum(b2.NUM_UPSAMPLE_FILTERS)
    npl = 2  # anchors per location in mini cfg
    conv2d("dense_head.conv_cls", c_bev, npl * 1, k=1, bias=True)
    conv2d("dense_head.conv_box", c_bev, npl * 7, k=1, bias=True)
    conv2d("dense_head.conv_dir_cls", c_bev, npl * 2, k=1, bias=True)

    # ---- roi_head ----------------------------------------------------------
    r = cfg.MODEL.ROI_HEAD
    cin = c_bev * r.ROI_GRID_POOL.GRID_SIZE ** 2
    # shared_fc_layer: conv,bn,relu,[dropout],conv,bn,relu
    conv1d("roi_head.shared_fc_layer.0", cin, r.SHARED_FC[0])
    bn("roi_head.shared_fc_layer.1", r.SHARED_FC[0])
    conv1d("roi_head.shared_fc_layer.4", r.SHARED_FC[0], r.SHARED_FC[1])
    bn("roi_head.shared_fc_layer.5", r.SHARED_FC[1])
    # iou_layers: conv,bn,relu,dropout(k==0),conv,bn,relu,final conv
    conv1d("roi_head.iou_layers.0", r.SHARED_FC[-1], r.IOU_FC[0])
    bn("roi_head.iou_layers.1", r.IOU_FC[0])
    conv1d("roi_head.iou_layers.4", r.IOU_FC[0], r.IOU_FC[1])
    bn("roi_head.iou_layers.5", r.IOU_FC[1])
    conv1d("roi_head.iou_layers.7", r.IOU_FC[1], 1, bias=True)
    return sd


def test_detector_ckpt_import_matches_init_tree():
    cfg = _mini_cfg()
    model, dcfg = build_detector(cfg)
    rng = np.random.RandomState(0)
    pts, valid, gt = _fake_batch(rng)
    init_vars = model.init({"params": jax.random.PRNGKey(0)}, pts, valid,
                           train=False)

    sd = make_reference_second_iou_state_dict(rng, cfg)
    imported = ckpt_compat.detector_variables_from_torch(sd, "SECONDNetIoU")

    init_shapes = jax.tree.map(lambda a: tuple(a.shape), init_vars["params"])
    imp_shapes = jax.tree.map(lambda a: tuple(np.shape(a)), imported["params"])
    flat_init = dict(jax.tree_util.tree_flatten_with_path(init_shapes)[0])
    flat_imp = dict(jax.tree_util.tree_flatten_with_path(imp_shapes)[0])
    missing = set(flat_init) - set(flat_imp)
    extra = set(flat_imp) - set(flat_init)
    assert not missing, f"ckpt import missing params: {sorted(missing)[:8]}"
    assert not extra, f"ckpt import extra params: {sorted(extra)[:8]}"
    for k in flat_init:
        assert flat_init[k] == flat_imp[k], (k, flat_init[k], flat_imp[k])

    # batch_stats tree must match too
    init_bs = dict(jax.tree_util.tree_flatten_with_path(
        jax.tree.map(lambda a: tuple(a.shape), init_vars["batch_stats"]))[0])
    imp_bs = dict(jax.tree_util.tree_flatten_with_path(
        jax.tree.map(lambda a: tuple(np.shape(a)), imported["batch_stats"]))[0])
    assert set(init_bs) == set(imp_bs)

    # and the model must run with the imported weights
    imported = jax.tree.map(jnp.asarray, imported)
    out = model.apply(imported, pts, valid, train=False)
    assert np.isfinite(np.asarray(out["rcnn_iou"])).all()
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()


def test_pth_detector_roundtrip(tmp_path):
    import torch

    cfg = _mini_cfg()
    rng = np.random.RandomState(1)
    sd = make_reference_second_iou_state_dict(rng, cfg)
    path = tmp_path / "det.pth"
    torch.save({"model_state": {k: torch.from_numpy(v) for k, v in sd.items()},
                "epoch": 30, "version": "pcdet+0.5.2"}, path)
    variables = ckpt_compat.load_detector_checkpoint(str(path))
    w = variables["params"]["backbone_3d"]["conv_input"]["kernel"]
    assert np.shape(w) == (27, 3, 16)
    # spconv 2.x (out,kz,ky,kx,in) -> (K,in,out): check one element maps right
    ref = sd["backbone_3d.conv_input.0.weight"]  # (16,3,3,3,3)
    np.testing.assert_allclose(np.asarray(w)[0, 0, 0], ref[0, 0, 0, 0, 0])


def test_multihead_ckpt_export_import_roundtrip():
    """AnchorHeadMulti layout: export to the reference's
    dense_head.shared_conv.{0,1} + dense_head.rpn_heads.{i}.conv_* naming,
    reimport, and get the identical tree back."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_detector import _mini_cfg as _mc

    cfg = _mc()
    cfg["CLASS_NAMES"] = ["Car", "Pedestrian"]
    ag = cfg["MODEL"]["DENSE_HEAD"]["ANCHOR_GENERATOR_CONFIG"]
    ped = dict(ag[0], class_name="Pedestrian",
               anchor_sizes=[[0.8, 0.6, 1.73]])
    cfg["MODEL"]["DENSE_HEAD"]["ANCHOR_GENERATOR_CONFIG"] = [ag[0], ped]
    cfg["MODEL"]["DENSE_HEAD"]["NAME"] = "AnchorHeadMulti"
    cfg["MODEL"]["DENSE_HEAD"]["SHARED_CONV_NUM_FILTER"] = 32
    cfg["MODEL"]["DENSE_HEAD"]["CLASS_NAMES_EACH_HEAD"] = [["Car"],
                                                           ["Pedestrian"]]
    cfg["MODEL"]["NAME"] = "SECONDNet"
    cfg["MODEL"].pop("ROI_HEAD", None)
    model, dcfg = build_detector(cfg)
    rng = np.random.RandomState(0)
    pts, valid, gt = _fake_batch(rng)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pts, valid,
                           train=False)
    host = {"params": jax.tree.map(np.asarray, variables["params"]),
            "batch_stats": jax.tree.map(np.asarray,
                                        variables["batch_stats"])}
    sd = ckpt_compat.detector_state_dict_from_variables(host, "SECONDNet")
    assert "dense_head.rpn_heads.0.conv_cls.weight" in sd
    assert "dense_head.rpn_heads.1.conv_box.weight" in sd
    assert "dense_head.shared_conv.0.weight" in sd
    assert "dense_head.shared_conv.1.running_mean" in sd

    imported = ckpt_compat.detector_variables_from_torch(sd, "SECONDNet")
    ref = dict(jax.tree_util.tree_flatten_with_path(host["params"])[0])
    imp = dict(jax.tree_util.tree_flatten_with_path(imported["params"])[0])
    assert set(ref) == set(imp), (sorted(set(ref) ^ set(imp))[:6])
    for k in ref:
        np.testing.assert_allclose(np.asarray(imp[k]), np.asarray(ref[k]),
                                   atol=1e-6, err_msg=str(k))
    out = model.apply(jax.tree.map(jnp.asarray, imported), pts, valid,
                      train=False)
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()


def test_convtranspose_import_numeric_parity_with_torch():
    """Imported ConvTranspose2d weights must make flax nn.ConvTranspose
    reproduce torch.nn.functional.conv_transpose2d exactly (the deblock
    upsample path, base_bev_backbone.py UPSAMPLE_STRIDES): torch scatters
    w[..., i, j] at output offset +i,+j while flax places taps mirrored, so
    the importer flips the spatial axes."""
    import torch
    import flax.linen as nn

    rng = np.random.RandomState(3)
    cin, cout, k = 5, 4, 2
    w = rng.randn(cin, cout, k, k).astype(np.float32)  # torch (in,out,kh,kw)
    x = rng.randn(2, cin, 8, 8).astype(np.float32)     # NCHW

    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), stride=k).numpy()

    leaf = ckpt_compat.deconv2d_to_convtranspose(
        {"p.weight": w}, "p", has_bias=False)
    mod = nn.ConvTranspose(cout, (k, k), strides=(k, k), padding="VALID",
                           use_bias=False)
    y = mod.apply({"params": {"kernel": jnp.asarray(leaf["kernel"])}},
                  jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(y), (0, 3, 1, 2)),
                               ref, atol=1e-5)

    # and the export direction is the exact inverse
    back = ckpt_compat._convtranspose_to_deconv2d(leaf)
    np.testing.assert_allclose(back["weight"], w, atol=0)


def test_convtranspose_import_parity_stride3_overlap():
    """Same parity with kernel != stride (overlapping taps)."""
    import torch
    import flax.linen as nn

    rng = np.random.RandomState(4)
    cin, cout = 3, 2
    w = rng.randn(cin, cout, 3, 3).astype(np.float32)
    x = rng.randn(1, cin, 6, 6).astype(np.float32)
    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), stride=2).numpy()

    leaf = ckpt_compat.deconv2d_to_convtranspose(
        {"p.weight": w}, "p", has_bias=False)
    mod = nn.ConvTranspose(cout, (3, 3), strides=(2, 2), padding="VALID",
                           use_bias=False)
    y = mod.apply({"params": {"kernel": jnp.asarray(leaf["kernel"])}},
                  jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(y), (0, 3, 1, 2)),
                               ref, atol=1e-5)


def test_legacy_pickle_pth_with_spconv1x_layout(tmp_path):
    """Byte-faithful reference fixture: save with the reference's exact
    legacy-pickle format (train_utils.py:169-177,
    _use_new_zipfile_serialization=False) and the full checkpoint_state
    schema, with every spconv weight stored in the spconv-1.x on-disk
    layout (kz, ky, kx, in, out — detector3d_template.py:330-359), then
    load through ckpt_compat and require identical imported params."""
    import torch

    cfg = _mini_cfg()
    rng = np.random.RandomState(1)
    sd = make_reference_second_iou_state_dict(rng, cfg)

    sd_v1 = {}
    n_spconv = 0
    for k, v in sd.items():
        if v.ndim == 5:  # spconv 2.x native (out, kz, ky, kx, in) -> 1.x
            sd_v1[k] = np.transpose(v, (1, 2, 3, 4, 0)).copy()
            n_spconv += 1
        else:
            sd_v1[k] = v
    assert n_spconv >= 10

    path = tmp_path / "legacy_ckpt.pth"
    torch.save({"epoch": 7, "it": 123,
                "model_state": {k: torch.from_numpy(v)
                                for k, v in sd_v1.items()},
                "optimizer_state": None, "version": "pcdet+0.5.2"},
               str(path), _use_new_zipfile_serialization=False)
    # legacy serialization produces a bare pickle stream, not a zip archive
    with open(path, "rb") as f:
        assert f.read(2) != b"PK", "expected non-zipfile torch serialization"

    ckpt = ckpt_compat.load_torch_checkpoint(str(path))
    assert ckpt["epoch"] == 7 and ckpt["version"] == "pcdet+0.5.2"
    loaded = ckpt_compat.state_dict_to_numpy(ckpt["model_state"])
    imported_v1 = ckpt_compat.detector_variables_from_torch(loaded,
                                                            "SECONDNetIoU")
    imported_v2 = ckpt_compat.detector_variables_from_torch(sd, "SECONDNetIoU")
    flat1 = dict(jax.tree_util.tree_flatten_with_path(imported_v1["params"])[0])
    flat2 = dict(jax.tree_util.tree_flatten_with_path(imported_v2["params"])[0])
    assert set(flat1) == set(flat2)
    for k in flat1:
        np.testing.assert_allclose(np.asarray(flat1[k]), np.asarray(flat2[k]),
                                   atol=0, err_msg=str(k))

    # and the model runs with the 1.x-imported weights
    model, dcfg = build_detector(cfg)
    pts, valid, gt = _fake_batch(np.random.RandomState(0))
    out = model.apply(jax.tree.map(jnp.asarray, imported_v1), pts, valid,
                      train=False)
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()


def test_exported_pth_is_legacy_format_and_reference_schema(tmp_path):
    """Our .pth export uses the reference's on-disk format: legacy pickle,
    checkpoint_state keys (epoch/it/model_state/optimizer_state/version)."""
    import torch

    cfg = _mini_cfg()
    model, dcfg = build_detector(cfg)
    pts, valid, gt = _fake_batch(np.random.RandomState(0))
    variables = model.init({"params": jax.random.PRNGKey(0)}, pts, valid,
                           train=False)
    path = tmp_path / "export.pth"
    ckpt_compat.save_detector_checkpoint(str(path), variables, epoch=3, it=9)
    with open(path, "rb") as f:
        assert f.read(2) != b"PK"
    ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
    assert set(ckpt) == {"epoch", "it", "model_state", "optimizer_state",
                         "version"}
    assert ckpt["epoch"] == 3 and ckpt["it"] == 9

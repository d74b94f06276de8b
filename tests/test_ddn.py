"""DeepLabV3 DDN: torch structural replica parity + CaDDN integration.

The torch model below reproduces torchvision's deeplabv3_resnet state-dict
layout (ddn_template.py consumes exactly those dicts), at tiny width so the
test is fast. Parity: torch forward == flax DDNDeepLabV3 forward with
weights imported through ckpt_compat.deeplabv3_variables_from_torch.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from seevcn_tpu.models.modules.ddn import (  # noqa: E402
    DDNDeepLabV3, ddn_focal_loss, fg_mask_from_boxes2d)
from seevcn_tpu.utils.ckpt_compat import deeplabv3_variables_from_torch  # noqa: E402

W = 8  # tiny width (torchvision uses 64)


class TBottleneck(nn.Module):
    def __init__(self, cin, planes, stride=1, dilation=1, prev_dilation=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                               padding=prev_dilation, dilation=prev_dilation,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if stride != 1 or cin != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        return F.relu(self.bn3(self.conv3(y)) + r)


class TBackbone(nn.Module):
    """ResNet w/ replace_stride_with_dilation=[False, True, True]."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, W, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(W)
        self.layer1 = nn.Sequential(TBottleneck(W, W))
        self.layer2 = nn.Sequential(TBottleneck(W * 4, W * 2, stride=2))
        # torchvision semantics: the first block of a dilated stage keeps the
        # PREVIOUS dilation on its 3x3 (layer3 -> 1, layer4 -> 2)
        self.layer3 = nn.Sequential(
            TBottleneck(W * 8, W * 4, stride=1, prev_dilation=1))
        self.layer4 = nn.Sequential(
            TBottleneck(W * 16, W * 8, stride=1, prev_dilation=2))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, stride=2, padding=1)
        l1 = self.layer1(x)
        x = self.layer2(l1)
        x = self.layer3(x)
        return l1, self.layer4(x)


class TASPPPooling(nn.Sequential):
    def __init__(self, cin, cout):
        super().__init__(nn.AdaptiveAvgPool2d(1),
                         nn.Conv2d(cin, cout, 1, bias=False),
                         nn.BatchNorm2d(cout), nn.ReLU())

    def forward(self, x):
        size = x.shape[-2:]
        y = super().forward(x)
        return F.interpolate(y, size=size, mode="nearest")


class TASPP(nn.Module):
    def __init__(self, cin, ch, rates=(12, 24, 36)):
        super().__init__()
        mods = [nn.Sequential(nn.Conv2d(cin, ch, 1, bias=False),
                              nn.BatchNorm2d(ch), nn.ReLU())]
        for r in rates:
            mods.append(nn.Sequential(
                nn.Conv2d(cin, ch, 3, padding=r, dilation=r, bias=False),
                nn.BatchNorm2d(ch), nn.ReLU()))
        mods.append(TASPPPooling(cin, ch))
        self.convs = nn.ModuleList(mods)
        self.project = nn.Sequential(nn.Conv2d(5 * ch, ch, 1, bias=False),
                                     nn.BatchNorm2d(ch), nn.ReLU(),
                                     nn.Dropout(0.5))

    def forward(self, x):
        return self.project(torch.cat([m(x) for m in self.convs], dim=1))


class TDeepLabV3(nn.Module):
    def __init__(self, num_classes):
        super().__init__()
        self.backbone = TBackbone()
        ch = W * 4
        self.classifier = nn.Sequential(
            TASPP(W * 32, ch), nn.Conv2d(ch, ch, 3, padding=1, bias=False),
            nn.BatchNorm2d(ch), nn.ReLU(), nn.Conv2d(ch, num_classes, 1))

    def forward(self, x):
        feats, out = self.backbone(x)
        logits = self.classifier(out)
        logits = F.interpolate(logits, size=feats.shape[-2:], mode="bilinear",
                               align_corners=False)
        return feats, logits


@pytest.mark.slow
def test_ddn_torch_parity():
    torch.manual_seed(0)
    num_classes = 11
    tm = TDeepLabV3(num_classes).eval()
    # randomize BN stats so the test cannot pass with ignored stats
    for m in tm.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.5, 1.5)

    img = np.random.RandomState(0).rand(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        tfeat, tlog = tm(torch.from_numpy(img))

    model = DDNDeepLabV3(num_classes=num_classes, backbone_name="ResNetTiny",
                         width=W, pretrained_norm=False)
    jimg = jnp.asarray(img.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), jimg)
    imported = deeplabv3_variables_from_torch(tm.state_dict(), num_classes)
    # imported tree must cover every initialized leaf
    flat_init = jax.tree_util.tree_leaves_with_path(variables)
    flat_imp = {jax.tree_util.keystr(k)
                for k, _ in jax.tree_util.tree_leaves_with_path(imported)}
    missing = [jax.tree_util.keystr(k) for k, _ in flat_init
               if jax.tree_util.keystr(k) not in flat_imp]
    assert not missing, missing

    jfeat, jlog = model.apply(imported, jimg)
    np.testing.assert_allclose(np.asarray(jfeat),
                               tfeat.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jlog),
                               tlog.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=2e-4)


def test_ddn_classifier_mismatch_dropped():
    torch.manual_seed(1)
    tm = TDeepLabV3(21).eval()
    imported = deeplabv3_variables_from_torch(tm.state_dict(), num_classes=11)
    assert "classifier" not in imported["params"]


def test_fg_mask_and_focal_loss():
    boxes = jnp.asarray([[[4.0, 4.0, 12.0, 8.0], [0, 0, 0, 0]]])
    fg = fg_mask_from_boxes2d(boxes, (1, 8, 16), downsample_factor=2)
    assert bool(fg[0, 2, 2]) and bool(fg[0, 3, 5])
    assert not bool(fg[0, 0, 0]) and int(fg.sum()) == 8

    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(1, 8, 16, 5).astype(np.float32))
    tgt = jnp.asarray(rng.randint(0, 5, (1, 8, 16)))
    loss, tb = ddn_focal_loss(logits, tgt, boxes, downsample_factor=2)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # fg pixels weighted 13x: loss with boxes > loss without
    loss_plain, _ = ddn_focal_loss(logits, tgt, None)
    assert float(loss) > float(loss_plain)


@pytest.mark.slow
def test_caddn_with_deeplab_ddn():
    from seevcn_tpu.models.detectors.second import build_detector
    from seevcn_tpu.utils.config import Cfg
    from test_caddn import _caddn_cfg

    cfg = _caddn_cfg()
    cfg.MODEL.VFE.FFN.DDN = Cfg({"NAME": "DDNDeepLabV3",
                                 "BACKBONE_NAME": "ResNetTiny",
                                 "ARGS": {"width": 8}})
    cfg.MODEL.VFE.FFN.CHANNEL_REDUCE = Cfg({"out_channels": 16,
                                            "kernel_size": 1})
    cfg.MODEL.VFE.FFN.LOSS = Cfg({"NAME": "DDNLoss",
                                  "ARGS": {"weight": 3.0, "alpha": 0.25,
                                           "gamma": 2.0, "fg_weight": 13,
                                           "bg_weight": 1}})
    model, dcfg = build_detector(cfg)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, 96, 320, 3).astype(np.float32))
    P2 = jnp.asarray(np.array([[[200, 0, 160, 0], [0, 200, 48, 0],
                                [0, 0, 1, 0]]], np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, images, P2,
                           train=False)
    out = model.apply(variables, images, P2, train=False)
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()

    gt = jnp.asarray(np.array([[[8, 0, 0, 4.2, 2.0, 1.6, 0.2, 1]]],
                              np.float32))
    depth = jnp.asarray(rng.uniform(3, 25, (1, 96, 320)).astype(np.float32))
    boxes2d = jnp.asarray(np.array([[[100, 20, 220, 90]]], np.float32))

    def loss_fn(params):
        o, _ = model.apply({"params": params,
                            "batch_stats": variables["batch_stats"]},
                           images, P2, train=True, mutable=["batch_stats"])
        return model.loss(o, gt, depth_maps=depth, gt_boxes2d=boxes2d)

    (loss, tb), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(loss))
    assert float(tb["ddn_loss"]) > 0 and float(tb["fg_loss"]) > 0
    g = jax.tree_util.tree_reduce(lambda a, x: a + float(jnp.abs(x).sum()),
                                  grads, 0.0)
    assert g > 0

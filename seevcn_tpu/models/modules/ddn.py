"""Depth distribution network (DDN): DeepLabV3 + ResNet, TPU-native flax.

Reference behavior target (structure only, re-designed for NHWC/XLA):
  * detector3d/pcdet/models/backbones_3d/vfe/image_vfe_modules/ffn/ddn/
    ddn_deeplabv3.py + ddn_template.py — torchvision deeplabv3_resnet50/101,
    image features extracted at ``layer1`` (stride 4, 256 ch), classifier
    (ASPP head) logits bilinear-upsampled back to the feature resolution,
    ImageNet normalization with zero-padded pixels kept at zero.
  * ffn/ddn_loss/{ddn_loss.py,balancer.py} — focal loss over LID depth bins
    with foreground/background balancing from projected 2D gt boxes.

Design notes (TPU): everything is NHWC so convs map straight onto the MXU;
the dilated stages follow torchvision's ``replace_stride_with_dilation=
[False, True, True]`` (output stride 8); module names are chosen so the
torchvision state dict maps 1:1 (see ckpt_compat.deeplabv3_variables_from_torch).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# torchvision resnet depths
RESNET_LAYERS = {"ResNet50": (3, 4, 6, 3), "ResNet101": (3, 4, 23, 3),
                 "ResNetTiny": (1, 1, 1, 1)}


def _bn(train: bool, name: str):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class Bottleneck(nn.Module):
    """torchvision ResNet bottleneck: 1x1 -> 3x3(stride/dilation) -> 1x1 (x4)."""
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(_bn(train, "bn1")(y))
        d = self.dilation
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    kernel_dilation=(d, d), padding=[(d, d), (d, d)],
                    use_bias=False, name="conv2")(y)
        y = nn.relu(_bn(train, "bn2")(y))
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False, name="conv3")(y)
        y = _bn(train, "bn3")(y)
        if self.has_downsample:
            residual = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="downsample_conv")(x)
            residual = _bn(train, "downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetDeepLab(nn.Module):
    """ResNet backbone with dilated layer3/layer4 (output stride 8).

    Returns (layer1_features [stride 4], layer4_features [stride 8]).
    """
    layers: Sequence[int] = (3, 4, 6, 3)
    width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.width
        x = nn.Conv(w, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="conv1")(x)
        x = nn.relu(_bn(train, "bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        # (planes, first-block stride, dilation) per torchvision
        # replace_stride_with_dilation = [False, True, True]:
        stage_spec = [(w, 1, 1), (w * 2, 2, 1), (w * 4, 1, 2), (w * 8, 1, 4)]
        feats = {}
        for si, ((planes, stride, dil), n) in enumerate(
                zip(stage_spec, self.layers), start=1):
            for bi in range(n):
                first = bi == 0
                x = Bottleneck(
                    planes,
                    stride=stride if first else 1,
                    # torchvision applies the *previous* dilation to the
                    # stride-replaced first block's 3x3 and the new dilation
                    # afterwards; with our stage dilations (1,1,2,4) this is
                    # dil//2-or-1 for the first block of dilated stages.
                    dilation=(max(dil // 2, 1) if first else dil),
                    # every stage's first bottleneck changes channel count
                    # (in != planes*4), so it always carries a downsample
                    has_downsample=first,
                    name=f"layer{si}_{bi}")(x, train)
            feats[f"layer{si}"] = x
        return feats["layer1"], feats["layer4"]


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (torchvision ASPP, rates 12/24/36)."""
    channels: int = 256
    rates: Sequence[int] = (12, 24, 36)

    @nn.compact
    def __call__(self, x, train: bool = False):
        branches = []
        y = nn.Conv(self.channels, (1, 1), use_bias=False, name="conv0")(x)
        branches.append(nn.relu(_bn(train, "bn0")(y)))
        for i, r in enumerate(self.rates, start=1):
            y = nn.Conv(self.channels, (3, 3), kernel_dilation=(r, r),
                        padding=[(r, r), (r, r)], use_bias=False,
                        name=f"conv{i}")(x)
            branches.append(nn.relu(_bn(train, f"bn{i}")(y)))
        # global pooling branch
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(self.channels, (1, 1), use_bias=False, name="pool_conv")(g)
        g = nn.relu(_bn(train, "pool_bn")(g))
        branches.append(jnp.broadcast_to(g, branches[0].shape))

        y = jnp.concatenate(branches, axis=-1)
        y = nn.Conv(self.channels, (1, 1), use_bias=False, name="project")(y)
        return nn.relu(_bn(train, "project_bn")(y))


class DDNDeepLabV3(nn.Module):
    """DeepLabV3 depth distribution network.

    __call__(images (B, H, W, 3) in [0, 1]) ->
      features (B, H/4, W/4, 256·width/64), depth logits (B, H/4, W/4, D+1).
    """
    num_classes: int                       # num depth bins + 1
    backbone_name: str = "ResNet101"
    width: int = 64                        # 8 for the tiny test variant
    pretrained_norm: bool = True

    @nn.compact
    def __call__(self, images, train: bool = False):
        x = images
        if self.pretrained_norm:
            mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
            std = jnp.asarray(IMAGENET_STD, x.dtype)
            pad = x == 0
            x = (x - mean) / std
            x = jnp.where(pad, 0.0, x)

        layers = RESNET_LAYERS[self.backbone_name]
        feat4, feat8 = ResNetDeepLab(layers=layers, width=self.width,
                                     name="backbone")(x, train)
        y = ASPP(channels=4 * self.width, name="aspp")(feat8, train)
        y = nn.Conv(4 * self.width, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="head_conv")(y)
        y = nn.relu(_bn(train, "head_bn")(y))
        logits = nn.Conv(self.num_classes, (1, 1), name="classifier")(y)
        logits = jax.image.resize(
            logits, feat4.shape[:3] + (self.num_classes,), "bilinear")
        return feat4, logits


# --------------------------------------------------------------------------- #
# DDN loss: focal + fg/bg balancer (ddn_loss.py / balancer.py)
# --------------------------------------------------------------------------- #

def fg_mask_from_boxes2d(gt_boxes2d, shape, downsample_factor: int = 1):
    """(B, N, 4) xyxy pixel boxes -> (B, H, W) bool foreground mask at the
    downsampled resolution (loss_utils.compute_fg_mask). Zero boxes ignored."""
    b, h, w = shape
    boxes = gt_boxes2d / downsample_factor
    x1 = jnp.floor(boxes[..., 0]); y1 = jnp.floor(boxes[..., 1])
    x2 = jnp.ceil(boxes[..., 2]);  y2 = jnp.ceil(boxes[..., 3])
    valid = (boxes[..., 2] > boxes[..., 0]) & (boxes[..., 3] > boxes[..., 1])
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]  # (1,H,1,1)
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]  # (1,1,W,1)
    inside = ((xs >= x1[:, None, None, :]) & (xs < x2[:, None, None, :]) &
              (ys >= y1[:, None, None, :]) & (ys < y2[:, None, None, :]))
    return (inside & valid[:, None, None, :]).any(axis=-1)


def ddn_focal_loss(depth_logits, depth_targets, gt_boxes2d=None, *,
                   alpha: float = 0.25, gamma: float = 2.0,
                   fg_weight: float = 13.0, bg_weight: float = 1.0,
                   downsample_factor: int = 1, weight: float = 3.0):
    """Focal CE over depth bins + balancer.

    depth_logits (B, H, W, D+1), depth_targets (B, H, W) int bin indices.
    Matches kornia FocalLoss(alpha, gamma, reduction='none') followed by
    Balancer(fg_weight, bg_weight) and the final LOSS.ARGS weight.
    """
    logp = jax.nn.log_softmax(depth_logits, axis=-1)
    tgt = jax.nn.one_hot(depth_targets, depth_logits.shape[-1],
                         dtype=depth_logits.dtype)
    logpt = (logp * tgt).sum(-1)
    pt = jnp.exp(logpt)
    loss = -alpha * (1.0 - pt) ** gamma * logpt                 # (B, H, W)

    tb = {}
    if gt_boxes2d is not None:
        fg = fg_mask_from_boxes2d(gt_boxes2d, loss.shape, downsample_factor)
        weights = jnp.where(fg, fg_weight, bg_weight)
        n = float(loss.shape[0] * loss.shape[1] * loss.shape[2])
        wloss = loss * weights
        fg_loss = jnp.where(fg, wloss, 0.0).sum() / n
        bg_loss = jnp.where(fg, 0.0, wloss).sum() / n
        total = (fg_loss + bg_loss) * weight
        tb.update(fg_loss=fg_loss * weight, bg_loss=bg_loss * weight)
    else:
        total = loss.mean() * weight
    tb["ddn_loss"] = total
    return total, tb

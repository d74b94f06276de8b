"""Detection losses (reference detector3d/pcdet/utils/loss_utils.py:9-385)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(logits: jax.Array, targets: jax.Array, weights: jax.Array,
                       alpha: float = 0.25, gamma: float = 2.0) -> jax.Array:
    """Per-element focal loss with anchor weights.

    logits/targets (..., A, C), weights (..., A). Matches
    SigmoidFocalClassificationLoss including the weight broadcast rules.
    """
    p = jax.nn.sigmoid(logits)
    alpha_w = targets * alpha + (1 - targets) * (1 - alpha)
    pt = targets * (1 - p) + (1 - targets) * p
    focal = alpha_w * jnp.power(pt, gamma)
    # numerically stable BCE-with-logits
    bce = jnp.clip(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss = focal * bce
    return loss * weights[..., None]


def weighted_smooth_l1(pred: jax.Array, target: jax.Array, weights: jax.Array,
                       beta: float = 1.0 / 9.0, code_weights=None) -> jax.Array:
    """WeightedSmoothL1Loss: per-code-dim weights + per-anchor weights."""
    diff = pred - target
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, dtype=diff.dtype)
    ad = jnp.abs(diff)
    loss = jnp.where(ad < beta, 0.5 * ad * ad / beta, ad - 0.5 * beta)
    return loss * weights[..., None]


def weighted_cross_entropy(logits: jax.Array, one_hot: jax.Array,
                           weights: jax.Array) -> jax.Array:
    """WeightedCrossEntropyLoss (dir classifier)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -(one_hot * logp).sum(axis=-1)
    return loss * weights


def binary_cross_entropy_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    return jnp.clip(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))

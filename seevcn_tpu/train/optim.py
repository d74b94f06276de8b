"""Optimizers & LR schedules from reference OPTIMIZATION configs.

Reference: detector3d/tools/train_utils/optimization/ — fastai OptimWrapper
with true weight decay + OneCycle lr/momentum schedule
(learning_schedules_fastai.py), adam_onecycle being the config used by every
shipped detector; VCN side uses plain Adam/AdamW/SGD + StepLR/OneCycle
(models/vcn/tools/builder.py:49-76).

optax equivalents: adam_onecycle -> adamw + cosine_onecycle_schedule (the
fastai OneCycle is two cosine phases; optax's matches up to the momentum
cycling, which we reproduce with b1 scheduling), adam/sgd + step decay.
"""
from __future__ import annotations

import optax


def _safe_cosine_onecycle(total_steps: int, peak_value: float,
                          pct_start: float, div_factor: float,
                          final_div_factor: float):
    """cosine_onecycle_schedule that survives tiny total_steps.

    optax floors the phase boundary to ``int(pct_start * transition_steps)``;
    when that hits 0 (e.g. 2 total steps, pct_start 0.4) the warmup interval
    has zero width and the whole schedule evaluates to NaN. Clamp the warmup
    to [1, total_steps - 1] whole steps and re-derive pct_start so the
    floored boundary lands exactly there.
    """
    t = max(int(total_steps), 2)
    warm = min(max(int(round(pct_start * t)), 1), t - 1)
    return optax.cosine_onecycle_schedule(
        transition_steps=t, peak_value=peak_value,
        pct_start=(warm + 0.5) / t, div_factor=div_factor,
        final_div_factor=final_div_factor)


def build_lr_schedule(opt_cfg, total_steps: int):
    name = opt_cfg.OPTIMIZER
    lr = float(opt_cfg.LR)
    if name in ("adam_onecycle", "onecycle"):
        return _safe_cosine_onecycle(
            total_steps, lr,
            pct_start=float(opt_cfg.get("PCT_START", 0.4)),
            div_factor=float(opt_cfg.get("DIV_FACTOR", 10)),
            final_div_factor=1e4,
        )
    # step decay (adam/sgd path, train_utils/optimization/__init__.py:38-63)
    decay_steps = opt_cfg.get("DECAY_STEP_LIST", [])
    decay = float(opt_cfg.get("LR_DECAY", 0.1))
    steps_per_epoch = max(total_steps // max(int(opt_cfg.get("NUM_EPOCHS", 1)), 1), 1)
    boundaries = {int(e) * steps_per_epoch: decay for e in decay_steps}
    sched = optax.piecewise_constant_schedule(lr, boundaries)
    clip = float(opt_cfg.get("LR_CLIP", 0.0))
    if clip > 0:
        base = sched
        sched = lambda step: jnp_maximum(base(step), clip)  # noqa: E731
    if opt_cfg.get("LR_WARMUP", False):
        # CosineWarmupLR: the reference constructs it with
        # eta_min = LR / DIV_FACTOR (train_utils/optimization/__init__.py:58-61),
        # so the half-cosine ramps eta_min -> lr (not 0 -> lr) over
        # WARMUP_EPOCH epochs, then hands off to the decay schedule.
        warm_steps = max(int(opt_cfg.get("WARMUP_EPOCH", 1)) *
                         steps_per_epoch, 1)
        eta_min = lr / float(opt_cfg.get("DIV_FACTOR", 10))
        decay_sched = sched

        def sched(step):  # noqa: F811
            import jax.numpy as jnp

            t = jnp.minimum(step, warm_steps)
            warm = eta_min + (lr - eta_min) * (
                1 - jnp.cos(jnp.pi * t / warm_steps)) / 2
            return jnp.where(step < warm_steps, warm, decay_sched(step))
    return sched


def jnp_maximum(a, b):
    import jax.numpy as jnp

    return jnp.maximum(a, b)


def build_optimizer(opt_cfg, total_steps: int) -> optax.GradientTransformation:
    sched = build_lr_schedule(opt_cfg, total_steps)
    name = opt_cfg.OPTIMIZER
    wd = float(opt_cfg.get("WEIGHT_DECAY", 0.0))
    grad_clip = float(opt_cfg.get("GRAD_NORM_CLIP", 0.0))

    if name == "adam_onecycle":
        moms = opt_cfg.get("MOMS", [0.95, 0.85])
        # fastai cycles b1 opposite to lr: high -> low -> high
        b1 = _safe_cosine_onecycle(
            total_steps, float(moms[1]),
            pct_start=float(opt_cfg.get("PCT_START", 0.4)),
            div_factor=float(moms[1]) / float(moms[0]),
            final_div_factor=float(moms[1]) / float(moms[0]),
        )
        tx = optax.inject_hyperparams(
            lambda learning_rate, b1: optax.adamw(learning_rate, b1=b1,
                                                  weight_decay=wd)
        )(learning_rate=sched, b1=b1)
    elif name == "adam":
        # reference passes weight_decay to torch optim.Adam (L2-style, i.e.
        # added to the gradient — optax.add_decayed_weights before adam
        # scaling matches torch's coupled decay)
        tx = optax.adam(sched)
        if wd > 0:
            tx = optax.chain(optax.add_decayed_weights(wd), tx)
    elif name == "adamw":
        tx = optax.adamw(sched, weight_decay=wd)
    elif name == "sgd":
        tx = optax.sgd(sched, momentum=float(opt_cfg.get("MOMENTUM", 0.9)))
        if wd > 0:
            tx = optax.chain(optax.add_decayed_weights(wd), tx)
    else:
        raise NotImplementedError(name)

    if grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx

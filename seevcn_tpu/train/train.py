"""Detector training: one jitted SPMD train step over a device mesh.

Replaces the reference's DDP loop (detector3d/tools/train_utils/
train_utils.py:11-135): lr scheduling lives inside optax, gradient clipping
inside the optimizer chain, cross-device gradient averaging is implicit in
the sharded jit (params replicated, batch sharded over 'dp').
"""
from __future__ import annotations

from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax

from ..parallel.mesh import batch_sharding, make_mesh, replicated
from .optim import build_optimizer


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            batch_stats=new_batch_stats,
                            opt_state=new_opt)


def create_train_state(model, variables, opt_cfg, total_steps: int) -> TrainState:
    tx = build_optimizer(opt_cfg, total_steps)
    # own fresh buffers: the train steps donate the state, and aliasing
    # the caller's ``variables`` would delete them out from under it on
    # the first step
    params = jax.tree.map(jnp.copy, variables["params"])
    stats = jax.tree.map(jnp.copy, variables.get("batch_stats", {}))
    return TrainState(step=jnp.zeros((), jnp.int32),
                      params=params,
                      batch_stats=stats,
                      opt_state=tx.init(params),
                      tx=tx)


def make_train_step(model, jit: bool = True, donate: bool = True):
    """Returns train_step(state, points, valid, gt_boxes, rng) -> (state, metrics)."""

    def train_step(state: TrainState, points, valid, gt_boxes, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        sample_rng, dropout_rng = jax.random.split(step_rng)

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                points, valid, gt_boxes=gt_boxes, train=True, rng=sample_rng,
                rngs={"dropout": dropout_rng}, mutable=["batch_stats"])
            loss, tb = model.loss(out, gt_boxes)
            return loss, (tb, mut["batch_stats"])

        (loss, (tb, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_stats)
        metrics = {"loss": loss, **tb}
        return new_state, metrics

    if not jit:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def shard_train_step(model, mesh=None):
    """Sharded train step: batch over 'dp', state replicated, BEV spatial
    axis over 'mp' (constrain_bev inside the model; XLA inserts the conv
    halo exchanges). The gradient psum (DDP allreduce equivalent) is
    inserted by XLA.

    The state argument is DONATED (its HBM is reused for the updated
    state). Do not read the passed-in state afterwards — including any
    array that aliases it: device_put(state, replicated(mesh)) may share
    the original device-0 buffer with its source."""
    from ..parallel.mesh import set_active_mesh

    mesh = mesh or make_mesh()
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    raw = make_train_step(model, jit=False)

    def with_mesh(*args):
        prev = set_active_mesh(mesh)
        try:
            return raw(*args)
        finally:
            set_active_mesh(prev)

    return jax.jit(with_mesh, in_shardings=(rep, bsh, bsh, bsh, rep),
                   out_shardings=(rep, rep), donate_argnums=(0,)), mesh

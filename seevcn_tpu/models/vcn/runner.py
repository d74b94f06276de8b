"""VCN training runner.

Reference: see/.../models/vcn/tools/runner.py:24-549 (run_vc / validate_vc /
test_vc) + tools/builder.py (optimizer/scheduler/ckpt). One jitted train
step; losses weighted per cfg (losses / loss_weights lists); validation picks
best CDL1 checkpoint; checkpoints saved both as orbax-style msgpack and
reference-format .pth (via torch) so reference tooling can read them back.
"""
from __future__ import annotations

import os
import pickle
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .dataset import VCDataset
from .metrics import MetricAccumulator
from .nets import build_vcn


def build_vcn_optimizer(opt_cfg, sched_cfg=None, total_steps: int = 10000):
    """tools/builder.py:49-76: Adam/AdamW/SGD + StepLR/OneCycle."""
    name = (opt_cfg or {}).get("type", "Adam").lower()
    kw = dict((opt_cfg or {}).get("kwargs", {"lr": 1e-4}))
    lr = float(kw.pop("lr", 1e-4))
    sched = lr
    if sched_cfg:
        st = sched_cfg.get("type", "StepLR")
        skw = sched_cfg.get("kwargs", {})
        if st == "StepLR":
            step = int(skw.get("step_size", 40)) * max(total_steps // 100, 1)
            sched = optax.exponential_decay(lr, step, float(skw.get("gamma", 0.7)),
                                            staircase=True)
        elif st == "OneCycleLR":
            sched = optax.cosine_onecycle_schedule(total_steps, lr)
    wd = float(kw.pop("weight_decay", 0.0))
    if name == "adamw":
        return optax.adamw(sched, weight_decay=wd)
    if name == "sgd":
        return optax.sgd(sched, momentum=float(kw.pop("momentum", 0.9)))
    return optax.adam(sched)


class VCNTrainer:
    def __init__(self, cfg, work_dir: str = "./vcn_runs"):
        self.cfg = cfg
        self.work_dir = work_dir
        os.makedirs(work_dir, exist_ok=True)
        mcfg = cfg.model if "model" in cfg else cfg.MODEL
        name = mcfg["NAME"] if isinstance(mcfg, dict) and "NAME" in mcfg else mcfg
        self.model = build_vcn(name if isinstance(name, str) else name["NAME"])
        self.loss_names = list(cfg.get("losses", ["coarse", "partial"]))
        self.loss_weights = [float(w) for w in cfg.get(
            "loss_weights", [1.0] * len(self.loss_names))]
        self.best = np.inf

    def init_state(self, example_batch, total_steps: int):
        variables = self.model.init(jax.random.PRNGKey(0),
                                    {k: jnp.asarray(v)
                                     for k, v in example_batch.items()
                                     if k in ("input", "gt_boxes")}, train=False)
        self.tx = build_vcn_optimizer(self.cfg.get("optimizer"),
                                      self.cfg.get("scheduler"), total_steps)
        # gradient accumulation (reference runner.py:128-131 step_per_update):
        # optax.MultiSteps applies the inner update every k-th call and
        # accumulates grads in between — same update() signature, still jits.
        k = int(self.cfg.get("step_per_update", 1))
        if k > 1:
            self.tx = optax.MultiSteps(self.tx, every_k_schedule=k)
        return {"params": variables["params"],
                "batch_stats": variables.get("batch_stats", {}),
                "opt_state": self.tx.init(variables["params"]),
                "step": jnp.zeros((), jnp.int32)}

    @partial(jax.jit, static_argnums=(0,))
    def train_step(self, state, batch):
        def loss_fn(params):
            in_dict = {"input": batch["input"], "complete": batch["complete"],
                       "gt_boxes": batch["gt_boxes"]}
            out, mut = self.model.apply(
                {"params": params, "batch_stats": state["batch_stats"]},
                in_dict, train=True, mutable=["batch_stats"])
            losses = self.model.loss(out, in_dict)
            total = sum(w * losses[n] for n, w in
                        zip(self.loss_names, self.loss_weights) if n in losses)
            return total, (losses, mut["batch_stats"])

        (total, (losses, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])
        updates, opt_state = self.tx.update(grads, state["opt_state"],
                                            state["params"])
        new_state = {"params": optax.apply_updates(state["params"], updates),
                     "batch_stats": stats, "opt_state": opt_state,
                     "step": state["step"] + 1}
        return new_state, {"loss": total, **losses}

    @partial(jax.jit, static_argnums=(0,))
    def eval_step(self, state, batch):
        in_dict = {"input": batch["input"], "gt_boxes": batch["gt_boxes"]}
        return self.model.apply({"params": state["params"],
                                 "batch_stats": state["batch_stats"]},
                                in_dict, train=False)

    # ------------------------------------------------------------------ #
    def validate(self, state, dataset: VCDataset, batch_size: int = 32) -> dict:
        acc = MetricAccumulator()
        for batch in dataset.batches(batch_size, shuffle=False):
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            out = self.eval_step(state, jb)
            acc.update(out["coarse"], jb["complete"], jb["gt_boxes"],
                       batch["num_pts"],
                       out.get("reg_rot"), out.get("reg_centre"),
                       input_pts=jb.get("input"))
        return acc.summary()

    def fit(self, train_ds: VCDataset, val_ds: VCDataset | None = None,
            epochs: int = 1, batch_size: int = 32, val_freq: int = 1,
            log_every: int = 50, logger=print):
        steps_per_epoch = max(len(train_ds) // batch_size, 1)
        state = None
        for ep in range(epochs):
            for it, batch in enumerate(train_ds.batches(batch_size)):
                jb = {k: jnp.asarray(v) for k, v in batch.items()}
                if state is None:
                    state = self.init_state(jb, epochs * steps_per_epoch)
                state, metrics = self.train_step(state, jb)
                if it % log_every == 0:
                    logger(f"ep {ep} it {it}: " + " ".join(
                        f"{k}={float(v):.4f}" for k, v in metrics.items()))
            if val_ds is not None and (ep + 1) % val_freq == 0:
                summary = self.validate(state, val_ds, batch_size)
                logger(f"ep {ep} val: {summary}")
                self.render_val_examples(state, val_ds, epoch=ep)
                if summary.get("CDL1", np.inf) < self.best:
                    self.best = summary["CDL1"]
                    self.save_checkpoint(state, "ckpt-best")
            self.save_checkpoint(state, "ckpt-last", epoch=ep)
        return state

    def render_val_examples(self, state, dataset: VCDataset, epoch: int = 0,
                            n_examples: int = 3):
        """Per-val visual dump (reference runner.py:252-268 logs input /
        sparse / dense / gt point-cloud images to TensorBoard): a 3-panel
        BEV PNG (input | prediction | complete) per example under
        work_dir/val_vis/, plus one interactive HTML scene."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from ...utils.viz3d import save_scene_html

        out_dir = os.path.join(self.work_dir, "val_vis")
        os.makedirs(out_dir, exist_ok=True)
        batch = next(dataset.batches(min(n_examples, 8), shuffle=False))
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        out = self.eval_step(state, jb)
        coarse = np.asarray(out["coarse"])
        for i in range(min(n_examples, coarse.shape[0])):
            panels = [("input", np.asarray(batch["input"][i])),
                      ("pred", coarse[i]),
                      ("complete", np.asarray(batch["complete"][i]))]
            fig, axes = plt.subplots(1, 3, figsize=(9, 3))
            for ax, (name, pts) in zip(axes, panels):
                ax.scatter(pts[:, 0], pts[:, 1], s=0.5)
                ax.set_title(name)
                ax.set_aspect("equal")
            fig.tight_layout()
            fig.savefig(os.path.join(out_dir, f"ep{epoch:03d}_{i}.png"),
                        dpi=100)
            plt.close(fig)
        save_scene_html(os.path.join(out_dir, f"ep{epoch:03d}.html"),
                        np.concatenate([coarse[0], np.asarray(batch["input"][0])]),
                        gt_boxes=np.asarray(batch["gt_boxes"][:1]))

    # ------------------------------------------------------------------ #
    def save_checkpoint(self, state, name: str, epoch: int = 0):
        path = os.path.join(self.work_dir, f"{name}.pkl")
        host = jax.tree.map(np.asarray, {k: state[k] for k in
                                         ("params", "batch_stats")})
        # atomic (tmp + replace): a kill mid-dump must not destroy the
        # previous checkpoint this run would otherwise resume from
        with open(path + ".tmp", "wb") as f:
            pickle.dump({"variables": host, "epoch": epoch,
                         "best_metrics": self.best}, f)
        os.replace(path + ".tmp", path)
        # reference-format .pth so reference tooling / our importer read it back
        try:
            self.export_reference_pth(state,
                                      os.path.join(self.work_dir, f"{name}.pth"),
                                      epoch=epoch)
        except Exception as e:
            print(f"reference .pth export skipped ({e})")

    def export_reference_pth(self, state, path: str, epoch: int = 0):
        """Write a reference-layout VCN checkpoint (builder.py:114-123)."""
        import torch

        from ...utils.ckpt_compat import vcn_state_dict_from_variables

        sd = vcn_state_dict_from_variables(
            {"params": state["params"], "batch_stats": state["batch_stats"]},
            self.model.__class__.__name__)
        torch.save({"base_model": {k: torch.from_numpy(np.array(v))
                                   for k, v in sd.items()},
                    "epoch": epoch}, path)

    def load_checkpoint(self, path: str):
        with open(path, "rb") as f:
            d = pickle.load(f)
        return d

"""Detector training CLI.

Mirrors the reference tools/train.py:21-203 argument surface (--cfg_file,
--batch_size, --epochs, --ckpt, --extra_tag, --set, --fix_random_seed, and
auto-resume from the newest checkpoint in the run dir), driving the SPMD
train step instead of a DDP loop. Checkpoints are rotated like the
reference (max_ckpt_save_num) and also exported as OpenPCDet .pth.

Usage:
  python -m seevcn_tpu.cli.train_detector --cfg_file <pcdet yaml> [...]
"""
from __future__ import annotations

import argparse
import glob
import os
import pickle

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_file", required=True)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--extra_tag", default="default")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--fix_random_seed", action="store_true")
    p.add_argument("--max_ckpt_save_num", type=int, default=30)
    p.add_argument("--max_points", type=int, default=150000)
    p.add_argument("--output_dir", default="output")
    p.add_argument("--launcher", default="none",
                   choices=["none", "jax", "slurm", "auto"],
                   help="multi-process bring-up (reference train.py "
                        "--launcher; here jax.distributed.initialize)")
    p.add_argument("--set", dest="set_cfgs", nargs=argparse.REMAINDER, default=None)
    return p.parse_args(argv)


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from ..data.registry import DATASETS
    from ..models.detectors.second import build_detector
    from ..parallel.mesh import make_mesh, replicated, shard_batch
    from ..train.train import create_train_state, shard_train_step
    from ..utils.ckpt_compat import save_detector_checkpoint
    from ..utils.config import cfg_from_list, cfg_from_yaml_file

    args = parse_args(argv)
    from ..parallel.distributed import init_distributed

    rank, world = init_distributed(args.launcher)
    cfg = cfg_from_yaml_file(args.cfg_file)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs, cfg)
    if args.fix_random_seed:
        np.random.seed(666)

    out_dir = os.path.join(args.output_dir, cfg.TAG, args.extra_tag)
    ckpt_dir = os.path.join(out_dir, "ckpt")
    os.makedirs(ckpt_dir, exist_ok=True)

    mesh = make_mesh()
    n_dev = int(np.prod([s for s in mesh.devices.shape]))
    batch_size = args.batch_size or int(cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU) * n_dev
    epochs = args.epochs or int(cfg.OPTIMIZATION.NUM_EPOCHS)

    ds_name = cfg.DATA_CONFIG.DATASET
    dataset = DATASETS[ds_name](cfg.DATA_CONFIG, cfg.CLASS_NAMES, training=True,
                                max_points=args.max_points)
    assert len(dataset) > 0, "dataset is empty — check DATA_PATH / INFO_PATH"

    model, dcfg = build_detector(cfg)
    steps_per_epoch = max(len(dataset) // batch_size, 1)
    total_steps = steps_per_epoch * epochs

    example = dataset[0]
    variables = jax.jit(lambda p, v: model.init(
        {"params": jax.random.PRNGKey(0)}, p, v, train=False))(
        jnp.asarray(example["points"][None]),
        jnp.asarray(example["points_valid"][None]))
    state = create_train_state(model, variables, cfg.OPTIMIZATION, total_steps)

    # auto-resume (train.py:130-140)
    existing = sorted(glob.glob(os.path.join(ckpt_dir, "checkpoint_epoch_*.pkl")))
    start_epoch = 0
    if args.ckpt or existing:
        path = args.ckpt or existing[-1]
        with open(path, "rb") as f:
            d = pickle.load(f)
        state = state.replace(params=d["params"], batch_stats=d["batch_stats"],
                              step=jnp.asarray(d.get("step", 0)))
        start_epoch = d.get("epoch", 0) + 1
        print(f"resumed from {path} at epoch {start_epoch}")

    step_fn, mesh = shard_train_step(model, mesh)
    state = jax.device_put(state, replicated(mesh))
    rng = jax.random.PRNGKey(42)

    from ..data.loader import BackgroundLoader

    loader = BackgroundLoader(dataset, batch_size, num_workers=4,
                              seed=start_epoch)
    for ep in range(start_epoch, epochs):
        dataset.set_epoch(ep)       # fresh per-sample draws (sweeps etc.)
        # pre-split per-epoch aug keys once: per-step key creation is a tiny
        # device op whose dispatch dwarfs the train step on remote backends
        aug_keys = jax.random.split(jax.random.fold_in(rng, ep),
                                    max(len(loader), 1))
        for it, batch in enumerate(loader):
            if dataset.aug_list:
                batch = jax.tree.map(jnp.asarray, batch)
                batch = dataset.augment_on_device(aug_keys[it], batch)
            b = shard_batch(mesh, (batch["points"], batch["points_valid"],
                                   batch["gt_boxes"]))
            state, metrics = step_fn(state, *b, rng)
            if it % 50 == 0:   # avoid per-step device sync on state.step
                print(f"epoch {ep} it {it}: " + " ".join(
                    f"{k}={float(v):.4f}" for k, v in metrics.items()))

        host = {"params": jax.tree.map(np.asarray, state.params),
                "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
                "epoch": ep, "step": int(state.step)}
        path = os.path.join(ckpt_dir, f"checkpoint_epoch_{ep}.pkl")
        with open(path, "wb") as f:
            pickle.dump(host, f)
        try:
            save_detector_checkpoint(path.replace(".pkl", ".pth"),
                                     host, epoch=ep, it=int(state.step),
                                     model_name=cfg.MODEL.NAME)
        except Exception as e:  # export is best-effort for exotic models
            print("pth export skipped:", e)
        # rotate old checkpoints (train_utils.py:123-135)
        ckpts = sorted(glob.glob(os.path.join(ckpt_dir, "checkpoint_epoch_*.pkl")))
        for old in ckpts[:-args.max_ckpt_save_num]:
            os.remove(old)
    print("training done")


if __name__ == "__main__":
    main()

"""Detector evaluation CLI.

Mirrors reference tools/test.py:21-209: --cfg_file/--ckpt/--eval_all
watcher, DATA_CONFIG_TAR target-domain evaluation (test.py:184-190 — the
multi-target DA entry point: evaluate a source-trained checkpoint on the
target dataset's completed clouds without retraining).

Usage:
  python -m seevcn_tpu.cli.test_detector --cfg_file <yaml> --ckpt <pth|pkl>
"""
from __future__ import annotations

import argparse
import glob
import os
import pickle
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_file", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--extra_tag", default="default")
    p.add_argument("--eval_all", action="store_true")
    p.add_argument("--max_waiting_mins", type=int, default=30)
    p.add_argument("--max_points", type=int, default=150000)
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--output_dir", default="output")
    p.add_argument("--launcher", default="none",
                   choices=["none", "jax", "slurm", "auto"],
                   help="multi-process bring-up (reference test.py "
                        "--launcher; here jax.distributed.initialize)")
    p.add_argument("--set", dest="set_cfgs", nargs=argparse.REMAINDER, default=None)
    return p.parse_args(argv)


def load_variables(path, model_name):
    from ..utils.ckpt_compat import load_detector_checkpoint

    if path.endswith(".pth"):
        return load_detector_checkpoint(path, model_name)
    with open(path, "rb") as f:
        d = pickle.load(f)
    return {"params": d["params"], "batch_stats": d["batch_stats"]}


def evaluate_ckpt(cfg, ckpt_path, args):
    import jax

    from ..data.registry import DATASETS
    from ..models.detectors.second import build_detector
    from ..train.eval import eval_one_epoch

    # DA: evaluate on DATA_CONFIG_TAR when present (test.py:184-190)
    data_cfg = cfg.get("DATA_CONFIG_TAR", cfg.DATA_CONFIG)
    class_names = data_cfg.get("CLASS_NAMES", cfg.CLASS_NAMES)
    # the voxelizer block must match the trained model; inherit it from the
    # source DATA_CONFIG when the target config omits it
    has_vox = any(p.NAME == "transform_points_to_voxels"
                  for p in data_cfg.get("DATA_PROCESSOR", []))
    if not has_vox:
        src_vox = [p for p in cfg.DATA_CONFIG.DATA_PROCESSOR
                   if p.NAME == "transform_points_to_voxels"]
        data_cfg["DATA_PROCESSOR"] = list(data_cfg.get("DATA_PROCESSOR", []))             + src_vox
    dataset = DATASETS[data_cfg.DATASET](data_cfg, class_names, training=False,
                                         max_points=args.max_points)
    assert len(dataset) > 0, "eval dataset empty — check INFO_PATH"
    model, dcfg = build_detector(cfg, data_cfg=data_cfg, class_names=class_names)
    variables = jax.tree.map(lambda a: a, load_variables(ckpt_path, cfg.MODEL.NAME))
    return eval_one_epoch(model, cfg, variables, dataset,
                          batch_size=args.batch_size,
                          max_frames=args.max_frames)


def main(argv=None):
    from ..utils.config import cfg_from_list, cfg_from_yaml_file

    args = parse_args(argv)
    from ..parallel.distributed import init_distributed

    init_distributed(args.launcher)
    cfg = cfg_from_yaml_file(args.cfg_file)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs, cfg)

    if not args.eval_all:
        assert args.ckpt, "--ckpt required unless --eval_all"
        report, ap, recall = evaluate_ckpt(cfg, args.ckpt, args)
        return report, ap

    # watcher loop (test.py:86-132)
    ckpt_dir = os.path.join(args.output_dir, cfg.TAG, args.extra_tag, "ckpt")
    record = os.path.join(ckpt_dir, "eval_list.txt")
    evaluated = set()
    if os.path.exists(record):
        evaluated = set(open(record).read().split())
    waited = 0.0
    while waited < args.max_waiting_mins * 60:
        ckpts = sorted(glob.glob(os.path.join(ckpt_dir, "checkpoint_epoch_*.pkl")))
        todo = [c for c in ckpts if c not in evaluated]
        if not todo:
            time.sleep(30)
            waited += 30
            continue
        waited = 0.0
        for c in todo:
            print(f"evaluating {c}")
            evaluate_ckpt(cfg, c, args)
            evaluated.add(c)
            with open(record, "a") as f:
                f.write(c + "\n")
    print("eval_all: no new checkpoints, exiting")


if __name__ == "__main__":
    main()

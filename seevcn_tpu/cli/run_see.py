"""SEE preprocessing CLI: complete every frame's cars and write .pcd + infos.

Mirrors the reference driver (see/surface_completion/sc_multiproc.py:17-119):
GT path (source domain) and DET path (target domain), resume by output-file
existence, per-frame/per-car timing. The reference parallelises with a CUDA
process pool; here a single process drives the batched device pipeline
(frames stream through one jitted program), which is the TPU-shaped
equivalent.

With --workers N the frame loop becomes a thread pool — the TPU-shaped
analog of the reference's torch.multiprocessing Pool (sc_multiproc.py:65-94):
host I/O (cloud/mask load, projection, pcd write) overlaps across frames
while the device stage serializes naturally on the chip (JAX dispatch is
thread-safe; outputs are disjoint files, so resume-by-file still holds).

Usage:
  python -m seevcn_tpu.cli.run_see --cfg_file <SEE yaml> [--frames N]
                                   [--workers 4]
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_file", required=True)
    p.add_argument("--frames", type=int, default=None)
    p.add_argument("--path", default="det", choices=["gt", "det"])
    p.add_argument("--save_dir", default=None)
    p.add_argument("--workers", type=int, default=1,
                   help="frame-level worker threads (sc_multiproc analog)")
    return p.parse_args(argv)


def build_data_obj(cfg):
    name = cfg.DATA.get("DATASET", "demo").lower()
    if name == "demo":
        from ..data.demo_dataset import DemoObjects

        masks = {c: p for c, p in cfg.DATA.get("MASKS", {}).items()}
        return DemoObjects(cfg.DATA.ROOT, camera_channels=cfg.DATA.get(
            "CAMERA_CHANNELS", ["front"]), masks=masks)
    if name == "kitti":
        from ..data.kitti.see_adapter import KittiObjects

        return KittiObjects(cfg.DATA)
    from ..data.see_adapters import SEE_ADAPTERS

    if name in SEE_ADAPTERS:
        return SEE_ADAPTERS[name](cfg.DATA)
    raise NotImplementedError(name)


def main(argv=None):
    from ..geom.pcd_io import write_pcd
    from ..see.pipeline import SEEVCN
    from ..utils.config import cfg_from_yaml_file

    args = parse_args(argv)
    cfg = cfg_from_yaml_file(args.cfg_file)
    data_obj = build_data_obj(cfg)
    see = SEEVCN(cfg, data_obj=data_obj)

    n = args.frames or len(data_obj)

    def frame_out_path(idx):
        if args.save_dir:
            return os.path.join(args.save_dir, f"{data_obj.frames[idx]}.pcd")
        # adapter-defined location (e.g. training/vcn_<tag>/<frame>)
        return data_obj.get_save_fname(idx) + ".pcd"

    def process_one(idx):
        out_path = frame_out_path(idx)
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        if os.path.exists(out_path):  # resume-by-file (sc_multiproc.py:20-25)
            return None
        t0 = time.time()
        if args.path == "det":
            completed = see.process_det_frame(idx)
        else:
            completed = see.process_gt_frame(data_obj.get_pointcloud(idx),
                                             data_obj.get_gt_boxes(idx))
        write_pcd(out_path, completed)
        dt = time.time() - t0
        print(f"frame {idx}: {dt:.3f}s -> {out_path}", flush=True)
        return dt

    if args.workers > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=args.workers) as pool:
            t_frames = [t for t in pool.map(process_one, range(n))
                        if t is not None]
    else:
        t_frames = [t for t in map(process_one, range(n)) if t is not None]
    if t_frames:
        print(f"avg time/frame: {np.mean(t_frames):.3f}s over {len(t_frames)} frames")
    if hasattr(data_obj, "update_infos"):
        print("infos:", data_obj.update_infos())


if __name__ == "__main__":
    main()

"""Train VCN_VC on a procedurally generated VC dataset (no egress: the
reference's ShapeNet cars are unavailable, so car-LIKE meshes — body box
+ cabin box + wheel boxes with varied proportions — stand in; the full
VC-ShapeNet machinery (pose placement, occlusion raycast, partial/complete
pairs) is the repo's own generator).

Produces runs/vcn_vc_synth/ckpt-last.pkl consumed by
scripts/measure_maskpath_impact.py --vcn_ckpt so the DET-vs-GT comparison
runs with meaningful (car-shaped) completions instead of a random net.

Usage: python scripts/train_vcn_synthetic.py [--epochs 8] [--cpu]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def write_car_obj(path, rng):
    """Write a procedural car mesh as .obj in the SHAPENET frame (y up,
    -z forward) — load_obj + normalize_car_mesh applies the shapenet ->
    lidar axis swap, so writing lidar-frame verts here would train on
    sideways cars (height along the length axis)."""
    from seevcn_tpu.models.vcn.vc_shapenet import procedural_car_mesh

    verts, faces = procedural_car_mesh(rng)
    with open(path, "w") as f:
        for x, y, z in verts:          # lidar (x fwd, z up) -> shapenet
            f.write(f"v {y:.4f} {z:.4f} {-x:.4f}\n")
        for a, b, c in faces:
            f.write(f"f {a + 1} {b + 1} {c + 1}\n")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--meshes", type=int, default=6)
    ap.add_argument("--poses", type=int, default=60)
    ap.add_argument("--out", default="runs/vcn_vc_synth")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from seevcn_tpu.models.vcn import vc_shapenet as VS
    from seevcn_tpu.models.vcn.dataset import VCDataset
    from seevcn_tpu.models.vcn.runner import VCNTrainer
    from seevcn_tpu.utils.config import Cfg

    rng = np.random.RandomState(0)
    mesh_dir = os.path.join(args.out, "meshes")
    data_dir = os.path.join(args.out, "vc_data")
    os.makedirs(mesh_dir, exist_ok=True)
    meshes = []
    for i in range(args.meshes):
        p = os.path.join(mesh_dir, f"car{i}.obj")
        write_car_obj(p, rng)
        meshes.append(p)

    if not os.path.exists(os.path.join(data_dir, "model0000")):
        poses = []
        for _ in range(args.poses):
            d = rng.uniform(6, 35)
            ang = rng.uniform(-0.5, 0.5)
            poses.append(np.array([d * np.cos(ang), d * np.sin(ang), 0.0,
                                   rng.uniform(3.8, 4.6), 0, 0,
                                   rng.uniform(-np.pi, np.pi)]))
        VS.generate_vc_dataset(meshes, poses, data_dir, n_complete=4096,
                               rng=np.random.default_rng(1))

    cfg = Cfg({
        "model": {"NAME": "VCN_VC"},
        "losses": ["coarse", "partial", "translation", "rotation", "dims"],
        "loss_weights": [1.0, 1.0, 10.0, 1.0, 1.0],
        "optimizer": {"type": "Adam", "kwargs": {"lr": 1e-3}},
        "scheduler": {"type": "StepLR",
                      "kwargs": {"step_size": 40, "gamma": 0.7}},
    })
    train_ds = VCDataset(data_dir, transforms_cfg=[
        {"callback": "LidarSimulation"}], n_points=1024, n_complete=2048)
    val_ds = VCDataset(data_dir, n_points=1024, n_complete=2048)
    print(f"dataset: {len(train_ds)} samples", flush=True)
    trainer = VCNTrainer(cfg, work_dir=args.out)
    trainer.fit(train_ds, val_ds, epochs=args.epochs,
                batch_size=args.batch_size, val_freq=max(args.epochs, 1))
    print(f"saved {args.out}/ckpt-last.pkl", flush=True)


if __name__ == "__main__":
    main()

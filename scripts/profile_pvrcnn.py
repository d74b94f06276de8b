"""Gated PV-RCNN eval forward at reference capacity, driven by the
reference's own source-nuscenes/pvrcnn.yaml (VERDICT r2 #3 done-criterion:
< 300 ms with the fast-backbone multi-scale extraction)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from seevcn_tpu.models.detectors.second import build_detector
    from seevcn_tpu.utils.config import cfg_from_yaml_file

    cfg = cfg_from_yaml_file(
        "/root/reference/detector3d/tools/cfgs/source-nuscenes/pvrcnn.yaml")
    # nuScenes grid at test capacity (sc_nuscenes_dataset.yaml)
    proc = [p for p in cfg.DATA_CONFIG.DATA_PROCESSOR
            if p.NAME == "transform_points_to_voxels"][0]
    print("voxel", proc.VOXEL_SIZE, "max_voxels", proc.MAX_NUMBER_OF_VOXELS,
          "keypoints", cfg.MODEL.PFE.NUM_KEYPOINTS, flush=True)

    for mode in ("hybrid", "zfold"):
        cfg.MODEL.BACKBONE_3D["MODE"] = mode
        cfg.MODEL.BACKBONE_3D["DTYPE"] = "bfloat16"
        model, dcfg = build_detector(cfg)
        rng = np.random.RandomState(0)
        B, P = 1, 150000
        pcr = np.asarray(dcfg.point_cloud_range)
        nf = max(3, int(dcfg.num_point_features))
        pts = np.zeros((B, P, nf), np.float32)
        for c in range(3):
            pts[:, :, c] = rng.uniform(pcr[c] + 0.5, pcr[c + 3] - 0.5, (B, P))
        jp = jnp.asarray(pts)
        jv = jnp.ones((B, P), bool)
        try:
            variables = jax.jit(lambda p, v: model.init(
                {"params": jax.random.PRNGKey(0)}, p, v, train=False))(
                jp[:, :4096], jv[:, :4096])

            @jax.jit
            def fwd(v, p, m):
                out = model.apply(v, p, m, train=False)
                return out["rois"].sum() + out["rcnn_iou"].sum()

            s = fwd(variables, jp, jv)
            float(s)
            inputs = [jax.jit(lambda p, e: p.at[..., 2].add(e))(jp, 1e-4 * i)
                      for i in range(4)]
            float(np.asarray(inputs[-1][0, 0, 2]))
            n = 6
            t0 = time.time()
            for i in range(n):
                s = fwd(variables, inputs[i % 4], jv)
            float(s)
            dt = (time.time() - t0) / n
            print(f"PV-RCNN {mode} bf16 eval fwd @150k pts: {dt*1e3:.1f} ms",
                  flush=True)
        except Exception as e:
            print(f"PV-RCNN {mode}: FAILED {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()

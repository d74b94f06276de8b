"""seevcn_tpu — TPU-native rebuild of SEE-VCN (multi-target UDA for LiDAR 3D detection).

A single JAX/XLA/Pallas framework covering the three subsystems of the
reference (darrenjkt/SEE-VCN):

  * ``see``    — 2D-mask driven point isolation + VCN surface completion
                 (reference: see/surface_completion/)
  * ``models`` — VCN completion nets and the modular 3D detector stack
                 (reference: detector3d/pcdet/models/, see/.../models/vcn/)
  * ``data``   — dataset adapters, voxelization-free host pipeline
                 (reference: detector3d/pcdet/datasets/)
  * ``ops``    — device kernels replacing the reference's CUDA extensions
                 (iou3d_nms, chamfer, pointnet2, spconv) with XLA/Pallas.
  * ``train``  — pjit/shard_map training and evaluation loops replacing DDP.

Everything device-side is functional, statically shaped, and jit-friendly.
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache():
    """Persistent XLA compilation cache (big win on this deployment: remote
    TPU compiles take minutes; cached reloads take ~0.2s). Opt out with
    SEEVCN_NO_JAX_CACHE=1 or point elsewhere with JAX_COMPILATION_CACHE_DIR."""
    if _os.environ.get("SEEVCN_NO_JAX_CACHE"):
        return
    try:
        import jax

        cache = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(_os.path.dirname(_os.path.dirname(__file__)),
                          ".jax_cache"))
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()

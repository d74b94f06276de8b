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

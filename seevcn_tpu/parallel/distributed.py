"""Multi-process (multi-host) bring-up.

Replaces the reference's NCCL process-group initialization
(pcdet/utils/common_utils.py:144-188: init_dist_pytorch spawns ranks via
env vars, init_dist_slurm derives rank/world/address from SLURM_*) with
``jax.distributed.initialize``: one SPMD program whose global device set
spans every process; collectives ride ICI/DCN instead of NCCL.

Launchers:
  * 'jax'   — explicit coordinator via env (JAX_COORDINATOR_ADDRESS,
              JAX_NUM_PROCESSES, JAX_PROCESS_ID) or kwargs; also what the
              2-process CPU test uses.
  * 'slurm' — derive everything from SLURM_* like the reference
              (common_utils.py:156-170).
  * 'auto'  — jax.distributed.initialize() with no args (TPU pods and
              managed environments self-describe).
  * 'none'  — single process (default).
"""
from __future__ import annotations

import os


def init_distributed(launcher: str = "none", coordinator_address=None,
                     num_processes=None, process_id=None) -> tuple[int, int]:
    """Initialize multi-process JAX; returns (rank, world_size)."""
    import jax

    if launcher in (None, "none"):
        return jax.process_index(), jax.process_count()

    if launcher == "slurm":
        # reference init_dist_slurm (common_utils.py:156-170): proc id from
        # SLURM_PROCID, world from SLURM_NTASKS, coordinator = first node
        proc_id = int(os.environ["SLURM_PROCID"])
        ntasks = int(os.environ["SLURM_NTASKS"])
        node_list = os.environ["SLURM_NODELIST"]
        import subprocess

        addr = subprocess.getoutput(
            f"scontrol show hostname {node_list} | head -n1")
        port = os.environ.get("MASTER_PORT", "29501")
        jax.distributed.initialize(coordinator_address=f"{addr}:{port}",
                                   num_processes=ntasks, process_id=proc_id)
    elif launcher == "jax":
        addr = coordinator_address or os.environ.get(
            "JAX_COORDINATOR_ADDRESS")
        nproc = num_processes if num_processes is not None else \
            int(os.environ.get("JAX_NUM_PROCESSES", "1"))
        pid = process_id if process_id is not None else \
            int(os.environ.get("JAX_PROCESS_ID", "0"))
        jax.distributed.initialize(coordinator_address=addr,
                                   num_processes=nproc, process_id=pid)
    elif launcher == "auto":
        jax.distributed.initialize()
    else:
        raise NotImplementedError(launcher)
    return jax.process_index(), jax.process_count()

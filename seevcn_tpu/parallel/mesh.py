"""Device mesh + sharding helpers.

TPU replacement for the reference's NCCL process-group plumbing
(pcdet/utils/common_utils.py:144-188, commu_utils.py, dist_utils.py): one
SPMD program over a jax.sharding.Mesh. Data parallelism = batch axis sharded
over 'dp'; gradients all-reduce automatically because parameters are
replicated (XLA inserts the psum that DDP does by hand). Eval-result merging
(reference merge_results_dist tmpdir pickles) becomes
multihost_utils.process_allgather.

The mesh is 2-D ('dp', 'mp'): the detector family has no tensor/pipeline
dimension worth splitting at reference scale (it is a conv stack, SURVEY.md
§2.3 — the reference itself is DDP-only), so 'mp' defaults to 1 and exists
to shard the BEV spatial axis when a single frame's grid outgrows one chip.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, mp: int = 1) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    assert n % mp == 0
    if len(devs) < n:
        raise RuntimeError(
            f"make_mesh({n}, mp={mp}): only {len(devs)} device(s) visible on "
            f"platform '{devs[0].platform}'. For a virtual multi-device run, "
            f"set XLA_FLAGS=--xla_force_host_platform_device_count={n} and "
            f'jax.config.update("jax_platforms", "cpu") before any jax use '
            f"(see tests/conftest.py).")
    grid = np.asarray(devs[:n]).reshape(n // mp, mp)
    return Mesh(grid, axis_names=("dp", "mp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp; everything else replicated."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a host pytree with the batch axis sharded over dp."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


# --- BEV spatial ('mp') sharding --------------------------------------------
# The reference is DDP-only; on TPU we can additionally split a single
# frame's BEV grid across chips: annotate the (B, H, W, C) activations with
# W sharded over 'mp' and let XLA's SPMD partitioner insert the conv halo
# exchanges. Constraints are applied inside the jitted model through the
# active-mesh holder below (set at trace time by shard_train_step).
_ACTIVE_MESH: Mesh | None = None


def set_active_mesh(mesh: Mesh | None):
    """Set the mesh used by constrain_bev (returns the previous one)."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    return prev


def constrain_bev(x):
    """Shard a (B, H, W, C) BEV activation: batch over 'dp', W over 'mp'.

    No-op without an active mesh or with mp == 1, so single-chip paths and
    tests are untouched. W must be divisible by the mp size at every BEV
    stage (reference grids are powers of two)."""
    if _ACTIVE_MESH is None or dict(
            zip(_ACTIVE_MESH.axis_names, _ACTIVE_MESH.devices.shape)).get(
            "mp", 1) == 1:
        return x
    if x.ndim != 4:
        return x
    spec = P("dp", None, "mp", None)
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(_ACTIVE_MESH, spec))

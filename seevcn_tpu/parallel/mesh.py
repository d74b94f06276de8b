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

"""Cross-host collectives for evaluation and metrics.

Replaces the reference's commu_utils (pcdet/utils/commu_utils.py:50-182:
pickled-ByteTensor all_gather, reduce_dict, average_reduce_value) and the
filesystem result merge (common_utils.merge_results_dist:211-232) with
jax.experimental.multihost_utils.
"""
from __future__ import annotations

import jax
import numpy as np


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def merge_results_dist(local_results: list, total_size: int | None = None):
    """Gather per-host python result lists to every host (the reference's
    tmpdir-pickle merge). Single-process: identity."""
    if jax.process_count() == 1:
        return local_results[:total_size] if total_size else local_results
    from jax.experimental import multihost_utils

    # object gather via pickled bytes padded to the max length (the
    # reference pads ByteTensors the same way, commu_utils.py:50-111)
    import pickle

    blob = pickle.dumps(local_results)
    lens = multihost_utils.process_allgather(
        np.asarray([len(blob)], np.int64)).reshape(-1)
    max_len = int(lens.max())
    padded = np.frombuffer(blob.ljust(max_len, b"\0"), np.uint8)
    all_blobs = multihost_utils.process_allgather(padded)
    out = []
    for i in range(jax.process_count()):
        out.extend(pickle.loads(bytes(all_blobs[i][:int(lens[i])])))
    return out[:total_size] if total_size else out


def average_reduce_value(value: float) -> float:
    """Mean of a scalar across hosts (commu_utils.average_reduce_value)."""
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    vals = multihost_utils.process_allgather(np.asarray([value], np.float64))
    return float(vals.mean())


def reduce_dict(d: dict) -> dict:
    return {k: average_reduce_value(float(v)) for k, v in d.items()}

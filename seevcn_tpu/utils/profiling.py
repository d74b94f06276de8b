"""Tracing / timing / logging utilities.

The reference's observability is wall-clock prints + tensorboardX scalars
(SURVEY.md §5: train_utils.py:18-62, sc_multiproc.py:90-94, runner.py
AverageMeters). TPU equivalents here:
  * AverageMeter / Timer — same roles, with block_until_ready-accurate
    device timing,
  * trace() — jax.profiler trace context producing TensorBoard-viewable
    device profiles (replaces "no profiler, no traces"),
  * annotate() — jax.profiler.TraceAnnotation for named spans inside steps,
  * create_logger — rank-0 file+console logger
    (common_utils.create_logger:85-100),
  * MetricsWriter — scalar logging: TensorBoard via tensorflow summary when
    importable, JSONL fallback otherwise,
  * set_random_seed — determinism knobs (common_utils.py:102).
"""
from __future__ import annotations

import contextlib
import json
import logging
import os
import time


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self):
        return self.sum / max(self.count, 1)


class Timer:
    """Device timing: synchronizes on the given pytree.

    WARNING (tunneled deployments): on the remote `axon` TPU backend
    jax.block_until_ready returns at ENQUEUE, not completion — block-based
    times measure dispatch latency only. Pass ``readback=True`` (or gate
    yourself on ``float(scalar)`` of an output) to measure true execution;
    see docs/ARCHITECTURE.md §9 and BASELINE.md.
    """

    def __init__(self):
        self.meter = AverageMeter()

    @contextlib.contextmanager
    def measure(self, sync=None, readback: bool = False):
        import jax
        import numpy as np

        t0 = time.perf_counter()
        yield
        if sync is not None:
            if readback:
                leaves = jax.tree_util.tree_leaves(sync)
                if leaves:
                    np.asarray(jax.tree_util.tree_leaves(
                        jax.tree.map(lambda x: x.ravel()[0], sync))[0])
            else:
                jax.block_until_ready(sync)
        self.meter.update(time.perf_counter() - t0)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device profile viewable in TensorBoard / xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


def create_logger(log_file=None, rank: int = 0, name: str = "seevcn_tpu"):
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO if rank == 0 else logging.WARNING)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s  %(levelname)5s  %(message)s")
    ch = logging.StreamHandler()
    ch.setFormatter(fmt)
    logger.addHandler(ch)
    if log_file is not None and rank == 0:
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    return logger


class MetricsWriter:
    """Scalar sink: TF summary writer when available, JSONL otherwise."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._tb = None
        try:
            import tensorflow as tf

            self._tb = tf.summary.create_file_writer(log_dir)
        except Exception:
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")

    def scalar(self, tag: str, value, step: int):
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                tf.summary.scalar(tag, float(value), step=step)
        else:
            self._jsonl.write(json.dumps(
                {"tag": tag, "value": float(value), "step": int(step),
                 "ts": time.time()}) + "\n")
            self._jsonl.flush()

    def close(self):
        if self._tb is None:
            self._jsonl.close()


def set_random_seed(seed: int):
    """Determinism knobs (common_utils.set_random_seed + --fix_random_seed)."""
    import random

    import numpy as np

    random.seed(seed)
    np.random.seed(seed)
    return seed

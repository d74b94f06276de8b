"""Background batch loader: overlap host batch prep with device steps.

The reference gets this from torch DataLoader worker processes; here a
small thread pool prepares (and optionally device_puts) the next batches
while the jitted step runs — combined with the C++ file reader this is the
host->HBM streaming path (BASELINE config 5).
"""
from __future__ import annotations

import queue
import threading

import numpy as np


class BackgroundLoader:
    """Iterate fixed-shape batches assembled on worker threads.

    dataset: indexable returning per-frame dicts of numpy arrays.
    """

    def __init__(self, dataset, batch_size: int, keys=("points", "points_valid",
                                                       "gt_boxes", "gt_mask"),
                 shuffle: bool = True, prefetch: int = 2, num_workers: int = 2,
                 seed: int = 0, drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.keys = keys
        self.shuffle = shuffle
        self.prefetch = prefetch
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        starts = list(range(0, len(order) - (self.batch_size - 1
                                             if self.drop_last else 0),
                            self.batch_size))
        jobs = queue.Queue()
        out = {}
        done = threading.Event()
        # Backpressure: hold at most ~prefetch assembled batches in memory.
        # A worker holding batch bi blocks until bi < next_needed + prefetch;
        # since jobs are taken FIFO, the worker holding next_needed always
        # satisfies the window, so the consumer can never starve.
        cv = threading.Condition()
        state = {"next": 0, "errors": []}
        window = max(1, self.prefetch)

        for bi, s in enumerate(starts):
            jobs.put((bi, order[s:s + self.batch_size]))

        def worker():
            while not done.is_set():
                try:
                    bi, idx = jobs.get_nowait()
                except queue.Empty:
                    return
                with cv:
                    while bi >= state["next"] + window and not done.is_set():
                        cv.wait(timeout=0.1)
                if done.is_set():
                    return
                try:
                    frames = [self.dataset[int(i)] for i in idx]
                    batch = {k: np.stack([f[k] for f in frames])
                             for k in self.keys if k in frames[0]}
                except Exception as e:  # surface to the consumer
                    with cv:
                        state["errors"].append(e)
                        cv.notify_all()
                    return
                with cv:
                    out[bi] = batch
                    cv.notify_all()

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        try:
            for bi in range(len(starts)):
                with cv:
                    while bi not in out:
                        if state["errors"]:
                            raise state["errors"][0]
                        if not any(t.is_alive() for t in threads):
                            raise RuntimeError("loader workers died")
                        cv.wait(timeout=0.1)
                    batch = out.pop(bi)
                    state["next"] = bi + 1
                    cv.notify_all()
                yield batch
        finally:
            done.set()
            with cv:
                cv.notify_all()

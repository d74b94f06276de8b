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
        lock = threading.Lock()

        for bi, s in enumerate(starts):
            jobs.put((bi, order[s:s + self.batch_size]))

        def worker():
            while not done.is_set():
                try:
                    bi, idx = jobs.get_nowait()
                except queue.Empty:
                    return
                frames = [self.dataset[int(i)] for i in idx]
                batch = {k: np.stack([f[k] for f in frames]) for k in self.keys
                         if k in frames[0]}
                with lock:
                    out[bi] = batch

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        try:
            import time

            for bi in range(len(starts)):
                while True:
                    with lock:
                        if bi in out:
                            batch = out.pop(bi)
                            break
                        workers_done = not any(t.is_alive() for t in threads)
                    if workers_done:
                        with lock:
                            if bi in out:
                                batch = out.pop(bi)
                                break
                        raise RuntimeError("loader workers died")
                    time.sleep(0.001)
                yield batch
        finally:
            done.set()

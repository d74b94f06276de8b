import numpy as np

from seevcn_tpu.data.loader import BackgroundLoader


class _DS:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"points": np.full((4, 3), i, np.float32),
                "points_valid": np.ones(4, bool),
                "gt_boxes": np.zeros((2, 8), np.float32),
                "gt_mask": np.zeros(2, bool)}


def test_loader_covers_all_and_shapes():
    ds = _DS(13)
    loader = BackgroundLoader(ds, batch_size=4, shuffle=True, num_workers=3)
    seen = []
    for batch in loader:
        assert batch["points"].shape == (4, 4, 3)
        seen.extend(batch["points"][:, 0, 0].astype(int).tolist())
    assert len(seen) == 12            # drop_last
    assert len(set(seen)) == 12       # no duplicates


def test_loader_deterministic_seed():
    ds = _DS(8)
    a = [b["points"][:, 0, 0].tolist() for b in
         BackgroundLoader(ds, 4, seed=5, num_workers=2)]
    b = [b["points"][:, 0, 0].tolist() for b in
         BackgroundLoader(ds, 4, seed=5, num_workers=2)]
    assert a == b


def test_loader_backpressure_bounds_memory():
    """Workers must not assemble the whole epoch ahead of the consumer:
    with prefetch=2, no batch beyond next_needed+2+num_workers may have
    been materialized while the consumer is still on early batches."""
    import time

    built = []

    class SlowConsumeDataset:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            built.append(i)
            return {"points": np.full((4, 3), i, np.float32)}

    ld = BackgroundLoader(SlowConsumeDataset(), batch_size=4,
                          keys=("points",), shuffle=False, prefetch=2,
                          num_workers=2)
    it = iter(ld)
    next(it)
    time.sleep(0.3)  # give workers time to (wrongly) run ahead
    # batches 0..(1+2) may be built (consumed=1, window=2, +in-flight);
    # frames beyond batch 4 mean the window is broken
    assert max(built) < 5 * 4, f"workers ran ahead: max frame {max(built)}"
    rest = list(it)
    assert len(rest) == 15
    # order and contents preserved
    assert float(rest[-1]["points"][0, 0, 0]) == 60.0


def test_loader_worker_error_propagates():
    class BoomDataset:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise ValueError("boom")
            return {"points": np.zeros((4, 3), np.float32)}

    ld = BackgroundLoader(BoomDataset(), batch_size=4, keys=("points",),
                          shuffle=False, prefetch=2, num_workers=2)
    try:
        list(ld)
    except ValueError as e:
        assert "boom" in str(e)
    else:
        raise AssertionError("worker exception not propagated")

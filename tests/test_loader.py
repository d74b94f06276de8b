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

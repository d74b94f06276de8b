import os
import numpy as np
import pytest

from seevcn_tpu.utils import native_io
from seevcn_tpu.geom.pcd_io import write_pcd


def test_read_bin_matches_numpy(tmp_path):
    rng = np.random.RandomState(0)
    pts = rng.rand(5000, 4).astype(np.float32)
    p = tmp_path / "a.bin"
    pts.tofile(p)
    back = native_io.read_bin(str(p), max_rows=10000)
    np.testing.assert_array_equal(back, pts)
    # truncation at max_rows
    back = native_io.read_bin(str(p), max_rows=100)
    assert back.shape == (100, 4)


def test_read_pcd_matches(tmp_path):
    pts = np.random.RandomState(1).rand(777, 3).astype(np.float32)
    p = tmp_path / "a.pcd"
    write_pcd(str(p), pts)
    back = native_io.read_pcd(str(p), max_rows=1000)
    np.testing.assert_allclose(back, pts, atol=1e-7)


def test_prefetcher_batch(tmp_path):
    rng = np.random.RandomState(2)
    entries = []
    refs = []
    for i in range(6):
        pts = rng.rand(rng.randint(100, 400), 4).astype(np.float32)
        p = tmp_path / f"{i}.bin"
        pts.tofile(p)
        entries.append((str(p), "bin"))
        refs.append(pts)
    pf = native_io.Prefetcher(3)
    bufs, counts = pf.load(entries, max_rows=500)
    for i, r in enumerate(refs):
        assert counts[i] == len(r)
        np.testing.assert_array_equal(bufs[i, :len(r)], r)


def test_missing_file_raises(tmp_path):
    if not native_io.native_available():
        pytest.skip("no native lib")
    with pytest.raises(FileNotFoundError):
        native_io.read_bin(str(tmp_path / "nope.bin"))

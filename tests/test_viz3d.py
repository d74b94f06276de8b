"""3D HTML scene viewer + PLY export (tools/visual_utils analog)."""
import pytest

import base64
import json
import re

import numpy as np

from seevcn_tpu.utils.viz3d import _box_edges, export_ply, save_scene_html

pytestmark = pytest.mark.slow  # heavy tier: full model/backbone builds


def test_box_edges_geometry():
    box = np.array([[10.0, 2.0, 0.0, 4.0, 2.0, 1.5, 0.0]])
    segs = _box_edges(box)           # (1, 14, 2, 3)
    assert segs.shape == (1, 14, 2, 3)
    pts = segs[:, :12].reshape(-1, 3)
    np.testing.assert_allclose(pts[:, 0].min(), 8.0, atol=1e-5)
    np.testing.assert_allclose(pts[:, 0].max(), 12.0, atol=1e-5)
    np.testing.assert_allclose(pts[:, 2].max(), 0.75, atol=1e-5)
    # heading tick points +x for ry=0
    tick = segs[0, 12]
    assert tick[1, 0] > tick[0, 0]


def test_scene_html_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    pts = rng.uniform(-5, 5, (500, 4)).astype(np.float32)  # intensity dropped
    gt = np.array([[0, 0, 0, 4.2, 1.9, 1.6, 0.3]], np.float32)
    pred = np.array([[1, 1, 0, 4.0, 1.8, 1.5, -0.2]], np.float32)
    path = str(tmp_path / "scene.html")
    save_scene_html(path, pts, gt_boxes=gt, ref_boxes=pred)
    html = open(path).read()
    data = json.loads(re.search(r"const DATA = (\{.*?\});\n", html,
                                re.S).group(1))
    dec = np.frombuffer(base64.b64decode(data["points"]), np.float32)
    np.testing.assert_allclose(dec.reshape(-1, 3), pts[:, :3], rtol=1e-6)
    assert data["n_boxes"] == 2
    assert len(data["seg_sets"]) == 2
    seg = np.frombuffer(base64.b64decode(data["seg_sets"][0]["data"]),
                        np.float32).reshape(-1, 2, 3)
    assert seg.shape[0] == 14
    # self-contained: no external resources
    assert "http" not in html.split("<script>")[1]


def test_scene_html_subsamples(tmp_path):
    pts = np.zeros((1000, 3), np.float32)
    path = save_scene_html(str(tmp_path / "s.html"), pts, max_points=100)
    data = json.loads(re.search(r"const DATA = (\{.*?\});\n",
                                open(path).read(), re.S).group(1))
    assert len(base64.b64decode(data["points"])) == 100 * 3 * 4


def test_ply_roundtrip(tmp_path):
    pts = np.arange(30, dtype=np.float32).reshape(10, 3)
    p = str(tmp_path / "a.ply")
    export_ply(p, pts, binary=True)
    raw = open(p, "rb").read()
    head, body = raw.split(b"end_header\n", 1)
    assert b"element vertex 10" in head
    np.testing.assert_allclose(np.frombuffer(body, np.float32).reshape(10, 3),
                               pts)
    # ascii with colors
    p2 = str(tmp_path / "b.ply")
    export_ply(p2, pts, colors=np.full((10, 3), 128, np.uint8), binary=False)
    lines = open(p2).read().strip().splitlines()
    assert lines[-1].endswith("128 128 128")

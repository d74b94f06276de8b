import numpy as np

from seevcn_tpu.data.kitti.eval import (clean_data, eval_class,
                                        get_official_eval_result,
                                        image_box_overlap)


def _anno(names, bboxes, locs, dims, rys, scores=None, occ=None, trunc=None):
    n = len(names)
    a = {
        "name": np.array(names),
        "bbox": np.array(bboxes, np.float64).reshape(n, 4),
        "location": np.array(locs, np.float64).reshape(n, 3),
        "dimensions": np.array(dims, np.float64).reshape(n, 3),
        "rotation_y": np.array(rys, np.float64),
        "occluded": np.array(occ if occ is not None else [0] * n),
        "truncated": np.array(trunc if trunc is not None else [0.0] * n),
        "alpha": np.zeros(n),
    }
    if scores is not None:
        a["score"] = np.array(scores, np.float64)
    return a


def _empty_anno(with_score=False):
    return _anno([], np.zeros((0, 4)), np.zeros((0, 3)), np.zeros((0, 3)),
                 np.zeros(0), scores=np.zeros(0) if with_score else None)


def _make_frames(n_frames=10, miss_every=0):
    """Frames with 2 cars each; detections perfect except every k-th gt missed."""
    gt_annos, dt_annos = [], []
    k = 0
    for f in range(n_frames):
        names, bboxes, locs, dims, rys = [], [], [], [], []
        dnames, dbb, dloc, ddim, dry, dsc = [], [], [], [], [], []
        for i in range(2):
            names.append("Car")
            bboxes.append([100 + i * 200, 100, 200 + i * 200, 180])  # h=80 > 40
            locs.append([i * 10.0, 1.5, 20.0 + f])
            dims.append([4.0, 1.6, 1.8])
            rys.append(0.1 * i)
            k += 1
            if miss_every and k % miss_every == 0:
                continue
            dnames.append("Car")
            dbb.append(bboxes[-1])
            dloc.append(locs[-1])
            ddim.append(dims[-1])
            dry.append(rys[-1])
            dsc.append(0.9 - 0.01 * i)
        gt_annos.append(_anno(names, bboxes, locs, dims, rys))
        dt_annos.append(_anno(dnames, dbb, dloc, ddim, dry, scores=dsc)
                        if dnames else _empty_anno(True))
    return gt_annos, dt_annos


def test_image_box_overlap():
    a = np.array([[0, 0, 10, 10]], np.float64)
    b = np.array([[5, 0, 15, 10]], np.float64)
    np.testing.assert_allclose(image_box_overlap(a, b)[0, 0], 50 / 150, atol=1e-9)


def test_clean_data_rules():
    gt = _anno(["Car", "Van", "Pedestrian", "DontCare", "Car"],
               [[0, 0, 10, 50], [0, 0, 10, 50], [0, 0, 10, 50],
                [0, 0, 10, 50], [0, 0, 10, 30]],  # last: height 30 < 40
               [[0, 0, 10]] * 5, [[4, 1.6, 1.8]] * 5, [0] * 5)
    nv, ig, idt, dc = clean_data(gt, _empty_anno(True), "Car", 0)
    assert nv == 1
    assert ig.tolist() == [0, 1, -1, -1, 1]
    assert dc.shape == (1, 4)


def test_perfect_detections_ap100():
    # >= 41 valid gts so the 41-point recall grid saturates (with fewer gts
    # even the reference protocol yields < 100 for a perfect detector)
    gt, dt = _make_frames(30)
    for metric in ("bbox", "bev", "3d"):
        r = eval_class(gt, dt, "Car", 0, metric, 0.7)
        assert r["ap_r40"] > 95.0, (metric, r["ap_r40"])


def test_no_detections_ap0():
    gt, _ = _make_frames(5)
    dt = [_empty_anno(True) for _ in gt]
    r = eval_class(gt, dt, "Car", 0, "3d", 0.7)
    assert r["ap_r40"] == 0.0


def test_partial_recall():
    gt, dt = _make_frames(20, miss_every=2)  # half the gts undetected
    r = eval_class(gt, dt, "Car", 0, "3d", 0.7)
    # recall caps at 0.5 -> AP_R40 ~ 50
    assert 40 < r["ap_r40"] < 60, r["ap_r40"]


def test_false_positives_reduce_ap():
    gt, dt = _make_frames(10)
    # add a high-scoring FP to every frame
    for d in dt:
        d["name"] = np.append(d["name"], "Car")
        d["bbox"] = np.vstack([d["bbox"], [500, 100, 600, 180]])
        d["location"] = np.vstack([d["location"], [50, 1.5, 60]])
        d["dimensions"] = np.vstack([d["dimensions"], [4, 1.6, 1.8]])
        d["rotation_y"] = np.append(d["rotation_y"], 0.0)
        d["score"] = np.append(d["score"], 0.95)
    r = eval_class(gt, dt, "Car", 0, "3d", 0.7)
    assert r["ap_r40"] < 90


def test_official_report_string():
    gt, dt = _make_frames(30)
    report, results = get_official_eval_result(gt, dt, classes=("Car",))
    assert "Car AP_R40@0.70 (3d)" in report
    assert results["Car"]["3d"][0] > 95

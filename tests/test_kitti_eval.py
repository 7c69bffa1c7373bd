"""KITTI-protocol AP: perfect detections -> ~100, misses lower recall,
difficulty gates apply, ignored classes don't count as FP."""

import numpy as np

from findnpropagate_tpu.datasets.kitti_eval import eval_class, kitti_eval


def make_frame(rng, n, cls="Car"):
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0] = rng.uniform(5, 60, n)
    boxes[:, 1] = rng.uniform(-20, 20, n)
    boxes[:, 2] = -1.0
    boxes[:, 3:6] = [4.0, 1.8, 1.6]
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return {
        "name": np.asarray([cls] * n),
        "gt_boxes_lidar": boxes,
        "bbox": np.tile([0, 0, 100, 100], (n, 1)).astype(np.float32),
        "occluded": np.zeros(n),
        "truncated": np.zeros(n),
    }


def test_perfect_detections_score_100():
    rng = np.random.RandomState(0)
    gts, dets = [], []
    for _ in range(4):
        g = make_frame(rng, 5)
        gts.append(g)
        dets.append({
            "boxes": g["gt_boxes_lidar"].copy(),
            "scores": rng.uniform(0.5, 1.0, 5),
            "name": np.asarray(["Car"] * 5),
        })
    ap = eval_class(gts, dets, "Car", 1, metric="3d")
    assert ap > 99.0, ap


def test_missed_detections_reduce_ap():
    rng = np.random.RandomState(1)
    gts, dets = [], []
    for _ in range(4):
        g = make_frame(rng, 6)
        gts.append(g)
        dets.append({
            "boxes": g["gt_boxes_lidar"][:3].copy(),  # miss half
            "scores": rng.uniform(0.5, 1.0, 3),
            "name": np.asarray(["Car"] * 3),
        })
    ap = eval_class(gts, dets, "Car", 1, metric="3d")
    assert 30.0 < ap < 60.0, ap


def test_hard_gt_ignored_at_easy():
    rng = np.random.RandomState(2)
    g = make_frame(rng, 4)
    g["occluded"] = np.array([0, 0, 2, 2])  # two heavily occluded
    det = {
        "boxes": g["gt_boxes_lidar"][:2].copy(),
        "scores": np.array([0.9, 0.8]),
        "name": np.asarray(["Car"] * 2),
    }
    # easy difficulty: occluded gts become 'ignored' -> only 2 care gts
    ap_easy = eval_class([g], [det], "Car", 0, metric="3d")
    assert ap_easy > 99.0
    # hard difficulty: all 4 count -> recall 0.5
    ap_hard = eval_class([g], [det], "Car", 2, metric="3d")
    assert ap_hard < 60.0


def test_van_matches_dont_penalize_car():
    rng = np.random.RandomState(3)
    g = make_frame(rng, 2)
    g["name"] = np.asarray(["Car", "Van"])
    det = {
        "boxes": g["gt_boxes_lidar"].copy(),
        "scores": np.array([0.9, 0.8]),
        "name": np.asarray(["Car", "Car"]),
    }
    ap = eval_class([g], [det], "Car", 1, metric="3d")
    # detection on the Van is neither TP nor FP -> AP stays 100
    assert ap > 99.0, ap


def test_kitti_eval_summary():
    rng = np.random.RandomState(4)
    g = make_frame(rng, 3)
    det = {"boxes": g["gt_boxes_lidar"].copy(),
           "scores": np.array([0.9, 0.8, 0.7]),
           "name": np.asarray(["Car"] * 3)}
    s, r = kitti_eval([g], [det], ["Car"])
    assert "Car_3d_moderate_R40" in r
    assert r["mAP_3d_moderate_R40"] > 99.0

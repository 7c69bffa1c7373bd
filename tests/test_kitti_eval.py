"""KITTI-protocol AP: perfect detections -> ~100, misses lower recall,
difficulty gates apply, ignored classes don't count as FP."""

import numpy as np

from findnpropagate_tpu.datasets.kitti_eval import (
    _ap_curve, _ap_r11, _ap_r40, eval_class, kitti_eval, R11_POINTS,
)


def ap_of(gts, dets, cls, diff, metric="3d"):
    scores_tp, num_gt = eval_class(gts, dets, cls, diff, metric)
    return _ap_r40(scores_tp, num_gt) * 100.0


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
    ap = ap_of(gts, dets, "Car", 1, metric="3d")
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
    ap = ap_of(gts, dets, "Car", 1, metric="3d")
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
    ap_easy = ap_of([g], [det], "Car", 0, metric="3d")
    assert ap_easy > 99.0
    # hard difficulty: all 4 count -> recall 0.5
    ap_hard = ap_of([g], [det], "Car", 2, metric="3d")
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
    ap = ap_of([g], [det], "Car", 1, metric="3d")
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


def test_r11_vs_r40_hand_computed():
    """Half the gts detected perfectly: R40 interpolates 40 points above
    1/40 recall, R11 includes the r=0 sample (precision 1) -> R11 > R40
    when recall caps at 0.5 with perfect precision."""
    rng = np.random.RandomState(5)
    g = make_frame(rng, 4)
    det = {"boxes": g["gt_boxes_lidar"][:2].copy(),
           "scores": np.array([0.9, 0.8]),
           "name": np.asarray(["Car"] * 2)}
    scores_tp, num_gt = eval_class([g], [det], "Car", 1, "3d")
    r40 = _ap_r40(scores_tp, num_gt)
    r11 = _ap_r11(scores_tp, num_gt)
    # hand-computed: precision 1.0 up to recall 0.5, 0 beyond
    # R40: 20/40 samples covered; R11: 6/11 samples (0.0..0.5)
    assert abs(r40 - 20 / 40) < 1e-6, r40
    assert abs(r11 - 6 / 11) < 1e-6, r11


def test_aos_perfect_and_flipped_orientation():
    rng = np.random.RandomState(6)
    g = make_frame(rng, 2)
    g["alpha"] = np.array([0.3, -0.5])
    det = {"boxes": g["gt_boxes_lidar"].copy(),
           "bbox": g["bbox"].copy(),
           "scores": np.array([0.9, 0.8]),
           "alpha": g["alpha"].copy(),
           "name": np.asarray(["Car"] * 2)}
    s, r = kitti_eval([g], [det], ["Car"])
    # perfect orientations -> AOS == bbox AP (≈100)
    assert r["Car_aos_moderate_R40"] > 99.0, r["Car_aos_moderate_R40"]
    assert r["Car_bbox_moderate_R40"] > 99.0
    # flip both orientations by pi -> similarity (1+cos(pi))/2 = 0
    det_flipped = dict(det, alpha=det["alpha"] + np.pi)
    s2, r2 = kitti_eval([g], [det_flipped], ["Car"])
    assert r2["Car_aos_moderate_R40"] < 1.0, r2["Car_aos_moderate_R40"]
    assert r2["Car_bbox_moderate_R40"] > 99.0  # matching unaffected

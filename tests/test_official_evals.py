"""Official Waymo / ONCE eval protocols on hand-computed fixtures."""

import numpy as np
import pytest

from findnpropagate_tpu.datasets.once_eval import (
    heading_gated_iou3d,
    once_eval,
)
from findnpropagate_tpu.datasets.waymo_eval import (
    _ap_from_matches,
    _heading_sim,
    waymo_eval,
)


def boxes(rows):
    return np.asarray(rows, np.float64).reshape(-1, 7)


# ------------------------------------------------------------------ Waymo

def waymo_gt_frame(n, cls="Vehicle", npts=20):
    rng = np.random.RandomState(42 + n)
    b = np.zeros((n, 7))
    b[:, 0] = rng.uniform(5, 60, n)
    b[:, 1] = rng.uniform(-20, 20, n)
    b[:, 2] = 1.0
    b[:, 3:6] = [4.5, 2.0, 1.8]
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return {"name": np.asarray([cls] * n), "gt_boxes_lidar": b,
            "difficulty": np.zeros(n, np.int64),
            "num_points_in_gt": np.full(n, npts)}


def test_waymo_perfect_ap_and_aph():
    gt = waymo_gt_frame(5)
    det = {"name": gt["name"].copy(), "boxes_lidar": gt["gt_boxes_lidar"],
           "score": np.linspace(0.9, 0.5, 5)}
    s, r = waymo_eval([gt], [det], ["Vehicle"])
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"] > 99.9
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] > 99.9
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/APH"] > 99.9


def test_waymo_heading_error_hits_aph_not_ap():
    gt = waymo_gt_frame(4)
    det_boxes = gt["gt_boxes_lidar"].copy()
    det_boxes[:, 6] += np.pi  # flipped heading: same footprint, sim = 0
    det = {"name": gt["name"].copy(), "boxes_lidar": det_boxes,
           "score": np.linspace(0.9, 0.6, 4)}
    s, r = waymo_eval([gt], [det], ["Vehicle"])
    ap = r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"]
    aph = r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/APH"]
    assert ap > 99.0, ap          # geometry matches perfectly
    assert aph < 1.0, (ap, aph)   # every TP carries zero heading weight


def test_waymo_level2_counts_hard_gts():
    """2 easy + 2 hard (few-point) gts, only easy detected: LEVEL_1 AP is
    perfect (hard gts ignored), LEVEL_2 recall caps at 0.5."""
    gt = waymo_gt_frame(4)
    gt["num_points_in_gt"] = np.array([20, 20, 3, 3])
    det = {"name": gt["name"][:2].copy(),
           "boxes_lidar": gt["gt_boxes_lidar"][:2].copy(),
           "score": np.array([0.9, 0.8])}
    s, r = waymo_eval([gt], [det], ["Vehicle"])
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"] > 99.9
    l2 = r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"]
    assert abs(l2 - 50.0) < 1.0, l2


def test_waymo_zero_point_gts_dropped():
    gt = waymo_gt_frame(2)
    gt["num_points_in_gt"] = np.array([20, 0])
    det = {"name": gt["name"][:1].copy(),
           "boxes_lidar": gt["gt_boxes_lidar"][:1].copy(),
           "score": np.array([0.9])}
    s, r = waymo_eval([gt], [det], ["Vehicle"])
    # the empty gt is dropped entirely -> perfect score
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] > 99.9


def test_heading_sim_wraps():
    assert abs(_heading_sim(0.0, np.pi) - 0.0) < 1e-9
    assert abs(_heading_sim(0.1, 0.1 + 2 * np.pi) - 1.0) < 1e-6
    assert abs(_heading_sim(0.0, np.pi / 2) - 0.5) < 1e-9


# ------------------------------------------------------------------- ONCE

def once_gt_frame(positions, names):
    n = len(names)
    b = np.zeros((n, 7))
    for i, p in enumerate(positions):
        b[i, :3] = p
    b[:, 3:6] = [4.2, 1.9, 1.7]
    return {"name": np.asarray(names), "boxes_3d": b}


def test_once_heading_gate():
    a = boxes([[10, 0, 0, 4, 2, 1.6, 0.0]])
    b_same = boxes([[10, 0, 0, 4, 2, 1.6, 0.3]])
    b_flip = boxes([[10, 0, 0, 4, 2, 1.6, np.pi * 0.75]])
    assert heading_gated_iou3d(a, b_same)[0, 0] > 0.5
    assert heading_gated_iou3d(a, b_flip)[0, 0] == 0.0


def test_once_superclass_and_distance_buckets():
    # one Car at 10m, one Truck at 40m, one Pedestrian at 60m
    gt = once_gt_frame([[10, 0, 0], [40, 0, 0], [60, 0, 0]],
                       ["Car", "Truck", "Pedestrian"])
    gt["boxes_3d"][2, 3:6] = [0.8, 0.7, 1.7]
    det = {"name": gt["name"].copy(), "boxes_3d": gt["boxes_3d"].copy(),
           "score": np.array([0.9, 0.8, 0.7])}
    s, r = once_eval([gt], [det], ["Car", "Bus", "Truck", "Pedestrian",
                                   "Cyclist"])
    # Car+Truck merge into Vehicle; perfect detections everywhere
    assert r["AP_Vehicle/overall"] > 99.0, r
    assert r["AP_Vehicle/0-30m"] > 99.0
    assert r["AP_Vehicle/30-50m"] > 99.0
    assert r["AP_Pedestrian/50m-inf"] > 99.0
    # no Vehicle gt beyond 50m -> key absent (no valid gt)
    assert "AP_Vehicle/50m-inf" not in r


def test_once_misses_cap_recall():
    gt = once_gt_frame([[10, 0, 0], [12, 5, 0], [14, -5, 0], [16, 2, 0]],
                       ["Car"] * 4)
    det = {"name": np.asarray(["Car"] * 2),
           "boxes_3d": gt["boxes_3d"][:2].copy(),
           "score": np.array([0.9, 0.8])}
    s, r = once_eval([gt], [det], ["Car", "Bus", "Truck"])
    ap = r["AP_Vehicle/overall"]
    assert 40.0 < ap < 60.0, ap


def test_once_wrong_class_is_fp():
    gt = once_gt_frame([[10, 0, 0]], ["Pedestrian"])
    gt["boxes_3d"][0, 3:6] = [0.8, 0.7, 1.7]
    det = {"name": np.asarray(["Pedestrian", "Cyclist"]),
           "boxes_3d": np.vstack([gt["boxes_3d"],
                                  boxes([[30, 0, 0, 1.8, 0.6, 1.7, 0]])]),
           "score": np.array([0.9, 0.95])}
    s, r = once_eval([gt], [det], ["Pedestrian", "Cyclist"])
    assert r["AP_Pedestrian/overall"] > 99.0
    # Cyclist has no gt -> class skipped (no valid gt), not crashing
    assert "AP_Cyclist/overall" not in r


# ------------------------------------------------------------------ Lyft

def test_lyft_ap_hand_computed():
    """lyft_mAP_eval protocol (lyft_eval.py:272-340): greedy score-order
    matching, VOC envelope AP, IoU-threshold sweep. Hand-computed case:
    one gt, two preds on it (second is a double-match FP), one far FP."""
    from findnpropagate_tpu.datasets.lyft_eval import (
        get_ap,
        lyft_eval,
        recall_precision,
    )

    gt = [{"sample_token": "0",
           "box7": np.array([0, 0, 0, 4, 2, 1.5, 0.0]), "name": "car"}]
    preds = [
        {"sample_token": "0", "box7": np.array([0, 0, 0, 4, 2, 1.5, 0.0]),
         "name": "car", "score": 0.9},                    # TP (IoU 1.0)
        {"sample_token": "0",
         "box7": np.array([0.1, 0, 0, 4, 2, 1.5, 0.0]),
         "name": "car", "score": 0.8},                    # gt claimed -> FP
        {"sample_token": "0", "box7": np.array([20, 0, 0, 4, 2, 1.5, 0.0]),
         "name": "car", "score": 0.7},                    # FP
    ]
    recalls, precisions, ap_list = recall_precision(gt, preds, [0.5])
    # PR points: (1, 1.0), (1, 0.5), (1, 1/3) -> envelope AP = 1.0
    np.testing.assert_allclose(recalls[:, 0], [1.0, 1.0, 1.0])
    np.testing.assert_allclose(precisions[:, 0], [1.0, 0.5, 1 / 3])
    assert ap_list[0] == pytest.approx(1.0)

    # VOC envelope on a crafted curve
    ap = get_ap(np.array([0.5, 1.0]), np.array([1.0, 0.25]))
    assert ap == pytest.approx(0.5 * 1.0 + 0.5 * 0.25)

    # framework wrapper: per-frame annos -> per-class AP + mAP
    gt_annos = [{"gt_boxes": np.array([[0, 0, 0, 4, 2, 1.5, 0.0]]),
                 "gt_names": ["car"]}]
    det_annos = [{"boxes": np.array([[0, 0, 0, 4, 2, 1.5, 0.0]]),
                  "scores": np.array([0.9]), "name": ["car"]}]
    result, metrics = lyft_eval(gt_annos, det_annos, ["car", "truck"])
    # exact match -> TP at every threshold 0.5..0.95
    assert metrics["AP_car"] == pytest.approx(1.0)
    assert metrics["AP_truck"] == 0.0
    assert metrics["mAP"] == pytest.approx(0.5)
    assert "mAP" in result


def test_lyft_threshold_sweep_drops_loose_matches():
    """A det with 3D IoU ~0.57 counts at 0.5/0.55 but not above."""
    from findnpropagate_tpu.datasets.lyft_eval import recall_precision

    gt = [{"sample_token": "0",
           "box7": np.array([0, 0, 0, 4, 2, 1.5, 0.0]), "name": "car"}]
    # shift x by 1.0: inter = 3*2*1.5 = 9, union = 2*12 - 9 = 15 -> 0.6
    preds = [{"sample_token": "0",
              "box7": np.array([1.0, 0, 0, 4, 2, 1.5, 0.0]),
              "name": "car", "score": 0.9}]
    _, _, ap_list = recall_precision(gt, preds, [0.5, 0.55, 0.65])
    assert ap_list[0] == pytest.approx(1.0)
    assert ap_list[1] == pytest.approx(1.0)
    assert ap_list[2] == pytest.approx(0.0)


# ------------------------------------------------------------------ Argo2

def _argo2_frames(det_offset=0.0, yaw_err=0.0, n=6):
    gts, dets = [], []
    for f in range(2):
        rng = np.random.RandomState(100 + f)
        b = np.zeros((n, 7))
        b[:, 0] = rng.uniform(5, 60, n)
        b[:, 1] = rng.uniform(-30, 30, n)
        b[:, 2] = 0.8
        b[:, 3:6] = [4.6, 2.0, 1.7]
        b[:, 6] = rng.uniform(-np.pi, np.pi, n)
        gts.append({"gt_boxes": b.copy(),
                    "gt_names": np.asarray(["REGULAR_VEHICLE"] * n)})
        d = b.copy()
        d[:, 0] += det_offset
        d[:, 6] += yaw_err
        dets.append({"boxes": d, "scores": np.linspace(0.9, 0.5, n),
                     "name": np.asarray(["REGULAR_VEHICLE"] * n)})
    return gts, dets


def test_argo2_perfect_detections():
    from findnpropagate_tpu.datasets.argo2_eval import argo2_eval

    gts, dets = _argo2_frames()
    _, res = argo2_eval(gts, dets, ["REGULAR_VEHICLE"])
    assert res["REGULAR_VEHICLE_AP"] == pytest.approx(1.0)
    assert res["REGULAR_VEHICLE_ATE"] == pytest.approx(0.0, abs=1e-9)
    assert res["REGULAR_VEHICLE_ASE"] == pytest.approx(0.0, abs=1e-9)
    assert res["REGULAR_VEHICLE_AOE"] == pytest.approx(0.0, abs=1e-9)
    assert res["REGULAR_VEHICLE_CDS"] == pytest.approx(1.0)
    assert res["mAP"] == pytest.approx(1.0)


def test_argo2_threshold_sweep_and_ate():
    """A 1.5 m offset matches only at the 2 m and 4 m thresholds ->
    AP = mean(0, 0, 1, 1); ATE = 1.5 at the 2 m TP threshold."""
    from findnpropagate_tpu.datasets.argo2_eval import argo2_eval

    gts, dets = _argo2_frames(det_offset=1.5)
    _, res = argo2_eval(gts, dets, ["REGULAR_VEHICLE"])
    assert res["REGULAR_VEHICLE_AP"] == pytest.approx(0.5)
    assert res["REGULAR_VEHICLE_ATE"] == pytest.approx(1.5, abs=1e-6)
    # CDS discounts AP by the normalized ATE (1.5 / 2.0)
    want_cds = 0.5 * np.mean([1 - 1.5 / 2.0, 1.0, 1.0])
    assert res["REGULAR_VEHICLE_CDS"] == pytest.approx(want_cds, abs=1e-6)


def test_argo2_yaw_error_hits_aoe_not_ap():
    from findnpropagate_tpu.datasets.argo2_eval import argo2_eval

    gts, dets = _argo2_frames(yaw_err=0.3)
    _, res = argo2_eval(gts, dets, ["REGULAR_VEHICLE"])
    assert res["REGULAR_VEHICLE_AP"] == pytest.approx(1.0)
    assert res["REGULAR_VEHICLE_AOE"] == pytest.approx(0.3, abs=1e-6)


def test_argo2_no_tp_takes_max_errors():
    from findnpropagate_tpu.datasets.argo2_eval import argo2_eval

    gts, dets = _argo2_frames(det_offset=50.0)
    _, res = argo2_eval(gts, dets, ["REGULAR_VEHICLE"])
    assert res["REGULAR_VEHICLE_AP"] == pytest.approx(0.0)
    assert res["REGULAR_VEHICLE_ATE"] == pytest.approx(2.0)
    assert res["REGULAR_VEHICLE_ASE"] == pytest.approx(1.0)
    assert res["REGULAR_VEHICLE_AOE"] == pytest.approx(np.pi)
    assert res["REGULAR_VEHICLE_CDS"] == pytest.approx(0.0)


def test_argo2_range_and_point_filters():
    """GTs beyond max_range_m or with zero interior points are excluded."""
    from findnpropagate_tpu.datasets.argo2_eval import argo2_eval

    b = np.zeros((3, 7))
    b[:, 0] = [10.0, 300.0, 20.0]
    b[:, 3:6] = [4.0, 2.0, 1.5]
    gts = [{"gt_boxes": b, "gt_names": np.asarray(["BUS"] * 3),
            "num_points_in_gt": np.array([5, 5, 0])}]
    dets = [{"boxes": b[:1], "scores": np.array([0.9]),
             "name": np.asarray(["BUS"])}]
    _, res = argo2_eval(gts, dets, ["BUS"], max_range_m=200.0)
    # only gt 0 counts (gt 1 out of range, gt 2 has no points) -> perfect
    assert res["BUS_AP"] == pytest.approx(1.0)

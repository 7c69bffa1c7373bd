"""nuScenes-protocol evaluator vs hand-computed values.

The AP operating-point integral, the recall/precision clamps at 0.1, the TP
metrics and the NDS aggregation are all checked against closed-form
expectations on tiny synthetic fixtures (the devkit itself is absent here;
these are the devkit formulas evaluated by hand)."""

import numpy as np

from findnpropagate_tpu.datasets.nuscenes_eval import (
    accumulate,
    calc_ap,
    calc_tp,
    nuscenes_protocol_eval,
)


def box(x, y, yaw=0.0, dims=(4.0, 2.0, 1.5), vel=(0.0, 0.0)):
    return np.array([x, y, 0.0, *dims, yaw, *vel], np.float64)


def test_perfect_detections_give_nds_one():
    gt_annos, det_annos = [], []
    for f in range(3):
        boxes = np.stack([box(5 + f, 0), box(-8, 3 + f)])
        gt_annos.append({
            "gt_boxes": boxes,
            "gt_names": np.array(["car", "pedestrian"], dtype=object),
            "gt_attrs": np.array(["vehicle.parked", "pedestrian.standing"],
                                 dtype=object),
        })
        det_annos.append({
            "boxes": boxes.copy(),
            "scores": np.array([0.9, 0.8]),
            "names": np.array(["car", "pedestrian"], dtype=object),
            "attrs": np.array(["vehicle.parked", "pedestrian.standing"],
                              dtype=object),
        })
    _, res = nuscenes_protocol_eval(det_annos, gt_annos,
                                    ["car", "pedestrian"])
    assert abs(res["mAP"] - 1.0) < 1e-6
    for k in ("mATE", "mASE", "mAOE", "mAVE", "mAAE"):
        assert res[k] < 1e-6, (k, res[k])
    assert abs(res["NDS"] - 1.0) < 1e-6


def test_ap_operating_point_integral():
    """1 det matching 1 of 2 gts at full precision: recall tops out at 0.5,
    so AP = (0.5 - 0.1) / (1 - 0.1) under the min-recall/min-precision
    clamps (NOT 0.5, which Pascal-style integration would give)."""
    gt = [{"gt_boxes": np.stack([box(5, 0), box(-5, 0)]),
           "gt_names": np.array(["car", "car"], dtype=object)}]
    det = [{"boxes": np.stack([box(5, 0)]), "scores": np.array([0.9]),
            "names": np.array(["car"], dtype=object)}]
    _, res = nuscenes_protocol_eval(det, gt, ["car"])
    expected = (0.5 - 0.1) / 0.9
    assert abs(res["AP_car"] - expected) < 1e-3, res["AP_car"]


def test_tp_errors_hand_computed():
    """Single TP with known offsets: ATE = planar distance, AOE = yaw diff,
    ASE = 1 - size IoU, AVE = velocity L2."""
    g = box(10, 0, yaw=0.0, dims=(4.0, 2.0, 2.0), vel=(1.0, 0.0))
    d = box(10.5, 0, yaw=0.25, dims=(4.0, 2.0, 1.0), vel=(2.0, 0.0))
    gt = [{"gt_boxes": g[None], "gt_names": np.array(["car"], dtype=object)}]
    det = [{"boxes": d[None], "scores": np.array([0.9]),
            "names": np.array(["car"], dtype=object)}]
    md = accumulate(gt_frames=[{"boxes": g[None],
                                "names": np.array(["car"], dtype=object)}],
                    det_frames=[{"boxes": d[None],
                                 "scores": np.array([0.9]),
                                 "names": np.array(["car"], dtype=object)}],
                    class_name="car", dist_th=2.0)
    assert abs(calc_tp(md, "trans_err") - 0.5) < 1e-6
    assert abs(calc_tp(md, "orient_err") - 0.25) < 1e-6
    # size IoU: vol inter = 4*2*1, union = 4*2*2 -> ASE = 1 - 0.5
    assert abs(calc_tp(md, "scale_err") - 0.5) < 1e-6
    assert abs(calc_tp(md, "vel_err") - 1.0) < 1e-6


def test_barrier_yaw_period_pi():
    g = box(10, 0, yaw=0.0)
    d = box(10, 0, yaw=np.pi - 0.1)  # flipped barrier: error 0.1, not pi-0.1
    md = accumulate([{"boxes": g[None],
                      "names": np.array(["barrier"], dtype=object)}],
                    [{"boxes": d[None], "scores": np.array([0.9]),
                      "names": np.array(["barrier"], dtype=object)}],
                    "barrier", 2.0)
    assert abs(calc_tp(md, "orient_err") - 0.1) < 1e-6


def test_class_range_filtering():
    """traffic_cone beyond 30 m must be dropped from both gt and det."""
    gt = [{"gt_boxes": np.stack([box(35, 0), box(10, 0)]),
           "gt_names": np.array(["traffic_cone", "traffic_cone"],
                                dtype=object)}]
    det = [{"boxes": np.stack([box(35, 0), box(10, 0)]),
            "scores": np.array([0.9, 0.8]),
            "names": np.array(["traffic_cone", "traffic_cone"],
                              dtype=object)}]
    _, res = nuscenes_protocol_eval(det, gt, ["traffic_cone"])
    # only the near pair remains -> perfect AP
    assert abs(res["AP_traffic_cone"] - 1.0) < 1e-6


def test_known_novel_bucketing_and_nds_formula():
    gt, det = [], []
    boxes = np.stack([box(5, 0), box(-8, 3)])
    gt.append({"gt_boxes": boxes,
               "gt_names": np.array(["car", "pedestrian"], dtype=object),
               "gt_attrs": np.array(["vehicle.parked", "pedestrian.moving"],
                                    dtype=object)})
    # perfect car, missed pedestrian
    det.append({"boxes": boxes[:1], "scores": np.array([0.9]),
                "names": np.array(["car"], dtype=object)})
    _, res = nuscenes_protocol_eval(det, gt, ["car", "pedestrian"],
                                    known_classes=["car"])
    assert abs(res["AP_B"] - 1.0) < 1e-6
    assert res["AP_N"] == 0.0
    assert res["AR_N"] == 0.0
    # devkit semantics: a gt-present class with NO TPs contributes the worst
    # value 1.0 to every TP metric (calc_tp's last<first branch); the car is
    # perfect (0.0, its default attribute vehicle.parked matches), so each
    # mTP = 0.5 and NDS = (5*0.5 + 5*(1-0.5)) / 10
    for k in ("mATE", "mASE", "mAOE", "mAVE", "mAAE"):
        assert abs(res[k] - 0.5) < 1e-6, (k, res[k])
    assert abs(res["NDS"] - 0.5) < 1e-6, res["NDS"]


def test_zero_point_gt_removed():
    gt = [{"gt_boxes": np.stack([box(5, 0)]),
           "gt_names": np.array(["car"], dtype=object),
           "num_lidar_pts": np.array([0])}]
    det = [{"boxes": np.zeros((0, 9)), "scores": np.zeros(0),
            "names": np.array([], dtype=object)}]
    _, res = nuscenes_protocol_eval(det, gt, ["car"])
    # the only gt is filtered -> class absent -> mAP over present classes = 0
    assert res["mAP"] == 0.0

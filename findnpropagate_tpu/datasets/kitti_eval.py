"""KITTI-protocol AP evaluation (R40, difficulty buckets, rotated IoU).

Replaces the reference's numba-JIT evaluator
(pcdet/datasets/kitti/kitti_object_eval_python/eval.py, /root/reference;
numba is unavailable here). Implements the official protocol's core:
40-point interpolated AP, per-class IoU thresholds (0.7 car / 0.5 others),
easy/moderate/hard difficulty gating by box height / occlusion / truncation,
ignored-box handling, greedy score-ordered matching with rotated BEV/3D IoU
(exact polygon-clipping kernel run on CPU via the shared JAX op).
"""

from __future__ import annotations

import numpy as np

from ..ops.rotated_iou import boxes_iou3d, boxes_iou_bev

# official difficulty gates (eval.py clean_data)
MIN_HEIGHT = [40, 25, 25]        # 2D bbox height in px (easy, moderate, hard)
MAX_OCCLUSION = [0, 1, 2]
MAX_TRUNCATION = [0.15, 0.3, 0.5]
IOU_THRESH = {"Car": 0.7, "Pedestrian": 0.5, "Cyclist": 0.5}


def clean_gt(anno, cls_name, difficulty):
    """Returns (care mask, ignored mask) over gt boxes for one frame."""
    names = np.asarray(anno["name"])
    n = len(names)
    care = np.zeros(n, bool)
    ignored = np.zeros(n, bool)
    occl = np.asarray(anno.get("occluded", np.zeros(n)))
    trunc = np.asarray(anno.get("truncated", np.zeros(n)))
    bbox = np.asarray(anno.get("bbox", np.zeros((n, 4))))
    heights = bbox[:, 3] - bbox[:, 1] if len(bbox) else np.zeros(n)
    for i in range(n):
        same = names[i] == cls_name
        neighbor = (
            (cls_name == "Pedestrian" and names[i] == "Person_sitting")
            or (cls_name == "Car" and names[i] == "Van")
        )
        too_hard = (
            occl[i] > MAX_OCCLUSION[difficulty]
            or trunc[i] > MAX_TRUNCATION[difficulty]
            or (len(bbox) and heights[i] < MIN_HEIGHT[difficulty])
        )
        if same and not too_hard:
            care[i] = True
        elif same or neighbor or names[i] == "DontCare":
            ignored[i] = True
    return care, ignored


def _ap_r40(scores_tp, num_gt):
    """scores_tp: list of (score, is_tp); 40-point interpolated AP."""
    if num_gt == 0 or not scores_tp:
        return 0.0
    arr = np.asarray(scores_tp)
    order = np.argsort(-arr[:, 0])
    tp = arr[order, 1]
    cum_tp = np.cumsum(tp)
    cum_fp = np.cumsum(1 - tp)
    recall = cum_tp / num_gt
    precision = cum_tp / np.maximum(cum_tp + cum_fp, 1)
    # precision envelope
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    ap = 0.0
    for r in np.linspace(1 / 40, 1.0, 40):
        idx = np.searchsorted(recall, r, side="left")
        ap += precision[idx] if idx < len(precision) else 0.0
    return ap / 40


def eval_class(gt_annos, det_annos, cls_name, difficulty, metric="3d"):
    """AP for one (class, difficulty). gt_annos: per-frame dicts with
    name/gt_boxes_lidar(+bbox/occluded/truncated); det_annos: per-frame
    boxes/scores/labels arrays + a name list OR labels matching class index.
    """
    thresh = IOU_THRESH.get(cls_name, 0.5)
    scores_tp = []
    num_gt_total = 0
    for gt, det in zip(gt_annos, det_annos):
        care, ignored = clean_gt(gt, cls_name, difficulty)
        gt_boxes = np.asarray(gt.get("gt_boxes_lidar", np.zeros((0, 7))))
        det_names = np.asarray(det.get("name", []))
        if len(det_names):
            det_mask = det_names == cls_name
        else:
            det_mask = np.ones(len(det.get("boxes", [])), bool)
        det_boxes = np.asarray(det.get("boxes", np.zeros((0, 7))))[det_mask][:, :7]
        det_scores = np.asarray(det.get("scores", np.zeros(0)))[det_mask]
        num_gt_total += int(care.sum())
        if len(det_boxes) == 0:
            continue
        if len(gt_boxes) == 0:
            scores_tp.extend((s, 0) for s in det_scores)
            continue
        iou_fn = boxes_iou3d if metric == "3d" else boxes_iou_bev
        iou = np.asarray(iou_fn(det_boxes.astype(np.float32),
                                gt_boxes.astype(np.float32)))
        order = np.argsort(-det_scores)
        assigned = np.zeros(len(gt_boxes), bool)
        for di in order:
            row = iou[di].copy()
            row[assigned] = -1
            # prefer care gts (official protocol: a detection overlapping
            # both an ignored gt and a qualifying care gt counts as TP for
            # the care gt, never absorbed by the ignored one)
            care_row = np.where(care, row, -1.0)
            gi = int(np.argmax(care_row))
            if care_row[gi] >= thresh:
                assigned[gi] = True
                scores_tp.append((det_scores[di], 1))
                continue
            ign_row = np.where(ignored, row, -1.0)
            gi = int(np.argmax(ign_row))
            if ign_row[gi] >= thresh:
                assigned[gi] = True  # matched an ignored gt: neither TP nor FP
            else:
                scores_tp.append((det_scores[di], 0))
    return _ap_r40(scores_tp, num_gt_total) * 100.0


def kitti_eval(gt_annos, det_annos, class_names, metrics=("bev", "3d")):
    """Returns (result_str, result_dict) with AP_R40 per class x difficulty."""
    result = {}
    for cls_name in class_names:
        for metric in metrics:
            for d, dname in enumerate(["easy", "moderate", "hard"]):
                ap = eval_class(gt_annos, det_annos, cls_name, d, metric)
                result[f"{cls_name}_{metric}_{dname}_R40"] = ap
    lines = [f"{k}: {v:.2f}" for k, v in result.items()]
    moderate_3d = [
        result.get(f"{c}_3d_moderate_R40", 0.0) for c in class_names
    ]
    result["mAP_3d_moderate_R40"] = float(np.mean(moderate_3d))
    lines.append(f"mAP_3d_moderate_R40: {result['mAP_3d_moderate_R40']:.2f}")
    return "\n".join(lines), result

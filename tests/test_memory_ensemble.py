"""Memory-bank ensembles: match/replace/disappear/appear semantics."""

import numpy as np

from findnpropagate_tpu.utils.memory_ensemble import (
    bipartite_ensemble,
    consistency_ensemble,
    memory_ensemble,
    nms_ensemble,
)

CFG = {"IOU_THRESH": 0.1, "NMS_THRESH": 0.1,
       "MEMORY_VOTING": {"ENABLED": True, "IGNORE_THRESH": 2, "RM_THRESH": 3}}


def infos(boxes_scores, counter=None):
    boxes = np.asarray(boxes_scores, np.float32)
    n = len(boxes)
    return {
        "gt_boxes": boxes,
        "cls_scores": None,
        "iou_scores": None,
        "memory_counter": np.zeros(n, np.int64) if counter is None
        else np.asarray(counter),
    }


def box(x, y, score, label=1):
    return [x, y, 0, 4, 2, 1.5, 0.0, label, score]


def test_consistency_keeps_higher_confidence():
    a = infos([box(10, 0, 0.5)])
    b = infos([box(10.2, 0, 0.9)])
    out = consistency_ensemble(a, b, CFG)
    assert len(out["gt_boxes"]) == 1
    assert out["gt_boxes"][0, 8] == np.float32(0.9)
    assert out["memory_counter"][0] == 0


def test_consistency_appear_and_disappear():
    a = infos([box(10, 0, 0.8)], counter=[1])
    b = infos([box(40, 0, 0.7)])
    out = consistency_ensemble(a, b, CFG)
    # memory box disappeared (counter -> 2 -> ignored, label=-1) + new box
    assert len(out["gt_boxes"]) == 2
    labels = out["gt_boxes"][:, 7]
    assert (labels == -1).sum() == 1
    assert (labels == 1).sum() == 1


def test_consistency_removes_after_rm_thresh():
    a = infos([box(10, 0, 0.8)], counter=[2])
    b = infos([box(40, 0, 0.7)])
    out = consistency_ensemble(a, b, CFG)
    # counter hits 3 -> removed entirely; only the new box remains
    assert len(out["gt_boxes"]) == 1
    assert out["gt_boxes"][0, 0] == np.float32(40)


def test_nms_ensemble_dedups():
    a = infos([box(10, 0, 0.5)])
    b = infos([box(10.1, 0, 0.9), box(40, 0, 0.6)])
    out = nms_ensemble(a, b, CFG)
    assert len(out["gt_boxes"]) == 2
    assert np.max(out["gt_boxes"][:, 8]) == np.float32(0.9)


def test_bipartite_matches_one_to_one():
    a = infos([box(10, 0, 0.5), box(10.5, 0, 0.4)])
    b = infos([box(10.1, 0, 0.9)])
    out = bipartite_ensemble(a, b, CFG)
    # only ONE memory box can take the new box; the other counts a miss
    assert (out["memory_counter"] == 1).sum() == 1
    assert (out["gt_boxes"][:, 8] == np.float32(0.9)).sum() == 1


def test_dispatch():
    a = infos([box(10, 0, 0.5)])
    b = infos([box(10.2, 0, 0.9)])
    out = memory_ensemble(a, b, dict(CFG, NAME="consistency_ensemble"))
    assert len(out["gt_boxes"]) == 1

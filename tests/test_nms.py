import numpy as np

from findnpropagate_tpu.ops.nms import (
    circle_nms,
    class_agnostic_nms,
    nms_bev,
    nms_normal_bev,
)

from oracles import greedy_nms, rotated_iou_bev


def random_boxes(rng, n, span=10.0):
    boxes = np.zeros((n, 7), dtype=np.float32)
    boxes[:, 0:2] = rng.uniform(-span, span, (n, 2))
    boxes[:, 2] = rng.uniform(-1, 1, n)
    boxes[:, 3:6] = rng.uniform(1.0, 4.0, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes


def test_nms_bev_vs_oracle():
    rng = np.random.RandomState(0)
    boxes = random_boxes(rng, 60, span=8.0)
    scores = rng.uniform(0, 1, 60).astype(np.float32)
    idx, num = nms_bev(boxes, scores, 0.5, pre_maxsize=64, post_maxsize=64)
    got = sorted(int(i) for i in np.asarray(idx)[: int(num)])

    want = sorted(
        greedy_nms(
            boxes,
            scores,
            0.5,
            lambda a, b: rotated_iou_bev(a[[0, 1, 3, 4, 6]], b[[0, 1, 3, 4, 6]]),
        )
    )
    assert got == want


def test_nms_keeps_all_disjoint():
    boxes = np.zeros((8, 7), dtype=np.float32)
    boxes[:, 0] = np.arange(8) * 100.0
    boxes[:, 3:6] = 1.0
    scores = np.linspace(1, 0.1, 8).astype(np.float32)
    idx, num = nms_bev(boxes, scores, 0.1, pre_maxsize=8, post_maxsize=8)
    assert int(num) == 8


def test_nms_suppresses_duplicates():
    boxes = np.tile(np.array([[1, 2, 0, 3, 2, 1.5, 0.4]], dtype=np.float32), (5, 1))
    scores = np.array([0.9, 0.8, 0.7, 0.6, 0.5], dtype=np.float32)
    idx, num = nms_bev(boxes, scores, 0.5, pre_maxsize=8, post_maxsize=8)
    assert int(num) == 1
    assert int(idx[0]) == 0


def test_nms_normal_ignores_heading():
    # identical centers/dims, different headings -> axis-aligned IoU is 1 -> suppress
    boxes = np.array(
        [[0, 0, 0, 4, 2, 1, 0.0], [0, 0, 0, 4, 2, 1, 1.2]], dtype=np.float32
    )
    scores = np.array([0.9, 0.8], dtype=np.float32)
    idx, num = nms_normal_bev(boxes, scores, 0.5, pre_maxsize=2, post_maxsize=2)
    assert int(num) == 1


def test_class_agnostic_score_thresh():
    rng = np.random.RandomState(1)
    boxes = random_boxes(rng, 20, span=50.0)  # spread out, no overlap
    scores = np.linspace(0.95, 0.05, 20).astype(np.float32)
    idx, sel_scores, num = class_agnostic_nms(
        scores, boxes, nms_thresh=0.3, score_thresh=0.5, pre_maxsize=32, post_maxsize=32
    )
    assert int(num) == int((scores >= 0.5).sum())
    assert np.all(np.asarray(sel_scores)[: int(num)] >= 0.5)


def test_circle_nms():
    centers = np.array([[0, 0], [0.5, 0], [10, 10]], dtype=np.float32)
    scores = np.array([0.9, 0.8, 0.7], dtype=np.float32)
    idx, num = circle_nms(centers, scores, radius=1.0, post_maxsize=3)
    kept = sorted(int(i) for i in np.asarray(idx)[: int(num)])
    assert kept == [0, 2]

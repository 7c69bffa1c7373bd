"""Parity of the native C++ host geometry library (findnpropagate_tpu/native)
against the independent float64 numpy oracles, and of the geometry_np
fallback path against the native path.

Reference contracts: pcdet/ops/iou3d_nms/src/iou3d_cpu.cpp (exact rotated
BEV IoU on the host), kitti_object_eval_python/rotate_iou.py.
"""

import numpy as np
import pytest

from findnpropagate_tpu import native
from findnpropagate_tpu.utils import geometry_np as G

import oracles


def random_boxes(rng, n, span=20.0):
    out = np.zeros((n, 7), np.float32)
    out[:, 0:2] = rng.uniform(-span, span, (n, 2))
    out[:, 2] = rng.uniform(-1.0, 1.0, n)
    out[:, 3:6] = rng.uniform(0.5, 4.0, (n, 3))
    out[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return out


@pytest.fixture(scope="module")
def boxes():
    rng = np.random.RandomState(0)
    return random_boxes(rng, 40), random_boxes(rng, 30)


def test_native_builds():
    assert native.available(), "g++ toolchain present but native lib failed"


def test_iou_bev_vs_oracle(boxes):
    a, b = boxes
    got = native.iou_bev7(a, b)
    for i in range(0, len(a), 7):
        for j in range(0, len(b), 5):
            want = oracles.rotated_iou_bev(
                a[i, [0, 1, 3, 4, 6]].astype(np.float64),
                b[j, [0, 1, 3, 4, 6]].astype(np.float64))
            assert abs(got[i, j] - want) < 1e-4, (i, j, got[i, j], want)


def test_iou_bev_self_identity(boxes):
    a, _ = boxes
    got = native.iou_bev7(a, a)
    assert np.allclose(np.diag(got), 1.0, atol=1e-5)


def test_iou3d_vs_oracle(boxes):
    a, b = boxes
    got = native.iou3d(a, b)
    for i in range(0, len(a), 7):
        for j in range(0, len(b), 5):
            want = oracles.iou3d(a[i].astype(np.float64),
                                 b[j].astype(np.float64))
            assert abs(got[i, j] - want) < 1e-4, (i, j, got[i, j], want)


def test_points_in_boxes_vs_oracle(boxes):
    a, _ = boxes
    rng = np.random.RandomState(1)
    pts = rng.uniform(-22, 22, (500, 3)).astype(np.float32)
    got = native.points_in_boxes(pts, a)
    for k in range(0, len(pts), 17):
        want = -1
        for i in range(len(a)):
            if oracles.points_in_box(pts[k:k + 1], a[i])[0]:
                want = i
                break
        assert got[k] == want, (k, got[k], want)


def test_nms_vs_oracle(boxes):
    a, _ = boxes
    rng = np.random.RandomState(2)
    scores = rng.uniform(0, 1, len(a)).astype(np.float32)
    got = native.nms_bev(a, scores, 0.3)

    def iou_fn(x, y):
        return float(native.iou_bev7(x[None, :7], y[None, :7])[0, 0])

    want = oracles.greedy_nms(a, scores, 0.3, iou_fn)
    assert list(got) == list(want)


def test_geometry_np_fallback_matches_native(boxes, monkeypatch):
    a, b = boxes
    fast = G.boxes_bev_iou_cpu(a, b)
    monkeypatch.setattr(native, "available", lambda: False)
    slow = G.boxes_bev_iou_cpu(a, b)
    assert np.allclose(fast, slow, atol=1e-4)


def test_empty_inputs():
    empty = np.zeros((0, 7), np.float32)
    one = np.array([[0, 0, 0, 2, 2, 2, 0.3]], np.float32)
    assert native.iou_bev7(empty, one).shape == (0, 1)
    assert G.boxes_bev_iou_cpu(one, empty).shape == (1, 0)
    assert len(native.nms_bev(empty, np.zeros((0,)), 0.5)) == 0

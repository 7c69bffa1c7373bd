import numpy as np
import pytest

from findnpropagate_tpu.ops.rotated_iou import (
    boxes_aligned_iou3d,
    boxes_aligned_overlap_bev,
    boxes_iou3d,
    boxes_iou_bev,
    boxes_nearest_bev_iou,
    boxes_overlap_bev,
)

from oracles import iou3d, rotated_iou_bev, rotated_overlap_bev


def random_boxes(rng, n, span=10.0):
    boxes = np.zeros((n, 7), dtype=np.float32)
    boxes[:, 0:2] = rng.uniform(-span, span, (n, 2))
    boxes[:, 2] = rng.uniform(-2, 2, n)
    boxes[:, 3:6] = rng.uniform(0.5, 5.0, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes


def test_overlap_bev_vs_oracle():
    rng = np.random.RandomState(0)
    a = random_boxes(rng, 24, span=4.0)
    b = random_boxes(rng, 17, span=4.0)
    got = np.asarray(boxes_overlap_bev(a, b))
    for i in range(a.shape[0]):
        for j in range(b.shape[0]):
            want = rotated_overlap_bev(a[i][[0, 1, 3, 4, 6]], b[j][[0, 1, 3, 4, 6]])
            assert got[i, j] == pytest.approx(want, abs=2e-3), (i, j)


def test_iou_bev_vs_oracle():
    rng = np.random.RandomState(1)
    a = random_boxes(rng, 16, span=3.0)
    b = random_boxes(rng, 16, span=3.0)
    got = np.asarray(boxes_iou_bev(a, b))
    for i in range(16):
        for j in range(16):
            want = rotated_iou_bev(a[i][[0, 1, 3, 4, 6]], b[j][[0, 1, 3, 4, 6]])
            assert got[i, j] == pytest.approx(want, abs=2e-3)


def test_identical_boxes_full_overlap():
    rng = np.random.RandomState(2)
    a = random_boxes(rng, 8)
    iou = np.asarray(boxes_iou_bev(a, a))
    assert np.allclose(np.diag(iou), 1.0, atol=1e-3)
    iou3 = np.asarray(boxes_iou3d(a, a))
    assert np.allclose(np.diag(iou3), 1.0, atol=1e-3)


def test_disjoint_boxes_zero():
    a = np.array([[0, 0, 0, 2, 2, 2, 0.3]], dtype=np.float32)
    b = np.array([[100, 100, 0, 2, 2, 2, 1.0]], dtype=np.float32)
    assert float(boxes_overlap_bev(a, b)[0, 0]) == 0.0
    assert float(boxes_iou3d(a, b)[0, 0]) == 0.0


def test_axis_aligned_known_value():
    # two axis-aligned unit squares overlapping by 0.5 in x
    a = np.array([[0, 0, 0, 1, 1, 1, 0]], dtype=np.float32)
    b = np.array([[0.5, 0, 0, 1, 1, 1, 0]], dtype=np.float32)
    assert float(boxes_overlap_bev(a, b)[0, 0]) == pytest.approx(0.5, abs=1e-4)
    assert float(boxes_iou_bev(a, b)[0, 0]) == pytest.approx(0.5 / 1.5, abs=1e-4)


def test_rotated_45_known_value():
    # unit square vs same square rotated 45 deg: intersection = 8*(sqrt(2)-1)^2/2...
    # use the octagon area formula: A = 2*(sqrt(2)-1) for unit squares.
    a = np.array([[0, 0, 0, 1, 1, 1, 0]], dtype=np.float32)
    b = np.array([[0, 0, 0, 1, 1, 1, np.pi / 4]], dtype=np.float32)
    want = 2 * (np.sqrt(2) - 1)
    assert float(boxes_overlap_bev(a, b)[0, 0]) == pytest.approx(want, abs=1e-3)


def test_contained_box():
    a = np.array([[0, 0, 0, 4, 4, 4, 0.7]], dtype=np.float32)
    b = np.array([[0, 0, 0, 1, 1, 1, 1.9]], dtype=np.float32)
    assert float(boxes_overlap_bev(a, b)[0, 0]) == pytest.approx(1.0, abs=1e-3)


def test_iou3d_vs_oracle():
    rng = np.random.RandomState(3)
    a = random_boxes(rng, 12, span=3.0)
    b = random_boxes(rng, 12, span=3.0)
    got = np.asarray(boxes_iou3d(a, b))
    for i in range(12):
        for j in range(12):
            assert got[i, j] == pytest.approx(iou3d(a[i], b[j]), abs=2e-3)


def test_aligned_variants_match_diagonal():
    rng = np.random.RandomState(4)
    a = random_boxes(rng, 20, span=2.0)
    b = random_boxes(rng, 20, span=2.0)
    full = np.asarray(boxes_overlap_bev(a, b))
    aligned = np.asarray(boxes_aligned_overlap_bev(a, b))
    assert np.allclose(aligned, np.diag(full), atol=1e-4)
    full3 = np.asarray(boxes_iou3d(a, b))
    aligned3 = np.asarray(boxes_aligned_iou3d(a, b))
    assert np.allclose(aligned3, np.diag(full3), atol=1e-4)


def test_blocked_equals_unblocked():
    rng = np.random.RandomState(5)
    a = random_boxes(rng, 300, span=6.0)
    b = random_boxes(rng, 50, span=6.0)
    blocked = np.asarray(boxes_overlap_bev(a, b, block_size=64))
    whole = np.asarray(boxes_overlap_bev(a, b, block_size=512))
    assert np.allclose(blocked, whole, atol=1e-5)


def test_nearest_bev_iou_axis_aligned_case():
    # For heading 0 boxes, nearest-BEV IoU == exact rotated IoU.
    rng = np.random.RandomState(6)
    a = random_boxes(rng, 10, span=3.0)
    b = random_boxes(rng, 10, span=3.0)
    a[:, 6] = 0.0
    b[:, 6] = 0.0
    got = np.asarray(boxes_nearest_bev_iou(a, b))
    want = np.asarray(boxes_iou_bev(a, b))
    assert np.allclose(got, want, atol=2e-3)
    # heading pi/2 swaps dx/dy
    b90 = b.copy()
    b90[:, 6] = np.pi / 2
    b_sw = b.copy()
    b_sw[:, [3, 4]] = b[:, [4, 3]]
    got90 = np.asarray(boxes_nearest_bev_iou(a, b90))
    want90 = np.asarray(boxes_nearest_bev_iou(a, b_sw))
    assert np.allclose(got90, want90, atol=1e-4)

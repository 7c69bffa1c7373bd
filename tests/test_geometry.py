import numpy as np
import pytest

from findnpropagate_tpu.utils import geometry as G

from oracles import box_to_corners_bev, points_in_box


def test_limit_period():
    vals = np.array([0.0, np.pi, -np.pi, 3.5 * np.pi, -0.1])
    got = np.asarray(G.limit_period(vals, 0.5, np.pi))
    want = vals - np.floor(vals / np.pi + 0.5) * np.pi
    assert np.allclose(got, want, atol=1e-6)
    assert np.all(got >= -np.pi / 2 - 1e-6) and np.all(got < np.pi / 2 + 1e-6)


def test_rotate_points_along_z_matches_reference_formula():
    rng = np.random.RandomState(0)
    pts = rng.randn(3, 10, 5).astype(np.float32)
    ang = rng.uniform(-np.pi, np.pi, 3).astype(np.float32)
    got = np.asarray(G.rotate_points_along_z(pts, ang))
    for b in range(3):
        c, s = np.cos(ang[b]), np.sin(ang[b])
        rot = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]], dtype=np.float32)
        want = pts[b, :, :3] @ rot
        assert np.allclose(got[b, :, :3], want, atol=1e-5)
        assert np.allclose(got[b, :, 3:], pts[b, :, 3:])


def test_rotation_positive_x_to_y():
    # positive angle rotates +x toward +y (reference convention)
    pts = np.array([[[1.0, 0.0, 0.0]]], dtype=np.float32)
    out = np.asarray(G.rotate_points_along_z(pts, np.array([np.pi / 2], np.float32)))
    assert out[0, 0, 0] == pytest.approx(0.0, abs=1e-6)
    assert out[0, 0, 1] == pytest.approx(1.0, abs=1e-6)


def test_boxes_to_corners_3d():
    box = np.array([[1.0, 2.0, 3.0, 4.0, 2.0, 1.0, 0.0]], dtype=np.float32)
    corners = np.asarray(G.boxes_to_corners_3d(box))
    assert corners.shape == (1, 8, 3)
    # corner 0 per template: (+dx/2, +dy/2, -dz/2) + center
    assert np.allclose(corners[0, 0], [3.0, 3.0, 2.5], atol=1e-5)
    assert np.allclose(corners.mean(axis=1)[0], [1.0, 2.0, 3.0], atol=1e-5)


def test_boxes_to_corners_bev_matches_oracle():
    rng = np.random.RandomState(1)
    for _ in range(10):
        box = np.array(
            [rng.uniform(-5, 5), rng.uniform(-5, 5), 0.0,
             rng.uniform(1, 4), rng.uniform(1, 4), 1.0, rng.uniform(-np.pi, np.pi)],
            dtype=np.float32,
        )
        got = np.asarray(G.boxes_to_corners_bev(box[None]))[0]
        want = box_to_corners_bev(box[[0, 1, 3, 4, 6]])
        # Same set of corners (possibly different order)
        d = np.linalg.norm(got[:, None] - want[None], axis=-1)
        assert d.min(axis=1).max() < 1e-4


def test_points_in_boxes_mask_vs_oracle():
    rng = np.random.RandomState(2)
    boxes = np.zeros((5, 7), dtype=np.float32)
    boxes[:, 0:3] = rng.uniform(-5, 5, (5, 3))
    boxes[:, 3:6] = rng.uniform(1, 4, (5, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 5)
    pts = rng.uniform(-8, 8, (200, 3)).astype(np.float32)
    got = np.asarray(G.points_in_boxes_mask(pts, boxes))
    for i in range(5):
        want = points_in_box(pts, boxes[i])
        assert (got[i] == want).mean() > 0.995  # boundary-equality tolerance


def test_points_in_boxes_index_first_match():
    boxes = np.array(
        [[0, 0, 0, 2, 2, 2, 0], [0, 0, 0, 4, 4, 4, 0]], dtype=np.float32
    )
    pts = np.array([[0, 0, 0], [1.5, 0, 0], [10, 0, 0]], dtype=np.float32)
    idx = np.asarray(G.points_in_boxes_index(pts, boxes))
    assert idx.tolist() == [0, 1, -1]


def test_mask_boxes_outside_range():
    boxes = np.array(
        [[0, 0, 0, 1, 1, 1, 0], [100, 0, 0, 1, 1, 1, 0]], dtype=np.float32
    )
    mask = np.asarray(G.mask_boxes_outside_range(boxes, [-50, -50, -5, 50, 50, 5]))
    assert mask.tolist() == [True, False]


def test_get_voxel_centers():
    coords = np.array([[0, 0, 0], [1, 2, 3]], dtype=np.int32)  # zyx
    centers = np.asarray(
        G.get_voxel_centers(coords, 1, [0.1, 0.2, 0.3], [-10, -20, -3, 10, 20, 3])
    )
    assert np.allclose(centers[0], [-10 + 0.05, -20 + 0.1, -3 + 0.15], atol=1e-5)
    assert np.allclose(centers[1], [-10 + 3 * 0.1 + 0.05, -20 + 2 * 0.2 + 0.1, -3 + 1 * 0.3 + 0.15], atol=1e-5)

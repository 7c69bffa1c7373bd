"""FGR geometric proposer (reference fgr.py / fgr_utils.py)."""

import numpy as np

from findnpropagate_tpu.openvocab.fgr import (
    FGR,
    calculate_ground,
    find_key_vertex,
    min_shrink_rect,
    region_grow,
)
from test_box_classification import project_box_2d
from test_frustum_proposer import make_camera


def _box_surface_points(box, rng, n=600):
    """Points on the two CAMERA-FACING side faces of an upright box (an
    L-shape like real LiDAR returns; camera at the origin). FGR's key
    vertex is the junction of the two visible faces."""
    x, y, z, dx, dy, dz, yaw = box
    c, s = np.cos(yaw), np.sin(yaw)
    to_cam = -np.array([x, y])
    faces = []  # (normal_world, local center offset, in-face axes)
    for nx_, ny_, ax_ in (((1, 0), (0.5, 0), 0), ((-1, 0), (-0.5, 0), 0),
                          ((0, 1), (0, 0.5), 1), ((0, -1), (0, -0.5), 1)):
        nw = np.array([nx_[0] * c - nx_[1] * s, nx_[0] * s + nx_[1] * c])
        faces.append((nw @ to_cam, ny_, ax_))
    faces.sort(key=lambda f: -f[0])
    visible = faces[:2]
    pts = []
    for _ in range(n):
        _, off, ax_ = visible[rng.randint(2)]
        u = rng.uniform(-0.5, 0.5)
        w = rng.uniform(-0.5, 0.5)
        if ax_ == 0:  # x-normal face: spread along y
            local = [off[0] * dx, u * dy, w * dz]
        else:  # y-normal face: spread along x
            local = [u * dx, off[1] * dy, w * dz]
        pts.append(local)
    local = np.asarray(pts)
    return np.stack([local[:, 0] * c - local[:, 1] * s + x,
                     local[:, 0] * s + local[:, 1] * c + y,
                     local[:, 2] + z], -1)


def test_min_shrink_rect_recovers_lshape_yaw():
    rng = np.random.RandomState(0)
    yaw = 0.4
    # L-shape: two perpendicular edges of a 4 x 2 rectangle
    e1 = np.stack([np.linspace(0, 4, 60), np.zeros(60)], 1)
    e2 = np.stack([np.zeros(40), np.linspace(0, 2, 40)], 1)
    pts = np.concatenate([e1, e2]) + rng.normal(0, 0.01, (100, 2))
    c, s = np.cos(yaw), np.sin(yaw)
    pts = pts @ np.array([[c, s], [-s, c]])
    box, angle, final = min_shrink_rect(pts)
    assert abs(((angle - yaw) + np.pi / 4) % (np.pi / 2) - np.pi / 4) < 0.05
    # key vertex is the L corner (near origin)
    i1, i2, p1, p2, n1, n2 = find_key_vertex(pts, box)
    key = p2 if n1 < n2 else p1
    assert np.linalg.norm(key) < 0.3


def test_region_grow_rejects_low_origin_ratio():
    # two clusters 5m apart; origin mask covers only cluster A
    a = np.random.RandomState(1).uniform(0, 1, (50, 3))
    b = a + np.array([5.0, 0, 0])
    pc = np.concatenate([a, b])
    search = np.ones(100)
    origin = np.zeros(100)
    origin[:50] = 1
    grown = region_grow(pc, search, origin, thresh=0.5, ratio=0.8)
    assert grown[:50].sum() > 0 and grown[50:].sum() == 0
    # ratio=None: grow from the merged mask without the reject rule
    grown2 = region_grow(pc, search, np.ones(100), 6.0, ratio=None)
    assert grown2.sum() == 100


def test_calculate_ground_flags_plane():
    rng = np.random.RandomState(2)
    # permuted frame (y, z, x): axis 1 is up; ground at z=-1.8
    gy = rng.uniform(-20, 20, 400)
    gx = rng.uniform(0, 40, 400)
    ground = np.stack([gy, np.full(400, -1.8), gx], 1)
    obj = np.stack([rng.uniform(-1, 1, 100), rng.uniform(-1, 0.5, 100),
                    rng.uniform(9, 11, 100)], 1)
    pc = np.concatenate([ground, obj])
    non_ground, sample = calculate_ground(pc, 0.15,
                                          np.random.RandomState(0))
    assert non_ground[:400].sum() < 40      # ground removed
    assert non_ground[400:].sum() > 80      # object kept
    assert sample is not None


def test_fgr_recovers_box():
    l2i, _, _ = make_camera()
    rng = np.random.RandomState(3)
    box = np.array([11.0, -2.0, -0.6, 4.2, 1.9, 1.6, 1.2])
    obj = _box_surface_points(box, rng)
    gx = rng.uniform(2, 30, 800)
    gy = rng.uniform(-12, 12, 800)
    ground = np.stack([gx, gy, np.full(800, -1.6)], 1)
    pts = np.concatenate([obj, ground]).astype(np.float32)
    det = project_box_2d(box.astype(np.float64), l2i)

    prop = FGR(class_names=["car"] * 10, seed=0)
    boxes, scores, labels = prop.propose(
        pts, det[None], np.asarray([1]), np.asarray([0.9]),
        np.asarray([0]), l2i[None])
    assert len(boxes) == 1
    np.testing.assert_allclose(boxes[0, :3], box[:3], atol=0.5)
    np.testing.assert_allclose(boxes[0, 3:6], box[3:6], atol=0.4)
    # yaw within 10deg mod pi (L-shape fit)
    dyaw = abs(((boxes[0, 6] - box[6]) + np.pi / 2) % np.pi - np.pi / 2)
    assert dyaw < 0.18
    assert labels[0] == 1

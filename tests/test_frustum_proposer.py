"""Greedy Box Seeker validation on a synthetic camera rig: project known 3D
boxes to 2D detections, run the seeker, and require the proposals to land on
the true objects. Plus camera-geometry unit tests."""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from findnpropagate_tpu.openvocab.camera import (
    get_geometry_at_image_coords,
    masked_quantile,
    nms_2d,
    project_to_camera,
)
from findnpropagate_tpu.openvocab.frustum_proposer import FrustumProposerOG

CLASS_NAMES = ("car", "truck", "construction_vehicle", "bus", "trailer",
               "barrier", "motorcycle", "bicycle", "pedestrian", "traffic_cone")


def make_camera():
    """One pinhole cam at lidar origin, looking along lidar +x."""
    fx = fy = 800.0
    cx, cy = 800.0, 450.0
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    # columns = lidar dirs of camera axes (x_cam=-y_l, y_cam=-z_l, z_cam=+x_l)
    R_c2l = np.array([[0, 0, 1.0], [-1, 0, 0], [0, -1, 0]])
    t = np.zeros(3)
    cam2lidar = np.eye(4)
    cam2lidar[:3, :3] = R_c2l
    cam2lidar[:3, 3] = t
    lidar2cam = np.linalg.inv(cam2lidar)
    lidar2image = np.eye(4)
    lidar2image[:3, :3] = K @ lidar2cam[:3, :3]
    lidar2image[:3, 3] = K @ lidar2cam[:3, 3]
    intr4 = np.eye(4)
    intr4[:3, :3] = K
    return lidar2image, cam2lidar, intr4


def project_np(pts, lidar2image):
    hom = pts @ lidar2image[:3, :3].T + lidar2image[:3, 3]
    return hom[:, 0] / hom[:, 2], hom[:, 1] / hom[:, 2], hom[:, 2]


def test_masked_quantile_matches_numpy():
    rng = np.random.RandomState(0)
    v = rng.randn(100).astype(np.float32)
    m = rng.rand(100) > 0.4
    for q in (0.1, 0.336, 0.5, 0.9):
        got = float(masked_quantile(jnp.asarray(v), jnp.asarray(m), q))
        want = np.quantile(v[m].astype(np.float64), q)
        assert got == pytest.approx(want, abs=1e-4)


def test_project_lift_roundtrip():
    l2i, c2l, intr = make_camera()
    rng = np.random.RandomState(1)
    pts = np.stack([
        rng.uniform(5, 40, 50),   # x forward
        rng.uniform(-5, 5, 50),
        rng.uniform(-2, 2, 50),
    ], -1).astype(np.float32)
    coords, on_img = project_to_camera(
        jnp.asarray(pts), jnp.asarray(l2i)[None]
    )
    uvd = np.asarray(coords[0])
    lifted = np.asarray(get_geometry_at_image_coords(
        jnp.asarray(uvd),
        jnp.broadcast_to(jnp.asarray(c2l[:3, :3]), (50, 3, 3)),
        jnp.broadcast_to(jnp.asarray(c2l[:3, 3]), (50, 3)),
        jnp.broadcast_to(jnp.asarray(intr[:3, :3]), (50, 3, 3)),
    ))
    np.testing.assert_allclose(lifted, pts, atol=1e-2)


def test_nms_2d():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    labels = np.array([1, 1, 1], np.int32)
    keep = np.asarray(nms_2d(jnp.asarray(boxes), jnp.asarray(scores),
                             jnp.asarray(labels), 0.5))
    assert keep.tolist() == [True, False, True]
    # different classes never suppress each other
    labels2 = np.array([1, 2, 1], np.int32)
    keep2 = np.asarray(nms_2d(jnp.asarray(boxes), jnp.asarray(scores),
                              jnp.asarray(labels2), 0.5))
    assert keep2.tolist() == [True, True, True]


def test_seeker_recovers_objects():
    rng = np.random.RandomState(2)
    l2i, c2l, intr = make_camera()

    # three cars in front of the camera
    gt = np.array([
        [12.0, -3.0, -0.6, 4.6, 1.95, 1.7, 0.3],
        [20.0, 4.0, -0.5, 4.7, 2.0, 1.75, -0.8],
        [30.0, 0.0, -0.7, 4.5, 1.9, 1.7, 1.2],
    ], np.float32)

    # LiDAR-like SURFACE points: sample the faces visible from the sensor
    # (the seeker's depth quantiles assume surface returns, not volume fill)
    pts_list = []
    for b in gt:
        n = 400
        local = rng.uniform(-0.5, 0.5, (n, 3)) * b[3:6]
        # snap each point to one of the two sensor-facing faces
        c, s = np.cos(b[6]), np.sin(b[6])
        to_sensor_local = np.array([
            -b[0] * c - b[1] * s, b[0] * s - b[1] * c
        ])  # sensor direction in box frame
        face = rng.randint(0, 2, n)
        sx = np.sign(to_sensor_local[0]) if abs(to_sensor_local[0]) > 1e-6 else 1.0
        sy = np.sign(to_sensor_local[1]) if abs(to_sensor_local[1]) > 1e-6 else 1.0
        local[face == 0, 0] = sx * b[3] / 2
        local[face == 1, 1] = sy * b[4] / 2
        x = local[:, 0] * c - local[:, 1] * s + b[0]
        y = local[:, 0] * s + local[:, 1] * c + b[1]
        z = local[:, 2] + b[2]
        pts_list.append(np.stack([x, y, z], -1))
    ground = np.stack([
        rng.uniform(3, 45, 3000), rng.uniform(-10, 10, 3000),
        np.full(3000, -1.6),
    ], -1)
    pts = np.concatenate(pts_list + [ground]).astype(np.float32)
    P = 6000
    points = np.zeros((P, 3), np.float32)
    points[: len(pts)] = pts
    pmask = np.zeros(P, bool)
    pmask[: len(pts)] = True

    # 2D detections from projected gt corners
    from findnpropagate_tpu.utils.geometry import boxes_to_corners_3d

    corners = np.asarray(boxes_to_corners_3d(jnp.asarray(gt)))
    D = 8
    det_boxes = np.zeros((D, 4), np.float32)
    det_labels = np.zeros(D, np.int32)
    det_scores = np.zeros(D, np.float32)
    det_cams = np.zeros(D, np.int32)
    det_mask = np.zeros(D, bool)
    for i in range(3):
        u, v, d = project_np(corners[i], l2i)
        det_boxes[i] = [u.min(), v.min(), u.max(), v.max()]
        det_labels[i] = 1  # car
        det_scores[i] = 0.9
        det_mask[i] = True

    seeker = FrustumProposerOG(class_names=CLASS_NAMES)
    out = seeker.propose(
        jnp.asarray(points), jnp.asarray(pmask),
        jnp.asarray(det_boxes), jnp.asarray(det_labels),
        jnp.asarray(det_scores), jnp.asarray(det_cams), jnp.asarray(det_mask),
        jnp.asarray(l2i, jnp.float32)[None],
        jnp.asarray(c2l, jnp.float32)[None],
        jnp.asarray(intr, jnp.float32)[None],
    )
    boxes = np.asarray(out.boxes)
    valid = np.asarray(out.valid)
    assert valid[:3].all(), "all three detections should yield proposals"
    assert not valid[3:].any(), "padded detections must stay invalid"
    for i in range(3):
        # depth along the viewing ray is quantile-estimated (loose by design);
        # lateral placement is pinned by the frustum
        d = np.linalg.norm(boxes[i, :2] - gt[i, :2])
        assert d < 3.5, f"proposal {i} center {boxes[i,:3]} far from gt {gt[i,:3]} (d={d:.2f})"
        ray = gt[i, :2] / np.linalg.norm(gt[i, :2])
        lateral = abs(np.cross(np.append(ray, 0), np.append(boxes[i, :2] - gt[i, :2], 0))[2])
        assert lateral < 1.6, f"lateral error {lateral:.2f} too large for proposal {i}"
        assert abs(boxes[i, 2] - gt[i, 2]) < 1.5

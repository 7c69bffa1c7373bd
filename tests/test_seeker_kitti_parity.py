"""KITTI seeker parity harness: an INDEPENDENT loop-based numpy oracle that
hand-executes the reference's KITTI Greedy Box Seeker math step by step
(frustum_proposals_v1_kitti.py:290-691 under /root/reference — KITTI calib
projection, quantile depths, frustum lift, anchor/mag placement, softmin
front-centering, back-projected IoU with [900,1600] clamping, distance
ranking, sum-normalized density, the KITTI additive score
dns_w + dens + iou_w*iou + dst_w*dist, axis-aligned NMS, top-1) and requires
the repo's vmapped program to select the SAME proposals."""

import numpy as np

import jax.numpy as jnp

from findnpropagate_tpu.openvocab.frustum_proposer_kitti import (
    KITTI_ANCHORS,
    FrustumProposerOGKITTI,
)
from test_seeker_parity import aa_nms_np, corners_np


import pytest

pytestmark = pytest.mark.slow

def make_kitti_calib():
    """Standard KITTI-style calib: x_cam = -y_l, y_cam = -z_l, z_cam = x_l,
    with a small stereo-baseline P2[0,3] term and a near-identity R0."""
    P2 = np.array([[721.5, 0.0, 609.6, 44.85],
                   [0.0, 721.5, 172.8, 0.216],
                   [0.0, 0.0, 1.0, 0.0027]], np.float64)
    th = 0.004
    R0 = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0],
                   [0, 0, 1]], np.float64)
    V2C = np.array([[0.0, -1.0, 0.0, -0.002],
                    [0.0, 0.0, -1.0, -0.075],
                    [1.0, 0.0, 0.0, -0.272]], np.float64)
    return P2, R0, V2C


def lidar_to_img_np(pts, P2, R0, V2C):
    """Calibration.lidar_to_img (calibration_kitti.py:72-98) in float64."""
    hom = np.hstack([pts, np.ones((len(pts), 1))])
    rect = hom @ V2C.T @ R0.T
    rhom = np.hstack([rect, np.ones((len(rect), 1))])
    proj = rhom @ P2.T
    uv = proj[:, :2] / rect[:, 2:3]
    depth = proj[:, 2] - P2[2, 3]
    return uv, depth


def img_to_lidar_np(uvd, P2, R0, V2C):
    cu, cv, fu, fv = P2[0, 2], P2[1, 2], P2[0, 0], P2[1, 1]
    tx, ty = P2[0, 3] / (-fu), P2[1, 3] / (-fv)
    x = (uvd[:, 0] - cu) * uvd[:, 2] / fu + tx
    y = (uvd[:, 1] - cv) * uvd[:, 2] / fv + ty
    rect = np.stack([x, y, uvd[:, 2]], 1)
    R0e = np.eye(4)
    R0e[:3, :3] = R0
    V2Ce = np.eye(4)
    V2Ce[:3, :4] = V2C
    rhom = np.hstack([rect, np.ones((len(rect), 1))])
    return (rhom @ np.linalg.inv((R0e @ V2Ce).T))[:, :3]


def kitti_seeker_oracle(cfg: FrustumProposerOGKITTI, points, det_box,
                        det_label, P2, R0, V2C):
    """One detection. Mirrors the reference KITTI control flow with loops."""
    h_img, w_img = cfg.image_size
    uv, depth = lidar_to_img_np(points, P2, R0, V2C)
    x1, y1, x2, y2 = det_box
    on_box = (uv[:, 1] < y2) & (uv[:, 1] >= y1) \
        & (uv[:, 0] < x2) & (uv[:, 0] >= x1)
    if on_box.sum() == 0:
        return None
    d = depth[on_box]
    q_lo = np.quantile(d, cfg.lq)
    if cfg.search_depth is None:
        q_hi = np.quantile(d, cfg.uq)
    else:
        q_hi = q_lo + cfg.search_depth
    fmax = min(q_hi, cfg.max_dist)
    fmin = max(q_lo, cfg.frustum_min)
    cz = np.quantile(d, cfg.cq)

    centre_xyz = img_to_lidar_np(
        np.array([[(x1 + x2) / 2, (y1 + y2) / 2, cz]]), P2, R0, V2C)[0]

    corners_img = np.array([
        [x2, y2, fmin], [x2, y1, fmin], [x1, y1, fmin], [x1, y2, fmin],
        [x2, y2, fmax], [x2, y1, fmax], [x1, y1, fmax], [x1, y2, fmax],
    ])
    frust = img_to_lidar_np(corners_img, P2, R0, V2C)
    if cfg.clamp_bottom > 0:
        bp = points[on_box]
        for dim in range(3):
            f1 = max(bp[:, dim].min(), frust[:, dim].min())
            f2 = min(bp[:, dim].max(), frust[:, dim].max())
            frust[:, dim] = np.clip(frust[:, dim], f1, f2)
    bev = np.stack([(frust[2 * i] + frust[2 * i + 1]) / 2 for i in range(4)])
    close = bev[:2].mean(axis=0)
    far = bev[2:].mean(axis=0)
    cvec = far - close
    if cfg.search_depth is not None:
        cvec = cvec / np.linalg.norm(cvec) * cfg.search_depth
    mags = np.linspace(0.0, 1.0, cfg.num_mags)
    centers = close[None] + cvec[None] * mags[:, None]

    anchors = np.asarray(cfg.anchors)[det_label - 1]
    sizes = np.linspace(cfg.size_min, cfg.size_max, cfg.num_sizes)
    rots = np.linspace(cfg.ry_min, cfg.ry_max, cfg.num_rotations)
    props = []
    for m in centers:
        for r in rots:
            for s in sizes:
                props.append([m[0], m[1], m[2], anchors[0] * s,
                              anchors[1] * s, anchors[2] * s, r])
    props = np.asarray(props)
    cor = corners_np(props)

    dists = np.linalg.norm(cor, axis=2)
    z = -dists - (-dists).max(axis=1, keepdims=True)
    rank = np.exp(z)
    rank = rank / rank.sum(axis=1, keepdims=True)
    wfc = (rank[..., None] * cor).sum(axis=1)
    shift = props[:, :3] - wfc
    props[:, :3] += shift
    cor = cor + shift[:, None]

    valid = np.linalg.norm(wfc, axis=-1) < cfg.max_dist

    uu, _ = lidar_to_img_np(cor.reshape(-1, 3), P2, R0, V2C)
    uu = uu.reshape(-1, 8, 2)
    px = np.clip(uu[..., 0], 0, w_img)
    py = np.clip(uu[..., 1], 0, h_img)
    px1, py1, px2, py2 = px.min(1), py.min(1), px.max(1), py.max(1)
    ix1 = np.maximum(px1, x1)
    iy1 = np.maximum(py1, y1)
    ix2 = np.minimum(px2, x2)
    iy2 = np.minimum(py2, y2)
    inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
    union = (px2 - px1) * (py2 - py1) + (x2 - x1) * (y2 - y1) - inter
    ious = inter / np.maximum(union, 1e-9)

    dd = np.linalg.norm(wfc - centre_xyz[None], axis=-1)
    dmin, dmax = dd[valid].min(), dd[valid].max()
    dranked = 1 - (dd - dmin) / (dmax - dmin + 1e-8)

    valid = valid & (ious > cfg.min_cam_iou)
    if valid.sum() == 0:
        return None

    pts_box = points[on_box]
    counts = np.zeros(len(props))
    for i in range(len(props)):
        c_, s_ = np.cos(-props[i, 6]), np.sin(-props[i, 6])
        sh = pts_box - props[i, :3]
        lx = sh[:, 0] * c_ - sh[:, 1] * s_
        ly = sh[:, 0] * s_ + sh[:, 1] * c_
        inside = (np.abs(lx) <= props[i, 3] / 2) \
            & (np.abs(ly) <= props[i, 4] / 2) \
            & (np.abs(sh[:, 2]) <= props[i, 5] / 2)
        counts[i] = inside.sum()
    dens = counts / (counts[valid].sum() + 1e-8)  # SUM-normalized (:652)

    score = cfg.dns_w + dens + cfg.iou_w * ious + cfg.dst_w * dranked
    score = np.where(valid, score, -1e9)

    keep = aa_nms_np(props, score, cfg.nms_normal)
    keep = [k for k in keep if valid[k]]
    if not keep:
        return None
    best = keep[0]
    return props[best], score[best], props, score


def make_scene(rng, objs):
    """Points: road clutter in front of the car + dense per-object clusters."""
    pts = [np.stack([rng.uniform(4, 60, 800), rng.uniform(-15, 15, 800),
                     rng.uniform(-1.6, -1.2, 800)], -1)]
    for box, _ in objs:
        local = rng.uniform(-0.5, 0.5, (400, 3)) * box[3:6]
        c, s = np.cos(box[6]), np.sin(box[6])
        rot = np.stack([local[:, 0] * c - local[:, 1] * s,
                        local[:, 0] * s + local[:, 1] * c,
                        local[:, 2]], -1)
        pts.append(rot + box[:3])
    return np.concatenate(pts).astype(np.float64)


def project_box_to_det(box, P2, R0, V2C):
    cor = corners_np(box[None])[0]
    uv, _ = lidar_to_img_np(cor, P2, R0, V2C)
    return np.array([uv[:, 0].min(), uv[:, 1].min(),
                     uv[:, 0].max(), uv[:, 1].max()])


def run_repo_seeker(cfg, points, dets, P2, R0, V2C):
    d = len(dets)
    det_boxes = np.stack([db for db, _ in dets]).astype(np.float32)
    det_labels = np.asarray([lb for _, lb in dets], np.int32)
    return cfg.propose(
        jnp.asarray(points, jnp.float32),
        jnp.ones(len(points), bool),
        jnp.asarray(det_boxes),
        jnp.asarray(det_labels),
        jnp.ones(d, jnp.float32) * 0.9,
        jnp.ones(d, bool),
        jnp.asarray(P2, jnp.float32), jnp.asarray(R0, jnp.float32),
        jnp.asarray(V2C, jnp.float32),
    )


def check_parity(cfg, objs, seed=11):
    P2, R0, V2C = make_kitti_calib()
    rng = np.random.RandomState(seed)
    points = make_scene(rng, objs)
    dets = [(project_box_to_det(box, P2, R0, V2C), lb) for box, lb in objs]

    want = [kitti_seeker_oracle(cfg, points, db, lb, P2, R0, V2C)
            for db, lb in dets]
    out = run_repo_seeker(cfg, points, dets, P2, R0, V2C)
    got_boxes = np.asarray(out.boxes)
    got_valid = np.asarray(out.valid)

    for i, w in enumerate(want):
        assert w is not None
        assert got_valid[i], f"det {i} invalid in repo seeker"
        wb, ws, all_props, all_scores = w
        assert abs(float(out.oracle[i]) - ws) < 2e-3, \
            f"det {i}: repo oracle {float(out.oracle[i])} vs best {ws}"
        # the repo's pick must BE an oracle proposal slot (nearest-slot
        # distance ~0) whose oracle score ties the oracle's best — exact
        # argmax ties between depth-magnitude slots may break differently
        # in f32 vs f64, which the reference itself doesn't pin down
        d = np.linalg.norm(all_props - got_boxes[i, :7][None], axis=1)
        j = int(np.argmin(d))
        assert d[j] < 5e-3, \
            f"det {i}: repo box {got_boxes[i, :7]} not an oracle slot " \
            f"(nearest {all_props[j]}, dist {d[j]})"
        assert all_scores[j] > ws - 2e-3, \
            f"det {i}: repo picked slot with oracle score {all_scores[j]} " \
            f"vs best {ws}"


def test_kitti_seeker_matches_loop_oracle():
    cfg = FrustumProposerOGKITTI()
    objs = [
        # car heading along x (label 1 = Car)
        (np.array([18.0, 3.0, -0.8, 3.9, 1.6, 1.56, 0.25]), 1),
        # pedestrian (label 7)
        (np.array([11.0, -3.5, -0.6, 0.8, 0.6, 1.73, 0.0]), 7),
    ]
    check_parity(cfg, objs)


def test_kitti_seeker_search_depth_and_clamp():
    cfg = FrustumProposerOGKITTI(search_depth=8.0, clamp_bottom=1.0)
    objs = [(np.array([22.0, -1.0, -0.7, 3.9, 1.6, 1.56, 1.1]), 1)]
    check_parity(cfg, objs, seed=5)


def test_kitti_seeker_from_config_and_empty_det():
    cfg = FrustumProposerOGKITTI.from_config(
        {"PARAMS": {"nms_2d": 0.6, "max_dist": 60, "topk": 2, "nms_3d": 0}},
        class_names=("Car", "Pedestrian"),
    )
    assert cfg.nms_2d_thresh == 0.6 and cfg.max_dist == 60 and cfg.topk == 2
    assert len(cfg.anchors) == 7  # anchor table independent of class list

    P2, R0, V2C = make_kitti_calib()
    # a detection box with NO points behind it -> invalid slot
    points = np.array([[30.0, 0.0, -1.0]])
    out = cfg.propose(
        jnp.asarray(points, jnp.float32), jnp.ones(1, bool),
        jnp.asarray([[10.0, 10.0, 40.0, 40.0]], jnp.float32),
        jnp.asarray([1], jnp.int32), jnp.asarray([0.9], jnp.float32),
        jnp.ones(1, bool),
        jnp.asarray(P2, jnp.float32), jnp.asarray(R0, jnp.float32),
        jnp.asarray(V2C, jnp.float32),
    )
    assert not np.asarray(out.valid).any()

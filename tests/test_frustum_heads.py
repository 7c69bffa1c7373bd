"""Frustum query heads: FrustumViTHead / FrustumPointNetHead and the
Frustum PointNets v1 networks (reference frustum_vit_head.py,
frustum_pointnet_v1.py, frustum_pointnets_v1.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from findnpropagate_tpu.models.dense_heads.frustum_heads import (
    FrustumPointNetHead,
    FrustumViTHead,
    build_frustum_queries,
    make_frustum_head_tools,
)
from findnpropagate_tpu.models.frustum_pointnets import (
    FrustumPointNetv1,
    decode_heading,
    decode_size,
    encode_heading,
    frustum_pointnet_loss,
)
from test_box_classification import BOXES3D, project_box_2d
from test_frustum_proposer import make_camera

HEAD_CFG = {
    "NUM_CLASSES": 10,
    "HIDDEN_CHANNEL": 32,
    "NUM_HEADING_BIN": 12,
    "TARGET_ASSIGNER_CONFIG": {
        "HUNGARIAN_ASSIGNER": {
            "cls_cost": {"gamma": 2.0, "alpha": 0.25, "weight": 0.15},
            "reg_cost": {"weight": 0.25},
            "iou_cost": {"weight": 0.25},
        },
    },
    "LOSS_CONFIG": {
        "LOSS_CLS": {"use_sigmoid": True, "gamma": 2.0, "alpha": 0.25},
        "LOSS_WEIGHTS": {
            "cls_weight": 1.0,
            "bbox_weight": 0.25,
            "code_weights": [1.0] * 8,
        },
    },
    "POST_PROCESSING": {
        "SCORE_THRESH": 0.0,
        "POST_CENTER_RANGE": [-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
    },
}


def _scene():
    l2i, _, _ = make_camera()
    rng = np.random.RandomState(0)
    boxes, dets, labels = [], [], []
    for bi in range(2):
        box = BOXES3D[bi]
        local = rng.uniform(-0.45, 0.45, (250, 3)) * box[3:6]
        c, s = np.cos(box[6]), np.sin(box[6])
        pts = np.stack([local[:, 0] * c - local[:, 1] * s + box[0],
                        local[:, 0] * s + local[:, 1] * c + box[1],
                        local[:, 2] + box[2]], -1)
        boxes.append(pts)
        dets.append(project_box_2d(box.astype(np.float64), l2i))
        labels.append(bi + 1)
    points = np.concatenate(boxes).astype(np.float32)
    return l2i, points, np.stack(dets), np.asarray(labels)


def test_build_frustum_queries():
    l2i, points, dets, labels = _scene()
    q = build_frustum_queries(points, dets, labels, np.asarray([0.9, 0.8]),
                              np.asarray([0, 0]), l2i[None],
                              num_proposals=8, max_points=64)
    assert q["query_valid"].sum() == 2
    # median-centred (median over ALL box points, THEN subsampled — so the
    # stored subset's median is only approximately 0)
    for i in range(2):
        pts_i = q["query_pts"][i][q["query_pt_valid"][i]]
        np.testing.assert_allclose(np.median(pts_i, axis=0), 0, atol=0.5)
        np.testing.assert_allclose(q["query_pos"][i][:2],
                                   BOXES3D[i][:2], atol=0.5)
    assert q["query_labels"][:2].tolist() == [0, 1]


def test_heading_encode_decode_roundtrip():
    angles = jnp.asarray([0.0, 0.3, 1.9, -2.5, 3.1, 6.0])
    cls, res = encode_heading(angles, 12)
    rec = cls * (2 * jnp.pi / 12) + res
    np.testing.assert_allclose(np.mod(np.asarray(rec), 2 * np.pi),
                               np.mod(np.asarray(angles), 2 * np.pi),
                               atol=1e-5)
    assert (np.abs(np.asarray(res)) <= np.pi / 12 + 1e-5).all()


@pytest.mark.slow
def test_fpointnet_loss_decreases():
    """FrustumPointNetv1 + FrustumPointNetLoss on one synthetic frustum:
    seg/center/heading/size losses all decrease under adam."""
    rng = np.random.RandomState(1)
    n = 128
    fg = rng.uniform(-1, 1, (n // 2, 3)) * [2.0, 0.9, 0.7] + [10, 0, 0]
    bg = rng.uniform(-4, 4, (n // 2, 3)) + [14, 0, 0]
    pts = jnp.asarray(np.concatenate([fg, bg])[None], jnp.float32)
    valid = jnp.ones((1, n), bool)
    seg = jnp.asarray(
        np.concatenate([np.ones(n // 2), np.zeros(n // 2)])[None],
        jnp.int32)
    anchors = ((4.0, 1.8, 1.4),)
    targets = {
        "seg": seg,
        "center": jnp.asarray([[10.0, 0.0, 0.0]]),
        "heading": jnp.asarray([0.4]),
        "size_cls": jnp.asarray([0]),
        "size": jnp.asarray([[4.0, 1.8, 1.4]]),
        "point_valid": valid,
    }
    net = FrustumPointNetv1(n_classes=3, size_anchors=anchors)
    one_hot = jax.nn.one_hot(jnp.asarray([0]), 3)
    params = net.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)},
                      pts, one_hot, valid, True)

    def loss_fn(p, rng_key):
        out, _ = net.apply(
            p, pts, one_hot, valid, True,
            rngs={"dropout": rng_key}, mutable=["batch_stats"])
        total, parts = frustum_pointnet_loss(out, targets, anchors)
        return total, parts

    opt = optax.adam(3e-3)
    state = opt.init(params)
    key = jax.random.PRNGKey(2)

    @jax.jit
    def step(p, s, k):
        (total, parts), g = jax.value_and_grad(
            loss_fn, has_aux=True)(p, k)
        up, s = opt.update(g, s)
        return optax.apply_updates(p, up), s, total, parts

    first = None
    for i in range(60):
        key, sub = jax.random.split(key)
        params, state, total, parts = step(params, state, sub)
        if first is None:
            first = float(total)
    assert float(total) < 0.5 * first
    assert float(parts["seg_loss"]) < 0.5
    # decode heads stay finite
    out, _ = net.apply(params, pts, one_hot, valid, False,
                       mutable=["batch_stats"])
    h = decode_heading(out["heading_scores"], out["heading_res"])
    d = decode_size(out["size_scores"], out["size_res"],
                    jnp.asarray(anchors))
    assert np.isfinite(np.asarray(h)).all()
    assert np.isfinite(np.asarray(d)).all()


@pytest.mark.slow
def test_vit_head_e2e_loss_decreases():
    l2i, points, dets, labels = _scene()
    q = build_frustum_queries(points, dets, labels, np.asarray([0.9, 0.8]),
                              np.asarray([0, 0]), l2i[None],
                              num_proposals=8, max_points=64)
    batch = {k: jnp.asarray(v)[None] for k, v in q.items()}
    gt = np.zeros((1, 4, 8), np.float32)
    gt[0, 0, :7] = BOXES3D[0]
    gt[0, 0, 7] = 1
    gt[0, 1, :7] = BOXES3D[1]
    gt[0, 1, 7] = 2
    batch["gt_boxes"] = jnp.asarray(gt)

    head = FrustumViTHead(model_cfg=HEAD_CFG, num_class=10)
    tools = make_frustum_head_tools(HEAD_CFG, 10,
                                    class_names=["car", "truck"])
    params = head.init(jax.random.PRNGKey(0), dict(batch), True)

    def loss_fn(p):
        out = head.apply(p, dict(batch), True)
        return tools.compute_loss(out)

    opt = optax.adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        (total, tb), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        up, s = opt.update(g, s)
        return optax.apply_updates(p, up), s, total

    first = None
    for _ in range(40):
        params, state, total = step(params, state)
        if first is None:
            first = float(total)
    assert float(total) < first

    # decode produces 1-indexed labels from the detector's classes
    out = head.apply(params, dict(batch), False)
    det = tools.get_bboxes(out["transfusion_preds"], max_det=8)
    assert int(det.count[0]) >= 1
    assert np.isfinite(np.asarray(det.boxes)).all()


@pytest.mark.slow
def test_pointnet_head_forward_and_loss():
    l2i, points, dets, labels = _scene()
    q = build_frustum_queries(points, dets, labels, np.asarray([0.9, 0.8]),
                              np.asarray([0, 0]), l2i[None],
                              num_proposals=4, max_points=64)
    batch = {k: jnp.asarray(v)[None] for k, v in q.items()}
    gt = np.zeros((1, 4, 8), np.float32)
    gt[0, 0, :7] = BOXES3D[0]
    gt[0, 0, 7] = 1
    batch["gt_boxes"] = jnp.asarray(gt)

    cfg = dict(HEAD_CFG)
    head = FrustumPointNetHead(model_cfg=cfg, num_class=10)
    tools = make_frustum_head_tools(cfg, 10)
    params = head.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)},
                       dict(batch), False)
    out = head.apply(params, dict(batch), False,
                     mutable=["batch_stats"])[0]
    res = out["transfusion_preds"]
    boxes = tools.decode_boxes(res)
    assert boxes.shape == (1, 4, 7)
    assert np.isfinite(np.asarray(boxes)).all()
    total, tb = tools.compute_loss(out)
    assert np.isfinite(float(total))

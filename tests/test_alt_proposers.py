"""Ablation proposers (GTProposals oracle, cluster-based FrustumProposer)
and the MaskCLIP relabel variant (stubbed dense encoder)."""

import numpy as np
import pytest

import jax.numpy as jnp

from findnpropagate_tpu.openvocab.alt_proposers import (
    FrustumClusterProposer,
    gt_proposals,
)
from test_box_classification import BOXES3D, project_box_2d
from test_frustum_proposer import make_camera


def test_gt_proposals_oracle():
    gt = np.zeros((5, 8), np.float32)
    gt[0] = [5, 0, 0, 4, 2, 1.5, 0.1, 3]
    gt[1] = [8, 1, 0, 1, 1, 1.7, 0.0, 9]
    # rows 2-4 padding (label 0)
    boxes, scores, labels = gt_proposals(gt)
    assert len(boxes) == 2
    assert labels.tolist() == [3, 9]
    assert (scores == 1.0).all()


def test_cluster_proposer_finds_object():
    l2i, _, _ = make_camera()
    rng = np.random.RandomState(0)
    box = BOXES3D[0]
    local = rng.uniform(-0.4, 0.4, (300, 3)) * box[3:6]
    c, s = np.cos(box[6]), np.sin(box[6])
    pts = np.stack([local[:, 0] * c - local[:, 1] * s + box[0],
                    local[:, 0] * s + local[:, 1] * c + box[1],
                    local[:, 2] + box[2]], -1).astype(np.float32)
    bg = rng.uniform(-30, 30, (200, 3)).astype(np.float32)
    points = np.concatenate([pts, bg])
    det = project_box_2d(box.astype(np.float64), l2i)

    prop = FrustumClusterProposer(class_names=["car"] * 10, topk=1)
    boxes, scores, labels = prop.propose(
        points, det[None], np.asarray([1]), np.asarray([0.9]),
        np.asarray([0]), l2i[None])
    assert len(boxes) == 1
    np.testing.assert_allclose(boxes[0, :2], box[:2], atol=1.0)
    assert labels[0] == 1


class _StubMaskCLIP:
    """pixel_probs stub: class 1 probability painted where the red channel
    is lit, class 2 where blue."""

    def pixel_probs(self, images):
        r = images[..., 0]
        b = images[..., 2]
        other = 1.0 - jnp.clip(r + b, 0, 1)
        return jnp.stack([r, b, other], -1)


def test_maskclip_relabel_with_stub():
    from findnpropagate_tpu.openvocab.box_classification import (
        CLIPBoxClassificationMaskCLIP,
    )

    l2i, _, _ = make_camera()
    h, w = 900, 1600
    images = np.zeros((1, h, w, 3), np.float32)
    b0 = project_box_2d(BOXES3D[0].astype(np.float64), l2i).astype(int)
    b1 = project_box_2d(BOXES3D[1].astype(np.float64), l2i).astype(int)
    images[0, b0[1]:b0[3], b0[0]:b0[2], 0] = 1.0
    images[0, b1[1]:b1[3], b1[0]:b1[2], 2] = 1.0

    rel = CLIPBoxClassificationMaskCLIP(
        class_names=["red_thing", "blue_thing", "bg"],
        maskclip=_StubMaskCLIP())
    labels, scores = rel.relabel(
        jnp.asarray(BOXES3D), jnp.asarray(l2i, jnp.float32)[None],
        jnp.asarray(images))
    assert np.asarray(labels).tolist() == [1, 2]
    assert (np.asarray(scores) > 0.5).all()


def test_build_relabeler_dispatch():
    from findnpropagate_tpu.openvocab.self_training import build_relabeler

    assert build_relabeler({"CLIP_UNK_RELABEL": False}, ["a"]) is None
    r = build_relabeler({"CLIP_UNK_RELABEL": True, "CLIP_TYPE": "GLIP"},
                        ["a", "b"])
    assert r is not None
    # GLIP mode with no cached detector: labels pass through unchanged
    l, s = r(np.zeros((2, 7), np.float32), {}, 0,
             np.asarray([1, 2]), np.asarray([0.5, 0.6]))
    assert list(l) == [1, 2]


def test_frustum_dbscan_minmax_box():
    """FrustumDBSCAN: the object cluster yields an axis-aligned min/max
    box around the points; combine_clusters merges all non-noise."""
    from findnpropagate_tpu.openvocab.alt_proposers import FrustumDBSCAN

    l2i, _, _ = make_camera()
    rng = np.random.RandomState(1)
    box = BOXES3D[0]
    local = rng.uniform(-0.45, 0.45, (250, 3)) * box[3:6]
    c, s = np.cos(box[6]), np.sin(box[6])
    pts = np.stack([local[:, 0] * c - local[:, 1] * s + box[0],
                    local[:, 0] * s + local[:, 1] * c + box[1],
                    local[:, 2] + box[2]], -1).astype(np.float32)
    det = project_box_2d(box.astype(np.float64), l2i)

    prop = FrustumDBSCAN(class_names=["car"] * 10, combine_clusters=True)
    boxes, scores, labels = prop.propose(
        pts, det[None], np.asarray([2]), np.asarray([0.8]),
        np.asarray([0]), l2i[None])
    assert len(boxes) == 1
    np.testing.assert_allclose(boxes[0, :3], box[:3], atol=0.6)
    assert labels[0] == 2 and scores[0] == np.float32(0.8)
    # min/max fit: dims bounded by the rotated extent
    assert (boxes[0, 3:6] <= np.linalg.norm(box[3:5]) + 0.5).all()

    # cluster_together pools frustums and majority-votes labels
    prop2 = FrustumDBSCAN(class_names=["car"] * 10, cluster_together=True)
    boxes2, _, labels2 = prop2.propose(
        pts, np.stack([det, det]), np.asarray([2, 2]),
        np.asarray([0.8, 0.7]), np.asarray([0, 0]), l2i[None])
    assert len(boxes2) >= 1 and labels2[0] == 2


def test_pca_bbox_recovers_oriented_box():
    """compute_pca_bbox: yaw from the principal axis, min/max extents."""
    from findnpropagate_tpu.openvocab.alt_proposers import compute_pca_bbox

    rng = np.random.RandomState(3)
    yaw_true = 0.6
    local = rng.uniform(-0.5, 0.5, (500, 3)) * np.array([4.0, 1.8, 1.5])
    c, s = np.cos(yaw_true), np.sin(yaw_true)
    pts = np.stack([local[:, 0] * c - local[:, 1] * s + 10.0,
                    local[:, 0] * s + local[:, 1] * c - 3.0,
                    local[:, 2] + 0.5], -1)
    xc, yc, zc, l, w, h, yaw = compute_pca_bbox(pts)
    np.testing.assert_allclose([xc, yc, zc], [10.0, -3.0, 0.5], atol=0.15)
    # principal axis is the long axis (mod pi)
    assert abs(((yaw - yaw_true) + np.pi / 2) % np.pi - np.pi / 2) < 0.12
    assert l > w and abs(l - 4.0) < 0.5 and abs(h - 1.5) < 0.2


def test_ov3ddet_proposer():
    from findnpropagate_tpu.openvocab.alt_proposers import FrustumOV3DET

    l2i, _, _ = make_camera()
    rng = np.random.RandomState(5)
    box = BOXES3D[0]
    local = rng.uniform(-0.45, 0.45, (400, 3)) * box[3:6]
    c, s = np.cos(box[6]), np.sin(box[6])
    pts = np.stack([local[:, 0] * c - local[:, 1] * s + box[0],
                    local[:, 0] * s + local[:, 1] * c + box[1],
                    local[:, 2] + box[2]], -1).astype(np.float32)
    det = project_box_2d(box.astype(np.float64), l2i)
    prop = FrustumOV3DET(class_names=["car"] * 10, min_points=50)
    boxes, scores, labels = prop.propose(
        pts, det[None], np.asarray([1]), np.asarray([0.9]),
        np.asarray([0]), l2i[None])
    assert len(boxes) == 1
    np.testing.assert_allclose(boxes[0, :3], box[:3], atol=0.5)


def test_clip2scene_proposer_per_class_clusters():
    from findnpropagate_tpu.openvocab.alt_proposers import (
        Clip2SceneProposer,
    )

    rng = np.random.RandomState(7)
    # two objects: a car cluster and a pedestrian cluster + road bg
    car = rng.uniform(-0.5, 0.5, (200, 3)) * [4, 2, 1.5] + [10, 0, 0]
    ped = rng.uniform(-0.5, 0.5, (80, 3)) * [0.6, 0.6, 1.7] + [5, 6, 0]
    road = rng.uniform(-20, 20, (300, 3)) * [1, 1, 0.01]
    points = np.concatenate([car, ped, road]).astype(np.float32)
    # seg labels: car=4, pedestrian=7, driveable_surface=11 in CLIP2Scene
    seg = np.concatenate([np.full(200, 4), np.full(80, 7),
                          np.full(300, 11)])
    class_names = ["car", "truck", "construction_vehicle", "bus",
                   "trailer", "barrier", "motorcycle", "bicycle",
                   "pedestrian", "traffic_cone"]
    prop = Clip2SceneProposer(class_names, eps=0.6, min_samples=10)
    boxes, scores, labels = prop.propose(points, seg)
    assert len(boxes) == 2
    got = {int(l): b for l, b in zip(labels, boxes)}
    assert set(got) == {1, 9}  # car=1, pedestrian=9 in det space
    np.testing.assert_allclose(got[1][:2], [10, 0], atol=0.5)
    np.testing.assert_allclose(got[9][:2], [5, 6], atol=0.5)


def test_base_frustum_proposer_svd_line():
    """FrustumProposerBase (the registered base FrustumProposer): pooled
    clustering + SVD-direction line search recovers a well-populated box;
    flat ground sheets are rejected by the bg_thr singular-value gate."""
    from findnpropagate_tpu.openvocab.alt_proposers import (
        FrustumProposerBase,
    )

    l2i, _, _ = make_camera()
    rng = np.random.RandomState(7)
    box = BOXES3D[0]
    local = rng.uniform(-0.5, 0.5, (400, 3)) * box[3:6]
    c, s = np.cos(box[6]), np.sin(box[6])
    pts = np.stack([local[:, 0] * c - local[:, 1] * s + box[0],
                    local[:, 0] * s + local[:, 1] * c + box[1],
                    local[:, 2] + box[2]], -1).astype(np.float32)
    det = project_box_2d(box.astype(np.float64), l2i)

    prop = FrustumProposerBase(class_names=["car"] * 10, topk=1,
                               min_cam_iou=0.05, bg_thr=0.2)
    boxes, scores, labels = prop.propose(
        pts, det[None], np.asarray([1]), np.asarray([0.9]),
        np.asarray([0]), l2i[None])
    assert len(boxes) >= 1
    best = boxes[np.argmin(np.linalg.norm(boxes[:, :2] - box[:2], axis=1))]
    np.testing.assert_allclose(best[:2], box[:2], atol=1.5)
    # anchor dims ride along
    np.testing.assert_allclose(best[3:6], prop.anchors[0], atol=1e-5)
    assert (labels == 1).all()
    # emitted score is the camera score
    assert np.allclose(scores, 0.9)

    # a flat z=const sheet is background: smallest singular value ~ 0
    sheet = np.concatenate(
        [pts[:, :2] + rng.uniform(-2, 2, (len(pts), 2)),
         np.full((len(pts), 1), box[2] - box[5] / 2)], 1).astype(np.float32)
    b2, _, _ = prop.propose(
        sheet, det[None], np.asarray([1]), np.asarray([0.9]),
        np.asarray([0]), l2i[None])
    assert len(b2) == 0


def test_alt_proposer_registry_names():
    """Registry exposes the reference's registered proposer NAMEs
    (pcdet/models/dense_heads/__init__.py:38-67)."""
    from findnpropagate_tpu.openvocab.alt_proposers import (
        ALT_PROPOSER_REGISTRY,
    )

    for name in ("FrustumProposer", "FrustumClusterProposer",
                 "FrustumDBSCAN", "FrustumOV3DET", "CLIP2SceneProposer",
                 "CLIP2SceneCCProposer", "GTProposals"):
        assert name in ALT_PROPOSER_REGISTRY
    cc = ALT_PROPOSER_REGISTRY["CLIP2SceneCCProposer"](["car"])
    assert cc.cluster_together

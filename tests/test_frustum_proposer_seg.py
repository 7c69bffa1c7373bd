"""FrustumProposerSEG: PointNet instance-seg foreground filter over the
Greedy Box Seeker (reference frustum_proposals_seg.py:52-742)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from findnpropagate_tpu.openvocab.frustum_proposer import FrustumProposerOG
from findnpropagate_tpu.openvocab.frustum_proposer_seg import (
    LABEL_TO_HIERARCHY,
    FrustumProposerSEG,
)
from test_frustum_proposer import make_camera, project_np

CLASS_NAMES = ("car", "truck", "construction_vehicle", "bus", "trailer",
               "barrier", "motorcycle", "bicycle", "pedestrian",
               "traffic_cone")


def _one_box_scene(rng):
    l2i, c2l, intr = make_camera()
    gt = np.array([12.0, -2.0, -0.6, 4.5, 1.9, 1.7, 0.4], np.float32)
    local = rng.uniform(-0.5, 0.5, (300, 3)) * gt[3:6]
    c, s = np.cos(gt[6]), np.sin(gt[6])
    obj = np.stack([local[:, 0] * c - local[:, 1] * s + gt[0],
                    local[:, 0] * s + local[:, 1] * c + gt[1],
                    local[:, 2] + gt[2]], -1)
    pts = np.zeros((1024, 3), np.float32)
    pts[:300] = obj
    pmask = np.zeros(1024, bool)
    pmask[:300] = True
    from findnpropagate_tpu.utils.geometry import boxes_to_corners_3d

    cor = np.asarray(boxes_to_corners_3d(jnp.asarray(gt[None])))[0]
    u, v, d = project_np(cor, l2i)
    det_boxes = np.zeros((4, 4), np.float32)
    det_boxes[0] = [u.min(), v.min(), u.max(), v.max()]
    det_labels = np.zeros(4, np.int32)
    det_labels[0] = 1
    det_scores = np.zeros(4, np.float32)
    det_scores[0] = 0.9
    det_cams = np.zeros(4, np.int32)
    det_mask = np.zeros(4, bool)
    det_mask[0] = True
    return (l2i, c2l, intr, gt, pts, pmask, det_boxes, det_labels,
            det_scores, det_cams, det_mask)


def test_hierarchy_labels():
    # car/truck+cv/bus+trailer/barrier/moto+bike/ped+cone -> 6 groups
    assert len(LABEL_TO_HIERARCHY) == 10
    assert max(LABEL_TO_HIERARCHY) == 5


def test_seg_masks_shapes_and_gating():
    rng = np.random.RandomState(0)
    (l2i, c2l, intr, gt, pts, pmask, det_boxes, det_labels, det_scores,
     det_cams, det_mask) = _one_box_scene(rng)
    prop = FrustumProposerSEG(CLASS_NAMES, seg_pts_thr=50,
                              max_seg_points=128)
    params = prop.seg_net.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 128, 3)), jnp.zeros((1, 6)),
        jnp.ones((1, 128), bool), False)
    masks = np.asarray(prop.seg_point_masks(
        params, jnp.asarray(pts), jnp.asarray(pmask),
        jnp.asarray(det_boxes), jnp.asarray(det_labels),
        jnp.asarray(det_cams), jnp.asarray(det_mask),
        jnp.asarray(l2i, jnp.float32)[None]))
    assert masks.shape == (4, 1024)
    # invalid det slots pass through unfiltered
    assert masks[1:].all()
    # the filtered det keeps only a subset of its in-box points
    assert masks[0].sum() <= 300
    # a small frustum (seg_pts_thr above its count) passes through
    prop2 = FrustumProposerSEG(CLASS_NAMES, seg_pts_thr=1000,
                               max_seg_points=128)
    masks2 = np.asarray(prop2.seg_point_masks(
        params, jnp.asarray(pts), jnp.asarray(pmask),
        jnp.asarray(det_boxes), jnp.asarray(det_labels),
        jnp.asarray(det_cams), jnp.asarray(det_mask),
        jnp.asarray(l2i, jnp.float32)[None]))
    assert masks2.all()


@pytest.mark.slow
def test_det_point_mask_gates_proposals():
    """OG seeker with an all-false det_point_mask for the only detection
    produces no valid proposal; the unmasked run does."""
    rng = np.random.RandomState(1)
    (l2i, c2l, intr, gt, pts, pmask, det_boxes, det_labels, det_scores,
     det_cams, det_mask) = _one_box_scene(rng)
    seeker = FrustumProposerOG(class_names=CLASS_NAMES, det_chunk=4)
    args = (jnp.asarray(pts), jnp.asarray(pmask), jnp.asarray(det_boxes),
            jnp.asarray(det_labels), jnp.asarray(det_scores),
            jnp.asarray(det_cams), jnp.asarray(det_mask),
            jnp.asarray(l2i, jnp.float32)[None],
            jnp.asarray(c2l, jnp.float32)[None],
            jnp.asarray(intr, jnp.float32)[None])
    out = seeker.propose(*args)
    assert bool(np.asarray(out.valid)[0])
    out_masked = seeker.propose(
        *args, det_point_mask=jnp.zeros((4, 1024), bool))
    assert not np.asarray(out_masked.valid).any()

    # SEG wrapper with no seg params equals OG exactly
    prop = FrustumProposerSEG(CLASS_NAMES, det_chunk=4)
    out_seg = prop.propose(*args)
    np.testing.assert_array_equal(np.asarray(out.boxes),
                                  np.asarray(out_seg.boxes))
    np.testing.assert_array_equal(np.asarray(out.valid),
                                  np.asarray(out_seg.valid))

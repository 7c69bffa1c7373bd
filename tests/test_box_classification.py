"""VLM relabel path: GLIP 2D-overlap relabeling on a synthetic camera rig,
CLIP crop scoring with a stubbed encoder (no weights needed), and the shared
3D-box -> per-camera 2D projection."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from findnpropagate_tpu.openvocab.box_classification import (
    CLIPBoxClassification,
    GLIPBoxClassification,
    project_boxes_to_cameras,
)
from test_frustum_proposer import make_camera
from test_seeker_parity import corners_np


def project_box_2d(box, l2i):
    cor = corners_np(box[None])[0]
    hom = cor @ l2i[:3, :3].T + l2i[:3, 3]
    u = hom[:, 0] / hom[:, 2]
    v = hom[:, 1] / hom[:, 2]
    return np.array([u.min(), v.min(), u.max(), v.max()], np.float32)


BOXES3D = np.array([
    [14.0, 2.0, -0.8, 4.6, 2.0, 1.7, 0.2],
    [10.0, -3.0, -0.6, 0.7, 0.7, 1.8, 0.0],
], np.float32)


def test_project_boxes_to_cameras():
    l2i, _, _ = make_camera()
    boxes2d, visible = project_boxes_to_cameras(
        jnp.asarray(BOXES3D), jnp.asarray(l2i, jnp.float32)[None])
    assert visible.shape == (1, 2) and bool(visible.all())
    for i in range(2):
        want = project_box_2d(BOXES3D[i].astype(np.float64), l2i)
        np.testing.assert_allclose(np.asarray(boxes2d)[0, i], want, atol=0.5)
    # a box behind the camera is invisible
    behind = jnp.asarray([[-10.0, 0, 0, 4, 2, 1.6, 0]], jnp.float32)
    _, vis2 = project_boxes_to_cameras(
        behind, jnp.asarray(l2i, jnp.float32)[None])
    assert not bool(np.asarray(vis2).any())


def test_glip_relabel_assigns_cached_labels():
    """Cached 2D dets at the boxes' projections carry classes 3 and 7 ->
    relabel replaces whatever the detector said with those."""
    l2i, _, _ = make_camera()
    det_boxes = np.stack([
        project_box_2d(BOXES3D[0].astype(np.float64), l2i),
        project_box_2d(BOXES3D[1].astype(np.float64), l2i),
    ])
    glip = GLIPBoxClassification(num_classes=10)
    labels, scores = glip.relabel(
        jnp.asarray(BOXES3D), jnp.asarray(l2i, jnp.float32)[None],
        jnp.asarray(det_boxes), jnp.asarray([3, 7], jnp.int32),
        jnp.asarray([0.8, 0.6], jnp.float32), jnp.zeros(2, jnp.int32),
        jnp.ones(2, bool),
    )
    labels = np.asarray(labels)
    scores = np.asarray(scores)
    assert labels.tolist() == [3, 7], labels
    # score ~ iou(≈1) * det score
    assert abs(scores[0] - 0.8) < 0.1 and abs(scores[1] - 0.6) < 0.1, scores


def test_glip_relabel_masks_invalid_and_other_cameras():
    l2i, _, _ = make_camera()
    det_boxes = np.stack([
        project_box_2d(BOXES3D[0].astype(np.float64), l2i),
        project_box_2d(BOXES3D[0].astype(np.float64), l2i),
    ])
    glip = GLIPBoxClassification(num_classes=10)
    # second det is on camera 5 (doesn't exist here) -> ignored
    labels, scores = glip.relabel(
        jnp.asarray(BOXES3D[:1]), jnp.asarray(l2i, jnp.float32)[None],
        jnp.asarray(det_boxes), jnp.asarray([4, 9], jnp.int32),
        jnp.asarray([0.5, 0.99], jnp.float32), jnp.asarray([0, 5], jnp.int32),
        jnp.ones(2, bool),
    )
    assert np.asarray(labels).tolist() == [4]


class _StubCLIP:
    """Image encoder stub: feature = mean normalized RGB of the crop."""

    def get_image_features(self, pixel_values):
        return jnp.mean(jnp.asarray(pixel_values), axis=(2, 3))  # (N, 3)


def test_clip_relabel_with_stub_encoder():
    """Two solid-color regions; text features aligned with the colors ->
    the crop content decides the label."""
    l2i, _, _ = make_camera()
    h, w = 900, 1600
    images = np.zeros((1, h, w, 3), np.float32)
    # paint each box's projected region red / blue
    b0 = project_box_2d(BOXES3D[0].astype(np.float64), l2i).astype(int)
    b1 = project_box_2d(BOXES3D[1].astype(np.float64), l2i).astype(int)
    images[0, b0[1]:b0[3], b0[0]:b0[2], 0] = 1.0     # red
    images[0, b1[1]:b1[3], b1[0]:b1[2], 2] = 1.0     # blue

    clip = CLIPBoxClassification(class_names=["red_thing", "blue_thing"])
    mean = np.array([0.48145466, 0.4578275, 0.40821073])
    std = np.array([0.26862954, 0.26130258, 0.27577711])
    red = (np.array([1.0, 0, 0]) - mean) / std
    blue = (np.array([0, 0, 1.0]) - mean) / std
    text = np.stack([red / np.linalg.norm(red), blue / np.linalg.norm(blue)])
    clip._model = _StubCLIP()
    clip._text_features = jnp.asarray(text, jnp.float32)

    labels, scores = clip.relabel(
        jnp.asarray(BOXES3D), jnp.asarray(l2i, jnp.float32)[None],
        jnp.asarray(images))
    assert np.asarray(labels).tolist() == [1, 2], np.asarray(labels)
    assert (np.asarray(scores) > 0.5).all()

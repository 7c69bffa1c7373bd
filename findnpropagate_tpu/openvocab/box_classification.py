"""VLM box relabeling: CLIP crop scoring and GLIP 2D-overlap scoring.

Parity targets (/root/reference):
  * CLIPBoxClassification (pcdet/models/dense_heads/clip_box_classification.py
    :68-379): project 3D box corners to each camera, take a square crop
    (>=64 px), encode with CLIP, softmax vs class-text features, average the
    per-camera probabilities, REPLACE predicted labels+scores.
  * GLIPBoxClassification (glip_box_classification.py:14-242): zero-shot from
    cached GLIP 2D boxes — IoU(projected 3D box, GLIP boxes)^T @
    one_hot(labels) * scores -> per-camera probs -> mean -> argmax.

CLIP runs through transformers' FlaxCLIPModel on the TPU (gated: falls back
to a clear error if weights are unavailable — this environment has no
network egress, so CLIP weights must be on disk).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .camera import boxes_2d_iou, project_to_camera

PROMPT_TEMPLATES = (
    "a photo of a {}",
    "a photo of the {}",
    "a photo of one {}",
)


def project_boxes_to_cameras(boxes3d, lidar2image, image_size=(900, 1600)):
    """(N, 7) boxes -> per-camera 2D xyxy boxes + visibility.

    Returns boxes2d (NCAM, N, 4), visible (NCAM, N)."""
    from ..utils.geometry import boxes_to_corners_3d

    corners = boxes_to_corners_3d(boxes3d)  # (N, 8, 3)
    n = corners.shape[0]
    coords, on_img = project_to_camera(
        corners.reshape(-1, 3), lidar2image, image_size=image_size
    )  # (NCAM, N*8, 3)
    ncam = coords.shape[0]
    uv = coords[..., :2].reshape(ncam, n, 8, 2)
    front = (coords[..., 2] > 1e-4).reshape(ncam, n, 8)
    h, w = image_size
    u = jnp.clip(uv[..., 0], 0, w)
    v = jnp.clip(uv[..., 1], 0, h)
    boxes2d = jnp.stack(
        [u.min(axis=2), v.min(axis=2), u.max(axis=2), v.max(axis=2)], axis=-1
    )
    visible = front.all(axis=2) & (
        (boxes2d[..., 2] - boxes2d[..., 0]) > 1
    ) & ((boxes2d[..., 3] - boxes2d[..., 1]) > 1)
    return boxes2d, visible


class GLIPBoxClassification:
    """Relabel 3D detections from cached per-camera 2D GLIP boxes."""

    def __init__(self, num_classes: int, image_size=(900, 1600)):
        self.num_classes = num_classes
        self.image_size = image_size

    def relabel(self, boxes3d, lidar2image, det_boxes, det_labels, det_scores,
                det_cams, det_mask):
        """boxes3d (N, 7); cached 2D dets (D, ...) padded. Returns
        (new_labels (N,) 1-indexed, new_scores (N,))."""
        boxes2d, visible = project_boxes_to_cameras(
            boxes3d, lidar2image, self.image_size
        )  # (NCAM, N, 4)
        ncam, n = visible.shape
        onehot = jax.nn.one_hot(det_labels - 1, self.num_classes)  # (D, C)
        weighted = onehot * det_scores[:, None] * det_mask[:, None]

        def per_cam(c):
            cam_sel = (det_cams == c) & det_mask
            iou = boxes_2d_iou(boxes2d[c], det_boxes)  # (N, D)
            iou = iou * cam_sel[None, :]
            probs = iou @ weighted  # (N, C)
            return probs * visible[c][:, None]

        probs = jnp.sum(
            jax.vmap(per_cam)(jnp.arange(ncam)), axis=0
        )  # (N, C)
        cams_seen = jnp.sum(
            jax.vmap(lambda c: visible[c])(jnp.arange(ncam)), axis=0
        )
        probs = probs / jnp.clip(cams_seen[:, None], 1)
        labels = jnp.argmax(probs, axis=-1).astype(jnp.int32) + 1
        scores = jnp.max(probs, axis=-1)
        return labels, scores


class CLIPBoxClassificationMaskCLIP:
    """MaskCLIP relabel variant (clip_box_cls_maskclip.py:66-309,
    /root/reference): per-pixel CLIP class probabilities from the dense
    value-embedding features (backbones_image/maskclip.py), averaged inside
    each 3D box's projected 2D region per camera, then averaged over the
    cameras the box appears in — REPLACES predicted labels + scores.

    The dense encoder is weights-gated; tests stub `maskclip.pixel_probs`."""

    def __init__(self, class_names: Sequence[str],
                 image_size=(900, 1600), maskclip=None):
        from ..models.backbones_image.maskclip import MaskCLIP

        self.class_names = list(class_names)
        self.image_size = image_size
        self.maskclip = maskclip or MaskCLIP(class_names)

    def relabel(self, boxes3d, lidar2image, images):
        """boxes3d (N, 7); images (NCAM, H, W, 3) in [0, 1].
        Returns (labels (N,) 1-indexed, scores (N,))."""
        probs_px = self.maskclip.pixel_probs(images)   # (NCAM, H, W, C)
        boxes2d, visible = project_boxes_to_cameras(
            boxes3d, lidar2image, self.image_size)
        ncam, n = visible.shape
        h_img, w_img = self.image_size
        ys = jnp.arange(h_img, dtype=jnp.float32)
        xs = jnp.arange(w_img, dtype=jnp.float32)

        def per_cam(pp, b2d, vis):
            def per_box(box, v):
                in_x = (xs >= box[0]) & (xs < box[2])
                in_y = (ys >= box[1]) & (ys < box[3])
                m = in_y[:, None] & in_x[None, :]
                denom = jnp.clip(jnp.sum(m), 1)
                mean = jnp.sum(pp * m[..., None], axis=(0, 1)) / denom
                return jnp.where(v, mean, 0.0)

            return jax.vmap(per_box)(b2d, vis)          # (N, C)

        probs = jnp.sum(jax.vmap(per_cam)(probs_px, boxes2d, visible),
                        axis=0)
        cams_seen = jnp.clip(jnp.sum(visible, axis=0), 1)
        probs = probs / cams_seen[:, None]
        labels = jnp.argmax(probs, axis=-1).astype(jnp.int32) + 1
        scores = jnp.max(probs, axis=-1)
        return labels, scores


class CLIPBoxClassification:
    """CLIP crop scoring; requires local CLIP weights (no egress here)."""

    def __init__(self, class_names: Sequence[str],
                 model_name: str = "openai/clip-vit-base-patch32",
                 image_size=(900, 1600), crop_min: int = 64,
                 prompt_ensemble: bool = True):
        self.class_names = list(class_names)
        self.image_size = image_size
        self.crop_min = crop_min
        self.prompt_ensemble = prompt_ensemble
        self.model_name = model_name
        self._model = None
        self._text_features = None

    def _load(self):
        if self._model is not None:
            return
        from transformers import CLIPProcessor, FlaxCLIPModel

        self._model = FlaxCLIPModel.from_pretrained(self.model_name)
        self._processor = CLIPProcessor.from_pretrained(self.model_name)
        prompts = []
        for name in self.class_names:
            if self.prompt_ensemble:
                prompts.extend(t.format(name.replace("_", " "))
                               for t in PROMPT_TEMPLATES)
            else:
                prompts.append(f"a photo of a {name.replace('_', ' ')}")
        inputs = self._processor(text=prompts, return_tensors="np",
                                 padding=True)
        feats = self._model.get_text_features(**inputs)
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        if self.prompt_ensemble:
            feats = feats.reshape(len(self.class_names), len(PROMPT_TEMPLATES),
                                  -1).mean(axis=1)
            feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        self._text_features = feats  # (C, E)

    def crop_boxes(self, images, boxes2d, visible):
        """Square crops >= crop_min px, resized to 224 (via bilinear
        jax.image.resize — grid_sample equivalent for axis-aligned crops,
        clip_box_classification.py:217-379)."""
        ncam, n, _ = boxes2d.shape
        h_img, w_img = self.image_size
        cx = (boxes2d[..., 0] + boxes2d[..., 2]) / 2
        cy = (boxes2d[..., 1] + boxes2d[..., 3]) / 2
        size = jnp.maximum(
            jnp.maximum(boxes2d[..., 2] - boxes2d[..., 0],
                        boxes2d[..., 3] - boxes2d[..., 1]),
            float(self.crop_min),
        )
        x1 = jnp.clip(cx - size / 2, 0, w_img - 1)
        y1 = jnp.clip(cy - size / 2, 0, h_img - 1)

        def crop_one(img, x1s, y1s, sizes):
            def one(x, y, s):
                # sample a 224x224 grid over the square crop
                ys = y + (jnp.arange(224) + 0.5) * s / 224
                xs = x + (jnp.arange(224) + 0.5) * s / 224
                yi = jnp.clip(ys.astype(jnp.int32), 0, h_img - 1)
                xi = jnp.clip(xs.astype(jnp.int32), 0, w_img - 1)
                return img[yi][:, xi]

            return jax.vmap(one)(x1s, y1s, sizes)

        return jax.vmap(crop_one)(images, x1, y1, size)  # (NCAM, N, 224, 224, 3)

    def relabel(self, boxes3d, lidar2image, images):
        """boxes3d (N, 7); images (NCAM, H, W, 3) float in [0, 1].

        Returns (labels (N,) 1-indexed, scores (N,)) — softmax over classes,
        averaged over the cameras each box appears in."""
        self._load()
        boxes2d, visible = project_boxes_to_cameras(
            boxes3d, lidar2image, self.image_size
        )
        crops = self.crop_boxes(images, boxes2d, visible)
        ncam, n = visible.shape
        mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
        std = jnp.asarray([0.26862954, 0.26130258, 0.27577711])
        pix = (crops - mean) / std
        pix = pix.reshape(-1, 224, 224, 3).transpose(0, 3, 1, 2)
        feats = self._model.get_image_features(pixel_values=np.asarray(pix))
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        logits = 100.0 * feats @ self._text_features.T  # (NCAM*N, C)
        probs = jax.nn.softmax(logits, axis=-1).reshape(ncam, n, -1)
        probs = probs * visible[..., None]
        cams_seen = jnp.clip(jnp.sum(visible, axis=0), 1)
        mean_probs = jnp.sum(probs, axis=0) / cams_seen[:, None]
        labels = jnp.argmax(mean_probs, axis=-1).astype(jnp.int32) + 1
        scores = jnp.max(mean_probs, axis=-1)
        return labels, scores

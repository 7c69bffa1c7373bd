"""Shared detector post-processing: score sigmoid, class-agnostic NMS,
fixed-size final detections, and recall bookkeeping.

Behavioral parity with Detector3DTemplate.post_processing
(pcdet/models/detectors/detector3d_template.py:199-399, /root/reference),
restructured for fixed shapes: every sample yields MAX_DET slots + a count.
Recall records support known/unknown class splits (the OV evaluation path).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.nms import nms_bev
from ..ops.rotated_iou import boxes_iou3d


class Detections(NamedTuple):
    boxes: jax.Array   # (B, D, 7+C)
    scores: jax.Array  # (B, D)
    labels: jax.Array  # (B, D) int32, 1-indexed; 0 for empty slots
    count: jax.Array   # (B,) int32


@functools.partial(
    jax.jit, static_argnames=("score_thresh", "nms_pre", "nms_post", "normalized")
)
def post_process(batch_cls_preds, batch_box_preds, nms_thresh,
                 score_thresh: float = 0.1, nms_pre: int = 1024,
                 nms_post: int = 256, normalized: bool = False):
    """Class-agnostic post-processing (POST_PROCESSING.NMS_CONFIG path).

    batch_cls_preds: (B, N, C) logits (or probs if normalized);
    batch_box_preds: (B, N, 7+).
    """
    scores_all = batch_cls_preds if normalized else jax.nn.sigmoid(batch_cls_preds)
    scores = jnp.max(scores_all, axis=-1)
    labels = jnp.argmax(scores_all, axis=-1).astype(jnp.int32) + 1

    def one(boxes_s, scores_s, labels_s):
        valid = scores_s >= score_thresh
        idx, num = nms_bev(
            boxes_s, scores_s, nms_thresh,
            pre_maxsize=nms_pre, post_maxsize=nms_post, valid_mask=valid,
        )
        safe = jnp.clip(idx, 0)
        good = idx >= 0
        return (
            jnp.where(good[:, None], boxes_s[safe], 0.0),
            jnp.where(good, scores_s[safe], 0.0),
            jnp.where(good, labels_s[safe], 0),
            num,
        )

    boxes, scores_o, labels_o, count = jax.vmap(one)(
        batch_box_preds, scores, labels
    )
    return Detections(boxes, scores_o, labels_o, count)


@functools.partial(jax.jit,
                   static_argnames=("thresh_list", "known_labels"))
def recall_record(det_boxes, det_mask, gt_boxes, thresh_list=(0.3, 0.5, 0.7),
                  rois=None, known_labels=None):
    """Per-batch recall counts (detector3d_template.generate_recall_record,
    incl. the OV known/unknown buckets at :314-399 when `known_labels` — a
    tuple of 1-indexed known class labels — is given).

    det_boxes: (D, 7+) final detections for one sample; det_mask: (D,);
    gt_boxes: (M, 8) padded with zero rows (last col = 1-indexed label).
    Returns dict {'gt': num_gt, f'recall_{t}': matched count, and when
    known_labels: num_known/num_unknown + recall_{known,unknown}_{t}}.
    """
    gt_valid = gt_boxes[:, 7] > 0 if gt_boxes.shape[-1] > 7 else (
        jnp.sum(jnp.abs(gt_boxes), axis=-1) > 0
    )
    num_gt = jnp.sum(gt_valid)
    out = {"gt": num_gt}
    iou = boxes_iou3d(gt_boxes[:, :7], det_boxes[:, :7])
    iou = jnp.where(det_mask[None, :], iou, 0.0)
    best = jnp.max(iou, axis=1, initial=0.0)
    best = jnp.where(gt_valid, best, 0.0)
    for t in thresh_list:
        out[f"recall_{t}"] = jnp.sum(best > t)
    if known_labels is not None and gt_boxes.shape[-1] > 7:
        labels = gt_boxes[:, 7].astype(jnp.int32)
        known = jnp.zeros_like(gt_valid)
        for l in known_labels:
            known = known | (labels == int(l))
        known = known & gt_valid
        unknown = gt_valid & ~known
        out["num_known"] = jnp.sum(known)
        out["num_unknown"] = jnp.sum(unknown)
        for t in thresh_list:
            out[f"recall_known_{t}"] = jnp.sum(jnp.where(known, best, 0.0) > t)
            out[f"recall_unknown_{t}"] = jnp.sum(
                jnp.where(unknown, best, 0.0) > t)
    return out


@functools.partial(
    jax.jit, static_argnames=("score_thresh", "nms_pre", "nms_post")
)
def post_process_two_stage(rcnn_scores, rois, roi_labels, roi_valid,
                           nms_thresh, score_thresh: float = 0.1,
                           nms_pre: int = 1024, nms_post: int = 256):
    """Two-stage (IoU-head) post-processing: class labels come from the
    first stage's ROIs, scores from the second stage (reference
    second_net_iou.py + detector3d_template.py:199-298 has_class_labels
    path). rcnn_scores (B, M, 1) logits; rois (B, M, 7); roi_labels (B, M)
    1-indexed."""
    scores = jax.nn.sigmoid(rcnn_scores[..., 0])
    if roi_valid is not None:
        scores = jnp.where(roi_valid, scores, 0.0)

    def one(boxes_s, scores_s, labels_s):
        valid = scores_s >= score_thresh
        idx, num = nms_bev(
            boxes_s, scores_s, nms_thresh,
            pre_maxsize=nms_pre, post_maxsize=nms_post, valid_mask=valid,
        )
        safe = jnp.clip(idx, 0)
        good = idx >= 0
        return (
            jnp.where(good[:, None], boxes_s[safe], 0.0),
            jnp.where(good, scores_s[safe], 0.0),
            jnp.where(good, labels_s[safe], 0),
            num,
        )

    boxes, scores_o, labels_o, count = jax.vmap(one)(rois, scores,
                                                     roi_labels)
    return Detections(boxes, scores_o, labels_o, count)


def post_process_mppnet(cls_probs, box_preds, roi_labels, roi_valid,
                        nms_thresh, score_thresh: float = 0.1,
                        nms_pre: int = 1024, nms_post: int = 256,
                        not_apply_nms_for_vel: bool = False):
    """MPPNet post-processing (mppnet.py:44-180): scores are ALREADY
    normalized (stage-1 blended), labels come from the ROIs, and with
    NOT_APPLY_NMS_FOR_VEL vehicles (label 1) skip NMS entirely while
    pedestrians/cyclists are NMS'd.

    cls_probs (B, M); box_preds (B, M, 7+); roi_labels (B, M)."""
    scores = jnp.where(roi_valid, cls_probs, 0.0) \
        if roi_valid is not None else cls_probs

    def one(boxes_s, scores_s, labels_s):
        above = scores_s >= score_thresh
        if not_apply_nms_for_vel:
            is_car = labels_s == 1
            idx, _ = nms_bev(
                boxes_s, jnp.where(is_car, 0.0, scores_s), nms_thresh,
                pre_maxsize=nms_pre, post_maxsize=nms_post,
                valid_mask=above & ~is_car,
            )
            keep = jnp.zeros(scores_s.shape, bool).at[
                jnp.clip(idx, 0)].set(idx >= 0, mode="drop")
            keep = keep | (is_car & above)
        else:
            idx, _ = nms_bev(
                boxes_s, scores_s, nms_thresh,
                pre_maxsize=nms_pre, post_maxsize=nms_post,
                valid_mask=above,
            )
            keep = jnp.zeros(scores_s.shape, bool).at[
                jnp.clip(idx, 0)].set(idx >= 0, mode="drop")
        key = jnp.where(keep, scores_s, -1.0)
        topv, top = jax.lax.top_k(key, min(nms_post, key.shape[0]))
        good = topv > 0
        return (
            jnp.where(good[:, None], boxes_s[top], 0.0),
            jnp.where(good, scores_s[top], 0.0),
            jnp.where(good, labels_s[top], 0),
            jnp.sum(good.astype(jnp.int32)),
        )

    boxes, scores_o, labels_o, count = jax.vmap(one)(
        box_preds, scores, roi_labels)
    return Detections(boxes, scores_o, labels_o, count)

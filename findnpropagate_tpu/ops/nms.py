"""Greedy rotated NMS on device — TPU replacement for `nms_gpu`/`nms_normal_gpu`
(pcdet/ops/iou3d_nms, /root/reference) and the wrappers in
pcdet/models/model_utils/model_nms_utils.py:6-66.

The CUDA version builds a 64-bit suppression bitmask per block; on TPU we
compute the (topk x topk) rotated-IoU matrix with the branch-free polygon
kernel and run the greedy suppression recurrence as a `fori_loop` over rows
(O(K) iterations of O(K) vector work — negligible next to the IoU matrix).
All outputs are fixed-size: (indices padded with -1, num_kept).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .rotated_iou import boxes_iou_bev, boxes_overlap_bev

NEG_INF = -1e9


def _greedy_suppress(iou_mat, valid, thresh):
    """iou_mat (K, K) for boxes already sorted by descending score.

    Returns keep mask (K,). Row i suppresses all later j with IoU > thresh,
    but only if i itself survived.
    """
    k = iou_mat.shape[0]
    idx = jnp.arange(k)

    def body(i, suppressed):
        row_suppresses = (iou_mat[i] > thresh) & (idx > i)
        alive = jnp.logical_not(suppressed[i]) & valid[i]
        return jnp.where(alive, suppressed | row_suppresses, suppressed)

    suppressed = jax.lax.fori_loop(0, k, body, jnp.zeros((k,), dtype=bool))
    return jnp.logical_not(suppressed) & valid


@functools.partial(jax.jit, static_argnames=("pre_maxsize", "post_maxsize"))
def nms_bev(boxes, scores, thresh, pre_maxsize: int = 1024, post_maxsize: int = 256,
            valid_mask=None):
    """Rotated BEV NMS (`nms_gpu` semantics: IoU over BEV rotated boxes).

    Args:
      boxes: (N, 7) [x, y, z, dx, dy, dz, heading].
      scores: (N,).
      thresh: IoU threshold.
      valid_mask: optional (N,) bool; invalid boxes are never selected.

    Returns:
      (indices (post_maxsize,) int32 padded with -1, num_kept scalar int32)
    """
    scores = jnp.where(valid_mask, scores, NEG_INF) if valid_mask is not None else scores
    k = min(pre_maxsize, boxes.shape[0])
    top_scores, order = jax.lax.top_k(scores, k)
    top_boxes = boxes[order]
    top_valid = top_scores > NEG_INF / 2

    iou = boxes_iou_bev(top_boxes, top_boxes)
    keep = _greedy_suppress(iou, top_valid, thresh)

    keep_scores = jnp.where(keep, top_scores, NEG_INF)
    m = min(post_maxsize, k)
    sel_scores, sel = jax.lax.top_k(keep_scores, m)
    kept_idx = order[sel].astype(jnp.int32)
    good = sel_scores > NEG_INF / 2
    num = jnp.sum(good).astype(jnp.int32)
    return jnp.where(good, kept_idx, -1), num


def _iou_normal_matrix(boxes_a, boxes_b):
    """Axis-aligned BEV IoU ignoring heading (`iou_normal`,
    iou3d_nms_kernel.cu:327-339)."""
    left = jnp.maximum(
        (boxes_a[:, 0] - boxes_a[:, 3] / 2)[:, None],
        (boxes_b[:, 0] - boxes_b[:, 3] / 2)[None, :],
    )
    right = jnp.minimum(
        (boxes_a[:, 0] + boxes_a[:, 3] / 2)[:, None],
        (boxes_b[:, 0] + boxes_b[:, 3] / 2)[None, :],
    )
    top = jnp.maximum(
        (boxes_a[:, 1] - boxes_a[:, 4] / 2)[:, None],
        (boxes_b[:, 1] - boxes_b[:, 4] / 2)[None, :],
    )
    bot = jnp.minimum(
        (boxes_a[:, 1] + boxes_a[:, 4] / 2)[:, None],
        (boxes_b[:, 1] + boxes_b[:, 4] / 2)[None, :],
    )
    inter = jnp.clip(right - left, 0.0) * jnp.clip(bot - top, 0.0)
    sa = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    sb = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return inter / jnp.maximum(sa + sb - inter, 1e-8)


@functools.partial(jax.jit, static_argnames=("pre_maxsize", "post_maxsize"))
def nms_normal_bev(boxes, scores, thresh, pre_maxsize: int = 1024,
                   post_maxsize: int = 256, valid_mask=None):
    """`nms_normal_gpu` semantics: greedy NMS with AXIS-ALIGNED BEV IoU —
    heading is ignored entirely (iou3d_nms_kernel.cu:327,341-382)."""
    scores = jnp.where(valid_mask, scores, NEG_INF) if valid_mask is not None else scores
    k = min(pre_maxsize, boxes.shape[0])
    top_scores, order = jax.lax.top_k(scores, k)
    top_boxes = boxes[order]
    top_valid = top_scores > NEG_INF / 2

    iou = _iou_normal_matrix(top_boxes, top_boxes)
    keep = _greedy_suppress(iou, top_valid, thresh)

    keep_scores = jnp.where(keep, top_scores, NEG_INF)
    m = min(post_maxsize, k)
    sel_scores, sel = jax.lax.top_k(keep_scores, m)
    kept_idx = order[sel].astype(jnp.int32)
    good = sel_scores > NEG_INF / 2
    num = jnp.sum(good).astype(jnp.int32)
    return jnp.where(good, kept_idx, -1), num


@functools.partial(
    jax.jit, static_argnames=("pre_maxsize", "post_maxsize")
)
def class_agnostic_nms(box_scores, box_preds, nms_thresh, score_thresh=None,
                       pre_maxsize: int = 1024, post_maxsize: int = 256):
    """Mirror of model_nms_utils.class_agnostic_nms (model_nms_utils.py:6-29).

    Returns (selected indices padded -1, selected scores, num_kept).
    """
    valid = jnp.ones_like(box_scores, dtype=bool)
    if score_thresh is not None:
        valid = box_scores >= score_thresh
    idx, num = nms_bev(
        box_preds, box_scores, nms_thresh,
        pre_maxsize=pre_maxsize, post_maxsize=post_maxsize, valid_mask=valid,
    )
    sel_scores = jnp.where(idx >= 0, box_scores[jnp.clip(idx, 0)], 0.0)
    return idx, sel_scores, num


def multi_classes_nms(cls_scores, box_preds, nms_thresh, score_thresh=None,
                      pre_maxsize: int = 512, post_maxsize: int = 128):
    """Per-class NMS (model_nms_utils.multi_classes_nms:32-66).

    cls_scores: (N, C); box_preds: (N, 7+).
    Returns per-class (indices (C, post), scores (C, post), labels (C, post),
    counts (C,)) stacked over classes; flatten + topk downstream.
    """
    num_classes = cls_scores.shape[1]

    def per_class(c):
        scores = cls_scores[:, c]
        valid = jnp.ones_like(scores, dtype=bool)
        if score_thresh is not None:
            valid = scores >= score_thresh
        idx, num = nms_bev(box_preds, scores, nms_thresh,
                           pre_maxsize=pre_maxsize, post_maxsize=post_maxsize,
                           valid_mask=valid)
        sel_scores = jnp.where(idx >= 0, scores[jnp.clip(idx, 0)], 0.0)
        return idx, sel_scores, num

    idxs, scoress, nums = jax.vmap(per_class)(jnp.arange(num_classes))
    labels = jnp.broadcast_to(jnp.arange(num_classes)[:, None], idxs.shape)
    return idxs, scoress, labels, nums


@functools.partial(jax.jit, static_argnames=("post_maxsize",))
def circle_nms(centers, scores, radius, post_maxsize: int = 83):
    """CenterPoint circle NMS (model_utils/centernet_utils.py:100 numba kernel):
    suppress later detections whose center lies within `radius` (squared L2)
    of an earlier kept one."""
    n = centers.shape[0]
    _, order = jax.lax.top_k(scores, n)
    c = centers[order]
    d2 = jnp.sum((c[:, None, :] - c[None, :, :]) ** 2, axis=-1)
    idx = jnp.arange(n)

    def body(i, suppressed):
        row = (d2[i] < radius) & (idx > i)
        alive = jnp.logical_not(suppressed[i])
        return jnp.where(alive, suppressed | row, suppressed)

    suppressed = jax.lax.fori_loop(0, n, body, jnp.zeros((n,), dtype=bool))
    keep = jnp.logical_not(suppressed)
    keep_scores = jnp.where(keep, scores[order], NEG_INF)
    m = min(post_maxsize, n)
    sel_scores, sel = jax.lax.top_k(keep_scores, m)
    good = sel_scores > NEG_INF / 2
    return jnp.where(good, order[sel], -1).astype(jnp.int32), jnp.sum(good).astype(jnp.int32)

"""Axis-aligned anchor target assignment as a pure, fixed-shape JAX function.

Behavioral parity with pcdet/models/dense_heads/target_assigner/
axis_aligned_target_assigner.py:132-211 (/root/reference):

  * IoU between anchors and same-class GTs (nearest-BEV or full 3D),
  * force-match: for each GT, anchors achieving its best IoU (>0) become
    foreground with that anchor's own argmax GT,
  * anchors with max IoU >= matched_threshold are foreground,
  * anchors with max IoU < unmatched_threshold are background,
  * the rest are ignored (label -1),
  * regression targets via ResidualCoder for foreground anchors.

The reference loops per sample and per class with dynamic shapes; here the
per-class loop becomes one masked IoU (cross-class pairs get a -2 sentinel),
and padding GTs (class 0) are masked the same way — a single vmapped
fixed-shape program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...ops.rotated_iou import boxes_iou3d, boxes_nearest_bev_iou
from ...utils.box_coders import ResidualCoder


def _assign_single(anchors, anchor_class, matched_t, unmatched_t,
                   gt_boxes, gt_classes, coder: ResidualCoder,
                   match_height: bool):
    """anchors (N, 7), anchor_class (N,), gt_boxes (M, 7), gt_classes (M,)
    with 0 = padding; classes are 1-indexed against the class list order so
    anchor_class c matches gt_class c+1."""
    n = anchors.shape[0]

    if match_height:
        iou = boxes_iou3d(anchors, gt_boxes)
    else:
        iou = boxes_nearest_bev_iou(anchors, gt_boxes)

    gt_valid = gt_classes > 0
    same_class = anchor_class[:, None] == (gt_classes[None, :] - 1)
    pair_valid = same_class & gt_valid[None, :]
    iou = jnp.where(pair_valid, iou, -2.0)

    anchor_to_gt_max = jnp.max(iou, axis=1)
    anchor_to_gt_argmax = jnp.argmax(iou, axis=1)

    gt_to_anchor_max = jnp.max(iou, axis=0)  # (M,)
    # reference: gts with zero best overlap never force-match
    force_pairs = pair_valid & (iou == gt_to_anchor_max[None, :]) & (
        gt_to_anchor_max[None, :] > 0
    )
    force_anchor = jnp.any(force_pairs, axis=1)

    pos = anchor_to_gt_max >= matched_t
    bg = anchor_to_gt_max < unmatched_t
    fg = force_anchor | pos

    assigned_cls = gt_classes[anchor_to_gt_argmax]
    labels = jnp.where(fg, assigned_cls, jnp.where(bg, 0, -1)).astype(jnp.int32)

    assigned_gt = gt_boxes[anchor_to_gt_argmax]
    reg_targets = coder.encode(assigned_gt, anchors[:, :7])
    reg_targets = jnp.where(fg[:, None], reg_targets, 0.0)

    reg_weights = fg.astype(jnp.float32)
    return labels, reg_targets, reg_weights


@functools.partial(
    jax.jit,
    static_argnames=("coder", "match_height", "norm_by_num_examples"),
)
def assign_targets(anchors, anchor_class, matched_t, unmatched_t, gt_boxes,
                   coder: ResidualCoder, match_height: bool = False,
                   norm_by_num_examples: bool = False):
    """Batched assignment.

    Args:
      anchors: (N, 7) flattened anchor grid.
      anchor_class: (N,) int32 class slot per anchor (0-indexed).
      matched_t / unmatched_t: (N,) per-anchor thresholds.
      gt_boxes: (B, M, 8) [x,y,z,dx,dy,dz,rot,class]; zero rows = padding.

    Returns dict: box_cls_labels (B, N), box_reg_targets (B, N, code),
    reg_weights (B, N).
    """
    gt = gt_boxes[..., :7]
    gt_cls = gt_boxes[..., 7].astype(jnp.int32)

    labels, reg_targets, reg_weights = jax.vmap(
        lambda g, c: _assign_single(
            anchors, anchor_class, matched_t, unmatched_t, g, c, coder,
            match_height,
        )
    )(gt, gt_cls)

    if norm_by_num_examples:
        num_examples = jnp.sum(labels >= 0, axis=1, keepdims=True).astype(jnp.float32)
        reg_weights = reg_weights / jnp.clip(num_examples, 1.0)

    return {
        "box_cls_labels": labels,
        "box_reg_targets": reg_targets,
        "reg_weights": reg_weights,
    }

"""Two-stage (R-CNN) machinery: proposal layer, proposal-target sampling,
canonical-frame targets, and second-stage losses.

Parity target: pcdet/models/roi_heads/roi_head_template.py:1-261 and
roi_heads/target_assigner/proposal_target_layer.py (/root/reference).

TPU design: everything fixed-shape and jittable —
  * proposal layer = class-agnostic rotated NMS to a fixed ROI count;
  * ROI subsampling = rank-capped priority sampling (foreground ranks by
    random key capped at FG_RATIO*N, hard/easy background mixed by
    HARD_BG_RATIO) followed by one top_k — reproduces subsample_rois'
    fg/bg balance without dynamic shapes;
  * losses are masked means over the fixed ROI set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.nms import nms_bev
from ...ops.rotated_iou import boxes_iou3d
from ...utils.box_coders import ResidualCoder
from ...utils.geometry import rotate_points_along_z
from ...utils.losses import smooth_l1, corner_loss_lidar


def proposal_layer(cls_preds, box_preds, nms_cfg):
    """Single sample: cls_preds (N, C), box_preds (N, 7) -> fixed-size ROIs.

    Returns (rois (M, 7), roi_scores (M,), roi_labels (M,) 1-indexed,
    roi_valid (M,)) with M = NMS_POST_MAXSIZE (roi_head_template.py:46-102).
    """
    post = int(nms_cfg["NMS_POST_MAXSIZE"])
    scores = jnp.max(cls_preds, axis=-1)
    labels = jnp.argmax(cls_preds, axis=-1)
    idx, num = nms_bev(
        box_preds, scores, float(nms_cfg["NMS_THRESH"]),
        pre_maxsize=int(nms_cfg["NMS_PRE_MAXSIZE"]), post_maxsize=post,
    )
    sel = jnp.clip(idx, 0)
    valid = idx >= 0
    rois = jnp.where(valid[:, None], box_preds[sel], 0.0)
    roi_scores = jnp.where(valid, scores[sel], 0.0)
    roi_labels = jnp.where(valid, labels[sel] + 1, 0)
    return rois, roi_scores, roi_labels.astype(jnp.int32), valid


def _masked_rank(keys, mask):
    """Rank (0-based) of each element among mask==True by ascending key;
    masked-out elements get a huge rank."""
    n = keys.shape[0]
    k = jnp.where(mask, keys, jnp.inf)
    order = jnp.argsort(k)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    return jnp.where(mask, rank, n)


def sample_rois_for_rcnn(rng, rois, roi_scores, roi_labels, roi_valid,
                         gt_boxes, gt_labels, gt_valid, sampler_cfg):
    """Single sample. Fixed-count ROI subsampling (proposal_target_layer.py:
    64-147) with the reference's fg/bg ratios. gt_boxes (G, 7).

    Returns dict with ROI_PER_IMAGE entries each."""
    n_roi = int(sampler_cfg["ROI_PER_IMAGE"])
    fg_ratio = float(sampler_cfg["FG_RATIO"])
    reg_fg = float(sampler_cfg["REG_FG_THRESH"])
    cls_fg = float(sampler_cfg["CLS_FG_THRESH"])
    cls_bg = float(sampler_cfg["CLS_BG_THRESH"])
    bg_lo = float(sampler_cfg["CLS_BG_THRESH_LO"])
    hard_ratio = float(sampler_cfg["HARD_BG_RATIO"])
    fg_per_image = int(round(fg_ratio * n_roi))
    fg_thresh = min(reg_fg, cls_fg)

    if bool(sampler_cfg.get("SAMPLE_ROI_BY_EACH_CLASS", True)):
        iou = boxes_iou3d(rois[:, :7], gt_boxes[:, :7])
        same = roi_labels[:, None] == gt_labels[None, :]
        iou = jnp.where(same & gt_valid[None, :], iou, 0.0)
    else:
        iou = boxes_iou3d(rois[:, :7], gt_boxes[:, :7])
        iou = jnp.where(gt_valid[None, :], iou, 0.0)
    max_overlaps = jnp.max(iou, axis=1)
    gt_assignment = jnp.argmax(iou, axis=1)
    max_overlaps = jnp.where(roi_valid, max_overlaps, 0.0)

    fg = roi_valid & (max_overlaps >= fg_thresh)
    easy = roi_valid & (max_overlaps < bg_lo)
    hard = roi_valid & (max_overlaps >= bg_lo) & (max_overlaps < reg_fg) \
        & ~fg

    r = jax.random.uniform(rng, max_overlaps.shape)
    fg_rank = _masked_rank(r, fg)
    hard_rank = _masked_rank(r, hard)
    easy_rank = _masked_rank(r, easy)

    n_fg = jnp.minimum(jnp.sum(fg), fg_per_image)
    n_bg = n_roi - n_fg
    n_hard_want = (n_bg * hard_ratio).astype(jnp.int32)
    n_hard = jnp.minimum(jnp.sum(hard), n_hard_want)
    n_easy_want = n_bg - n_hard
    n_easy = jnp.minimum(jnp.sum(easy), n_easy_want)
    # if easy runs short, backfill with more hard (sample_bg_inds fallback)
    n_hard2 = jnp.minimum(jnp.sum(hard), n_bg - n_easy)

    # priority: selected fg/hard/easy = 2, leftover candidates = 1, invalid 0
    sel = (fg & (fg_rank < n_fg)) | (hard & (hard_rank < n_hard2)) \
        | (easy & (easy_rank < n_easy))
    prio = jnp.where(sel, 2.0, jnp.where(roi_valid, 1.0, 0.0))
    key = prio + r * 0.5
    _, take = jax.lax.top_k(key, n_roi)

    out = {
        "rois": rois[take],
        "roi_scores": roi_scores[take],
        "roi_labels": roi_labels[take],
        "gt_of_rois_src": jnp.where(
            gt_valid[gt_assignment[take], None],
            gt_boxes[gt_assignment[take]], 0.0),
        "gt_labels_of_rois": gt_labels[gt_assignment[take]],
        "gt_iou_of_rois": max_overlaps[take],
        "roi_valid": roi_valid[take],
        "take": take,  # source indices (MPPNet gathers trajectories by it)
    }

    # regression / classification labels (proposal_target_layer.py:36-57)
    ious = out["gt_iou_of_rois"]
    out["reg_valid_mask"] = (ious > reg_fg) & out["roi_valid"]
    score_type = str(sampler_cfg.get("CLS_SCORE_TYPE", "roi_iou"))
    if score_type == "roi_iou":
        fg_m = ious > cls_fg
        bg_m = ious < cls_bg
        interval = ~fg_m & ~bg_m
        cls_lab = fg_m.astype(jnp.float32)
        cls_lab = jnp.where(
            interval, (ious - cls_bg) / max(cls_fg - cls_bg, 1e-6), cls_lab)
        out["rcnn_cls_labels"] = jnp.where(out["roi_valid"], cls_lab, -1.0)
    else:  # 'cls'
        lab = (ious > cls_fg).astype(jnp.float32)
        ignore = (ious > cls_bg) & (ious < cls_fg)
        lab = jnp.where(ignore, -1.0, lab)
        out["rcnn_cls_labels"] = jnp.where(out["roi_valid"], lab, -1.0)
    return out


def canonicalize_gt_of_rois(rois, gt_of_rois):
    """Shift gt into each ROI's canonical frame + heading-flip normalization
    (roi_head_template.py:109-134). rois/gt (M, 7+)."""
    roi_center = rois[:, 0:3]
    roi_ry = rois[:, 6] % (2 * np.pi)
    gt = gt_of_rois.at[:, 0:3].add(-roi_center)
    xyz = rotate_points_along_z(gt[:, None, 0:3], -roi_ry)[:, 0]
    gt = gt.at[:, 0:3].set(xyz)
    heading = (gt[:, 6] - roi_ry) % (2 * np.pi)
    opposite = (heading > np.pi * 0.5) & (heading < np.pi * 1.5)
    heading = jnp.where(opposite, (heading + np.pi) % (2 * np.pi), heading)
    heading = jnp.where(heading > np.pi, heading - 2 * np.pi, heading)
    heading = jnp.clip(heading, -np.pi / 2, np.pi / 2)
    return gt.at[:, 6].set(heading)


def rcnn_reg_loss(rcnn_reg, rois, gt_ct, gt_src, reg_valid, loss_cfg,
                  coder: ResidualCoder):
    """Smooth-L1 on canonical residuals + optional corner loss
    (roi_head_template.py:137-199)."""
    code_size = 7
    anchors = jnp.concatenate(
        [jnp.zeros_like(rois[:, :3]), rois[:, 3:6],
         jnp.zeros_like(rois[:, 6:7])], axis=-1)
    reg_targets = coder.encode(gt_ct[:, :code_size], anchors)
    cw = jnp.asarray(loss_cfg["LOSS_WEIGHTS"]["code_weights"], jnp.float32)
    l1 = smooth_l1(rcnn_reg - reg_targets, beta=1.0 / 9.0) * cw[None, :]
    fg = reg_valid.astype(jnp.float32)
    n_fg = jnp.maximum(jnp.sum(fg), 1.0)
    loss = jnp.sum(jnp.sum(l1, axis=-1) * fg) / n_fg
    loss = loss * float(loss_cfg["LOSS_WEIGHTS"]["rcnn_reg_weight"])
    tb = {"rcnn_loss_reg": loss}

    if bool(loss_cfg.get("CORNER_LOSS_REGULARIZATION", False)):
        decoded = coder.decode(rcnn_reg, anchors)
        xyz = rotate_points_along_z(decoded[:, None, 0:3], rois[:, 6])[:, 0]
        decoded = decoded.at[:, 0:3].set(xyz + rois[:, 0:3])
        decoded = decoded.at[:, 6].add(rois[:, 6])
        cl = corner_loss_lidar(decoded[:, :7], gt_src[:, :7])
        closs = jnp.sum(cl * fg) / n_fg \
            * float(loss_cfg["LOSS_WEIGHTS"]["rcnn_corner_weight"])
        loss = loss + closs
        tb["rcnn_loss_corner"] = closs
    return loss, tb


def rcnn_cls_loss(rcnn_cls, cls_labels, loss_cfg):
    """BinaryCrossEntropy variant (roi_head_template.py:202-221)."""
    logits = rcnn_cls.reshape(-1)
    labels = cls_labels.reshape(-1)
    valid = (labels >= 0).astype(jnp.float32)
    p = jax.nn.sigmoid(logits)
    bce = -(labels * jnp.log(jnp.clip(p, 1e-7)) +
            (1 - labels) * jnp.log(jnp.clip(1 - p, 1e-7)))
    loss = jnp.sum(bce * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    loss = loss * float(loss_cfg["LOSS_WEIGHTS"]["rcnn_cls_weight"])
    return loss, {"rcnn_loss_cls": loss}


def generate_predicted_boxes(rois, rcnn_reg, coder: ResidualCoder):
    """Decode second-stage residuals back to lidar frame
    (roi_head_template.py:243-261). rois (M, 7), rcnn_reg (M, 7)."""
    anchors = jnp.concatenate(
        [jnp.zeros_like(rois[:, :3]), rois[:, 3:6],
         jnp.zeros_like(rois[:, 6:7])], axis=-1)
    decoded = coder.decode(rcnn_reg, anchors)
    xyz = rotate_points_along_z(decoded[:, None, 0:3], rois[:, 6])[:, 0]
    decoded = decoded.at[:, 0:3].set(xyz + rois[:, 0:3])
    decoded = decoded.at[:, 6].add(rois[:, 6])
    return decoded

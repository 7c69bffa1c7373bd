"""PointHeadBox — point-wise foreground segmentation + box regression head
(PointRCNN stage 1).

Behavioral parity with pcdet/models/dense_heads/point_head_box.py:6-120 and
point_head_template.py:49-209 (/root/reference): cls/reg FC stacks over the
per-point features; targets from points-in-gt-boxes with an ignore ring from
GT_EXTRA_WIDTH-enlarged boxes; sigmoid focal cls (positives-normalized) +
weighted smooth-L1 on PointResidualCoder residuals; decode produces
per-point proposal boxes for the ROI stage. NOTE: this fork pins
num_class=1 in PointHeadBox (point_head_box.py:13-14) — binary point cls.

TPU redesign: the per-sample python loop of assign_stack_targets becomes a
vmapped masked points-in-boxes program on fixed (B, P) layouts.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils import losses as L
from ...utils.box_coders import PointResidualCoder
from ...utils.geometry import enlarge_box3d, points_in_boxes_index
from ..blocks import MaskedBatchNorm


def _fc_stack(name, channels, out_ch, x, valid, train):
    for i, ch in enumerate(channels):
        x = nn.Dense(int(ch), use_bias=False, name=f"{name}_fc{i}")(x)
        x = MaskedBatchNorm(int(ch), name=f"{name}_bn{i}")(x, valid, train)
        x = nn.relu(x)
    return nn.Dense(int(out_ch), name=f"{name}_out")(x)


class PointHeadBox(nn.Module):
    model_cfg: Any
    input_channels: int
    num_class: int = 1  # pinned to 1 by the fork (point_head_box.py:13-14)

    @nn.compact
    def __call__(self, batch, train: bool):
        cfg = self.model_cfg
        feats = batch["point_features_before_fusion"] \
            if bool(cfg.get("USE_POINT_FEATURES_BEFORE_FUSION", False)) \
            else batch["point_features"]
        valid = batch["point_valid"]
        coder = _make_coder(cfg)

        cls_preds = _fc_stack("cls", cfg["CLS_FC"], 1, feats, valid, train)
        box_preds = _fc_stack("reg", cfg["REG_FC"], coder.code_size, feats,
                              valid, train)

        batch["point_cls_preds"] = cls_preds            # (B, P, 1)
        batch["point_box_preds_enc"] = box_preds        # (B, P, code)
        batch["point_cls_scores"] = jax.nn.sigmoid(
            jnp.max(cls_preds, axis=-1))

        # decode per-point boxes (proposals for the ROI stage); padded
        # points get -inf scores so they never rank into the ROI set
        pred_classes = jnp.argmax(cls_preds, axis=-1) + 1
        decoded = coder.decode(box_preds, batch["point_coords"],
                               pred_classes)
        batch["batch_cls_preds"] = jnp.where(
            valid[..., None], cls_preds, -1e9)
        batch["batch_box_preds"] = decoded[..., :7]
        batch["cls_preds_normalized"] = False
        return batch


def _make_coder(cfg):
    bc = cfg["TARGET_CONFIG"]["BOX_CODER_CONFIG"]
    return PointResidualCoder(
        use_mean_size=bool(bc.get("use_mean_size", True)),
        mean_size=tuple(tuple(m) for m in bc.get("mean_size", ())),
    )


def assign_point_targets(points, points_valid, gt_boxes_with_cls, coder,
                         extra_width=(0.2, 0.2, 0.2), binary=True):
    """Vmapped assign_stack_targets (point_head_template.py:49-131) with
    set_ignore_flag: labels fg/0/-1 (fg is 1 when `binary`, else the
    containing box's class — num_class > 1 semantics), box residual
    targets at fg points. points (B, P, 3)."""
    ew = tuple(float(e) for e in extra_width)

    def one(pts, pvalid, gt):
        boxes = gt[:, :7]
        gcls = gt[:, -1].astype(jnp.int32)
        gvalid = gcls > 0
        idx = points_in_boxes_index(pts, boxes, boxes_mask=gvalid)  # (P,)
        fg = (idx >= 0) & pvalid
        ext = enlarge_box3d(boxes, ew)
        idx_ext = points_in_boxes_index(pts, ext, boxes_mask=gvalid)
        ignore = fg ^ ((idx_ext >= 0) & pvalid)
        fg_label = 1 if binary else gcls[jnp.clip(idx, 0)]
        labels = jnp.where(fg, fg_label, 0)
        labels = jnp.where(ignore, -1, labels)

        safe = jnp.clip(idx, 0)
        gt_of_pts = boxes[safe]
        cls_of_pts = gcls[safe]
        enc = coder.encode(gt_of_pts, pts, cls_of_pts)  # (P, code)
        enc = jnp.where(fg[:, None], enc, 0.0)
        return labels, enc

    return jax.vmap(one)(points, points_valid, gt_boxes_with_cls)


def point_head_box_loss(out_batch, model_cfg):
    """get_cls_layer_loss + get_box_layer_loss (point_head_template.py:
    133-192) over the fork's binary point labels."""
    cfg = model_cfg
    coder = _make_coder(cfg)
    labels, box_targets = assign_point_targets(
        out_batch["point_coords"], out_batch["point_valid"],
        out_batch["gt_boxes"], coder,
        extra_width=tuple(cfg["TARGET_CONFIG"].get(
            "GT_EXTRA_WIDTH", (0.2, 0.2, 0.2))),
    )
    cls_preds = out_batch["point_cls_preds"]     # (B, P, 1)
    box_preds = out_batch["point_box_preds_enc"]
    valid = out_batch["point_valid"]
    lw = cfg["LOSS_CONFIG"]["LOSS_WEIGHTS"]

    pos = (labels > 0) & valid
    neg = (labels == 0) & valid
    cls_w = (neg + 1.0 * pos).astype(jnp.float32)
    pos_norm = jnp.sum(pos.astype(jnp.float32))
    cls_w = cls_w / jnp.clip(pos_norm, 1.0)
    onehot = pos.astype(jnp.float32)[..., None]  # (B, P, 1)
    cls_loss = jnp.sum(
        L.sigmoid_focal_loss(cls_preds, onehot, weights=cls_w)
    ) * float(lw["point_cls_weight"])

    code_w = jnp.asarray(
        lw.get("code_weights", [1.0] * box_preds.shape[-1]), jnp.float32)
    reg_w = pos.astype(jnp.float32) / jnp.clip(pos_norm, 1.0)
    diff = L.smooth_l1(box_preds - box_targets, beta=1.0 / 9.0)
    reg_loss = jnp.sum(
        diff * code_w[None, None, :] * reg_w[..., None]
    ) * float(lw["point_box_weight"])

    total = cls_loss + reg_loss
    return total, {"point_loss_cls": cls_loss, "point_loss_box": reg_loss,
                   "point_pos_num": pos_norm}


class PointHeadBoxWPseudos(nn.Module):
    """Open-vocab PointRCNN-style stage-1 head
    (pcdet/models/dense_heads/point_head_box_w_pseudo.py:7-271): the full
    class space (num_class pinned to the ALL_CLASS_NAMES size), multi-class
    point labels from the containing box, and training targets drawn from
    KNOWN-class gt (relabeled into full label space) merged with the padded
    seeker pseudo boxes the data pipeline supplies (`pseudo_boxes` — the
    functional equivalent of the reference's per-frame .pth loads)."""

    model_cfg: Any
    input_channels: int
    num_class: int = 10

    @nn.compact
    def __call__(self, batch, train: bool):
        cfg = self.model_cfg
        n_cls = len(cfg.get("ALL_CLASS_NAMES",
                            [None] * self.num_class))
        feats = batch["point_features"]
        valid = batch["point_valid"]
        coder = _make_coder(cfg)

        cls_preds = _fc_stack("cls", cfg["CLS_FC"], n_cls, feats, valid,
                              train)
        box_preds = _fc_stack("reg", cfg["REG_FC"], coder.code_size, feats,
                              valid, train)
        batch["point_cls_preds"] = cls_preds
        batch["point_box_preds_enc"] = box_preds
        batch["point_cls_scores"] = jax.nn.sigmoid(
            jnp.max(cls_preds, axis=-1))
        pred_classes = jnp.argmax(cls_preds, axis=-1) + 1
        decoded = coder.decode(box_preds, batch["point_coords"],
                               pred_classes)
        batch["batch_cls_preds"] = jnp.where(
            valid[..., None], cls_preds, -1e9)
        batch["batch_box_preds"] = decoded[..., :7]
        batch["cls_preds_normalized"] = False
        return batch


def _relabel_known_to_full(gt_boxes, known_names, all_names):
    """gt label i (1-indexed into KNOWN_CLASS_NAMES) -> full-space label
    (point_head_box_w_pseudo.py:52-71)."""
    import numpy as np

    lut = np.zeros(len(known_names) + 1, np.int32)
    for i, kn in enumerate(known_names):
        lut[i + 1] = list(all_names).index(kn) + 1
    labels = gt_boxes[..., -1].astype(jnp.int32)
    new = jnp.asarray(lut)[jnp.clip(labels, 0, len(known_names))]
    return jnp.concatenate(
        [gt_boxes[..., :-1], new[..., None].astype(gt_boxes.dtype)], -1)


def point_head_box_w_pseudo_loss(out_batch, model_cfg):
    """Full-space multi-class point cls + box loss over gt (relabeled) +
    pseudo boxes (point_head_box_w_pseudo.py:181-226)."""
    cfg = model_cfg
    coder = _make_coder(cfg)
    all_names = list(cfg["ALL_CLASS_NAMES"])
    known_names = list(cfg["KNOWN_CLASS_NAMES"])
    n_cls = len(all_names)

    gt = _relabel_known_to_full(out_batch["gt_boxes"], known_names,
                                all_names)
    if "pseudo_boxes" in out_batch:
        pb = out_batch["pseudo_boxes"]
        gt = jnp.concatenate([gt, pb[..., : gt.shape[-1]]], axis=1)

    labels, box_targets = assign_point_targets(
        out_batch["point_coords"], out_batch["point_valid"], gt, coder,
        extra_width=tuple(cfg["TARGET_CONFIG"].get(
            "GT_EXTRA_WIDTH", (0.2, 0.2, 0.2))),
        binary=False,
    )
    cls_preds = out_batch["point_cls_preds"]     # (B, P, n_cls)
    box_preds = out_batch["point_box_preds_enc"]
    valid = out_batch["point_valid"]
    lw = cfg["LOSS_CONFIG"]["LOSS_WEIGHTS"]

    pos = (labels > 0) & valid
    neg = (labels == 0) & valid
    cls_w = (neg + 1.0 * pos).astype(jnp.float32)
    pos_norm = jnp.sum(pos.astype(jnp.float32))
    cls_w = cls_w / jnp.clip(pos_norm, 1.0)
    onehot = jax.nn.one_hot(jnp.clip(labels, 0, n_cls), n_cls + 1)[..., 1:]
    cls_loss = jnp.sum(
        L.sigmoid_focal_loss(cls_preds, onehot, weights=cls_w)
    ) * float(lw["point_cls_weight"])

    code_w = jnp.asarray(
        lw.get("code_weights", [1.0] * box_preds.shape[-1]), jnp.float32)
    reg_w = pos.astype(jnp.float32) / jnp.clip(pos_norm, 1.0)
    diff = L.smooth_l1(box_preds - box_targets, beta=1.0 / 9.0)
    reg_loss = jnp.sum(
        diff * code_w[None, None, :] * reg_w[..., None]
    ) * float(lw["point_box_weight"])

    total = cls_loss + reg_loss
    return total, {"point_loss_cls": cls_loss, "point_loss_box": reg_loss,
                   "point_pos_num": pos_norm}

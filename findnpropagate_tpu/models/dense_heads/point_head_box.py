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
                         extra_width=(0.2, 0.2, 0.2)):
    """Vmapped assign_stack_targets (point_head_template.py:49-131) with
    set_ignore_flag: labels 1/0/-1 (fg / bg / ignore ring), box residual
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
        labels = jnp.where(fg, 1, 0)
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

"""PointIntraPartOffsetHead — per-point segmentation + intra-object part
location head (Part-A2 stage 1).

Behavioral parity with pcdet/models/dense_heads/point_intra_part_head.py
:8-160 and point_head_template.py:49-171 (/root/reference): cls FC stack
(multi-class labels from the containing gt box, ignore ring from
GT_EXTRA_WIDTH), part FC stack regressing the canonical in-box position
((R(-yaw)(p - c)) / dims + 0.5 in [0, 1]^3, BCE loss over foreground
points), sigmoid focal cls loss normalized by positives.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils import losses as L
from ...utils.geometry import (
    enlarge_box3d,
    points_in_boxes_index,
    rotate_points_along_z,
)
from .point_head_box import _fc_stack


class PointIntraPartOffsetHead(nn.Module):
    model_cfg: Any
    input_channels: int
    num_class: int = 3

    @nn.compact
    def __call__(self, batch, train: bool):
        cfg = self.model_cfg
        feats = batch["point_features"]
        valid = batch["point_valid"]
        cls_preds = _fc_stack("cls", cfg.get("CLS_FC", []), self.num_class,
                              feats, valid, train)
        part_preds = _fc_stack("part", cfg.get("PART_FC", []), 3,
                               feats, valid, train)
        batch["point_cls_preds"] = cls_preds
        batch["point_part_preds"] = part_preds
        batch["point_cls_scores"] = jax.nn.sigmoid(
            jnp.max(cls_preds, axis=-1))
        batch["point_part_offset"] = jax.nn.sigmoid(part_preds)
        if "REG_FC" in cfg:
            # PartA2_free: the anchor-free stage-1 also regresses per-point
            # boxes that the ROI head consumes as proposals (reference
            # point_intra_part_head.py:23-33, box_layers + the
            # generate_predicted_boxes path of point_head_template.py)
            from .point_head_box import _make_coder

            coder = _make_coder(cfg)
            box_preds = _fc_stack("reg", cfg["REG_FC"], coder.code_size,
                                  feats, valid, train)
            batch["point_box_preds_enc"] = box_preds
            pred_classes = jnp.argmax(cls_preds, axis=-1) + 1
            decoded = coder.decode(box_preds, batch["point_coords"],
                                   pred_classes)
            batch["batch_cls_preds"] = jnp.where(
                valid[..., None], cls_preds, -1e9)
            batch["batch_box_preds"] = decoded[..., :7]
            batch["cls_preds_normalized"] = False
        return batch


def assign_part_targets(points, points_valid, gt_boxes_with_cls,
                        extra_width=(0.2, 0.2, 0.2)):
    """Vmapped assign_stack_targets with ret_part_labels
    (point_head_template.py:49-131): labels (B, P) in {-1, 0, 1..C}, part
    targets (B, P, 3) in [0, 1]."""
    ew = tuple(float(e) for e in extra_width)

    def one(pts, pvalid, gt):
        boxes = gt[:, :7]
        gcls = gt[:, -1].astype(jnp.int32)
        gvalid = gcls > 0
        idx = points_in_boxes_index(pts, boxes, boxes_mask=gvalid)
        fg = (idx >= 0) & pvalid
        ext = enlarge_box3d(boxes, ew)
        idx_ext = points_in_boxes_index(pts, ext, boxes_mask=gvalid)
        ignore = fg ^ ((idx_ext >= 0) & pvalid)
        safe = jnp.clip(idx, 0)
        labels = jnp.where(fg, gcls[safe], 0)
        labels = jnp.where(ignore, -1, labels)

        box_of = boxes[safe]                     # (P, 7)
        local = rotate_points_along_z(
            (pts - box_of[:, :3])[:, None, :], -box_of[:, 6]
        )[:, 0]
        part = local / jnp.clip(box_of[:, 3:6], 1e-5) + 0.5
        part = jnp.where(fg[:, None], part, 0.0)
        return labels, part

    return jax.vmap(one)(points, points_valid, gt_boxes_with_cls)


def point_part_head_loss(out_batch, model_cfg, num_class):
    """get_cls_layer_loss + get_part_layer_loss (point_head_template.py:
    133-171)."""
    cfg = model_cfg
    labels, part_targets = assign_part_targets(
        out_batch["point_coords"], out_batch["point_valid"],
        out_batch["gt_boxes"],
        extra_width=tuple(cfg["TARGET_CONFIG"].get(
            "GT_EXTRA_WIDTH", (0.2, 0.2, 0.2))),
    )
    cls_preds = out_batch["point_cls_preds"]     # (B, P, C)
    part_preds = out_batch["point_part_preds"]
    valid = out_batch["point_valid"]
    lw = cfg["LOSS_CONFIG"]["LOSS_WEIGHTS"]

    pos = (labels > 0) & valid
    neg = (labels == 0) & valid
    cls_w = (neg + 1.0 * pos).astype(jnp.float32)
    pos_norm = jnp.sum(pos.astype(jnp.float32))
    cls_w = cls_w / jnp.clip(pos_norm, 1.0)
    onehot = jax.nn.one_hot(
        jnp.clip(labels, 0, num_class) , num_class + 1)[..., 1:]
    cls_loss = jnp.sum(
        L.sigmoid_focal_loss(cls_preds, onehot, weights=cls_w)
    ) * float(lw["point_cls_weight"])

    part_bce = L.sigmoid_cross_entropy_with_logits(part_preds, part_targets)
    part_loss = jnp.sum(
        jnp.sum(part_bce, axis=-1) * pos.astype(jnp.float32)
    ) / (3 * jnp.clip(pos_norm, 1.0)) * float(lw["point_part_weight"])

    total = cls_loss + part_loss
    return total, {"point_loss_cls": cls_loss, "point_loss_part": part_loss,
                   "point_pos_num": pos_norm}

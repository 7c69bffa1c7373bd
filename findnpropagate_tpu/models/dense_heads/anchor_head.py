"""AnchorHeadSingle: 1x1-conv anchor-based detection head + losses + decode.

Behavioral parity with pcdet/models/dense_heads/anchor_head_single.py:7-77 and
anchor_head_template.py:100-272 (/root/reference): class/box/direction conv
branches; sigmoid-focal cls loss with per-sample positive normalization;
smooth-L1 box loss with sin-difference heading and code weights; direction-bin
CE; decode with direction-bin snapping.

Split TPU-style: the flax module owns only parameters (convs) and decode;
target assignment and losses are pure functions on `AnchorHeadTools` (they
depend on cfg + static anchors, not parameters), so the train step composes
them without entering module context.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...utils import losses as L
from ...utils.box_coders import ResidualCoder
from ...utils.geometry import limit_period
from .anchor_generator import generate_anchors
from .target_assigner import assign_targets


def _build_anchors(model_cfg, grid_size, point_cloud_range):
    return generate_anchors(
        model_cfg["ANCHOR_GENERATOR_CONFIG"], grid_size, point_cloud_range
    )


def _dir_params(model_cfg):
    return (
        float(model_cfg.get("DIR_OFFSET", 0.78539)),
        float(model_cfg.get("DIR_LIMIT_OFFSET", 0.0)),
        int(model_cfg.get("NUM_DIR_BINS", 2)),
    )


class AnchorHeadSingle(nn.Module):
    model_cfg: Any
    input_channels: int
    num_class: int
    class_names: tuple
    grid_size: tuple
    point_cloud_range: tuple
    voxel_size: tuple = ()
    predict_boxes_when_training: bool = True

    def setup(self):
        cfg = self.model_cfg
        anchors, num_per_loc, _, _, _ = _build_anchors(
            cfg, self.grid_size, self.point_cloud_range
        )
        self._flat_anchors = anchors.reshape(-1, anchors.shape[-1])
        self.box_coder = ResidualCoder(
            code_size=int(cfg.get("BOX_CODER_CONFIG", {}).get("code_size", 7)),
            encode_angle_by_sincos=bool(cfg.get("BOX_CODER_CONFIG", {}).get(
                "encode_angle_by_sincos", False)),
        )
        code = self.box_coder.full_code_size
        self.conv_cls = nn.Conv(
            num_per_loc * self.num_class, (1, 1),
            bias_init=nn.initializers.constant(-np.log((1 - 0.01) / 0.01)),
        )
        self.conv_box = nn.Conv(
            num_per_loc * code, (1, 1),
            kernel_init=nn.initializers.normal(0.001),
        )
        self.use_dir = bool(cfg.get("USE_DIRECTION_CLASSIFIER", False))
        if self.use_dir:
            self.conv_dir = nn.Conv(
                num_per_loc * int(cfg["NUM_DIR_BINS"]), (1, 1)
            )

    def __call__(self, batch, train: bool):
        x = batch["spatial_features_2d"]  # (B, H, W, C)
        b = x.shape[0]
        code = self.box_coder.full_code_size

        cls_preds = self.conv_cls(x).reshape(b, -1, self.num_class)
        box_preds = self.conv_box(x).reshape(b, -1, code)
        batch["cls_preds"] = cls_preds
        batch["box_preds"] = box_preds
        dir_preds = None
        if self.use_dir:
            dir_preds = self.conv_dir(x).reshape(
                b, -1, int(self.model_cfg["NUM_DIR_BINS"])
            )
            batch["dir_cls_preds"] = dir_preds
        if (not train) or self.predict_boxes_when_training:
            anchors = jnp.asarray(self._flat_anchors)[None]
            boxes = self.box_coder.decode(box_preds, anchors)
            if dir_preds is not None:
                dir_offset, dir_limit_offset, num_bins = _dir_params(self.model_cfg)
                dir_labels = jnp.argmax(dir_preds, axis=-1)
                period = 2 * np.pi / num_bins
                dir_rot = limit_period(
                    boxes[..., 6] - dir_offset, dir_limit_offset, period
                )
                heading = dir_rot + dir_offset + period * dir_labels.astype(boxes.dtype)
                boxes = boxes.at[..., 6].set(heading)
            batch["batch_cls_preds"] = cls_preds
            batch["batch_box_preds"] = boxes
            batch["cls_preds_normalized"] = False
        return batch


@dataclass(frozen=True)
class AnchorHeadTools:
    """Pure target-assignment + loss for an anchor head (no parameters)."""

    model_cfg: Any
    num_class: int
    anchors: np.ndarray         # (N, 7)
    anchor_class: np.ndarray    # (N,)
    matched_t: np.ndarray
    unmatched_t: np.ndarray
    coder: ResidualCoder

    def assign(self, gt_boxes):
        tac = self.model_cfg.get("TARGET_ASSIGNER_CONFIG", {})
        return assign_targets(
            jnp.asarray(self.anchors),
            jnp.asarray(self.anchor_class),
            jnp.asarray(self.matched_t),
            jnp.asarray(self.unmatched_t),
            gt_boxes,
            coder=self.coder,
            match_height=bool(tac.get("MATCH_HEIGHT", False)),
            norm_by_num_examples=bool(tac.get("NORM_BY_NUM_EXAMPLES", False)),
        )

    def compute_loss(self, out_batch):
        targets = self.assign(out_batch["gt_boxes"])
        return self.loss(out_batch, targets)

    def loss(self, out_batch, targets):
        cfg = self.model_cfg
        lw = cfg["LOSS_CONFIG"]["LOSS_WEIGHTS"]
        cls_preds = out_batch["cls_preds"]
        box_preds = out_batch["box_preds"]
        labels = targets["box_cls_labels"]
        reg_targets = targets["box_reg_targets"]
        reg_weights_t = targets["reg_weights"]

        cared = labels >= 0
        positives = labels > 0
        negatives = labels == 0
        cls_weights = (negatives | positives).astype(jnp.float32)
        pos_normalizer = jnp.clip(
            jnp.sum(positives, axis=1, keepdims=True).astype(jnp.float32), 1.0
        )
        reg_weights = reg_weights_t / pos_normalizer
        cls_weights = cls_weights / pos_normalizer

        cls_targets = jnp.where(cared, labels, 0)
        one_hot = jax.nn.one_hot(cls_targets, self.num_class + 1)[..., 1:]
        cls_loss = L.sigmoid_focal_loss(cls_preds, one_hot, cls_weights)
        batch_size = cls_preds.shape[0]
        cls_loss = jnp.sum(cls_loss) / batch_size * float(lw["cls_weight"])

        bp_sin, rt_sin = _add_sin_difference(box_preds, reg_targets)
        loc_loss = L.weighted_smooth_l1_loss(
            bp_sin, rt_sin, reg_weights, code_weights=lw.get("code_weights")
        )
        loc_loss = jnp.sum(loc_loss) / batch_size * float(lw["loc_weight"])

        tb = {"rpn_loss_cls": cls_loss, "rpn_loss_loc": loc_loss}
        total = cls_loss + loc_loss

        if "dir_cls_preds" in out_batch:
            dir_offset, _, num_bins = _dir_params(cfg)
            anchors = jnp.asarray(self.anchors)[None]
            rot_gt = reg_targets[..., 6] + anchors[..., 6]
            offset_rot = limit_period(rot_gt - dir_offset, 0, 2 * np.pi)
            dir_targets = jnp.clip(
                jnp.floor(offset_rot / (2 * np.pi / num_bins)).astype(jnp.int32),
                0, num_bins - 1,
            )
            dir_one_hot = jax.nn.one_hot(dir_targets, num_bins)
            w = positives.astype(jnp.float32)
            w = w / jnp.clip(jnp.sum(w, axis=-1, keepdims=True), 1.0)
            dir_loss = L.weighted_cross_entropy_loss(
                out_batch["dir_cls_preds"], dir_one_hot, w
            )
            dir_loss = jnp.sum(dir_loss) / batch_size * float(lw["dir_weight"])
            total = total + dir_loss
            tb["rpn_loss_dir"] = dir_loss

        tb["rpn_loss"] = total
        return total, tb


def make_anchor_head_tools(model_cfg, num_class, grid_size, point_cloud_range):
    anchors, _, cls_slots, matched, unmatched = _build_anchors(
        model_cfg, grid_size, point_cloud_range
    )
    # per-location arrays (A,) -> per-anchor (ny*nx*A,) in (y, x, a) order
    locs = anchors.shape[0] * anchors.shape[1]
    return AnchorHeadTools(
        model_cfg=model_cfg,
        num_class=num_class,
        anchors=anchors.reshape(-1, anchors.shape[-1]),
        anchor_class=np.tile(cls_slots, locs),
        matched_t=np.tile(matched, locs),
        unmatched_t=np.tile(unmatched, locs),
        coder=ResidualCoder(
            code_size=int(model_cfg.get("BOX_CODER_CONFIG", {}).get("code_size", 7)),
            encode_angle_by_sincos=bool(model_cfg.get("BOX_CODER_CONFIG", {}).get(
                "encode_angle_by_sincos", False)),
        ),
    )


def _add_sin_difference(boxes1, boxes2, dim: int = 6):
    rad_pred = jnp.sin(boxes1[..., dim : dim + 1]) * jnp.cos(boxes2[..., dim : dim + 1])
    rad_tg = jnp.cos(boxes1[..., dim : dim + 1]) * jnp.sin(boxes2[..., dim : dim + 1])
    b1 = jnp.concatenate(
        [boxes1[..., :dim], rad_pred, boxes1[..., dim + 1 :]], axis=-1
    )
    b2 = jnp.concatenate([boxes2[..., :dim], rad_tg, boxes2[..., dim + 1 :]], axis=-1)
    return b1, b2

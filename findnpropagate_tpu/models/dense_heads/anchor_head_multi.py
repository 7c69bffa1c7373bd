"""AnchorHeadMulti — grouped multi-head anchor detection head.

Behavioral parity with pcdet/models/dense_heads/anchor_head_multi.py:9-373
(/root/reference): a shared conv feeds one SingleHead per class group
(RPN_HEAD_CFGS / HEAD_CLS_NAME); each head owns a small conv tower plus
cls/box(+dir) branches over its OWN classes' anchor slots (optionally with
SEPARATE_REG_CONFIG per-attribute regression branches).

TPU redesign: instead of per-head loss bookkeeping with head_label_indices,
each head's logits scatter into ONE global (B, N_anchors, num_class) tensor
(off-head class columns pinned to a large negative constant — sigmoid ~= 0,
zero gradient), so the shared AnchorHeadTools target assignment, losses and
decode apply unchanged. Requires each RPN head's classes to appear in
CLASS_NAMES order (true for every reference multi-head config).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ...utils.box_coders import ResidualCoder
from ...utils.geometry import limit_period
from .anchor_head import _build_anchors, _dir_params

NEG_FILL = -20.0  # sigmoid(-20) ~ 2e-9: off-head class columns


class AnchorHeadMulti(nn.Module):
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
        anchors, num_per_loc, class_slots, _, _ = _build_anchors(
            cfg, self.grid_size, self.point_cloud_range)
        self._flat_anchors = anchors.reshape(-1, anchors.shape[-1])
        self._num_per_loc = int(num_per_loc)
        self._class_slots = np.asarray(class_slots)
        self.box_coder = ResidualCoder(
            code_size=int(cfg.get("BOX_CODER_CONFIG", {}).get("code_size", 7)))
        code = self.box_coder.full_code_size

        shared_ch = int(cfg.get("SHARED_CONV_NUM_FILTER", 64))
        self.shared_conv = nn.Conv(shared_ch, (3, 3), padding="SAME",
                                   use_bias=False)
        self.shared_bn = nn.BatchNorm()

        names = list(self.class_names)
        head_groups = []
        heads = []
        for hi, rpn_cfg in enumerate(cfg["RPN_HEAD_CFGS"]):
            group = [names.index(n) for n in rpn_cfg["HEAD_CLS_NAME"]]
            head_groups.append(group)
            slots = np.where(np.isin(self._class_slots, group))[0]
            n_slots = len(slots)
            n_cls = len(group)
            tower = []
            for li in range(int(cfg.get("NUM_MIDDLE_CONV", 1))):
                tower.append((
                    nn.Conv(shared_ch, (3, 3), padding="SAME",
                            use_bias=False, name=f"h{hi}_mid{li}"),
                    nn.BatchNorm(name=f"h{hi}_mid{li}_bn")))
            conv_cls = nn.Conv(
                n_slots * n_cls, (1, 1),
                bias_init=nn.initializers.constant(
                    -np.log((1 - 0.01) / 0.01)),
                name=f"h{hi}_cls")
            conv_box = nn.Conv(
                n_slots * code, (1, 1),
                kernel_init=nn.initializers.normal(0.001),
                name=f"h{hi}_box")
            conv_dir = None
            if bool(cfg.get("USE_DIRECTION_CLASSIFIER", False)):
                conv_dir = nn.Conv(
                    n_slots * int(cfg["NUM_DIR_BINS"]), (1, 1),
                    name=f"h{hi}_dir")
            heads.append((tower, conv_cls, conv_box, conv_dir))
        self.heads = heads
        self.head_groups = head_groups

    def __call__(self, batch, train: bool):
        cfg = self.model_cfg
        x = batch["spatial_features_2d"]
        b, h, w, _ = x.shape
        x = nn.relu(self.shared_bn(self.shared_conv(x),
                                   use_running_average=not train))
        code = self.box_coder.full_code_size
        a = self._num_per_loc
        n_dir = int(cfg.get("NUM_DIR_BINS", 2))
        use_dir = bool(cfg.get("USE_DIRECTION_CLASSIFIER", False))

        cls_full = jnp.full((b, h * w, a, self.num_class), NEG_FILL)
        box_full = jnp.zeros((b, h * w, a, code))
        dir_full = jnp.zeros((b, h * w, a, n_dir)) if use_dir else None
        for hi, ((tower, conv_cls, conv_box, conv_dir), group) in enumerate(
                zip(self.heads, self.head_groups)):
            y = x
            for conv, bn in tower:
                y = nn.relu(bn(conv(y), use_running_average=not train))
            slots = np.where(np.isin(self._class_slots, group))[0]
            n_slots = len(slots)
            n_cls = len(group)
            cls_h = conv_cls(y).reshape(b, h * w, n_slots, n_cls)
            box_h = conv_box(y).reshape(b, h * w, n_slots, code)
            cls_full = cls_full.at[:, :, slots[:, None],
                                   np.asarray(group)[None, :]].set(cls_h)
            box_full = box_full.at[:, :, slots].set(box_h)
            if use_dir:
                dir_h = conv_dir(y).reshape(b, h * w, n_slots, n_dir)
                dir_full = dir_full.at[:, :, slots].set(dir_h)

        cls_preds = cls_full.reshape(b, -1, self.num_class)
        box_preds = box_full.reshape(b, -1, code)
        batch["cls_preds"] = cls_preds
        batch["box_preds"] = box_preds
        dir_preds = None
        if use_dir:
            dir_preds = dir_full.reshape(b, -1, n_dir)
            batch["dir_cls_preds"] = dir_preds
        if (not train) or self.predict_boxes_when_training:
            anchors = jnp.asarray(self._flat_anchors)[None]
            boxes = self.box_coder.decode(box_preds, anchors)
            if dir_preds is not None:
                dir_offset, dir_limit_offset, num_bins = _dir_params(cfg)
                dir_labels = jnp.argmax(dir_preds, axis=-1)
                period = 2 * np.pi / num_bins
                dir_rot = limit_period(
                    boxes[..., 6] - dir_offset, dir_limit_offset, period)
                boxes = boxes.at[..., 6].set(
                    dir_rot + dir_offset
                    + period * dir_labels.astype(boxes.dtype))
            batch["batch_cls_preds"] = cls_preds
            batch["batch_box_preds"] = boxes
            batch["cls_preds_normalized"] = False
        return batch

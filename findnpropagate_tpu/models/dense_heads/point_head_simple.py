"""PointHeadSimple — keypoint foreground segmentation (PV-RCNN aux head).

Parity target: pcdet/models/dense_heads/point_head_simple.py
(/root/reference): cls FC stack over the pre-fusion keypoint features;
targets = point-in-(gt box extended by GT_EXTRA_WIDTH); sigmoid focal cls
loss; predicted scores weight the keypoint features for the ROI head
(point_cls_scores).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils import losses as L
from ...utils.geometry import points_in_boxes_mask
from ..blocks import MaskedBatchNorm


class PointHeadSimple(nn.Module):
    model_cfg: Any
    input_channels: int

    @nn.compact
    def __call__(self, batch, train: bool):
        cfg = self.model_cfg
        feats = batch["point_features_before_fusion"] \
            if bool(cfg.get("USE_POINT_FEATURES_BEFORE_FUSION", True)) \
            else batch["point_features"]
        valid = batch["point_valid"]
        x = feats
        for i, ch in enumerate(cfg["CLS_FC"]):
            x = nn.Dense(int(ch), use_bias=False, name=f"cls_fc{i}")(x)
            x = MaskedBatchNorm(int(ch), name=f"cls_bn{i}")(x, valid, train)
            x = nn.relu(x)
        logits = nn.Dense(1, name="cls_out")(x)           # (B, K, 1)
        batch["point_cls_logits"] = logits
        batch["point_cls_scores"] = jax.nn.sigmoid(logits)[..., 0]
        return batch


def point_head_loss(out_batch, loss_cfg, extra_width=(0.2, 0.2, 0.2)):
    """Sigmoid focal segmentation loss on keypoints
    (point_head_template.assign_stack_targets + get_cls_layer_loss)."""
    logits = out_batch["point_cls_logits"][..., 0]     # (B, K)
    kp = out_batch["point_coords"]                     # (B, K, 3)
    valid = out_batch["point_valid"]
    gt = out_batch["gt_boxes"]                         # (B, G, 8)
    ew = jnp.asarray(extra_width, jnp.float32)

    def one(kpts, g):
        boxes = g[:, :7]
        boxes = boxes.at[:, 3:6].add(ew)
        gvalid = g[:, 7] > 0
        inside = points_in_boxes_mask(kpts, boxes)     # (G, K)
        inside = inside & gvalid[:, None]
        return jnp.any(inside, axis=0)                 # (K,)

    fg = jax.vmap(one)(kp, gt)
    targets = fg.astype(jnp.float32)
    w = valid.astype(jnp.float32)
    pos = jnp.sum(targets * w)
    w = w / jnp.clip(pos, 1.0)
    per = L.sigmoid_focal_loss(
        logits.reshape(-1, 1), targets.reshape(-1, 1), w.reshape(-1))
    loss = jnp.sum(per) * float(
        loss_cfg["LOSS_WEIGHTS"].get("point_cls_weight", 1.0))
    return loss, {"point_loss_cls": loss}

"""SECONDHead — IoU-scoring second stage over rotated-BEV grid pooling
(SECOND-IoU).

Parity target: pcdet/models/roi_heads/second_head.py (/root/reference):
class-agnostic proposal NMS, ROI sampling, rotated affine grid pooling of
spatial_features_2d (affine_grid + grid_sample align_corners=True,
second_head.py:64-121 — reproduced here as direct bilinear sampling of the
rotated ROI grid), shared 1x1-conv FCs, an IoU logit per ROI, and a BCE
IoU loss against the IoU-guided soft labels.

TPU design: fully batched/vmapped, fixed ROI counts from NMS_CONFIG, masked
BN over valid ROIs.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..blocks import MaskedBatchNorm
from .roi_head_template import proposal_layer, sample_rois_for_rcnn


def rotated_bev_grid_sample(feat, rois, grid_size, pc_range, bev_stride,
                            voxel_size):
    """feat (H, W, C) = (ny, nx, C); rois (M, 7). Bilinear-samples a
    grid_size x grid_size rotated grid per ROI with zero padding, matching
    torch affine_grid/grid_sample align_corners=True semantics."""
    h, w, c = feat.shape
    m = rois.shape[0]
    g = grid_size
    # ROI extents in feature-pixel units (second_head.py:88-92)
    cx = (rois[:, 0] - pc_range[0]) / (voxel_size[0] * bev_stride)
    cy = (rois[:, 1] - pc_range[1]) / (voxel_size[1] * bev_stride)
    dx = rois[:, 3] / (voxel_size[0] * bev_stride)
    dy = rois[:, 4] / (voxel_size[1] * bev_stride)
    cosa, sina = jnp.cos(rois[:, 6]), jnp.sin(rois[:, 6])

    lin = jnp.linspace(-1.0, 1.0, g)
    xo = jnp.broadcast_to(lin[None, :], (g, g))  # along W of the output grid
    yo = jnp.broadcast_to(lin[:, None], (g, g))  # along H
    px = cx[:, None, None] + (dx / 2)[:, None, None] * (
        cosa[:, None, None] * xo - sina[:, None, None] * yo)
    py = cy[:, None, None] + (dy / 2)[:, None, None] * (
        sina[:, None, None] * xo + cosa[:, None, None] * yo)

    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    wx = px - x0
    wy = py - y0

    def tap(yi, xi):
        ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = feat[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(ok[..., None], v, 0.0)

    out = (
        tap(y0, x0) * ((1 - wx) * (1 - wy))[..., None]
        + tap(y0, x0 + 1) * (wx * (1 - wy))[..., None]
        + tap(y0 + 1, x0) * ((1 - wx) * wy)[..., None]
        + tap(y0 + 1, x0 + 1) * (wx * wy)[..., None]
    )
    return out.reshape(m, g * g * c)


class SECONDHead(nn.Module):
    model_cfg: Any
    point_cloud_range: tuple
    voxel_size: tuple
    num_class: int = 1

    @nn.compact
    def __call__(self, batch, train: bool):
        cfg = self.model_cfg
        nms_cfg = cfg["NMS_CONFIG"]["TRAIN" if train else "TEST"]

        cls_preds = batch["batch_cls_preds"]   # (B, N, C)
        box_preds = batch["batch_box_preds"]   # (B, N, 7)
        rois, roi_scores, roi_labels, roi_valid = jax.vmap(
            lambda c, b: proposal_layer(c, b, nms_cfg)
        )(cls_preds, box_preds)

        targets = None
        if train:
            rng = self.make_rng("sampling")
            gt = batch["gt_boxes"]             # (B, G, 8) last col = label
            gt_boxes = gt[..., :7]
            gt_labels = gt[..., -1].astype(jnp.int32)
            gt_valid = gt_labels > 0
            rngs = jax.random.split(rng, rois.shape[0])
            targets = jax.vmap(
                lambda r, ro, sc, la, va, gb, gl, gv: sample_rois_for_rcnn(
                    r, ro, sc, la, va, gb, gl, gv, cfg["TARGET_CONFIG"])
            )(rngs, rois, roi_scores, roi_labels, roi_valid,
              gt_boxes, gt_labels, gt_valid)
            rois = targets["rois"]
            roi_labels = targets["roi_labels"]
            roi_valid = targets["roi_valid"]

        # rotated BEV grid pooling (stop-gradient like the reference detach)
        feat = jax.lax.stop_gradient(batch["spatial_features_2d"])
        rois_sg = jax.lax.stop_gradient(rois)
        g = int(cfg["ROI_GRID_POOL"]["GRID_SIZE"])
        stride = int(cfg["ROI_GRID_POOL"]["DOWNSAMPLE_RATIO"])
        pooled = jax.vmap(
            lambda f, r: rotated_bev_grid_sample(
                f, r, g, tuple(self.point_cloud_range),
                stride, tuple(self.voxel_size))
        )(feat, rois_sg)                        # (B, M, g*g*C)

        x = pooled
        for k, nf in enumerate(cfg["SHARED_FC"]):
            x = nn.Dense(int(nf), use_bias=False, name=f"shared_fc{k}")(x)
            x = MaskedBatchNorm(int(nf), name=f"shared_bn{k}")(
                x, roi_valid, train)
            x = nn.relu(x)
            if k != len(cfg["SHARED_FC"]) - 1 and float(
                    cfg.get("DP_RATIO", 0)) > 0:
                x = nn.Dropout(float(cfg["DP_RATIO"]),
                               deterministic=not train)(x)
        for k, nf in enumerate(cfg["IOU_FC"]):
            x = nn.Dense(int(nf), use_bias=False, name=f"iou_fc{k}")(x)
            x = MaskedBatchNorm(int(nf), name=f"iou_bn{k}")(
                x, roi_valid, train)
            x = nn.relu(x)
        rcnn_iou = nn.Dense(1, name="iou_out")(x)  # (B, M, 1)

        batch["rois"] = rois
        batch["roi_scores"] = roi_scores if not train else targets["roi_scores"]
        batch["roi_labels"] = roi_labels
        batch["roi_valid"] = roi_valid
        batch["rcnn_iou"] = rcnn_iou
        if train:
            batch["rcnn_targets"] = {
                "rcnn_cls_labels": targets["rcnn_cls_labels"],
                "reg_valid_mask": targets["reg_valid_mask"],
                "gt_iou_of_rois": targets["gt_iou_of_rois"],
            }
        else:
            # second_head.py:142-146: stage-2 scores, stage-1 boxes
            batch["batch_cls_preds"] = rcnn_iou
            batch["batch_box_preds"] = rois
            batch["batch_roi_labels"] = roi_labels
            batch["cls_preds_normalized"] = False
            batch["stage1_scores"] = batch["roi_scores"]
        return batch


ROI_HEAD_REGISTRY = {
    "SECONDHead": SECONDHead,
}


def rcnn_iou_loss(out_batch, loss_cfg):
    """BCE/L2/smoothL1 IoU loss (second_head.py:153-175)."""
    rcnn_iou = out_batch["rcnn_iou"].reshape(-1)
    labels = out_batch["rcnn_targets"]["rcnn_cls_labels"].reshape(-1)
    valid = (labels >= 0).astype(jnp.float32)
    kind = str(loss_cfg.get("IOU_LOSS", "BinaryCrossEntropy"))
    if kind == "BinaryCrossEntropy":
        p = jnp.clip(jax.nn.sigmoid(rcnn_iou), 1e-7, 1 - 1e-7)
        per = -(labels * jnp.log(p) + (1 - labels) * jnp.log(1 - p))
    elif kind == "L2":
        per = (rcnn_iou - labels) ** 2
    else:  # smoothL1
        d = jnp.abs(rcnn_iou - labels)
        per = jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)
    loss = jnp.sum(per * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    w = float(loss_cfg["LOSS_WEIGHTS"].get("rcnn_iou_weight", 1.0))
    return loss * w, {"rcnn_loss_iou": loss * w}

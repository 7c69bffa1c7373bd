"""PartA2FCHead — part-aggregation ROI head.

Behavioral parity with pcdet/models/roi_heads/partA2_head.py:10-222
(/root/reference): ROI-aware pooling of the part features (part offsets +
detached seg score, zeroed below SEG_MASK_SCORE_THRESH; AVG pool) and the
U-Net point features (MAX pool) into POOL_SIZE^3 grids; two sparse-conv
stems merge them; a stride-2 sparse max-pool downsamples the grid before the
shared/cls/reg FC towers with the RoIHeadTemplate losses.

TPU design: the pooled per-ROI grids are small and dense-ish, so the sparse
stems run as dense 3x3x3 convs MASKED to the occupied cells — numerically
identical to submanifold convs (inactive cells hold zeros and outputs are
re-masked), with no hash tables.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.roi_pool import roiaware_pool3d
from ..blocks import MaskedBatchNorm
from .roi_head_template import (
    canonicalize_gt_of_rois,
    generate_predicted_boxes,
    proposal_layer,
    sample_rois_for_rcnn,
)


class _MaskedConv3dStack(nn.Module):
    """Chain of dense 3x3x3 convs masked to the occupancy set (== subm)."""

    channels: tuple
    name_prefix: str = "conv"

    @nn.compact
    def __call__(self, x, occ, valid_roi, train: bool):
        """x (N, ox, oy, oz, C); occ (N, ox, oy, oz) bool."""
        for i, ch in enumerate(self.channels):
            x = nn.Conv(int(ch), (3, 3, 3), padding="SAME", use_bias=False,
                        name=f"{self.name_prefix}{i}")(x)
            x = jnp.where(occ[..., None], x, 0.0)
            n, ox, oy, oz, c = x.shape
            flat = x.reshape(n, ox * oy * oz, c)
            m = (occ.reshape(n, -1)) & valid_roi[:, None]
            flat = MaskedBatchNorm(int(ch), name=f"{self.name_prefix}{i}_bn")(
                flat, m, train)
            x = nn.relu(flat).reshape(n, ox, oy, oz, c)
            x = jnp.where(occ[..., None], x, 0.0)
        return x


class PartA2FCHead(nn.Module):
    model_cfg: Any
    point_cloud_range: tuple
    voxel_size: tuple
    num_class: int = 1

    @nn.compact
    def __call__(self, batch, train: bool):
        cfg = self.model_cfg
        nms_cfg = cfg["NMS_CONFIG"]["TRAIN" if train else "TEST"]

        cls_preds = batch["batch_cls_preds"]
        box_preds = batch["batch_box_preds"]
        rois, roi_scores, roi_labels, roi_valid = jax.vmap(
            lambda c, b: proposal_layer(c, b, nms_cfg)
        )(cls_preds, box_preds)

        targets = None
        if train:
            rng = self.make_rng("sampling")
            gt = batch["gt_boxes"]
            rngs = jax.random.split(rng, rois.shape[0])
            targets = jax.vmap(
                lambda r, ro, sc, la, va, gb, gl, gv: sample_rois_for_rcnn(
                    r, ro, sc, la, va, gb, gl, gv, cfg["TARGET_CONFIG"])
            )(rngs, rois, roi_scores, roi_labels, roi_valid,
              gt[..., :7], gt[..., -1].astype(jnp.int32), gt[..., -1] > 0)
            rois = targets["rois"]
            roi_labels = targets["roi_labels"]
            roi_valid = targets["roi_valid"]

        pool_cfg = cfg["ROI_AWARE_POOL"]
        ps = int(pool_cfg["POOL_SIZE"])
        seg_thresh = float(cfg.get("SEG_MASK_SCORE_THRESH", 0.3))

        pts = jax.lax.stop_gradient(batch["point_coords"])  # (B, V, 3)
        pvalid = batch["point_valid"]
        seg = jax.lax.stop_gradient(batch["point_cls_scores"])  # (B, V)
        part = batch["point_part_offset"]                       # (B, V, 3)
        part = jnp.where((seg >= seg_thresh)[..., None], part, 0.0)
        part_feats = jnp.concatenate([part, seg[..., None]], axis=-1)
        rpn_feats = batch["point_features"]
        rois_sg = jax.lax.stop_gradient(rois)

        pooled_part = jax.vmap(
            lambda r, p, f, m: roiaware_pool3d(
                r, p, f, m, out_size=(ps, ps, ps), pool="avg")
        )(rois_sg, pts, part_feats, pvalid)   # (B, R, ps,ps,ps, 4)
        pooled_rpn = jax.vmap(
            lambda r, p, f, m: roiaware_pool3d(
                r, p, f, m, out_size=(ps, ps, ps), pool="max")
        )(rois_sg, pts, rpn_feats, pvalid)

        b, r = roi_valid.shape
        part_g = pooled_part.reshape((b * r, ps, ps, ps, -1))
        rpn_g = pooled_rpn.reshape((b * r, ps, ps, ps, -1))
        # occupancy = cells with any pooled part mass (partA2_head.py:186:
        # sparse idx from part features sum > 0)
        occ = jnp.sum(jnp.abs(part_g), axis=-1) > 0
        rv = roi_valid.reshape(-1)

        c0 = int(pool_cfg["NUM_FEATURES"]) // 2
        part_x = _MaskedConv3dStack((64, c0), name="conv_part")(
            part_g, occ, rv, train)
        rpn_x = _MaskedConv3dStack((64, c0), name="conv_rpn")(
            rpn_g, occ, rv, train)
        merged = jnp.concatenate([rpn_x, part_x], axis=-1)

        # sparse max-pool stride 2 (partA2_head.py:191-194)
        pooled = nn.max_pool(merged, (2, 2, 2), strides=(2, 2, 2))
        flat = pooled.reshape(b, r, -1)

        def tower(name, channels, x):
            for i, ch in enumerate(channels):
                x = nn.Dense(int(ch), use_bias=False,
                             name=f"{name}_fc{i}")(x)
                x = MaskedBatchNorm(int(ch), name=f"{name}_bn{i}")(
                    x, roi_valid, train)
                x = nn.relu(x)
            return x

        shared = tower("shared", cfg["SHARED_FC"], flat)
        xc = tower("cls", cfg["CLS_FC"], shared)
        rcnn_cls = nn.Dense(1, name="cls_out")(xc)
        xr = tower("reg", cfg["REG_FC"], shared)
        rcnn_reg = nn.Dense(
            7, kernel_init=nn.initializers.normal(0.001), name="reg_out")(xr)

        batch["rois"] = rois
        batch["roi_labels"] = roi_labels
        batch["roi_valid"] = roi_valid
        batch["rcnn_cls"] = rcnn_cls
        batch["rcnn_reg"] = rcnn_reg
        if train:
            gt_ct = jax.vmap(canonicalize_gt_of_rois)(
                rois, targets["gt_of_rois_src"][..., :7])
            batch["rcnn_targets"] = {
                "rcnn_cls_labels": targets["rcnn_cls_labels"],
                "reg_valid_mask": targets["reg_valid_mask"],
                "gt_of_rois": gt_ct,
                "gt_of_rois_src": targets["gt_of_rois_src"],
            }
        else:
            from ...utils.box_coders import ResidualCoder

            coder = ResidualCoder()
            decoded = jax.vmap(
                lambda ro, rg: generate_predicted_boxes(ro, rg, coder)
            )(rois, rcnn_reg)
            batch["batch_cls_preds"] = rcnn_cls
            batch["batch_box_preds"] = decoded
            batch["batch_roi_labels"] = roi_labels
            batch["cls_preds_normalized"] = False
            batch["rcnn_iou"] = rcnn_cls
        return batch


def parta2_rcnn_loss(out_batch, loss_cfg):
    from .pvrcnn_head import pvrcnn_rcnn_loss

    return pvrcnn_rcnn_loss(out_batch, loss_cfg)

"""PVRCNNHead — keypoint-pooled two-stage refinement head.

Parity target: pcdet/models/roi_heads/pvrcnn_head.py (/root/reference):
6x6x6 ROI grid points (get_dense_grid_points:124-132, rotated+shifted to
global), MSG ball query of the grid points into the weighted keypoint
features (roi_grid_pool:64-109, keypoint features scaled by
point_cls_scores), shared FCs, separate cls/reg branches, smooth-L1
canonical-residual regression with corner-loss regularization and BCE
IoU-guided classification (all via roi_head_template helpers).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...utils.geometry import rotate_points_along_z
from ..blocks import MaskedBatchNorm
from ..pfe.voxel_set_abstraction import SALayer
from .roi_head_template import (
    canonicalize_gt_of_rois,
    generate_predicted_boxes,
    proposal_layer,
    sample_rois_for_rcnn,
)


def roi_grid_points(rois, grid_size: int):
    """(R, 7) -> (R, G^3, 3) global grid points (pvrcnn_head.py:111-132)."""
    g = grid_size
    idx = np.stack(np.meshgrid(np.arange(g), np.arange(g), np.arange(g),
                               indexing="ij"), -1).reshape(-1, 3)
    idx = jnp.asarray(idx, jnp.float32)                    # (G3, 3) xyz idx
    local = (idx[None] + 0.5) / g * rois[:, None, 3:6] \
        - rois[:, None, 3:6] / 2
    rotated = rotate_points_along_z(local, rois[:, 6])
    return rotated + rois[:, None, 0:3]


class PVRCNNHead(nn.Module):
    model_cfg: Any
    point_cloud_range: tuple
    voxel_size: tuple
    num_class: int = 1

    @nn.compact
    def __call__(self, batch, train: bool):
        cfg = self.model_cfg
        nms_cfg = cfg["NMS_CONFIG"]["TRAIN" if train else "TEST"]

        targets = None
        if "rois" in batch:
            # PV-RCNN++: the RoIProposalStage already proposed + sampled
            rois = batch["rois"]
            roi_labels = batch["roi_labels"]
            roi_valid = batch["roi_valid"]
            targets = batch.get("roi_targets")
        else:
            cls_preds = batch["batch_cls_preds"]
            box_preds = batch["batch_box_preds"]
            rois, roi_scores, roi_labels, roi_valid = jax.vmap(
                lambda c, b: proposal_layer(c, b, nms_cfg)
            )(cls_preds, box_preds)

            if train:
                rng = self.make_rng("sampling")
                gt = batch["gt_boxes"]
                rngs = jax.random.split(rng, rois.shape[0])
                targets = jax.vmap(
                    lambda r, ro, sc, la, va, gb, gl, gv:
                    sample_rois_for_rcnn(
                        r, ro, sc, la, va, gb, gl, gv, cfg["TARGET_CONFIG"])
                )(rngs, rois, roi_scores, roi_labels, roi_valid,
                  gt[..., :7], gt[..., -1].astype(jnp.int32),
                  gt[..., -1] > 0)
                rois = targets["rois"]
                roi_labels = targets["roi_labels"]
                roi_valid = targets["roi_valid"]

        # ---- ROI grid pooling over weighted keypoints (roi_grid_pool) ----
        kp = jax.lax.stop_gradient(batch["point_coords"])     # (B, K, 3)
        kp_valid = batch["point_valid"]
        kp_feats = batch["point_features"] \
            * batch["point_cls_scores"][..., None]
        g = int(cfg["ROI_GRID_POOL"]["GRID_SIZE"])
        rois_sg = jax.lax.stop_gradient(rois)
        grid_pts = jax.vmap(
            lambda r: roi_grid_points(r, g)
        )(rois_sg)                                            # (B, R, G3, 3)
        b, r, g3, _ = grid_pts.shape
        sa = SALayer(
            mlps=tuple(tuple(m) for m in cfg["ROI_GRID_POOL"]["MLPS"]),
            radii=tuple(cfg["ROI_GRID_POOL"]["POOL_RADIUS"]),
            nsamples=tuple(cfg["ROI_GRID_POOL"]["NSAMPLE"]),
            name="roi_grid_pool",
        )
        gp = grid_pts.reshape(b, r * g3, 3)
        gp_valid = jnp.repeat(roi_valid, g3, axis=1)
        pooled = sa(gp, gp_valid, kp, kp_valid, kp_feats, train)  # (B,RG3,C)
        pooled = pooled.reshape(b, r, g3 * pooled.shape[-1])

        x = pooled
        for i, ch in enumerate(cfg["SHARED_FC"]):
            x = nn.Dense(int(ch), use_bias=False, name=f"shared_fc{i}")(x)
            x = MaskedBatchNorm(int(ch), name=f"shared_bn{i}")(
                x, roi_valid, train)
            x = nn.relu(x)
            if i == 0 and float(cfg.get("DP_RATIO", 0)) > 0:
                x = nn.Dropout(float(cfg["DP_RATIO"]),
                               deterministic=not train)(x)
        xc = x
        for i, ch in enumerate(cfg["CLS_FC"]):
            xc = nn.Dense(int(ch), use_bias=False, name=f"cls_fc{i}")(xc)
            xc = MaskedBatchNorm(int(ch), name=f"cls_bn{i}")(
                xc, roi_valid, train)
            xc = nn.relu(xc)
        rcnn_cls = nn.Dense(1, name="cls_out")(xc)            # (B, R, 1)
        xr = x
        for i, ch in enumerate(cfg["REG_FC"]):
            xr = nn.Dense(int(ch), use_bias=False, name=f"reg_fc{i}")(xr)
            xr = MaskedBatchNorm(int(ch), name=f"reg_bn{i}")(
                xr, roi_valid, train)
            xr = nn.relu(xr)
        rcnn_reg = nn.Dense(7, name="reg_out")(xr)            # (B, R, 7)

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
            batch["rcnn_iou"] = rcnn_cls  # two-stage post-processing path
        return batch


def pvrcnn_rcnn_loss(out_batch, loss_cfg):
    """Template cls+reg losses over the stored targets."""
    from ...utils.box_coders import ResidualCoder
    from .roi_head_template import rcnn_cls_loss, rcnn_reg_loss

    t = out_batch["rcnn_targets"]
    cls_loss, tb = rcnn_cls_loss(out_batch["rcnn_cls"],
                                 t["rcnn_cls_labels"], loss_cfg)
    coder = ResidualCoder()
    b = out_batch["rois"].shape[0]
    reg_total = 0.0
    tb_reg = {}
    reg_loss, tb_reg = jax.vmap(
        lambda rois, reg, gct, gsrc, rv: rcnn_reg_loss(
            reg, rois, gct, gsrc, rv, loss_cfg, coder)
    )(out_batch["rois"], out_batch["rcnn_reg"], t["gt_of_rois"],
      t["gt_of_rois_src"], t["reg_valid_mask"])
    reg_loss = jnp.mean(reg_loss)
    tb = dict(tb)
    tb.update({k: jnp.mean(v) for k, v in tb_reg.items()})
    tb["rcnn_loss"] = cls_loss + reg_loss
    return cls_loss + reg_loss, tb

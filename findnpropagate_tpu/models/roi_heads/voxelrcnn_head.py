"""VoxelRCNNHead — ROI refinement pooled from multi-scale sparse voxels.

Behavioral parity with pcdet/models/roi_heads/voxelrcnn_head.py:8-262
(/root/reference): 6x6x6 ROI grid points, per-source neighbor pooling over
the x_conv2/3/4 sparse voxel features (voxel centers via
common_utils.get_voxel_centers: (coord + 0.5) * voxel_size * stride + pcr),
concatenated across sources, then shared/cls/reg FC towers with the
RoIHeadTemplate losses.

TPU redesign: the CUDA NeighborVoxelSAModuleMSG (voxel-window hash query) is
replaced by masked radius grouping over the fixed-capacity active lists —
the same neighborhoods the voxel query bounds, computed as dense masked
distance tiles on the MXU (ops/pointnet2.query_and_group via SALayer).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..blocks import MaskedBatchNorm
from ..pfe.voxel_set_abstraction import SALayer
from .pvrcnn_head import roi_grid_points
from .roi_head_template import (
    canonicalize_gt_of_rois,
    generate_predicted_boxes,
    proposal_layer,
    sample_rois_for_rcnn,
)

LEVEL_STRIDES = {"x_conv1": 1, "x_conv2": 2, "x_conv3": 4, "x_conv4": 8}


def level_voxel_centers(level, stride, voxel_size, pc_range):
    """win/sparse level -> (B, V, 3) xyz centers + (B, V) valid."""
    kind, a, m = level
    if kind == "win":
        _, coords, valid, feats = a
    elif kind == "sparse":
        coords, valid, feats = a.coords, a.valid, m
    else:
        raise ValueError("VoxelRCNN pooling needs a sparse/windowed level")
    xyz = jnp.stack([
        (coords[..., 2].astype(jnp.float32) + 0.5) * voxel_size[0] * stride
        + pc_range[0],
        (coords[..., 1].astype(jnp.float32) + 0.5) * voxel_size[1] * stride
        + pc_range[1],
        (coords[..., 0].astype(jnp.float32) + 0.5) * voxel_size[2] * stride
        + pc_range[2],
    ], axis=-1)
    return xyz, valid, feats


class VoxelRCNNHead(nn.Module):
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

        pool_cfg = cfg["ROI_GRID_POOL"]
        g = int(pool_cfg["GRID_SIZE"])
        rois_sg = jax.lax.stop_gradient(rois)
        grid_pts = jax.vmap(lambda r: roi_grid_points(r, g))(rois_sg)
        b, r, g3, _ = grid_pts.shape
        gp = grid_pts.reshape(b, r * g3, 3)
        gp_valid = jnp.repeat(roi_valid, g3, axis=1)

        ms = batch["multi_scale_3d_features"]
        pooled_parts = []
        for si, src_name in enumerate(pool_cfg["FEATURES_SOURCE"]):
            lcfg = pool_cfg["POOL_LAYERS"][src_name]
            stride = LEVEL_STRIDES[src_name]
            xyz, valid, feats = level_voxel_centers(
                ms[src_name], stride, self.voxel_size, self.point_cloud_range)
            sa = SALayer(
                mlps=tuple(tuple(m) for m in lcfg["MLPS"]),
                radii=tuple(float(x) for x in lcfg["POOL_RADIUS"]),
                nsamples=tuple(int(x) for x in lcfg["NSAMPLE"]),
                name=f"pool_{src_name}",
            )
            pooled_parts.append(sa(gp, gp_valid, xyz, valid, feats, train))
        pooled = jnp.concatenate(pooled_parts, axis=-1)  # (B, R*G3, C)
        pooled = pooled.reshape(b, r, g3 * pooled.shape[-1])

        def tower(name, channels, x):
            for i, ch in enumerate(channels):
                x = nn.Dense(int(ch), use_bias=False,
                             name=f"{name}_fc{i}")(x)
                x = MaskedBatchNorm(int(ch), name=f"{name}_bn{i}")(
                    x, roi_valid, train)
                x = nn.relu(x)
                if i != len(channels) - 1 and float(
                        cfg.get("DP_RATIO", 0)) > 0:
                    x = nn.Dropout(float(cfg["DP_RATIO"]),
                                   deterministic=not train)(x)
            return x

        shared = tower("shared", cfg["SHARED_FC"], pooled)
        xc = tower("cls", cfg["CLS_FC"], shared)
        rcnn_cls = nn.Dense(
            1, kernel_init=nn.initializers.normal(0.01), name="cls_out")(xc)
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


def voxelrcnn_rcnn_loss(out_batch, loss_cfg):
    from .pvrcnn_head import pvrcnn_rcnn_loss

    return pvrcnn_rcnn_loss(out_batch, loss_cfg)

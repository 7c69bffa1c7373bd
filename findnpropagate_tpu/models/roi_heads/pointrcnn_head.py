"""PointRCNNHead — canonical point-cloud ROI refinement head.

Behavioral parity with pcdet/models/roi_heads/pointrcnn_head.py:10-179
(/root/reference): ROI-point pooling (first NUM_SAMPLED_POINTS in-box points
with score+depth prefix channels), canonical transform into each ROI's
frame, xyz-up + merge-down 1x1 convs, a 3-level single-scale SA stack
(128 -> 32 -> all), then cls/reg FC branches with the shared
RoIHeadTemplate losses (BCE IoU cls + smooth-L1 canonical residuals +
corner regularization).

TPU design: fixed-capacity pooled point sets per ROI (vmapped over B x R);
the SA stack reuses ops/pointnet2.py primitives.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.pointnet2 import farthest_point_sample, query_and_group
from ...ops.roi_pool import roipoint_pool3d
from ...utils.geometry import rotate_points_along_z
from ..blocks import MaskedBatchNorm
from .roi_head_template import (
    canonicalize_gt_of_rois,
    generate_predicted_boxes,
    proposal_layer,
    sample_rois_for_rcnn,
)


class _MLP1x1(nn.Module):
    channels: tuple
    use_bn: bool = False

    @nn.compact
    def __call__(self, x, valid, train: bool):
        for i, ch in enumerate(self.channels):
            x = nn.Dense(int(ch), use_bias=not self.use_bn,
                         name=f"fc{i}")(x)
            if self.use_bn:
                x = MaskedBatchNorm(int(ch), name=f"bn{i}")(x, valid, train)
            x = nn.relu(x)
        return x


class _SASingle(nn.Module):
    """PointnetSAModule (single-scale): FPS (or all-points group when
    npoint == -1) + ball query + MLP + max."""

    npoint: int
    radius: float
    nsample: int
    mlp: tuple
    use_bn: bool = False

    @nn.compact
    def __call__(self, xyz, mask, feats, train: bool):
        if self.npoint > 0:
            def centers_one(x, m):
                idx = farthest_point_sample(x, m, self.npoint)
                return x[idx], jnp.arange(self.npoint) < jnp.sum(m)

            new_xyz, new_mask = jax.vmap(centers_one)(xyz, mask)

            def group_one(cx, cm, x, m, f):
                return query_and_group(cx, cm, x, m, f, float(self.radius),
                                       int(self.nsample), use_xyz=True)

            grouped, cnt = jax.vmap(group_one)(new_xyz, new_mask, xyz, mask,
                                               feats)
            b, m_, s, c = grouped.shape
            h = _MLP1x1(self.mlp, use_bn=self.use_bn, name="mlp")(
                grouped.reshape(b, m_ * s, c),
                jnp.repeat(new_mask, s, axis=1), train).reshape(b, m_, s, -1)
            h = jnp.where((cnt > 0)[..., None, None], h, 0.0)
            out = jnp.max(h, axis=2)
            return new_xyz, new_mask, jnp.where(new_mask[..., None], out, 0.0)
        # group-all: one output "point" per set
        rel = xyz - jnp.where(
            jnp.any(mask, 1, keepdims=True)[..., None],
            jnp.sum(xyz * mask[..., None], 1, keepdims=True)
            / jnp.clip(jnp.sum(mask, 1, keepdims=True)[..., None], 1), 0.0)
        g = jnp.concatenate([rel, feats], axis=-1)
        b, s, c = g.shape
        h = _MLP1x1(self.mlp, use_bn=self.use_bn, name="mlp")(
            g, mask, train)
        h = jnp.where(mask[..., None], h, -jnp.inf)
        out = jnp.max(h, axis=1, keepdims=True)          # (B, 1, C)
        out = jnp.where(jnp.any(mask, 1)[:, None, None], out, 0.0)
        return (jnp.zeros((b, 1, 3), xyz.dtype),
                jnp.any(mask, axis=1)[:, None], out)


class PointRCNNHead(nn.Module):
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

        # ---- ROI point pooling with score/depth prefix (roipool3d_gpu) ----
        pool_cfg = cfg["ROI_POINT_POOL"]
        num_sampled = int(pool_cfg["NUM_SAMPLED_POINTS"])
        depth_norm = float(pool_cfg["DEPTH_NORMALIZER"])
        ew = [float(e) for e in pool_cfg.get("POOL_EXTRA_WIDTH",
                                             (0.0, 0.0, 0.0))]
        pts = jax.lax.stop_gradient(batch["point_coords"])    # (B, P, 3)
        pts_valid = batch["point_valid"]
        scores = jax.lax.stop_gradient(batch["point_cls_scores"])
        depths = jnp.linalg.norm(pts, axis=-1) / depth_norm - 0.5
        feats_all = jnp.concatenate(
            [scores[..., None], depths[..., None], batch["point_features"]],
            axis=-1)

        rois_sg = jax.lax.stop_gradient(rois)
        pool_rois = rois_sg.at[..., 3:6].add(jnp.asarray(ew)) \
            if any(ew) else rois_sg

        def pool_one(r, p, f, m):
            return roipoint_pool3d(r, p, f, m, num_sampled=num_sampled)

        pooled, empty = jax.vmap(pool_one)(
            pool_rois, pts, feats_all, pts_valid)  # (B, R, S, 3+2+C), (B, R)

        # canonical transform (pointrcnn_head.py:120-131)
        b, r, s, c = pooled.shape
        local = pooled[..., 0:3] - rois_sg[..., None, 0:3]
        local = jax.vmap(
            lambda lp, ang: rotate_points_along_z(lp, -ang)
        )(local.reshape(b * r, s, 3), rois_sg[..., 6].reshape(b * r))
        pooled = jnp.concatenate(
            [local.reshape(b, r, s, 3), pooled[..., 3:]], axis=-1)
        ok = (~empty) & roi_valid
        pooled = jnp.where(ok[..., None, None], pooled, 0.0)

        # xyz-up + merge-down (1x1 convs over the sampled points)
        use_bn = bool(cfg.get("USE_BN", False))
        n_prefix = 5  # xyz + score + depth
        flat_valid = jnp.repeat(ok.reshape(b * r, 1), s, axis=1)
        xyz_in = pooled[..., :n_prefix].reshape(b * r, s, n_prefix)
        xyz_feat = _MLP1x1(tuple(cfg["XYZ_UP_LAYER"]), use_bn=use_bn,
                           name="xyz_up")(xyz_in, flat_valid, train)
        pt_feat = pooled[..., n_prefix:].reshape(b * r, s, -1)
        merged = jnp.concatenate([xyz_feat, pt_feat], axis=-1)
        merged = _MLP1x1((int(cfg["XYZ_UP_LAYER"][-1]),), use_bn=use_bn,
                         name="merge_down")(merged, flat_valid, train)

        # SA stack over the canonical in-ROI points
        sa_cfg = cfg["SA_CONFIG"]
        xyz = pooled[..., :3].reshape(b * r, s, 3)
        mask = flat_valid
        feats = merged
        for k, npoint in enumerate(sa_cfg["NPOINTS"]):
            sa = _SASingle(
                npoint=int(npoint),
                radius=float(sa_cfg["RADIUS"][k]),
                nsample=int(sa_cfg["NSAMPLE"][k]),
                mlp=tuple(int(ch) for ch in sa_cfg["MLPS"][k]),
                use_bn=use_bn, name=f"sa{k}")
            xyz, mask, feats = sa(xyz, mask, feats, train)

        shared = feats.reshape(b, r, -1)                   # (B, R, C)
        roi_ok = ok
        xc = _MLP1x1(tuple(cfg["CLS_FC"]), use_bn=True, name="cls_fc")(
            shared, roi_ok, train)
        rcnn_cls = nn.Dense(1, name="cls_out")(xc)
        xr = _MLP1x1(tuple(cfg["REG_FC"]), use_bn=True, name="reg_fc")(
            shared, roi_ok, train)
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


def pointrcnn_rcnn_loss(out_batch, loss_cfg):
    """Shared template losses (same composition as PV-RCNN)."""
    from .pvrcnn_head import pvrcnn_rcnn_loss

    return pvrcnn_rcnn_loss(out_batch, loss_cfg)

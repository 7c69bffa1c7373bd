"""TransFusionHead — the primary trainable head (TransFusion-LiDAR).

Behavioral parity with pcdet/models/dense_heads/transfusion_head.py:58-728
(/root/reference): shared conv -> class heatmap -> maxpool-NMS query
initialization (top NUM_PROPOSALS across classes) -> category embedding ->
one transformer decoder layer cross-attending the flattened BEV -> separate
regression heads; Hungarian-matched targets with gaussian heatmap supervision;
sigmoid-focal cls + L1 bbox losses; decode with per-query heatmap-score
blending.

TPU redesign: NHWC layout; the query top-k / gather pipeline is one
fixed-shape program; Hungarian matching runs ON DEVICE (ops/lap.py) instead
of a scipy host sync; per-sample target building is vmapped; inference
returns fixed-size Detections (mask + count, no ragged lists).

Open-vocab hooks (USE_PSEUDO / unknown down-weighting, transfusion_head.py:
330-332,460-461,562-590) integrate via `unknown_labels` + the loss's
unknown_cls_weight / unknown_code_weights, with the PseudoProcessor merge
living in the openvocab subsystem.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.lap import solve_lap
from ...ops.rotated_iou import boxes_overlap_bev
from ...utils import losses as L
from ..blocks import BN_KW
from ..model_utils.centernet import draw_heatmap, gaussian_radius
from ..model_utils.transformer import TransformerDecoderLayer
from ..post_processing import Detections


class SeparateHead(nn.Module):
    """SeparateHead_Transfusion (transfusion_head.py:20-54): per-output-name
    1x1-conv stacks over per-query features."""

    head_dict: Any
    head_channels: int = 64
    init_bias: float = -2.19
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        # x: (B, P, C)
        out = {}
        for name, spec in self.head_dict.items():
            h = x
            for k in range(int(spec["num_conv"]) - 1):
                h = nn.Dense(self.head_channels, use_bias=self.use_bias,
                             name=f"{name}_fc{k}")(h)
                h = nn.BatchNorm(use_running_average=not train, **BN_KW,
                                 name=f"{name}_bn{k}")(h)
                h = nn.relu(h)
            bias_init = (
                nn.initializers.constant(self.init_bias)
                if "hm" in name or name == "heatmap"
                else nn.initializers.zeros
            )
            out[name] = nn.Dense(
                int(spec["out_channels"]), bias_init=bias_init,
                name=f"{name}_out",
            )(h)
        return out


class TransFusionHead(nn.Module):
    model_cfg: Any
    input_channels: int
    num_class: int
    class_names: tuple
    grid_size: tuple           # (nx, ny, nz)
    point_cloud_range: tuple
    voxel_size: tuple = ()
    predict_boxes_when_training: bool = False

    def setup(self):
        cfg = self.model_cfg
        self.num_classes = int(cfg.get("NUM_CLASSES", self.num_class))
        self.hidden = int(cfg["HIDDEN_CHANNEL"])
        self.num_proposals = int(cfg["NUM_PROPOSALS"])
        self.nms_kernel_size = int(cfg.get("NMS_KERNEL_SIZE", 3))
        self.stride = int(cfg["TARGET_ASSIGNER_CONFIG"].get("FEATURE_MAP_STRIDE", 8))
        self.dataset_name = cfg["TARGET_ASSIGNER_CONFIG"].get("DATASET", "nuScenes")

        self.shared_conv = nn.Conv(self.hidden, (3, 3), padding="SAME")
        self.hm_block_conv = nn.Conv(
            self.hidden, (3, 3), padding="SAME",
            use_bias=bool(cfg.get("USE_BIAS_BEFORE_NORM", False)),
        )
        self.hm_block_bn = nn.BatchNorm(**BN_KW)
        self.hm_out = nn.Conv(
            self.num_classes, (3, 3), padding="SAME",
            bias_init=nn.initializers.constant(-2.19),
        )
        self.class_encoding = nn.Dense(self.hidden)
        self.decoder = TransformerDecoderLayer(
            d_model=self.hidden,
            nhead=int(cfg["NUM_HEADS"]),
            dim_feedforward=int(cfg["FFN_CHANNEL"]),
            dropout=float(cfg.get("DROPOUT", 0.1)),
        )
        heads = dict(cfg["SEPARATE_HEAD_CFG"]["HEAD_DICT"])
        heads["heatmap"] = {
            "out_channels": self.num_classes,
            "num_conv": int(cfg.get("NUM_HM_CONV", 2)),
        }
        self.prediction_head = SeparateHead(
            head_dict=heads,
            use_bias=bool(cfg.get("USE_BIAS_BEFORE_NORM", False)),
        )
        self.head_order = tuple(cfg["SEPARATE_HEAD_CFG"]["HEAD_ORDER"])

    def _flat_kernel1_classes(self):
        """Classes whose query-init NMS uses kernel 1 (transfusion_head.py:
        265-283): nuScenes pedestrian/traffic_cone (8, 9), Waymo (1, 2),
        kitti small classes."""
        if self.dataset_name == "nuScenes" and self.num_classes == 10:
            return (8, 9)
        if self.dataset_name == "Waymo":
            return (1, 2)
        if self.dataset_name == "kitti":
            return tuple(
                i for i, n in enumerate(self.class_names)
                if n in ("Pedestrian", "Person_Sitting", "Cyclist")
            )
        return ()

    def __call__(self, batch, train: bool):
        feats = batch["spatial_features_2d"]  # (B, H, W, Cin)
        b, h, w, _ = feats.shape
        lidar_feat = self.shared_conv(feats)  # (B, H, W, hidden)
        lidar_flat = lidar_feat.reshape(b, h * w, self.hidden)

        hm = self.hm_block_conv(lidar_feat)
        hm = self.hm_block_bn(hm, use_running_average=not train)
        hm = nn.relu(hm)
        dense_heatmap = self.hm_out(hm)  # (B, H, W, C)

        heatmap = jax.nn.sigmoid(jax.lax.stop_gradient(dense_heatmap))
        pad = self.nms_kernel_size // 2
        inner = nn.max_pool(
            heatmap, (self.nms_kernel_size, self.nms_kernel_size),
            strides=(1, 1), padding="VALID",
        )
        local_max = jnp.zeros_like(heatmap)
        local_max = local_max.at[:, pad : h - pad, pad : w - pad, :].set(inner)
        for ci in self._flat_kernel1_classes():
            local_max = local_max.at[..., ci].set(heatmap[..., ci])
        heatmap = heatmap * (heatmap == local_max)

        # top NUM_PROPOSALS across classes; flatten as (C, H*W) to keep the
        # reference's class = idx // (H*W) convention
        hm_chw = jnp.transpose(heatmap, (0, 3, 1, 2)).reshape(b, -1)  # (B, C*H*W)
        _, top = jax.lax.top_k(hm_chw, self.num_proposals)
        query_class = (top // (h * w)).astype(jnp.int32)   # (B, P)
        query_index = (top % (h * w)).astype(jnp.int32)    # (B, P) = y*W + x

        query_feat = jnp.take_along_axis(
            lidar_flat, query_index[..., None], axis=1
        )  # (B, P, hidden)
        one_hot = jax.nn.one_hot(query_class, self.num_classes)
        query_feat = query_feat + self.class_encoding(one_hot)

        ys = (query_index // w).astype(jnp.float32) + 0.5
        xs = (query_index % w).astype(jnp.float32) + 0.5
        query_pos = jnp.stack([xs, ys], axis=-1)  # (B, P, 2) xy

        yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
        bev_pos = jnp.stack(
            [xx.reshape(-1) + 0.5, yy.reshape(-1) + 0.5], axis=-1
        ).astype(jnp.float32)
        bev_pos = jnp.broadcast_to(bev_pos[None], (b, h * w, 2))

        query_feat = self.decoder(query_feat, lidar_flat, query_pos, bev_pos,
                                  train=train)
        res = self.prediction_head(query_feat, train)
        res["center"] = res["center"] + query_pos

        hm_masked_flat = jnp.transpose(heatmap, (0, 3, 1, 2)).reshape(
            b, self.num_classes, h * w
        )
        res["query_heatmap_score"] = jnp.take_along_axis(
            hm_masked_flat,
            query_index[:, None, :].repeat(self.num_classes, axis=1),
            axis=2,
        ).transpose(0, 2, 1)  # (B, P, C)
        res["dense_heatmap"] = dense_heatmap
        res["query_labels"] = query_class

        batch["transfusion_preds"] = res
        return batch


# ----------------------------------------------------------------- pure tools

@dataclass(frozen=True)
class TransFusionTools:
    """Target assignment, loss and decode — parameter-free pure functions."""

    model_cfg: Any
    num_classes: int
    grid_size: tuple
    point_cloud_range: tuple
    voxel_size: tuple
    class_names: tuple = ()
    unknown_labels: tuple = ()  # 1-indexed labels treated as pseudo/unknown
    relabel_lut: tuple = ()     # known-label -> full-label LUT (index 0 = 0)

    @property
    def code_size(self):
        return len(self.model_cfg["LOSS_CONFIG"]["LOSS_WEIGHTS"]["code_weights"])

    @property
    def stride(self):
        return int(self.model_cfg["TARGET_ASSIGNER_CONFIG"].get(
            "FEATURE_MAP_STRIDE", 8))

    def decode_boxes(self, res):
        """res dict -> (B, P, 7 or 9) world boxes (transfusion decode_bbox)."""
        pcr = self.point_cloud_range
        vx, vy = float(self.voxel_size[0]), float(self.voxel_size[1])
        center = res["center"]
        x = center[..., 0] * self.stride * vx + float(pcr[0])
        y = center[..., 1] * self.stride * vy + float(pcr[1])
        z = res["height"][..., 0]
        dims = jnp.exp(res["dim"])
        rot = jnp.arctan2(res["rot"][..., 0], res["rot"][..., 1])
        parts = [x[..., None], y[..., None], z[..., None], dims, rot[..., None]]
        if "vel" in res:
            parts.append(res["vel"])
        return jnp.concatenate(parts, axis=-1)

    def encode_gt(self, gt_boxes):
        """(M, 7+) world gt -> (M, code) targets (transfusion encode_bbox)."""
        pcr = self.point_cloud_range
        vx, vy = float(self.voxel_size[0]), float(self.voxel_size[1])
        out = [
            (gt_boxes[:, 0] - float(pcr[0])) / (self.stride * vx),
            (gt_boxes[:, 1] - float(pcr[1])) / (self.stride * vy),
            gt_boxes[:, 2],
            jnp.log(jnp.clip(gt_boxes[:, 3], 1e-5)),
            jnp.log(jnp.clip(gt_boxes[:, 4], 1e-5)),
            jnp.log(jnp.clip(gt_boxes[:, 5], 1e-5)),
            jnp.sin(gt_boxes[:, 6]),
            jnp.cos(gt_boxes[:, 6]),
        ]
        if self.code_size == 10:
            out.extend([gt_boxes[:, 7], gt_boxes[:, 8]])
        return jnp.stack(out, axis=-1)

    # --- matching costs (hungarian_assigner.py:55-134) ---

    def _iou3d_bottom(self, boxes_a, boxes_b):
        """3D IoU with the assigner's z-as-bottom height overlap quirk
        (hungarian_assigner.height_overlaps treats boxes[:,2] as bottom)."""
        overlap_bev = boxes_overlap_bev(boxes_a[:, :7], boxes_b[:, :7])
        a_top = (boxes_a[:, 2] + boxes_a[:, 5])[:, None]
        a_bot = boxes_a[:, 2][:, None]
        b_top = (boxes_b[:, 2] + boxes_b[:, 5])[None, :]
        b_bot = boxes_b[:, 2][None, :]
        overlap_h = jnp.clip(jnp.minimum(a_top, b_top) - jnp.maximum(a_bot, b_bot), 0.0)
        inter = overlap_bev * overlap_h
        va = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
        vb = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
        return inter / jnp.clip(va + vb - inter, 1e-8)

    def _assign_single(self, res_b, gt_boxes, gt_labels, gt_valid):
        """One sample. res_b: per-key (P, ...) slices. Returns targets."""
        cfg = self.model_cfg["TARGET_ASSIGNER_CONFIG"]["HUNGARIAN_ASSIGNER"]
        p = res_b["center"].shape[0]
        boxes = self.decode_boxes({k: v[None] for k, v in res_b.items()})[0]  # (P, 7+)
        score = res_b["heatmap"]  # (P, C) logits

        # focal cls cost
        alpha = float(cfg["cls_cost"].get("alpha", 0.25))
        gamma = float(cfg["cls_cost"].get("gamma", 2.0))
        w_cls = float(cfg["cls_cost"].get("weight", 0.15))
        eps = 1e-12
        prob = jax.nn.sigmoid(score)
        neg_cost = -jnp.log(1 - prob + eps) * (1 - alpha) * prob**gamma
        pos_cost = -jnp.log(prob + eps) * alpha * (1 - prob) ** gamma
        cls_cost = (pos_cost - neg_cost)[:, gt_labels] * w_cls  # (P, M)

        # normalized-center L1 cost
        pcr = jnp.asarray(self.point_cloud_range)
        w_reg = float(cfg["reg_cost"].get("weight", 0.25))
        span = pcr[3:5] - pcr[0:2]
        nb = (boxes[:, :2] - pcr[0:2]) / span
        ng = (gt_boxes[:, :2] - pcr[0:2]) / span
        reg_cost = jnp.sum(jnp.abs(nb[:, None] - ng[None, :]), axis=-1) * w_reg

        # -IoU cost
        w_iou = float(cfg["iou_cost"].get("weight", 0.25))
        iou = self._iou3d_bottom(boxes, gt_boxes)
        cost = cls_cost + reg_cost - iou * w_iou

        # rows = gts; mask invalid
        col_to_row = solve_lap(cost.T, gt_valid)  # (P,) gt index or -1
        matched = col_to_row >= 0
        safe_gt = jnp.clip(col_to_row, 0)

        labels = jnp.where(matched, gt_labels[safe_gt], self.num_classes)
        label_weights = jnp.ones((p,), jnp.float32)
        bbox_targets = jnp.where(
            matched[:, None], self.encode_gt(gt_boxes)[safe_gt], 0.0
        )
        bbox_weights = matched[:, None].astype(jnp.float32) * jnp.ones(
            (1, self.code_size), jnp.float32
        )
        ious = jnp.where(matched, iou[jnp.arange(p), safe_gt], 0.0)
        ious = jnp.clip(ious, 0.0, 1.0)
        if self.unknown_labels:
            unk = jnp.isin(labels + 1, jnp.asarray(self.unknown_labels))
            unknown_mask = matched & unk
        else:
            unknown_mask = jnp.zeros((p,), bool)
        return labels, label_weights, bbox_targets, bbox_weights, \
            matched.sum(), ious, unknown_mask

    def _heatmap_single(self, gt_boxes, gt_labels, gt_valid):
        cfg = self.model_cfg["TARGET_ASSIGNER_CONFIG"]
        vx, vy = float(self.voxel_size[0]), float(self.voxel_size[1])
        w = int(self.grid_size[0]) // self.stride
        h = int(self.grid_size[1]) // self.stride
        dx = gt_boxes[:, 3] / vx / self.stride
        dy = gt_boxes[:, 4] / vy / self.stride
        radius = gaussian_radius(dy, dx, float(cfg.get("GAUSSIAN_OVERLAP", 0.1)))
        radius = jnp.maximum(
            int(cfg.get("MIN_RADIUS", 2)), radius.astype(jnp.int32)
        )
        if self.unknown_labels:
            unk = jnp.isin(gt_labels + 1, jnp.asarray(self.unknown_labels))
            mult = float(cfg.get("UNK_RADIUS_MULT", 1.0))
            radius = jnp.where(
                unk, (radius.astype(jnp.float32) * mult).astype(jnp.int32), radius
            )
        pcr = self.point_cloud_range
        cx = (gt_boxes[:, 0] - float(pcr[0])) / vx / self.stride
        cy = (gt_boxes[:, 1] - float(pcr[1])) / vy / self.stride
        valid = gt_valid & (dx > 0) & (dy > 0)
        return draw_heatmap(
            jnp.stack([cx, cy], -1), radius, gt_labels, valid,
            num_classes=self.num_classes, height=h, width=w,
        )

    def get_targets(self, res, gt_boxes_with_cls):
        """res: batched head outputs; gt (B, M, 8+) padded."""
        gt = gt_boxes_with_cls[..., :-1]
        gt_labels = (gt_boxes_with_cls[..., -1].astype(jnp.int32) - 1)
        gt_valid = (
            (gt_boxes_with_cls[..., -1] > 0)
            & (gt[..., 3] > 0)
            & (gt[..., 4] > 0)
        )
        keys = ("center", "height", "dim", "rot", "vel", "heatmap")
        keys = tuple(k for k in keys if k in res)
        gt = jnp.asarray(gt)
        gt_labels = jnp.clip(jnp.asarray(gt_labels), 0)
        gt_valid = jnp.asarray(gt_valid)
        res_sub = {k: jax.lax.stop_gradient(res[k]) for k in keys}

        labels, lw, bt, bw, npos, ious, unk = jax.vmap(self._assign_single)(
            res_sub, gt, gt_labels, gt_valid
        )
        heatmap = jax.vmap(self._heatmap_single)(gt, gt_labels, gt_valid)
        return {
            "labels": labels, "label_weights": lw, "bbox_targets": bt,
            "bbox_weights": bw, "num_pos": jnp.sum(npos), "ious": ious,
            "heatmap": heatmap, "unknown_mask": unk,
        }

    def merge_pseudos(self, gt_boxes, pseudo_boxes):
        """Device-side GT+pseudo merge (USE_PSEUDO path,
        transfusion_head.py:330-332 + pseudo_processor.combine): relabel the
        known-space GT labels into the full class space via the LUT, then
        concatenate the padded pseudo boxes (zero rows stay padding)."""
        gt = gt_boxes
        if self.relabel_lut:
            lut = jnp.asarray(self.relabel_lut, jnp.int32)
            labels = jnp.clip(gt[..., -1].astype(jnp.int32), 0, len(lut) - 1)
            gt = gt.at[..., -1].set(
                jnp.where(gt[..., -1] > 0, lut[labels].astype(gt.dtype), 0.0)
            )
        c = gt.shape[-1]
        pseudo = pseudo_boxes[..., :c]
        if pseudo_boxes.shape[-1] < c:
            # pseudo (B, M, 8): widen to gt code size, keeping label last
            pad = jnp.zeros(
                pseudo_boxes.shape[:-1] + (c - pseudo_boxes.shape[-1],),
                gt.dtype,
            )
            pseudo = jnp.concatenate(
                [pseudo_boxes[..., :-1], pad, pseudo_boxes[..., -1:]], axis=-1
            )
        return jnp.concatenate([gt, pseudo], axis=1)

    def compute_loss(self, out_batch):
        if "pseudo_boxes" in out_batch and out_batch["pseudo_boxes"] is not None:
            merged = self.merge_pseudos(
                jnp.asarray(out_batch["gt_boxes"]),
                jnp.asarray(out_batch["pseudo_boxes"]),
            )
            out_batch = dict(out_batch)
            out_batch["gt_boxes"] = merged
        return self.loss(out_batch)

    def loss(self, batch, targets=None):
        res = batch["transfusion_preds"]
        lw_cfg = self.model_cfg["LOSS_CONFIG"]["LOSS_WEIGHTS"]
        loss_cls_cfg = self.model_cfg["LOSS_CONFIG"]["LOSS_CLS"]
        if targets is None:
            targets = self.get_targets(res, batch["gt_boxes"])

        # heatmap loss
        hm_pred = L.clip_sigmoid(
            jnp.transpose(res["dense_heatmap"], (0, 3, 1, 2))
        )
        hm_tgt = targets["heatmap"]
        loss_hm = jnp.sum(L.gaussian_focal_loss(hm_pred, hm_tgt)) / jnp.clip(
            jnp.sum(hm_tgt == 1.0), 1.0
        )

        labels = targets["labels"].reshape(-1)
        label_weights = targets["label_weights"].reshape(-1)
        num_pos = jnp.clip(targets["num_pos"], 1)

        if self.unknown_labels and "unknown_cls_weight" in lw_cfg:
            unk = targets["unknown_mask"].reshape(-1)
            label_weights = jnp.where(
                unk, label_weights * float(lw_cfg["unknown_cls_weight"]),
                label_weights,
            )

        cls_score = res["heatmap"].reshape(-1, self.num_classes)
        one_hot = jax.nn.one_hot(labels, self.num_classes + 1)[..., :-1]
        loss_cls = jnp.sum(
            L.sigmoid_focal_loss(
                cls_score, one_hot, label_weights,
                gamma=float(loss_cls_cfg.get("gamma", 2.0)),
                alpha=float(loss_cls_cfg.get("alpha", 0.25)),
            )
        ) / num_pos

        head_order = [k for k in ("center", "height", "dim", "rot", "vel")
                      if k in res]
        preds = jnp.concatenate([res[k] for k in head_order], axis=-1)
        code_weights = jnp.asarray(lw_cfg["code_weights"], jnp.float32)
        reg_weights = targets["bbox_weights"] * code_weights[None, None, :]
        if self.unknown_labels and "unknown_code_weights" in lw_cfg:
            ucw = jnp.asarray(lw_cfg["unknown_code_weights"], jnp.float32)
            reg_weights = jnp.where(
                targets["unknown_mask"][..., None], reg_weights * ucw,
                reg_weights,
            )
        loss_bbox = jnp.sum(
            jnp.abs(preds - targets["bbox_targets"]) * reg_weights
        ) / num_pos

        total = (
            loss_hm * float(lw_cfg["hm_weight"])
            + loss_cls * float(lw_cfg["cls_weight"])
            + loss_bbox * float(lw_cfg["bbox_weight"])
        )
        matched = labels < self.num_classes
        tb = {
            "loss_heatmap": loss_hm * float(lw_cfg["hm_weight"]),
            "loss_cls": loss_cls * float(lw_cfg["cls_weight"]),
            "loss_bbox": loss_bbox * float(lw_cfg["bbox_weight"]),
            "matched_ious": jnp.sum(
                jnp.where(matched, targets["ious"].reshape(-1), 0.0)
            ) / jnp.clip(jnp.sum(matched), 1),
            "loss_trans": total,
        }
        # per-class diagnostics (reference transfusion_head.py:506-543):
        # matched count, mean matched IoU, mean TP confidence per class
        if self.class_names:
            probs = jax.nn.sigmoid(cls_score)       # (BP, C)
            ious_flat = targets["ious"].reshape(-1)
            for ci, name in enumerate(self.class_names):
                cm = matched & (labels == ci)
                n = jnp.sum(cm)
                nc = jnp.clip(n, 1)
                tb[f"{name}_matches"] = n
                tb[f"{name}_iou_mean"] = jnp.sum(
                    jnp.where(cm, ious_flat, 0.0)) / nc
                tb[f"{name}_tp_pred_conf_mean"] = jnp.sum(
                    jnp.where(cm, probs[:, ci], 0.0)) / nc
        return total, tb

    def get_bboxes(self, res, max_det: int = 200, relabel_map=None,
                   training: bool = False, pseudo_nms_thresh=None):
        """Decode final detections (transfusion get_bboxes:698-728).

        Returns Detections with fixed max_det slots (labels 1-indexed).
        """
        pp = self.model_cfg["POST_PROCESSING"]
        score_thresh = float(pp.get("SCORE_THRESH", 0.0))
        post_range = jnp.asarray(pp["POST_CENTER_RANGE"], jnp.float32)

        prob = jax.nn.sigmoid(res["heatmap"])  # (B, P, C)
        one_hot = jax.nn.one_hot(res["query_labels"], self.num_classes)
        prob = prob * res["query_heatmap_score"] * one_hot
        boxes = self.decode_boxes(res)  # (B, P, 7+)
        scores = jnp.max(prob, axis=-1)
        labels = jnp.argmax(prob, axis=-1).astype(jnp.int32)

        mask = (
            (scores > score_thresh)
            & jnp.all(boxes[..., :3] >= post_range[:3], axis=-1)
            & jnp.all(boxes[..., :3] <= post_range[3:], axis=-1)
        )
        p = boxes.shape[1]
        k = min(max_det, p)

        def one(boxes_b, scores_b, labels_b, mask_b):
            s = jnp.where(mask_b, scores_b, -1.0)
            top_s, idx = jax.lax.top_k(s, k)
            good = top_s > 0
            out_boxes = jnp.where(good[:, None], boxes_b[idx], 0.0)
            out_labels = jnp.where(good, labels_b[idx] + 1, 0)
            if relabel_map is not None:
                lut = jnp.asarray(relabel_map, jnp.int32)  # (num_known+1,)
                out_labels = lut[jnp.clip(out_labels, 0, lut.shape[0] - 1)]
            return out_boxes, jnp.where(good, top_s, 0.0), out_labels, \
                jnp.sum(good).astype(jnp.int32)

        ob, os_, ol, oc = jax.vmap(one)(boxes, scores, labels, mask)
        return Detections(ob, os_, ol.astype(jnp.int32), oc)


def make_transfusion_tools(model_cfg, num_class, grid_size, point_cloud_range,
                           voxel_size, class_names=(), unknown_labels=(),
                           relabel_lut=()):
    return TransFusionTools(
        model_cfg=model_cfg,
        num_classes=int(model_cfg.get("NUM_CLASSES", num_class)),
        grid_size=tuple(int(g) for g in grid_size),
        point_cloud_range=tuple(float(v) for v in point_cloud_range),
        voxel_size=tuple(float(v) for v in voxel_size),
        class_names=tuple(class_names),
        unknown_labels=tuple(unknown_labels),
        relabel_lut=tuple(relabel_lut),
    )

"""CenterHead — CenterPoint heatmap detection head.

Behavioral parity with pcdet/models/dense_heads/center_head.py:52-495
(/root/reference): shared conv -> separate heads (hm/center/center_z/dim/
rot[/vel]); gaussian heatmap targets with per-object regression slots
(sub-pixel center offset, z, log dims, cos/sin yaw); CenterNet focal loss +
masked L1 regression normalized by positives; top-K heatmap decode with
score/range filtering and class-agnostic rotated NMS.

TPU redesign: the per-object python drawing/assign loop becomes the
vectorized draw_heatmap + fixed-slot target arrays. CLASS_NAMES_EACH_HEAD
grouping is supported: one SeparateHead per group, per-group heatmap targets
with within-group class ids, per-group decode merged (with global labels)
before the shared NMS — matching center_head.py:59-118,407-476.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...utils import losses as L
from ..model_utils.centernet import draw_heatmap, gaussian_radius, topk_heatmap
from ..post_processing import Detections, post_process
from .transfusion_head import SeparateHead


class CenterHead(nn.Module):
    model_cfg: Any
    input_channels: int
    num_class: int
    class_names: tuple
    grid_size: tuple
    point_cloud_range: tuple
    voxel_size: tuple = ()
    predict_boxes_when_training: bool = False

    def setup(self):
        cfg = self.model_cfg
        shared_ch = int(cfg.get("SHARED_CONV_CHANNEL", 64))
        self.shared_conv = nn.Conv(
            shared_ch, (3, 3), padding="SAME",
            use_bias=bool(cfg.get("USE_BIAS_BEFORE_NORM", False)),
        )
        self.shared_bn = nn.BatchNorm(epsilon=1e-3, momentum=0.99)
        groups = cfg.get("CLASS_NAMES_EACH_HEAD") or [list(self.class_names)]
        head_mods = []
        for gi, group in enumerate(groups):
            heads = dict(cfg["SEPARATE_HEAD_CFG"]["HEAD_DICT"])
            heads["hm"] = {
                "out_channels": len(group),
                "num_conv": int(cfg.get("NUM_HM_CONV", 2)),
            }
            head_mods.append(SeparateHead(
                head_dict=heads, head_channels=shared_ch,
                use_bias=bool(cfg.get("USE_BIAS_BEFORE_NORM", False)),
                name=f"group{gi}",
            ))
        self.head_groups = head_mods

    def __call__(self, batch, train: bool):
        x = batch["spatial_features_2d"]
        x = self.shared_conv(x)
        x = self.shared_bn(x, use_running_average=not train)
        x = nn.relu(x)
        # SeparateHead operates on (B, N, C); flatten spatial dims
        b, h, w, c = x.shape
        xf = x.reshape(b, h * w, c)
        out = []
        for mod in self.head_groups:
            preds = mod(xf, train)
            out.append({k: v.reshape(b, h, w, -1) for k, v in preds.items()})
        batch["center_preds"] = tuple(out)
        if self.predict_boxes_when_training:
            # Dense per-location decode so a downstream proposal layer
            # (PV-RCNN++ RoIProposalStage) can run its own top-k + NMS —
            # mirrors the reference CenterHead's
            # generate_predicted_boxes-when-training path
            # (center_head.py:generate_predicted_boxes, /root/reference).
            cls_rows, box_rows = [], []
            groups = self.model_cfg.get("CLASS_NAMES_EACH_HEAD") or [
                list(self.class_names)]
            stride = int(self.model_cfg["TARGET_ASSIGNER_CONFIG"][
                "FEATURE_MAP_STRIDE"])
            vx, vy = float(self.voxel_size[0]), float(self.voxel_size[1])
            pcr = self.point_cloud_range
            xs = jnp.arange(w, dtype=jnp.float32)[None, :].repeat(h, 0)
            ys = jnp.arange(h, dtype=jnp.float32)[:, None].repeat(w, 1)
            for preds, group in zip(out, groups):
                g_center = preds["center"]
                cx = (xs[None] + g_center[..., 0]) * stride * vx + float(pcr[0])
                cy = (ys[None] + g_center[..., 1]) * stride * vy + float(pcr[1])
                cz = preds["center_z"][..., 0]
                dims = jnp.exp(preds["dim"])
                ang = jnp.arctan2(preds["rot"][..., 1], preds["rot"][..., 0])
                parts = [cx[..., None], cy[..., None], cz[..., None], dims,
                         ang[..., None]]
                if "vel" in preds:
                    parts.append(preds["vel"])
                boxes = jnp.concatenate(parts, axis=-1).reshape(b, h * w, -1)
                hm = jax.nn.sigmoid(preds["hm"]).reshape(b, h * w, len(group))
                # scatter group columns into the global class layout
                cls_full = jnp.zeros((b, h * w, self.num_class), hm.dtype)
                for ci, cname in enumerate(group):
                    gi = list(self.class_names).index(cname)
                    cls_full = cls_full.at[..., gi].set(hm[..., ci])
                cls_rows.append(cls_full)
                box_rows.append(boxes)
            batch["batch_cls_preds"] = jnp.concatenate(cls_rows, axis=1)
            batch["batch_box_preds"] = jnp.concatenate(box_rows, axis=1)
            batch["cls_preds_normalized"] = True
        return batch


@dataclass(frozen=True)
class CenterHeadTools:
    model_cfg: Any
    num_classes: int
    grid_size: tuple
    point_cloud_range: tuple
    voxel_size: tuple
    class_names: tuple = ()
    groups: tuple = ()   # per-group GLOBAL 1-indexed label tuples

    @property
    def group_labels(self):
        if self.groups:
            return self.groups
        return (tuple(range(1, self.num_classes + 1)),)

    @property
    def stride(self):
        return int(self.model_cfg["TARGET_ASSIGNER_CONFIG"]["FEATURE_MAP_STRIDE"])

    @property
    def head_order(self):
        return list(self.model_cfg["SEPARATE_HEAD_CFG"]["HEAD_ORDER"])

    @property
    def code_size(self):
        return sum(
            int(self.model_cfg["SEPARATE_HEAD_CFG"]["HEAD_DICT"][h]["out_channels"])
            for h in self.head_order
        )

    def _fm_size(self):
        w = int(self.grid_size[0]) // self.stride
        h = int(self.grid_size[1]) // self.stride
        return h, w

    def _assign_single(self, gt_boxes, gt_labels, gt_valid,
                       num_classes=None):
        """(M, 7+), labels 0-idx (LOCAL to the group) -> heatmap (C, H, W),
        target boxes (M, code), inds (M,), mask (M,).
        (center_head.py:152-209)"""
        cfg = self.model_cfg["TARGET_ASSIGNER_CONFIG"]
        h, w = self._fm_size()
        vx, vy = float(self.voxel_size[0]), float(self.voxel_size[1])
        pcr = self.point_cloud_range
        cx = (gt_boxes[:, 0] - float(pcr[0])) / vx / self.stride
        cy = (gt_boxes[:, 1] - float(pcr[1])) / vy / self.stride
        cx = jnp.clip(cx, 0, w - 0.5)
        cy = jnp.clip(cy, 0, h - 0.5)
        cxi = cx.astype(jnp.int32)
        cyi = cy.astype(jnp.int32)

        dx = gt_boxes[:, 3] / vx / self.stride
        dy = gt_boxes[:, 4] / vy / self.stride
        radius = gaussian_radius(dx, dy, float(cfg.get("GAUSSIAN_OVERLAP", 0.1)))
        radius = jnp.clip(
            radius.astype(jnp.int32), int(cfg.get("MIN_RADIUS", 2)),
            int(max(h, w) // 2),
        )
        valid = gt_valid & (dx > 0) & (dy > 0)

        heatmap = draw_heatmap(
            jnp.stack([cx, cy], -1), radius, gt_labels, valid,
            num_classes=num_classes or self.num_classes, height=h, width=w,
        )
        extras = gt_boxes.shape[-1] - 7
        parts = [
            cx - cxi.astype(cx.dtype), cy - cyi.astype(cy.dtype),
            gt_boxes[:, 2],
            jnp.log(jnp.clip(gt_boxes[:, 3], 1e-5)),
            jnp.log(jnp.clip(gt_boxes[:, 4], 1e-5)),
            jnp.log(jnp.clip(gt_boxes[:, 5], 1e-5)),
            jnp.cos(gt_boxes[:, 6]), jnp.sin(gt_boxes[:, 6]),
        ]
        for i in range(extras):
            parts.append(gt_boxes[:, 7 + i])
        target_boxes = jnp.stack(parts, axis=-1)
        inds = (cyi * w + cxi).astype(jnp.int32)
        return heatmap, jnp.where(valid[:, None], target_boxes, 0.0), \
            jnp.where(valid, inds, 0), valid

    def assign(self, gt_boxes_with_cls, group=None):
        gt = gt_boxes_with_cls[..., :-1]
        glabels = gt_boxes_with_cls[..., -1].astype(jnp.int32)
        valid = glabels > 0
        if group is None:
            labels = jnp.clip(glabels - 1, 0)
            nc = self.num_classes
        else:
            # relabel global -> within-group local ids; drop other classes
            lut = np.full(self.num_classes + 1, -1, np.int32)
            for li, gl in enumerate(group):
                lut[gl] = li
            local = jnp.asarray(lut)[jnp.clip(glabels, 0,
                                              self.num_classes)]
            valid = valid & (local >= 0)
            labels = jnp.clip(local, 0)
            nc = len(group)
        return jax.vmap(
            lambda g, l, v: self._assign_single(g, l, v, num_classes=nc)
        )(gt, labels, valid)

    def compute_loss(self, out_batch):
        preds_all = out_batch["center_preds"]
        if isinstance(preds_all, dict):
            preds_all = (preds_all,)
        lw = self.model_cfg["LOSS_CONFIG"]["LOSS_WEIGHTS"]
        code_w = jnp.asarray(lw["code_weights"], jnp.float32)
        glabels = self.group_labels
        hm_total = 0.0
        loc_total = 0.0
        for preds, group in zip(preds_all, glabels):
            group_arg = None if len(glabels) == 1 else group
            heatmaps, target_boxes, inds, masks = self.assign(
                out_batch["gt_boxes"], group=group_arg)
            hm_pred = jnp.clip(
                jax.nn.sigmoid(jnp.transpose(preds["hm"], (0, 3, 1, 2))),
                1e-4, 1 - 1e-4,
            )
            hm_total += L.focal_loss_centernet(hm_pred, heatmaps)                 * float(lw["cls_weight"])
            b, h, w, _ = preds["hm"].shape
            reg = jnp.concatenate(
                [preds[k] for k in self.head_order], axis=-1
            ).reshape(b, h * w, -1)  # (B, HW, code)
            gathered = jnp.take_along_axis(
                reg, inds[..., None].astype(jnp.int32), axis=1
            )  # (B, M, code)
            per_dim = L.reg_loss_centernet(
                gathered, target_boxes[..., : gathered.shape[-1]], masks
            )
            loc_total += jnp.sum(per_dim * code_w) * float(lw["loc_weight"])

        total = hm_total + loc_total
        return total, {"hm_loss": hm_total, "loc_loss": loc_total,
                       "rpn_loss": total}

    def get_bboxes(self, out_batch, max_obj: int = 500):
        """Decode (decode_bbox_from_heatmap + class-agnostic NMS); groups
        decode independently and merge with global labels."""
        preds_all = out_batch["center_preds"]
        if isinstance(preds_all, dict):
            preds_all = (preds_all,)
        pp = self.model_cfg["POST_PROCESSING"]
        k = int(pp.get("MAX_OBJ_PER_SAMPLE", max_obj))
        score_thresh = float(pp.get("SCORE_THRESH", 0.1))
        post_range = jnp.asarray(pp["POST_CENTER_LIMIT_RANGE"], jnp.float32)
        h, w = self._fm_size()
        vx, vy = float(self.voxel_size[0]), float(self.voxel_size[1])
        pcr = self.point_cloud_range

        def one(hm, center, center_z, dim, rot, vel):
            scores, cls_ids, ys, xs, flat = topk_heatmap(
                jax.nn.sigmoid(jnp.transpose(hm, (2, 0, 1))), k
            )
            reg = jnp.concatenate(
                [center.reshape(h * w, -1), center_z.reshape(h * w, -1),
                 dim.reshape(h * w, -1), rot.reshape(h * w, -1)]
                + ([vel.reshape(h * w, -1)] if vel is not None else []),
                axis=-1,
            )
            g = reg[flat]  # (k, code)
            x = (xs.astype(jnp.float32) + g[:, 0]) * self.stride * vx + float(pcr[0])
            y = (ys.astype(jnp.float32) + g[:, 1]) * self.stride * vy + float(pcr[1])
            z = g[:, 2]
            dims = jnp.exp(g[:, 3:6])
            ang = jnp.arctan2(g[:, 7], g[:, 6])
            parts = [x[:, None], y[:, None], z[:, None], dims, ang[:, None]]
            if vel is not None:
                parts.append(g[:, 8:10])
            boxes = jnp.concatenate(parts, axis=-1)
            ok = (
                (scores > score_thresh)
                & jnp.all(boxes[:, :3] >= post_range[:3], axis=-1)
                & jnp.all(boxes[:, :3] <= post_range[3:], axis=-1)
            )
            return boxes, jnp.where(ok, scores, 0.0), cls_ids + 1, ok

        parts_b, parts_s, parts_l, parts_ok = [], [], [], []
        for preds, group in zip(preds_all, self.group_labels):
            vel = preds.get("vel")
            boxes, scores, labels, ok = jax.vmap(one)(
                preds["hm"], preds["center"], preds["center_z"],
                preds["dim"], preds["rot"], vel,
            ) if vel is not None else jax.vmap(
                lambda hm, c, cz, d, r: one(hm, c, cz, d, r, None)
            )(preds["hm"], preds["center"], preds["center_z"],
              preds["dim"], preds["rot"])
            # local (1-indexed within group) -> global labels
            lut = jnp.asarray((0,) + tuple(group), jnp.int32)
            labels = lut[jnp.clip(labels, 0, len(group))]
            parts_b.append(boxes)
            parts_s.append(scores)
            parts_l.append(labels)
            parts_ok.append(ok)
        boxes = jnp.concatenate(parts_b, axis=1)
        scores = jnp.concatenate(parts_s, axis=1)
        labels = jnp.concatenate(parts_l, axis=1)
        ok = jnp.concatenate(parts_ok, axis=1)

        nms_cfg = pp.get("NMS_CONFIG", {})
        from ...ops.nms import nms_bev

        def nms_one(bx, sc, lb, valid):
            idx, num = nms_bev(
                bx, sc, float(nms_cfg.get("NMS_THRESH", 0.7)),
                pre_maxsize=int(nms_cfg.get("NMS_PRE_MAXSIZE", k)),
                post_maxsize=int(nms_cfg.get("NMS_POST_MAXSIZE", 128)),
                valid_mask=valid,
            )
            safe = jnp.clip(idx, 0)
            good = idx >= 0
            return (jnp.where(good[:, None], bx[safe], 0.0),
                    jnp.where(good, sc[safe], 0.0),
                    jnp.where(good, lb[safe], 0).astype(jnp.int32), num)

        ob, os_, ol, oc = jax.vmap(nms_one)(boxes, scores, labels, ok)
        return Detections(ob, os_, ol, oc)


def make_center_head_tools(model_cfg, num_class, grid_size, point_cloud_range,
                           voxel_size, class_names=()):
    groups_cfg = model_cfg.get("CLASS_NAMES_EACH_HEAD")
    groups = ()
    if groups_cfg:
        names = list(class_names)
        groups = tuple(
            tuple(names.index(n) + 1 for n in group) for group in groups_cfg
        )
    return CenterHeadTools(
        model_cfg=model_cfg,
        num_classes=num_class,
        grid_size=tuple(int(g) for g in grid_size),
        point_cloud_range=tuple(float(v) for v in point_cloud_range),
        voxel_size=tuple(float(v) for v in voxel_size),
        class_names=tuple(class_names),
        groups=groups,
    )

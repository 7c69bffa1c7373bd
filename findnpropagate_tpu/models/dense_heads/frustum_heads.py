"""Frustum query heads — FrustumViTHead and FrustumPointNetHead.

Parity targets (/root/reference/pcdet/models/dense_heads):
  * frustum_vit_head.py:152-560 (FrustumViTHead): per cached-2D-detection
    frustum queries (<=256 median-centred points each), an
    ObjectPointsEncoder (cls-token transformer over the points,
    vit_point_encoder.py:132-182), one encoder layer ACROSS queries, and
    TransFusion-style separate heads + Hungarian matching; the class
    "heatmap" rides in from the 2D detector as one_hot * score.
  * frustum_pointnet_v1.py:26-601 (FrustumPointNetHead): same query
    building, but each frustum runs Frustum PointNets v1 (instance seg ->
    T-Net -> box estimation) after rotating the frustum to the +x axis
    (prerot), then decodes heading bins/size anchors to world boxes; same
    Hungarian loss on the decoded parametrisation.

TPU design: query building is host-side numpy (it consumes the ragged
cached detections); the networks are flax modules vmapped over fixed
(B, P, N, 3) query slabs with validity masks, so the whole forward jits.
Box targets/losses reuse the TransFusionTools Hungarian machinery with a
world-coordinate box code (the reference's encode_bbox here is raw world
xy, frustum_vit_head.py / frustum_pointnet_v1.py encode_bbox).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..frustum_pointnets import (
    FrustumPointNetv1,
    decode_heading,
    decode_size,
)
from .transfusion_head import TransFusionTools


def build_frustum_queries(points, det_boxes, det_labels, det_scores,
                          det_cams, lidar2image, num_proposals=200,
                          max_points=256, min_points=5, score_thr=0.1,
                          image_size=(900, 1600)):
    """Host-side query builder (frustum_vit_head.py predict :384-476):
    per valid 2D detection, gather in-box lidar points, median-centre,
    evenly subsample to <= max_points. Returns numpy arrays:
    query_pts (P, N, 3), query_pt_valid (P, N), query_pos (P, 3),
    query_labels (P,) 0-indexed, query_scores (P,), query_valid (P,)."""
    pts = np.asarray(points)[:, :3]
    h_img, w_img = image_size
    q_pts = np.zeros((num_proposals, max_points, 3), np.float32)
    q_ptv = np.zeros((num_proposals, max_points), bool)
    q_pos = np.zeros((num_proposals, 3), np.float32)
    q_lab = np.zeros(num_proposals, np.int64)
    q_sc = np.zeros(num_proposals, np.float32)
    q_val = np.zeros(num_proposals, bool)
    qi = 0
    for cam in sorted(set(int(c) for c in det_cams)):
        l2i = np.asarray(lidar2image[cam], np.float64)
        hom = pts @ l2i[:3, :3].T + l2i[:3, 3]
        depth = hom[:, 2]
        uv = hom[:, :2] / np.clip(depth[:, None], 1e-5, None)
        on_img = (depth > 1e-3) & (uv[:, 0] >= 0) & (uv[:, 0] < w_img) \
            & (uv[:, 1] >= 0) & (uv[:, 1] < h_img)
        for i in range(len(det_boxes)):
            if int(det_cams[i]) != cam or det_scores[i] < score_thr:
                continue
            if qi >= num_proposals:
                break
            x1, y1, x2, y2 = det_boxes[i]
            on = (on_img & (uv[:, 0] >= x1) & (uv[:, 0] < x2)
                  & (uv[:, 1] >= y1) & (uv[:, 1] < y2))
            box_pts = pts[on]
            if len(box_pts) < min_points:
                continue
            med = np.median(box_pts, axis=0)
            n = min(max_points, len(box_pts))
            idx = np.linspace(0, len(box_pts) - 1, n).astype(np.int64)
            q_pts[qi, :n] = box_pts[idx] - med
            q_ptv[qi, :n] = True
            q_pos[qi] = med
            q_lab[qi] = int(det_labels[i]) - 1
            q_sc[qi] = float(det_scores[i])
            q_val[qi] = True
            qi += 1
    return dict(query_pts=q_pts, query_pt_valid=q_ptv, query_pos=q_pos,
                query_labels=np.maximum(q_lab, 0), query_scores=q_sc,
                query_valid=q_val)


class ObjectPointsEncoder(nn.Module):
    """vit_point_encoder.py:132-182: normalise points by mean/var, embed,
    cls-token pre-norm transformer, output = cls token + mean/var
    embeddings."""

    dim: int = 64
    depth: int = 2
    heads: int = 8

    @nn.compact
    def __call__(self, x, valid):
        """x (B, N, 3); valid (B, N) -> (B, dim)."""
        m = valid[..., None].astype(x.dtype)
        n = jnp.clip(m.sum(-2, keepdims=True), 1.0)
        mean = (x * m).sum(-2, keepdims=True) / n
        var = ((x - mean) ** 2 * m).sum(-2, keepdims=True) / n
        mean_emb = nn.Dense(self.dim, name="mean_emb")(mean[..., 0, :])
        var_emb = nn.Dense(self.dim, name="var_emb")(var[..., 0, :])
        x = (x - mean) / (1e-8 + var)
        x = nn.Dense(self.dim, name="point_emb")(x) * m

        cls_tok = self.param("cls_token", nn.initializers.normal(1.0),
                             (1, self.dim))
        tok = jnp.broadcast_to(cls_tok[None], x.shape[:-2] + (1, self.dim))
        x = jnp.concatenate([tok, x], axis=-2)
        attn_valid = jnp.concatenate(
            [jnp.ones(valid.shape[:-1] + (1,), bool), valid], axis=-1)
        attn_mask = (attn_valid[..., None, :, None]
                     & attn_valid[..., None, None, :])
        for d in range(self.depth):
            h = nn.LayerNorm(name=f"ln_a{d}")(x)
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, qkv_features=self.dim,
                name=f"attn{d}")(h, h, mask=attn_mask)
            x = x + h
            h = nn.LayerNorm(name=f"ln_m{d}")(x)
            h = nn.Dense(self.dim, name=f"mlp{d}_0")(h)
            h = nn.Dense(self.dim, name=f"mlp{d}_1")(nn.gelu(h))
            x = x + h
        return x[..., 0, :] + mean_emb + var_emb


class FrustumViTHead(nn.Module):
    """frustum_vit_head.py:152-560. Consumes pre-built query slabs from
    `build_frustum_queries` (batch keys query_*)."""

    model_cfg: dict
    num_class: int = 10

    @nn.compact
    def __call__(self, batch, train: bool):
        dim = int(self.model_cfg.get("HIDDEN_CHANNEL", 64))
        q_pts = batch["query_pts"]              # (B, P, N, 3)
        q_ptv = batch["query_pt_valid"]
        q_pos = batch["query_pos"]              # (B, P, 3)
        q_lab = batch["query_labels"].astype(jnp.int32)
        q_sc = batch["query_scores"]
        q_val = batch["query_valid"]

        feat = ObjectPointsEncoder(dim=dim, name="encoder")(
            q_pts.reshape((-1,) + q_pts.shape[-2:]),
            q_ptv.reshape((-1,) + q_ptv.shape[-1:]))
        feat = feat.reshape(q_pts.shape[:-2] + (dim,))   # (B, P, dim)

        # one encoder layer across queries (overlapping boxes attend)
        qmask = q_val[..., None, :, None] & q_val[..., None, None, :]
        h = nn.LayerNorm(name="xq_ln")(feat)
        h = nn.MultiHeadDotProductAttention(
            num_heads=8, qkv_features=dim, name="xq_attn")(
            h, h, mask=qmask)
        feat = feat + h
        h = nn.Dense(dim, name="xq_mlp0")(nn.LayerNorm(
            name="xq_ln2")(feat))
        feat = feat + nn.Dense(dim, name="xq_mlp1")(nn.gelu(h))

        # separate heads (SeparateHead_Transfusion on (B, P, dim))
        def head(name, out_ch):
            x = nn.Dense(64, name=f"{name}_fc0")(feat)
            x = nn.relu(x)
            return nn.Dense(out_ch, name=f"{name}_out")(x)

        center = head("center", 2) + q_pos[..., :2]
        height = head("height", 1) + q_pos[..., 2:3]
        res = {
            "center": center,
            "height": height,
            "dim": head("dim", 3),
            "rot": head("rot", 2),
            "vel": head("vel", 2),
            "heatmap": head("heatmap", self.num_class),
            "stage1_center": q_pos,
            "query_labels": q_lab,
            "query_heatmap_score":
                jax.nn.one_hot(q_lab, self.num_class) * q_sc[..., None],
            "query_valid": q_val,
        }
        batch["transfusion_preds"] = res
        return batch


class FrustumPointNetHead(nn.Module):
    """frustum_pointnet_v1.py:26-316: rotate each frustum to +x
    (FrustumRotation), run Frustum PointNets v1 with the class one-hot,
    rotate centers/heading back by the pre-rotation."""

    model_cfg: dict
    num_class: int = 10
    size_anchors: tuple = ((4.63, 1.97, 1.74), (1.70, 0.60, 1.28),
                           (0.73, 0.67, 1.77))

    @nn.compact
    def __call__(self, batch, train: bool):
        q_pts = batch["query_pts"]
        q_ptv = batch["query_pt_valid"]
        q_pos = batch["query_pos"]
        q_lab = batch["query_labels"].astype(jnp.int32)
        q_sc = batch["query_scores"]
        q_val = batch["query_valid"]
        b, p = q_pts.shape[:2]

        # frustum pre-rotation: bring the query centre onto +x
        # (FrustumRotation, frustum_proposals_seg.py:37-50)
        prerot = jnp.arctan2(q_pos[..., 1], q_pos[..., 0])   # (B, P)
        c, s = jnp.cos(-prerot), jnp.sin(-prerot)
        world_pts = q_pts + q_pos[..., None, :]
        x = world_pts[..., 0] * c[..., None] - world_pts[..., 1] * s[..., None]
        y = world_pts[..., 0] * s[..., None] + world_pts[..., 1] * c[..., None]
        rot_pts = jnp.stack([x, y, world_pts[..., 2]], -1)

        one_hot = jax.nn.one_hot(q_lab, self.num_class)
        net = FrustumPointNetv1(
            n_classes=self.num_class,
            n_heading_bin=int(self.model_cfg.get("NUM_HEADING_BIN", 12)),
            size_anchors=tuple(map(tuple, self.size_anchors)),
            name="fpointnet")
        out = net(rot_pts.reshape((b * p,) + rot_pts.shape[-2:]),
                  one_hot.reshape(b * p, -1),
                  q_ptv.reshape((b * p,) + q_ptv.shape[-1:]), train)
        out = {k: v.reshape((b, p) + v.shape[1:]) for k, v in out.items()}

        heading = decode_heading(out["heading_scores"],
                                 out["heading_res"], prerot)
        size = decode_size(out["size_scores"], out["size_res"],
                           jnp.asarray(self.size_anchors, jnp.float32))
        # rotate centres back
        cc, cs = jnp.cos(prerot), jnp.sin(prerot)
        ctr = out["center"]
        wx = ctr[..., 0] * cc - ctr[..., 1] * cs
        wy = ctr[..., 0] * cs + ctr[..., 1] * cc

        res = {
            "center": jnp.stack([wx, wy], -1),
            "height": ctr[..., 2:3],
            "dim": jnp.log(jnp.clip(size, 1e-5)),
            "rot": jnp.stack([jnp.sin(heading), jnp.cos(heading)], -1),
            "heatmap": jnp.log(jnp.clip(
                jax.nn.one_hot(q_lab, self.num_class) * q_sc[..., None],
                1e-5) / jnp.clip(1 - jax.nn.one_hot(q_lab, self.num_class)
                                 * q_sc[..., None], 1e-5)),
            "query_labels": q_lab,
            "query_heatmap_score":
                jax.nn.one_hot(q_lab, self.num_class) * q_sc[..., None],
            "query_valid": q_val,
            "fpointnet_out": out,
            "prerot": prerot,
        }
        batch["transfusion_preds"] = res
        return batch


@dataclass(frozen=True)
class FrustumHeadTools(TransFusionTools):
    """TransFusionTools with the frustum heads' WORLD-coordinate box code
    (frustum_vit_head.py encode_bbox :455-474: raw xy/z, log dims,
    sin/cos) and no dense-heatmap loss term."""

    def decode_boxes(self, res):
        center = res["center"]
        z = res["height"][..., 0]
        dims = jnp.exp(res["dim"])
        rot = jnp.arctan2(res["rot"][..., 0], res["rot"][..., 1])
        parts = [center[..., :2], z[..., None], dims, rot[..., None]]
        if "vel" in res:
            parts.append(res["vel"])
        return jnp.concatenate(parts, axis=-1)

    def encode_gt(self, gt_boxes):
        out = [
            gt_boxes[:, 0], gt_boxes[:, 1], gt_boxes[:, 2],
            jnp.log(jnp.clip(gt_boxes[:, 3], 1e-5)),
            jnp.log(jnp.clip(gt_boxes[:, 4], 1e-5)),
            jnp.log(jnp.clip(gt_boxes[:, 5], 1e-5)),
            jnp.sin(gt_boxes[:, 6]),
            jnp.cos(gt_boxes[:, 6]),
        ]
        if self.code_size == 10:
            out.extend([gt_boxes[:, 7], gt_boxes[:, 8]])
        return jnp.stack(out, axis=-1)

    def get_targets(self, res, gt_boxes_with_cls):
        gt = gt_boxes_with_cls[..., :-1]
        gt_labels = gt_boxes_with_cls[..., -1].astype(jnp.int32) - 1
        gt_valid = ((gt_boxes_with_cls[..., -1] > 0)
                    & (gt[..., 3] > 0) & (gt[..., 4] > 0))
        keys = ("center", "height", "dim", "rot", "vel", "heatmap")
        keys = tuple(k for k in keys if k in res)
        res_sub = {k: jax.lax.stop_gradient(res[k]) for k in keys}
        labels, lw, bt, bw, npos, ious, unk = jax.vmap(
            self._assign_single)(
            res_sub, jnp.asarray(gt),
            jnp.clip(jnp.asarray(gt_labels), 0), jnp.asarray(gt_valid))
        # padded query slots carry no loss
        if "query_valid" in res:
            qv = res["query_valid"]
            lw = lw * qv.astype(lw.dtype)
            bw = bw * qv[..., None].astype(bw.dtype)
        return {"labels": labels, "label_weights": lw,
                "bbox_targets": bt, "bbox_weights": bw,
                "num_pos": jnp.sum(npos), "ious": ious,
                "unknown_mask": unk}

    def loss(self, batch, targets=None):
        res = batch["transfusion_preds"]
        lw_cfg = self.model_cfg["LOSS_CONFIG"]["LOSS_WEIGHTS"]
        loss_cls_cfg = self.model_cfg["LOSS_CONFIG"]["LOSS_CLS"]
        if targets is None:
            targets = self.get_targets(res, batch["gt_boxes"])

        from ...utils import losses as L

        labels = targets["labels"].reshape(-1)
        label_weights = targets["label_weights"].reshape(-1)
        num_pos = jnp.clip(targets["num_pos"], 1)
        cls_score = res["heatmap"].reshape(-1, self.num_classes)
        one_hot = jax.nn.one_hot(labels, self.num_classes + 1)[..., :-1]
        loss_cls = jnp.sum(L.sigmoid_focal_loss(
            cls_score, one_hot, label_weights,
            gamma=float(loss_cls_cfg.get("gamma", 2.0)),
            alpha=float(loss_cls_cfg.get("alpha", 0.25)))) / num_pos

        head_order = [k for k in ("center", "height", "dim", "rot", "vel")
                      if k in res]
        preds = jnp.concatenate([res[k] for k in head_order], axis=-1)
        # code_size 8 configs (no velocity supervision) ignore the vel head
        preds = preds[..., : self.code_size]
        code_weights = jnp.asarray(lw_cfg["code_weights"], jnp.float32)
        reg_weights = targets["bbox_weights"] * code_weights[None, None, :]
        loss_bbox = jnp.sum(
            jnp.abs(preds - targets["bbox_targets"]) * reg_weights
        ) / num_pos

        total = (loss_cls * float(lw_cfg.get("cls_weight", 1.0))
                 + loss_bbox * float(lw_cfg.get("bbox_weight", 0.25)))
        matched = labels < self.num_classes
        tb = {
            "loss_cls": loss_cls,
            "loss_bbox": loss_bbox,
            "matched_ious": jnp.sum(jnp.where(
                matched, targets["ious"].reshape(-1), 0.0))
            / jnp.clip(jnp.sum(matched), 1),
            "loss_trans": total,
        }
        return total, tb

    def compute_loss(self, out_batch):
        return self.loss(out_batch)


def make_frustum_head_tools(model_cfg, num_class, class_names=(),
                            point_cloud_range=(-54, -54, -5, 54, 54, 3)):
    return FrustumHeadTools(
        model_cfg=model_cfg,
        num_classes=int(model_cfg.get("NUM_CLASSES", num_class)),
        grid_size=(1, 1, 1),
        point_cloud_range=tuple(float(v) for v in point_cloud_range),
        voxel_size=(1.0, 1.0, 1.0),
        class_names=tuple(class_names),
    )

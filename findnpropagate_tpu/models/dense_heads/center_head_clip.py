"""CenterHeadCLIP — CLIP-embedding CenterPoint head (open-vocab experiment).

Behavioral parity with pcdet/models/dense_heads/center_head_clip.py:289-685
(/root/reference): a CLASS-AGNOSTIC center heatmap (hm out_channels = 1,
:345) plus a CLIP embedding branch; object classes come from the similarity
of the predicted embedding against the frozen class-text features (the
reference's CLIPSampleHead gathers BEV embeddings at box centers and scores
them against nuscenes_text.pkl). Training: CenterNet focal on the agnostic
heatmap + regression at centers + cross-entropy of center-embedding logits
against the gt class.

Text features are weights-gated exactly like the other VLM components: pass
`text_features` (C, E) explicitly (tests stub them; production loads the
CLIP text tower output).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...utils import losses as L
from ..model_utils.centernet import topk_heatmap
from ..post_processing import Detections
from .center_head import CenterHead, CenterHeadTools
from .transfusion_head import SeparateHead


class CenterHeadCLIP(nn.Module):
    model_cfg: Any
    input_channels: int
    num_class: int
    class_names: tuple
    grid_size: tuple
    point_cloud_range: tuple
    voxel_size: tuple = ()
    predict_boxes_when_training: bool = False

    @nn.compact
    def __call__(self, batch, train: bool):
        cfg = self.model_cfg
        shared_ch = int(cfg.get("SHARED_CONV_CHANNEL", 64))
        emb_dim = int(cfg.get("EMBED_DIM", 512))
        x = nn.Conv(shared_ch, (3, 3), padding="SAME",
                    use_bias=bool(cfg.get("USE_BIAS_BEFORE_NORM", False)))(
            batch["spatial_features_2d"])
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        b, h, w, c = x.shape
        heads = dict(cfg["SEPARATE_HEAD_CFG"]["HEAD_DICT"])
        heads["hm"] = {"out_channels": 1,
                       "num_conv": int(cfg.get("NUM_HM_CONV", 2))}
        heads["emb"] = {"out_channels": emb_dim, "num_conv": 2}
        mod = SeparateHead(
            head_dict=heads, head_channels=shared_ch,
            use_bias=bool(cfg.get("USE_BIAS_BEFORE_NORM", False)),
            name="clip_head",
        )
        preds = mod(x.reshape(b, h * w, c), train)
        batch["center_clip_preds"] = {
            k: v.reshape(b, h, w, -1) for k, v in preds.items()
        }
        return batch


@dataclass(frozen=True)
class CenterHeadCLIPTools(CenterHeadTools):
    """Agnostic-heatmap targets + embedding CE; decode classifies by text
    similarity."""

    text_features: Any = None  # (num_classes, E) normalized
    logit_scale: float = 100.0

    def compute_loss(self, out_batch):
        preds = out_batch["center_clip_preds"]
        lw = self.model_cfg["LOSS_CONFIG"]["LOSS_WEIGHTS"]
        code_w = jnp.asarray(lw["code_weights"], jnp.float32)
        gt = out_batch["gt_boxes"]
        # class-agnostic targets: every gt becomes class 0 of 1
        agn = jnp.concatenate(
            [gt[..., :-1], (gt[..., -1:] > 0).astype(gt.dtype)], -1)
        object.__setattr__  # (frozen dataclass; no state mutated)
        heatmaps, target_boxes, inds, masks = CenterHeadTools(
            model_cfg=self.model_cfg, num_classes=1,
            grid_size=self.grid_size,
            point_cloud_range=self.point_cloud_range,
            voxel_size=self.voxel_size,
        ).assign(agn)
        hm_pred = jnp.clip(
            jax.nn.sigmoid(jnp.transpose(preds["hm"], (0, 3, 1, 2))),
            1e-4, 1 - 1e-4)
        hm_loss = L.focal_loss_centernet(hm_pred, heatmaps) \
            * float(lw["cls_weight"])
        b, h, w, _ = preds["hm"].shape
        reg = jnp.concatenate(
            [preds[k] for k in self.head_order], axis=-1
        ).reshape(b, h * w, -1)
        gathered = jnp.take_along_axis(
            reg, inds[..., None].astype(jnp.int32), axis=1)
        per_dim = L.reg_loss_centernet(
            gathered, target_boxes[..., : gathered.shape[-1]], masks)
        loc_loss = jnp.sum(per_dim * code_w) * float(lw["loc_weight"])

        # embedding CE at gt centers vs the class text features
        emb = preds["emb"].reshape(b, h * w, -1)
        emb_at = jnp.take_along_axis(
            emb, inds[..., None].astype(jnp.int32), axis=1)  # (B, M, E)
        emb_at = emb_at / (jnp.linalg.norm(emb_at, axis=-1, keepdims=True)
                           + 1e-8)
        tf = jnp.asarray(self.text_features)
        logits = self.logit_scale * emb_at @ tf.T            # (B, M, C)
        labels = jnp.clip(gt[..., -1].astype(jnp.int32) - 1, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        m = masks.astype(jnp.float32)
        emb_loss = jnp.sum(ce * m) / jnp.clip(jnp.sum(m), 1.0) \
            * float(lw.get("emb_weight", 1.0))

        total = hm_loss + loc_loss + emb_loss
        return total, {"hm_loss": hm_loss, "loc_loss": loc_loss,
                       "emb_loss": emb_loss, "rpn_loss": total}

    def get_bboxes(self, out_batch):
        preds = out_batch["center_clip_preds"]
        pp = self.model_cfg["POST_PROCESSING"]
        k = int(pp.get("MAX_OBJ_PER_SAMPLE", 100))
        score_thresh = float(pp.get("SCORE_THRESH", 0.1))
        post_range = jnp.asarray(pp["POST_CENTER_LIMIT_RANGE"], jnp.float32)
        h, w = self._fm_size()
        vx, vy = float(self.voxel_size[0]), float(self.voxel_size[1])
        pcr = self.point_cloud_range
        tf = jnp.asarray(self.text_features)

        def one(hm, center, center_z, dim, rot, emb):
            scores, cls_ids, ys, xs, flat = topk_heatmap(
                jax.nn.sigmoid(jnp.transpose(hm, (2, 0, 1))), k)
            reg = jnp.concatenate(
                [center.reshape(h * w, -1), center_z.reshape(h * w, -1),
                 dim.reshape(h * w, -1), rot.reshape(h * w, -1)], axis=-1)
            g = reg[flat]
            x = (xs.astype(jnp.float32) + g[:, 0]) * self.stride * vx + pcr[0]
            y = (ys.astype(jnp.float32) + g[:, 1]) * self.stride * vy + pcr[1]
            boxes = jnp.concatenate(
                [x[:, None], y[:, None], g[:, 2:3], jnp.exp(g[:, 3:6]),
                 jnp.arctan2(g[:, 7], g[:, 6])[:, None]], axis=-1)
            e = emb.reshape(h * w, -1)[flat]
            e = e / (jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-8)
            sim = jax.nn.softmax(self.logit_scale * e @ tf.T, axis=-1)
            labels = jnp.argmax(sim, axis=-1).astype(jnp.int32) + 1
            final_scores = scores * jnp.max(sim, axis=-1)
            ok = (
                (scores > score_thresh)
                & jnp.all(boxes[:, :3] >= post_range[:3], -1)
                & jnp.all(boxes[:, :3] <= post_range[3:], -1))
            return boxes, jnp.where(ok, final_scores, 0.0), labels, ok

        boxes, scores, labels, ok = jax.vmap(one)(
            preds["hm"], preds["center"], preds["center_z"], preds["dim"],
            preds["rot"], preds["emb"])
        from ...ops.nms import nms_bev

        nms_cfg = pp.get("NMS_CONFIG", {})

        def nms_one(bx, sc, lb, valid):
            idx, num = nms_bev(
                bx, sc, float(nms_cfg.get("NMS_THRESH", 0.2)),
                pre_maxsize=int(nms_cfg.get("NMS_PRE_MAXSIZE", k)),
                post_maxsize=int(nms_cfg.get("NMS_POST_MAXSIZE", 83)),
                valid_mask=valid)
            safe = jnp.clip(idx, 0)
            good = idx >= 0
            return (jnp.where(good[:, None], bx[safe], 0.0),
                    jnp.where(good, sc[safe], 0.0),
                    jnp.where(good, lb[safe], 0).astype(jnp.int32), num)

        ob, os_, ol, oc = jax.vmap(nms_one)(boxes, scores, labels, ok)
        return Detections(ob, os_, ol, oc)


def make_center_head_clip_tools(model_cfg, num_class, grid_size,
                                point_cloud_range, voxel_size,
                                class_names=(), text_features=None):
    if text_features is None:
        # deterministic placeholder embeddings (production overlays the CLIP
        # text tower output; weights-gated like the other VLM components)
        rng = np.random.RandomState(0)
        e = int(model_cfg.get("EMBED_DIM", 512))
        t = rng.standard_normal((num_class, e)).astype(np.float32)
        text_features = t / np.linalg.norm(t, axis=-1, keepdims=True)
    return CenterHeadCLIPTools(
        model_cfg=model_cfg,
        num_classes=num_class,
        grid_size=tuple(int(g) for g in grid_size),
        point_cloud_range=tuple(float(v) for v in point_cloud_range),
        voxel_size=tuple(float(v) for v in voxel_size),
        class_names=tuple(class_names),
        text_features=np.asarray(text_features),
    )

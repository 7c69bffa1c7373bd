"""Frustum PointNets v1 — instance seg + T-Net + amodal box estimation.

Parity target: /root/reference/pcdet/models/frustum_pointnets_v1.py:14-286
and the loss in pcdet/utils/frustum_model_util.py:240-360. Consumers:
FrustumProposerSEG (uses PointNetInstanceSeg as the frustum foreground
filter, frustum_proposals_seg.py:94-103) and FrustumPointNetHead
(dense_heads/frustum_pointnet_v1.py).

TPU redesign notes:
  * Conv1d(k=1) == Dense over the point axis; everything runs in
    (B, N, C) with validity masks instead of ragged clouds.
  * The reference resamples predicted-foreground points to a fixed 512
    (point_cloud_masking / gather_object_pts). Downstream consumers are
    per-point MLPs + global max/mean, for which masking is EXACT
    equivalence — so we keep all N slots and mask, avoiding the
    data-dependent gather. (BatchNorm statistics therefore see the
    masked set rather than the resampled one — a documented deviation.)
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import MaskedBatchNorm

NEG_INF = -1e9


def _masked_max(x, valid):
    """(..., N, C) masked max over N."""
    big_neg = jnp.where(valid[..., None], x, NEG_INF)
    return jnp.max(big_neg, axis=-2)


def _mlp_stack(x, valid, dims, prefix, train):
    for i, d in enumerate(dims):
        x = nn.Dense(d, name=f"{prefix}_fc{i}")(x)
        x = MaskedBatchNorm(d, name=f"{prefix}_bn{i}")(x, valid, train)
        x = nn.relu(x)
    return x


class PointNetInstanceSeg(nn.Module):
    """Per-point FG/BG segmentation (frustum_pointnets_v1.py:14-75):
    encoder 64-64-64-128-1024, global max + class one-hot, skip from the
    2nd layer, decoder 512-256-128-128-2."""

    n_classes: int = 3

    @nn.compact
    def __call__(self, pts, one_hot, valid, train: bool = False):
        """pts (B, N, 3); one_hot (B, C); valid (B, N) -> logits (B, N, 2)."""
        n = pts.shape[-2]
        out1 = _mlp_stack(pts, valid, (64,), "enc0", train)
        out2 = _mlp_stack(out1, valid, (64,), "enc1", train)
        x = _mlp_stack(out2, valid, (64, 128, 1024), "enc2", train)
        global_feat = _masked_max(x, valid)                      # (B, 1024)
        glob = jnp.concatenate([global_feat, one_hot], -1)       # (B, 1024+C)
        glob = jnp.broadcast_to(glob[..., None, :],
                                out2.shape[:-1] + (glob.shape[-1],))
        x = jnp.concatenate([out2, glob], -1)
        x = _mlp_stack(x, valid, (512, 256, 128, 128), "dec", train)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(2, name="seg_out")(x)


class STNxyz(nn.Module):
    """T-Net center regression (frustum_pointnets_v1.py:126-157);
    final layer zero-initialised."""

    @nn.compact
    def __call__(self, pts, one_hot, valid, train: bool = False):
        x = _mlp_stack(pts, valid, (128, 128, 256), "enc", train)
        x = _masked_max(x, valid)
        x = jnp.concatenate([x, one_hot], -1)
        x = nn.relu(MaskedBatchNorm(256, name="fbn0")(
            nn.Dense(256, name="fc0")(x), jnp.ones(x.shape[:-1], bool),
            train))
        x = nn.relu(MaskedBatchNorm(128, name="fbn1")(
            nn.Dense(128, name="fc1")(x), jnp.ones(x.shape[:-1], bool),
            train))
        return nn.Dense(3, name="fc_out",
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros)(x)


class PointNetEstimation(nn.Module):
    """Amodal box estimation (frustum_pointnets_v1.py:77-125): encoder
    128-128-256-512, global max + one-hot, fc 512-256 ->
    3 + 2*NH + 4*NS raw outputs."""

    n_classes: int = 3
    n_heading_bin: int = 12
    n_size_cluster: int = 3

    @nn.compact
    def __call__(self, pts, one_hot, valid, train: bool = False):
        x = _mlp_stack(pts, valid, (128, 128, 256, 512), "enc", train)
        x = _masked_max(x, valid)
        x = jnp.concatenate([x, one_hot], -1)
        ones = jnp.ones(x.shape[:-1], bool)
        x = nn.relu(MaskedBatchNorm(512, name="fbn0")(
            nn.Dense(512, name="fc0")(x), ones, train))
        x = nn.relu(MaskedBatchNorm(256, name="fbn1")(
            nn.Dense(256, name="fc1")(x), ones, train))
        out = 3 + self.n_heading_bin * 2 + self.n_size_cluster * 4
        return nn.Dense(out, name="fc_out")(x)


class FrustumPointNetv1(nn.Module):
    """Seg -> masked centroid -> T-Net -> box estimation
    (frustum_pointnets_v1.py:158-243). `size_anchors` is the hierarchy
    anchor table ((NS, 3) tuple-of-tuples for hashability)."""

    n_classes: int = 3
    n_heading_bin: int = 12
    size_anchors: Tuple = ((3.9, 1.6, 1.56),)

    @nn.compact
    def __call__(self, pts, one_hot, valid, train: bool = False):
        anchors = jnp.asarray(self.size_anchors, jnp.float32)
        ns = anchors.shape[0]
        logits = PointNetInstanceSeg(self.n_classes, name="ins_seg")(
            pts, one_hot, valid, train)

        # point_cloud_masking: predicted-FG centroid + masked subset
        fg = (logits[..., 1] > logits[..., 0]) & valid
        # fall back to all valid points when nothing is predicted FG
        any_fg = jnp.any(fg, axis=-1, keepdims=True)
        fg_eff = jnp.where(any_fg, fg, valid)
        w = fg_eff.astype(pts.dtype)
        denom = jnp.clip(w.sum(-1, keepdims=True), 1.0)
        centroid = (pts * w[..., None]).sum(-2) / denom[..., :]  # (B, 3)
        obj_pts = (pts - centroid[..., None, :]) * w[..., None]

        delta = STNxyz(name="stn")(obj_pts, one_hot, fg_eff, train)
        stage1_center = delta + centroid
        obj_pts = obj_pts - delta[..., None, :] * w[..., None]

        box_pred = PointNetEstimation(
            self.n_classes, self.n_heading_bin, ns, name="est")(
            obj_pts, one_hot, fg_eff, train)

        nh = self.n_heading_bin
        center_boxnet = box_pred[..., :3]
        heading_scores = box_pred[..., 3:3 + nh]
        heading_res_norm = box_pred[..., 3 + nh:3 + 2 * nh]
        heading_res = heading_res_norm * (jnp.pi / nh)
        size_scores = box_pred[..., 3 + 2 * nh:3 + 2 * nh + ns]
        size_res_norm = box_pred[..., 3 + 2 * nh + ns:].reshape(
            box_pred.shape[:-1] + (ns, 3))
        size_res = size_res_norm * anchors

        return {
            "logits": logits,
            "mask": fg_eff,
            "stage1_center": stage1_center,
            "center": center_boxnet + stage1_center,
            "heading_scores": heading_scores,
            "heading_res_norm": heading_res_norm,
            "heading_res": heading_res,
            "size_scores": size_scores,
            "size_res_norm": size_res_norm,
            "size_res": size_res,
        }


# --------------------------------------------------------------- encoding

def encode_heading(angle, n_bins):
    """angle -> (bin class, residual) (frustum_model_util angle2class):
    bins centred at k*2pi/NH; residual in [-pi/NH, pi/NH)."""
    two_pi = 2 * jnp.pi
    a = jnp.mod(angle, two_pi)
    width = two_pi / n_bins
    cls = jnp.mod(jnp.floor(a / width + 0.5), n_bins).astype(jnp.int32)
    res = a - cls * width
    res = jnp.mod(res + jnp.pi, two_pi) - jnp.pi
    return cls, res


def decode_heading(heading_scores, heading_res, prerot=0.0):
    """Soft decode matching FrustumPointNetv1.forward(pred=True)
    (frustum_pointnets_v1.py:230-238): argmax bin centre + score-weighted
    residual, plus the frustum pre-rotation."""
    nh = heading_scores.shape[-1]
    cls = jnp.argmax(heading_scores, -1).astype(jnp.float32)
    soft = jax.nn.softmax(heading_scores, -1)
    return cls * (2 * jnp.pi / nh) + (heading_res * soft).sum(-1) + prerot


def decode_size(size_scores, size_res, anchors):
    """Score-weighted anchor + residual mixture (:218-227)."""
    soft = jax.nn.softmax(size_scores, -1)[..., None]
    return (soft * (jnp.asarray(anchors) + size_res)).sum(-2)


def _safe_norm(x, axis=-1):
    # norm with a NaN-free gradient at 0 (stage1 distance is exactly 0 at
    # init because the T-Net's final layer is zero-initialised)
    return jnp.sqrt(jnp.sum(x ** 2, axis=axis) + 1e-12)


def _huber(x, delta):
    a = jnp.abs(x)
    return jnp.where(a < delta, 0.5 * a ** 2 / delta, a - 0.5 * delta)


def frustum_pointnet_loss(out, targets, size_anchors, valid=None,
                          corner_w=10.0, box_w=1.0):
    """FrustumPointNetLoss (frustum_model_util.py:240-360): seg CE +
    box_w * (center huber(2) + stage1 huber(1) + heading cls CE +
    20*heading res huber + size cls CE + 20*size res huber +
    corner_w * flip-min corner huber).

    targets: dict with seg (B, N), center (B, 3), heading (B,),
    size_cls (B,), size (B, 3). `valid` (B,) masks padded queries."""
    anchors = jnp.asarray(size_anchors, jnp.float32)
    nh = out["heading_scores"].shape[-1]
    ns = anchors.shape[0]
    b = out["center"].shape[0]
    vmask = jnp.ones((b,)) if valid is None else valid.astype(jnp.float32)
    denom = jnp.clip(vmask.sum(), 1.0)

    def mean_v(x):
        return (x * vmask).sum() / denom

    # seg CE over valid points
    logp = jax.nn.log_softmax(out["logits"], -1)
    seg_t = jnp.clip(targets["seg"].astype(jnp.int32), 0)
    pmask = targets.get(
        "point_valid", jnp.ones(seg_t.shape, bool))
    ce = -jnp.take_along_axis(logp, seg_t[..., None], -1)[..., 0]
    pm = pmask.astype(jnp.float32) * vmask[:, None]
    seg_loss = (ce * pm).sum() / jnp.clip(pm.sum(), 1.0)

    center_loss = mean_v(_huber(
        _safe_norm(out["center"] - targets["center"]), 2.0))
    stage1_loss = mean_v(_huber(
        _safe_norm(out["center"] - out["stage1_center"]),
        1.0))

    h_cls, h_res = encode_heading(targets["heading"], nh)
    h_logp = jax.nn.log_softmax(out["heading_scores"], -1)
    h_cls_loss = mean_v(-jnp.take_along_axis(
        h_logp, h_cls[..., None], -1)[..., 0])
    h_onehot = jax.nn.one_hot(h_cls, nh)
    h_res_pred = (out["heading_res_norm"] * h_onehot).sum(-1)
    h_res_loss = mean_v(_huber(
        h_res_pred - h_res / (jnp.pi / nh), 1.0))

    s_cls = targets["size_cls"].astype(jnp.int32)
    s_logp = jax.nn.log_softmax(out["size_scores"], -1)
    s_cls_loss = mean_v(-jnp.take_along_axis(
        s_logp, s_cls[..., None], -1)[..., 0])
    s_onehot = jax.nn.one_hot(s_cls, ns)[..., None]
    s_res_pred = (out["size_res_norm"] * s_onehot).sum(-2)
    mean_size = anchors[s_cls]
    s_res_label = (targets["size"] - mean_size) / mean_size
    s_res_loss = mean_v(_huber(
        _safe_norm(s_res_label - s_res_pred), 1.0))

    # corner loss with flip ambiguity
    def corners(center, heading, size):
        dx, dy, dz = size[..., 0], size[..., 1], size[..., 2]
        tmpl = jnp.asarray(
            [[1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
             [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1]],
            jnp.float32) / 2
        local = tmpl[None] * jnp.stack([dx, dy, dz], -1)[:, None, :]
        c, s = jnp.cos(heading)[:, None], jnp.sin(heading)[:, None]
        x = local[..., 0] * c - local[..., 1] * s
        y = local[..., 0] * s + local[..., 1] * c
        rot = jnp.stack([x, y, local[..., 2]], -1)
        return rot + center[:, None, :]

    pred_heading = decode_heading(
        jax.lax.stop_gradient(out["heading_scores"]), out["heading_res"])
    pred_size = decode_size(
        jax.lax.stop_gradient(out["size_scores"]), out["size_res"],
        anchors)
    c_pred = corners(out["center"], pred_heading, pred_size)
    gt_heading = targets["heading"]
    gt_size = targets["size"]
    c_gt = corners(targets["center"], gt_heading, gt_size)
    c_gt_flip = corners(targets["center"], gt_heading + jnp.pi, gt_size)
    d = jnp.minimum(_safe_norm(c_pred - c_gt),
                    _safe_norm(c_pred - c_gt_flip))
    corner_loss = mean_v(_huber(d, 1.0).mean(-1))

    total = seg_loss + box_w * (
        center_loss + stage1_loss + h_cls_loss + s_cls_loss
        + 20.0 * h_res_loss + 20.0 * s_res_loss
        + corner_w * corner_loss)
    return total, {
        "seg_loss": seg_loss, "center_loss": center_loss,
        "stage1_loss": stage1_loss, "heading_cls_loss": h_cls_loss,
        "heading_res_loss": h_res_loss, "size_cls_loss": s_cls_loss,
        "size_res_loss": s_res_loss, "corner_loss": corner_loss,
    }

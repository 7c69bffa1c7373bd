"""Loss functions, numerically matching the reference's pcdet/utils/loss_utils.py
(/root/reference) but as pure JAX functions returning unreduced losses.

All functions take/return jnp arrays; "weights" follow the reference's
anchor-wise weighting conventions. No module state: code weights etc. are
plain arguments so everything stays jit/grad friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_cross_entropy_with_logits(logits, targets):
    """max(x,0) - x*z + log1p(exp(-|x|)) (loss_utils.py:26-43)."""
    return (
        jnp.clip(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def sigmoid_focal_loss(logits, targets, weights, gamma: float = 2.0,
                       alpha: float = 0.25):
    """SigmoidFocalClassificationLoss (loss_utils.py:10-74).

    logits/targets: (B, A, C); weights: (B, A) or (B, A, C).
    Returns (B, A, C) weighted loss (no reduction).
    """
    pred_sigmoid = jax.nn.sigmoid(logits)
    alpha_weight = targets * alpha + (1 - targets) * (1 - alpha)
    pt = targets * (1.0 - pred_sigmoid) + (1.0 - targets) * pred_sigmoid
    focal_weight = alpha_weight * jnp.power(pt, gamma)
    bce = sigmoid_cross_entropy_with_logits(logits, targets)
    loss = focal_weight * bce
    if weights.ndim == loss.ndim - 1:
        weights = weights[..., None]
    return loss * weights


def smooth_l1(diff, beta: float):
    if beta < 1e-5:
        return jnp.abs(diff)
    n = jnp.abs(diff)
    return jnp.where(n < beta, 0.5 * n * n / beta, n - 0.5 * beta)


def weighted_smooth_l1_loss(preds, targets, weights=None, beta: float = 1.0 / 9.0,
                            code_weights=None):
    """WeightedSmoothL1Loss (loss_utils.py:211-273). NaN targets are ignored."""
    targets = jnp.where(jnp.isnan(targets), preds, targets)
    diff = preds - targets
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, dtype=diff.dtype)
    loss = smooth_l1(diff, beta)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def weighted_l1_loss(preds, targets, weights=None, code_weights=None):
    """WeightedL1Loss (loss_utils.py:293-334)."""
    targets = jnp.where(jnp.isnan(targets), preds, targets)
    diff = preds - targets
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, dtype=diff.dtype)
    loss = jnp.abs(diff)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def l1_loss(preds, targets):
    """Plain elementwise L1 (loss_utils.py:718-727)."""
    return jnp.abs(preds - targets)


def weighted_cross_entropy_loss(logits, one_hot_targets, weights):
    """WeightedCrossEntropyLoss (loss_utils.py:336-...): softmax CE vs argmax
    of one-hot, anchor-wise weighted. logits: (B, A, C)."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.sum(one_hot_targets * log_probs, axis=-1)
    return ce * weights


def gaussian_focal_loss(pred, target, alpha: float = 2.0, gamma: float = 4.0):
    """GaussianFocalLoss (loss_utils.py:729-761): pred is a probability map,
    target a gaussian heatmap; positives are exactly-1 pixels."""
    eps = 1e-12
    pos_weights = (target == 1.0).astype(pred.dtype)
    neg_weights = jnp.power(1 - target, gamma)
    pos_loss = -jnp.log(pred + eps) * jnp.power(1 - pred, alpha) * pos_weights
    neg_loss = -jnp.log(1 - pred + eps) * jnp.power(pred, alpha) * neg_weights
    return pos_loss + neg_loss


def focal_loss_centernet(pred, target, mask=None):
    """FocalLossCenterNet / neg_loss_cornernet (loss_utils.py:452-498):
    normalized CornerNet focal loss over a heatmap. pred: probabilities.

    Returns a scalar: -1/N * [pos_loss + neg_loss], N = #positives (or the
    plain neg loss if there are no positives).
    """
    eps = 1e-12  # reference relies on clamped sigmoid upstream; keep eps here
    pos_inds = (target == 1.0).astype(pred.dtype)
    neg_inds = (target < 1.0).astype(pred.dtype)
    neg_weights = jnp.power(1 - target, 4)
    if mask is not None:
        m = mask.astype(pred.dtype)
        pos_inds = pos_inds * m
        neg_inds = neg_inds * m
    pos_loss = jnp.log(pred + eps) * jnp.power(1 - pred, 2) * pos_inds
    neg_loss = jnp.log(1 - pred + eps) * jnp.power(pred, 2) * neg_weights * neg_inds
    num_pos = jnp.sum(pos_inds)
    pos_sum = jnp.sum(pos_loss)
    neg_sum = jnp.sum(neg_loss)
    return jnp.where(
        num_pos > 0, -(pos_sum + neg_sum) / jnp.maximum(num_pos, 1.0), -neg_sum
    )


def reg_loss_centernet(regr, gt_regr, mask):
    """_reg_loss (loss_utils.py:501-530): masked L1, per-code-dim sums
    normalized by #positives. regr: (B, M, D); mask: (B, M).

    Returns (D,) per-dimension losses (reference keeps code dims separate so
    code_weights apply downstream).
    """
    num = jnp.sum(mask.astype(regr.dtype))
    m = mask.astype(regr.dtype)[..., None]
    isnotnan = jnp.logical_not(jnp.isnan(gt_regr)).astype(regr.dtype)
    m = m * isnotnan
    gt = jnp.where(jnp.isnan(gt_regr), 0.0, gt_regr)
    loss = jnp.abs(regr * m - gt * m)
    loss = jnp.sum(loss, axis=(0, 1))  # (D,)
    return loss / jnp.clip(num, 1.0)


def clip_sigmoid(x, eps: float = 1e-4):
    """TransFusion's clamped sigmoid (model_utils/transfusion_utils.py)."""
    return jnp.clip(jax.nn.sigmoid(x), eps, 1 - eps)


def corner_loss_lidar(pred_boxes, gt_boxes):
    """Corner-distance loss (reference loss_utils.py:364-392
    get_corner_loss_lidar): smooth-L1 of per-corner distances against the gt
    box and its pi-flipped twin, taking the minimum. Returns (N,)."""
    from .geometry import boxes_to_corners_3d

    pred_c = boxes_to_corners_3d(pred_boxes)           # (N, 8, 3)
    gt_c = boxes_to_corners_3d(gt_boxes)
    gt_flip = gt_boxes.at[:, 6].add(jnp.pi)
    gt_c_flip = boxes_to_corners_3d(gt_flip)
    d = jnp.minimum(
        jnp.linalg.norm(pred_c - gt_c, axis=2),
        jnp.linalg.norm(pred_c - gt_c_flip, axis=2),
    )
    return jnp.mean(smooth_l1(d, beta=1.0), axis=1)

"""Camera geometry for the open-vocabulary pipeline.

Parity with the reference's projection math (pcdet/models/dense_heads/
frustum_proposals_v1.py:128-140 get_cam_frustum, :1432-1493
project_to_camera, :1509-1545 get_geometry_at_image_coords — /root/reference)
as vectorized jnp, plus an exact masked-quantile (torch.quantile linear
interpolation semantics) used for frustum depth bounds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.geometry import CORNER_TEMPLATE


def project_to_camera(points, lidar2image, lidar_aug_matrix=None,
                      image_size=(900, 1600)):
    """points (P, 3) lidar-frame -> (u, v, depth) per camera + validity.

    lidar2image: (NCAM, 4, 4). Returns coords (NCAM, P, 3) [u, v, depth] and
    on_img (NCAM, P) (in front of camera & inside image bounds).
    """
    pts = points
    if lidar_aug_matrix is not None:
        # inverse data augmentation (project raw-frame geometry)
        pts = pts - lidar_aug_matrix[:3, 3]
        inv = jnp.linalg.inv(lidar_aug_matrix[:3, :3])
        pts = jnp.einsum('pj,ij->pi', pts, inv,
                         precision=jax.lax.Precision.HIGHEST)
    # lidar -> image
    hom = jnp.einsum(
        'nij,pj->nip', lidar2image[:, :3, :3], pts,
        precision=jax.lax.Precision.HIGHEST,
    ) + lidar2image[:, :3, 3:4]  # (N, 3, P)
    depth = jnp.clip(hom[:, 2, :], 1e-5, 1e5)
    u = hom[:, 0, :] / depth
    v = hom[:, 1, :] / depth
    h, w = image_size
    on_img = (
        (hom[:, 2, :] > 0)
        & (u >= 0) & (u < w)
        & (v >= 0) & (v < h)
    )
    coords = jnp.stack([u, v, depth], axis=-1)  # (N, P, 3)
    return coords, on_img


def get_geometry_at_image_coords(image_coords, cam2lidar_rots, cam2lidar_trans,
                                 intrins, extra_rots=None, extra_trans=None):
    """(L, 3) [u, v, depth] -> (L, 3) lidar xyz.

    cam2lidar_rots (L, 3, 3), cam2lidar_trans (L, 3), intrins (L, 3, 3) —
    already gathered per point (use jnp.take for per-camera selection).
    """
    pts = jnp.concatenate(
        [image_coords[:, :2] * image_coords[:, 2:3], image_coords[:, 2:3]],
        axis=-1,
    )
    combine = jnp.einsum(
        'lij,ljk->lik', cam2lidar_rots, jnp.linalg.inv(intrins),
        precision=jax.lax.Precision.HIGHEST,
    )
    pts = jnp.einsum('lij,lj->li', combine, pts,
                     precision=jax.lax.Precision.HIGHEST)
    pts = pts + cam2lidar_trans
    if extra_rots is not None:
        pts = jnp.einsum('ij,lj->li', extra_rots, pts,
                         precision=jax.lax.Precision.HIGHEST)
    if extra_trans is not None:
        pts = pts + extra_trans
    return pts


def get_cam_frustum(xyzxyz):
    """(..., 6) [x1, y1, zmin, x2, y2, zmax] image-space box -> (..., 8, 3)
    corners in the shared corner-template order."""
    whl = xyzxyz[..., 3:] - xyzxyz[..., :3]
    center = (xyzxyz[..., 3:] + xyzxyz[..., :3]) / 2
    template = jnp.asarray(CORNER_TEMPLATE, xyzxyz.dtype)
    return whl[..., None, :] * template + center[..., None, :]


def masked_quantile(values, mask, q):
    """torch.quantile(values[mask], q) with linear interpolation; fixed shape.

    values, mask: (P,); q scalar in [0, 1]. Returns the quantile (0 if the
    mask is empty).
    """
    big = jnp.finfo(values.dtype).max
    v = jnp.where(mask, values, big)
    v = jnp.sort(v)
    n = jnp.sum(mask)
    idx_f = q * jnp.maximum(n - 1, 0).astype(values.dtype)
    lo = jnp.floor(idx_f).astype(jnp.int32)
    hi = jnp.ceil(idx_f).astype(jnp.int32)
    frac = idx_f - lo.astype(values.dtype)
    lo_v = v[jnp.clip(lo, 0, values.shape[0] - 1)]
    hi_v = v[jnp.clip(hi, 0, values.shape[0] - 1)]
    out = lo_v * (1 - frac) + hi_v * frac
    return jnp.where(n > 0, out, 0.0)


def boxes_2d_iou(boxes_a, boxes_b):
    """(N, 4), (M, 4) xyxy -> (N, M) IoU."""
    lt = jnp.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])
    rb = jnp.minimum(boxes_a[:, None, 2:], boxes_b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(
        (boxes_a[:, 2] - boxes_a[:, 0]) * (boxes_a[:, 3] - boxes_a[:, 1]), 0.0
    )
    area_b = jnp.clip(
        (boxes_b[:, 2] - boxes_b[:, 0]) * (boxes_b[:, 3] - boxes_b[:, 1]), 0.0
    )
    return inter / jnp.clip(area_a[:, None] + area_b[None, :] - inter, 1e-7)


def nms_2d(boxes, scores, labels, thresh, valid=None, max_out=None):
    """Per-class greedy 2D NMS (torchvision batched_nms semantics).

    boxes (N, 4) xyxy. Returns keep mask (N,) — fixed shape.
    """
    n = boxes.shape[0]
    s = jnp.where(valid, scores, -jnp.inf) if valid is not None else scores
    order = jnp.argsort(-s)
    b = boxes[order]
    iou = boxes_2d_iou(b, b)
    same = labels[order][:, None] == labels[order][None, :]
    overlap = (iou > thresh) & same
    idxs = jnp.arange(n)

    def body(i, suppressed):
        row = overlap[i] & (idxs > i)
        alive = jnp.logical_not(suppressed[i]) & jnp.isfinite(s[order][i])
        return jnp.where(alive, suppressed | row, suppressed)

    suppressed = jax.lax.fori_loop(0, n, body, jnp.zeros((n,), bool))
    keep_sorted = jnp.logical_not(suppressed) & jnp.isfinite(s[order])
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep

"""ROI pooling primitives: roiaware voxel pooling and roipoint pooling.

Replaces the reference's roiaware_pool3d_cuda / roipoint_pool3d_cuda
extensions (pcdet/ops/roiaware_pool3d/src/roiaware_pool3d_kernel.cu,
pcdet/ops/roipoint_pool3d/src/roipoint_pool3d_kernel.cu under
/root/reference). Fixed-shape, batchless (vmap over batch/ROIs).

Conventions match the CUDA kernels exactly:
  * local frame = rotate by -heading about the box center
    (lidar_to_local_coords, roiaware_pool3d_kernel.cu:16-21)
  * sub-voxel index = int((local + d/2) / (d / out)) clamped to [0, out)
    (kernel.cu:57-70)
  * roiaware max pool returns 0 (not -inf) for empty cells
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _to_local(points, box):
    """(P, 3) lidar points into one box's canonical frame."""
    shift = points - box[:3]
    c, s = jnp.cos(-box[6]), jnp.sin(-box[6])
    lx = shift[:, 0] * c - shift[:, 1] * s
    ly = shift[:, 0] * s + shift[:, 1] * c
    return jnp.stack([lx, ly, shift[:, 2]], axis=1)


@functools.partial(jax.jit, static_argnames=("out_size", "pool"))
def roiaware_pool3d(rois, points, feats, points_mask, out_size=(6, 6, 6),
                    pool: str = "max"):
    """rois (R, 7); points (P, 3); feats (P, C); points_mask (P,).
    Returns (R, ox, oy, oz, C) pooled features (empty cells = 0)."""
    ox, oy, oz = (int(o) for o in out_size)
    n_cell = ox * oy * oz
    r = rois.shape[0]
    c = feats.shape[-1]

    def one(box):
        local = _to_local(points, box)
        dx, dy, dz = box[3], box[4], box[5]
        # MARGIN 1e-5 like check_pt_in_box3d; z uses center-offset convention
        inside = (
            (jnp.abs(local[:, 0]) < dx / 2 + 1e-5)
            & (jnp.abs(local[:, 1]) < dy / 2 + 1e-5)
            & (jnp.abs(local[:, 2]) < dz / 2 + 1e-5)
            & points_mask
        )
        xi = jnp.clip(((local[:, 0] + dx / 2) / (dx / ox)).astype(jnp.int32),
                      0, ox - 1)
        yi = jnp.clip(((local[:, 1] + dy / 2) / (dy / oy)).astype(jnp.int32),
                      0, oy - 1)
        zi = jnp.clip(((local[:, 2] + dz / 2) / (dz / oz)).astype(jnp.int32),
                      0, oz - 1)
        cell = (xi * oy + yi) * oz + zi
        cell = jnp.where(inside, cell, n_cell)
        if pool == "max":
            acc = jnp.full((n_cell + 1, c), -jnp.inf, feats.dtype)
            acc = acc.at[cell].max(jnp.where(inside[:, None], feats, -jnp.inf))
            out = jnp.where(jnp.isfinite(acc[:n_cell]), acc[:n_cell], 0.0)
        else:
            ssum = jnp.zeros((n_cell + 1, c), feats.dtype).at[cell].add(
                jnp.where(inside[:, None], feats, 0.0))
            cnt = jnp.zeros((n_cell + 1,), feats.dtype).at[cell].add(
                inside.astype(feats.dtype))
            out = ssum[:n_cell] / jnp.maximum(cnt[:n_cell, None], 1.0)
        return out.reshape(ox, oy, oz, c)

    return jax.vmap(one)(rois)


@functools.partial(jax.jit, static_argnames=("num_sampled",))
def roipoint_pool3d(rois, points, feats, points_mask, num_sampled: int = 512):
    """First `num_sampled` in-box points per ROI with canonical xyz
    prepended (roipoint_pool3d_kernel.cu semantics: points kept in index
    order, empty ROIs flagged). Returns (pooled (R, S, 3+C),
    empty_mask (R,))."""
    p = points.shape[0]

    def one(box):
        local = _to_local(points, box)
        inside = (
            (jnp.abs(local[:, 0]) < box[3] / 2 + 1e-5)
            & (jnp.abs(local[:, 1]) < box[4] / 2 + 1e-5)
            & (jnp.abs(local[:, 2]) < box[5] / 2 + 1e-5)
            & points_mask
        )
        order = jnp.where(inside, jnp.arange(p, dtype=jnp.int32), p)
        neg, _ = jax.lax.top_k(-order, num_sampled)
        idx = jnp.clip(-neg, 0, p - 1)
        cnt = jnp.minimum(jnp.sum(inside), num_sampled)
        slot_ok = jnp.arange(num_sampled) < cnt
        # global xyz + feats, like the CUDA kernel; canonical transform is
        # the head's job (pointrcnn_head.py)
        pooled = jnp.concatenate([points[idx], feats[idx]], axis=-1)
        pooled = jnp.where(slot_ok[:, None], pooled, 0.0)
        return pooled, cnt == 0

    return jax.vmap(one)(rois)

"""TPU-native PointNet++ primitives: FPS, ball query, grouping, three-NN
interpolation.

Replaces the reference's pointnet2_stack / pointnet2_batch CUDA extensions
(pcdet/ops/pointnet2/*/src, ~2.8k LoC CUDA; wrappers
pointnet2_utils.py under /root/reference) — used by PV-RCNN(++) keypoint
abstraction, PointRCNN backbones and the ROI heads.

Design: everything is fixed-shape and batchless (vmap for batches).
  * FPS = fixed-iteration lax.scan over argmax of running min-distances
    (identical greedy semantics to sampling_gpu.cu).
  * ball_query = full (M, P) distance matrix -> first-nsample selection via
    top_k over order keys (ball_query_gpu.cu keeps the FIRST nsample points
    in index order and back-fills slot 0's index — reproduced exactly).
  * grouping = plain gathers (small row counts; fine on TPU).
  * three_nn = top_k over the distance matrix.
Validity handled with masks; invalid points sit at +inf distance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

INF = 1e10


def _sqdist(a, b):
    """(M, 3) x (P, 3) -> (M, P) squared distances."""
    return jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, axis=-1)


@functools.partial(jax.jit, static_argnames=("k",))
def farthest_point_sample(points, mask, k: int):
    """Greedy farthest-point sampling (sampling_gpu.cu semantics: start at
    index 0, iteratively take the point with max distance-to-selected).

    points: (P, 3); mask: (P,) bool. Returns (k,) int32 indices. When fewer
    than k valid points exist, indices repeat (distance 0 ties resolve to
    argmax's first occurrence) — callers mask by count if needed.
    """
    p = points.shape[0]
    start = jnp.argmax(mask)  # first valid point
    d0 = jnp.where(mask, INF, -INF)

    def body(carry, _):
        dists, last = carry
        d_new = jnp.sum((points - points[last]) ** 2, axis=-1)
        dists = jnp.minimum(dists, jnp.where(mask, d_new, -INF))
        nxt = jnp.argmax(dists)
        return (dists, nxt), last

    (_, _), idx = jax.lax.scan(body, (d0, start), None, length=k)
    return idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("nsample",))
def ball_query(centers, centers_mask, points, points_mask, radius,
               nsample: int):
    """For each center, the FIRST `nsample` point indices (in point order)
    within `radius` (ball_query_gpu.cu). Empty slots are back-filled with
    the first in-radius index; centers with NO in-radius point get cnt 0.

    Returns (idx (M, nsample) int32, cnt (M,) int32).
    """
    p = points.shape[0]
    d2 = _sqdist(centers, points)
    within = (d2 < radius * radius) & points_mask[None, :] \
        & centers_mask[:, None]
    order = jnp.where(within, jnp.arange(p, dtype=jnp.int32)[None, :], p)
    # smallest-nsample order keys = first nsample in index order
    neg, _ = jax.lax.top_k(-order, nsample)           # (M, nsample)
    idx = -neg
    cnt = jnp.sum(within, axis=1).astype(jnp.int32)
    cnt = jnp.minimum(cnt, nsample)
    first = idx[:, :1]
    slot = jnp.arange(nsample, dtype=jnp.int32)[None, :]
    idx = jnp.where(slot < cnt[:, None], idx, first)  # back-fill
    idx = jnp.where(cnt[:, None] > 0, idx, 0)
    return idx.astype(jnp.int32), cnt


def group_points(feats, idx):
    """feats (P, C), idx (M, S) -> (M, S, C)."""
    return feats[idx]


@functools.partial(jax.jit, static_argnames=())
def three_nn(unknown, unknown_mask, known, known_mask):
    """3 nearest known points per unknown (interpolate_gpu.cu). Returns
    (dist (N, 3), idx (N, 3))."""
    d2 = _sqdist(unknown, known)
    d2 = jnp.where(known_mask[None, :], d2, INF)
    neg, idx = jax.lax.top_k(-d2, 3)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx.astype(jnp.int32)


def three_interpolate(feats, idx, dist):
    """feats (M, C); idx/dist (N, 3) -> (N, C) inverse-distance weighted."""
    w = 1.0 / jnp.maximum(dist, 1e-8) ** 2
    w = w / jnp.sum(w, axis=1, keepdims=True)
    return jnp.sum(feats[idx] * w[..., None], axis=1)


def query_and_group(centers, centers_mask, points, points_mask, feats,
                    radius, nsample: int, use_xyz: bool = True):
    """Ball query + relative-xyz grouping (QueryAndGroup semantics,
    pointnet2_utils.py). Returns (grouped (M, S, C[+3]), cnt (M,))."""
    idx, cnt = ball_query(centers, centers_mask, points, points_mask,
                          radius, nsample)
    grouped_xyz = points[idx] - centers[:, None, :]
    if feats is None:
        out = grouped_xyz
    else:
        grouped = feats[idx]
        out = jnp.concatenate([grouped_xyz, grouped], axis=-1) if use_xyz \
            else grouped
    # zero out empty groups (cnt == 0) like the CUDA kernel's empty_ball_mask
    out = jnp.where((cnt > 0)[:, None, None], out, 0.0)
    return out, cnt

"""CenterNet-style heatmap utilities, vectorized.

Parity with pcdet/models/model_utils/centernet_utils.py (/root/reference):
gaussian_radius (:9-35) and draw_gaussian_to_heatmap (:47-70), but the
per-box python drawing loop becomes one batched evaluation + scatter-max —
a fixed-shape program: every (box, pixel) pair is evaluated, windowed to the
box's radius, and max-reduced into its class map.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_radius(height, width, min_overlap: float = 0.5):
    """Elementwise CenterNet radius (centernet_utils.py:9-35)."""
    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.clip(b1**2 - 4 * a1 * c1, 0.0))
    r1 = (b1 + sq1) / 2

    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = jnp.sqrt(jnp.clip(b2**2 - 4 * a2 * c2, 0.0))
    r2 = (b2 + sq2) / 2

    a3 = 4.0 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = jnp.sqrt(jnp.clip(b3**2 - 4 * a3 * c3, 0.0))
    r3 = (b3 + sq3) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


@functools.partial(jax.jit, static_argnames=("num_classes", "height", "width"))
def draw_heatmap(centers, radii, class_ids, valid, num_classes: int,
                 height: int, width: int):
    """Batched gaussian heatmap targets.

    centers: (M, 2) float (x, y) in feature-map units; radii: (M,) int32;
    class_ids: (M,) int32 0-indexed; valid: (M,) bool.
    Returns (num_classes, height, width) float32, each pixel the max gaussian.

    Semantics match draw_gaussian_to_heatmap: gaussian centered on the INT
    center with sigma = (2r+1)/6, windowed to |dx|<=r, |dy|<=r, tiny values
    zeroed.
    """
    m = centers.shape[0]
    cx = centers[:, 0].astype(jnp.int32)
    cy = centers[:, 1].astype(jnp.int32)

    ys = jnp.arange(height)[None, :, None]   # (1, H, 1)
    xs = jnp.arange(width)[None, None, :]    # (1, 1, W)
    dy = ys - cy[:, None, None]
    dx = xs - cx[:, None, None]
    diameter = 2 * radii + 1
    sigma = diameter.astype(jnp.float32) / 6.0
    g = jnp.exp(
        -(dx.astype(jnp.float32) ** 2 + dy.astype(jnp.float32) ** 2)
        / (2 * sigma**2)[:, None, None]
    )
    inside = (
        (jnp.abs(dx) <= radii[:, None, None])
        & (jnp.abs(dy) <= radii[:, None, None])
        & valid[:, None, None]
    )
    # eps truncation (gaussian2D zeroes values < eps * max; max == 1 at center)
    g = jnp.where(inside & (g >= jnp.finfo(jnp.float32).eps), g, 0.0)

    heatmap = jnp.zeros((num_classes, height, width), jnp.float32)
    cls = jnp.where(valid, class_ids, num_classes)
    heatmap = jnp.concatenate(
        [heatmap, jnp.zeros((1, height, width), jnp.float32)], axis=0
    )
    heatmap = heatmap.at[cls].max(g)
    return heatmap[:num_classes]


@functools.partial(jax.jit, static_argnames=("k",))
def topk_heatmap(scores, k: int):
    """(C, H, W) -> per-map top-k across all classes:
    (scores (k,), class_ids (k,), ys (k,), xs (k,), flat_inds (k,))."""
    c, h, w = scores.shape
    flat = scores.reshape(-1)
    top_scores, top_inds = jax.lax.top_k(flat, k)
    class_ids = (top_inds // (h * w)).astype(jnp.int32)
    spatial = top_inds % (h * w)
    ys = (spatial // w).astype(jnp.int32)
    xs = (spatial % w).astype(jnp.int32)
    return top_scores, class_ids, ys, xs, spatial.astype(jnp.int32)

"""Heatmap target builder vs a loop-based reference implementation of
draw_gaussian_to_heatmap (centernet_utils.py:38-70 semantics)."""

import numpy as np

from findnpropagate_tpu.models.model_utils.centernet import (
    draw_heatmap,
    gaussian_radius,
    topk_heatmap,
)


def ref_draw(heatmap, center, radius):
    """Reference-style python drawing on one class map."""
    diameter = 2 * radius + 1
    m = (diameter - 1) / 2
    y, x = np.ogrid[-m : m + 1, -m : m + 1]
    sigma = diameter / 6
    g = np.exp(-(x * x + y * y) / (2 * sigma * sigma))
    g[g < np.finfo(g.dtype).eps * g.max()] = 0
    cx, cy = int(center[0]), int(center[1])
    h, w = heatmap.shape
    left, right = min(cx, radius), min(w - cx, radius + 1)
    top, bottom = min(cy, radius), min(h - cy, radius + 1)
    if min(right + left, bottom + top) > 0:
        heatmap[cy - top : cy + bottom, cx - left : cx + right] = np.maximum(
            heatmap[cy - top : cy + bottom, cx - left : cx + right],
            g[radius - top : radius + bottom, radius - left : radius + right],
        )
    return heatmap


def test_draw_heatmap_matches_reference_loop():
    rng = np.random.RandomState(0)
    h = w = 32
    m = 10
    centers = rng.uniform(2, 29, (m, 2)).astype(np.float32)
    radii = rng.randint(2, 6, m).astype(np.int32)
    classes = rng.randint(0, 3, m).astype(np.int32)
    valid = np.ones(m, bool)
    valid[7:] = False

    got = np.asarray(
        draw_heatmap(centers, radii, classes, valid, num_classes=3,
                     height=h, width=w)
    )
    want = np.zeros((3, h, w), np.float32)
    for i in range(7):
        ref_draw(want[classes[i]], centers[i], int(radii[i]))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gaussian_radius_matches_formula():
    h = np.array([4.0, 10.0])
    w = np.array([2.0, 8.0])
    r = np.asarray(gaussian_radius(h, w, 0.5))
    # closed-form check for first element
    b1 = h + w
    c1 = w * h * 0.5 / 1.5
    r1 = (b1 + np.sqrt(b1**2 - 4 * c1)) / 2
    b2 = 2 * (h + w)
    c2 = 0.5 * w * h
    r2 = (b2 + np.sqrt(b2**2 - 16 * c2)) / 8 * 4  # (b2+sq2)/2 with a2=4 -> /2? keep below
    assert np.all(r <= r1 + 1e-4)
    assert np.all(r > 0)


def test_topk_heatmap():
    scores = np.zeros((2, 8, 8), np.float32)
    scores[1, 3, 5] = 0.9
    scores[0, 2, 2] = 0.8
    s, cls, ys, xs, flat = (np.asarray(a) for a in topk_heatmap(scores, k=2))
    assert s[0] == np.float32(0.9) and cls[0] == 1 and ys[0] == 3 and xs[0] == 5
    assert s[1] == np.float32(0.8) and cls[1] == 0 and ys[1] == 2 and xs[1] == 2

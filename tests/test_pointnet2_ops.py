"""PointNet++ / ROI pooling primitives vs brute-force numpy oracles
(CUDA-semantics parity: sampling_gpu.cu greedy FPS, ball_query_gpu.cu
first-k-in-order + backfill, roiaware_pool3d_kernel.cu cell convention)."""

import jax.numpy as jnp
import numpy as np

from findnpropagate_tpu.ops.pointnet2 import (
    ball_query,
    farthest_point_sample,
    group_points,
    query_and_group,
    three_interpolate,
    three_nn,
)
from findnpropagate_tpu.ops.roi_pool import roiaware_pool3d, roipoint_pool3d


def fps_oracle(points, mask, k):
    idx = [int(np.argmax(mask))]
    d = np.where(mask, np.inf, -np.inf)
    for _ in range(k - 1):
        dn = np.sum((points - points[idx[-1]]) ** 2, axis=-1)
        d = np.minimum(d, np.where(mask, dn, -np.inf))
        idx.append(int(np.argmax(d)))
    return np.asarray(idx)


def test_fps_matches_oracle():
    rng = np.random.RandomState(0)
    pts = rng.randn(200, 3).astype(np.float32)
    mask = np.ones(200, bool)
    mask[150:] = False
    got = np.asarray(farthest_point_sample(jnp.asarray(pts),
                                           jnp.asarray(mask), 32))
    want = fps_oracle(pts, mask, 32)
    np.testing.assert_array_equal(got, want)
    # all selected points valid
    assert mask[got].all()


def test_ball_query_first_k_and_backfill():
    rng = np.random.RandomState(1)
    pts = rng.randn(100, 3).astype(np.float32)
    ctr = pts[:5] + 0.01
    mask = np.ones(100, bool)
    idx, cnt = ball_query(jnp.asarray(ctr), jnp.ones(5, bool),
                          jnp.asarray(pts), jnp.asarray(mask), 0.8, 8)
    idx, cnt = np.asarray(idx), np.asarray(cnt)
    for i in range(5):
        d = np.linalg.norm(ctr[i] - pts, axis=-1)
        within = np.where(d < 0.8)[0]
        want_cnt = min(len(within), 8)
        assert cnt[i] == want_cnt
        np.testing.assert_array_equal(idx[i, :want_cnt], within[:want_cnt])
        if want_cnt:
            # backfill with first index
            np.testing.assert_array_equal(idx[i, want_cnt:],
                                          within[0] * np.ones(8 - want_cnt))


def test_ball_query_empty_center():
    pts = np.zeros((10, 3), np.float32)
    ctr = np.full((1, 3), 100.0, np.float32)
    idx, cnt = ball_query(jnp.asarray(ctr), jnp.ones(1, bool),
                          jnp.asarray(pts), jnp.ones(10, bool), 0.5, 4)
    assert int(cnt[0]) == 0
    g, c2 = query_and_group(jnp.asarray(ctr), jnp.ones(1, bool),
                            jnp.asarray(pts), jnp.ones(10, bool),
                            jnp.asarray(np.ones((10, 2), np.float32)),
                            0.5, 4)
    assert np.all(np.asarray(g) == 0.0)  # empty_ball_mask zeroing


def test_three_nn_interpolate():
    rng = np.random.RandomState(2)
    known = rng.randn(50, 3).astype(np.float32)
    unknown = rng.randn(20, 3).astype(np.float32)
    feats = rng.randn(50, 4).astype(np.float32)
    dist, idx = three_nn(jnp.asarray(unknown), jnp.ones(20, bool),
                         jnp.asarray(known), jnp.ones(50, bool))
    dist, idx = np.asarray(dist), np.asarray(idx)
    for i in range(20):
        d = np.linalg.norm(unknown[i] - known, axis=-1)
        want = np.sort(d)[:3]
        np.testing.assert_allclose(np.sort(dist[i]), want, rtol=1e-5)
    out = np.asarray(three_interpolate(jnp.asarray(feats), jnp.asarray(idx),
                                       jnp.asarray(dist)))
    w = 1.0 / np.maximum(dist, 1e-8) ** 2
    w = w / w.sum(1, keepdims=True)
    want = (feats[idx] * w[..., None]).sum(1)
    np.testing.assert_allclose(out, want, rtol=1e-4)


def roiaware_oracle(roi, pts, feats, out, pool):
    ox, oy, oz = out
    res = np.zeros((ox, oy, oz, feats.shape[1]), np.float32)
    cntg = np.zeros((ox, oy, oz), np.int32)
    c, s = np.cos(-roi[6]), np.sin(-roi[6])
    for p, f in zip(pts, feats):
        sh = p - roi[:3]
        lx = sh[0] * c - sh[1] * s
        ly = sh[0] * s + sh[1] * c
        lz = sh[2]
        if abs(lx) >= roi[3] / 2 or abs(ly) >= roi[4] / 2 or abs(lz) >= roi[5] / 2:
            continue
        xi = min(int((lx + roi[3] / 2) / (roi[3] / ox)), ox - 1)
        yi = min(int((ly + roi[4] / 2) / (roi[4] / oy)), oy - 1)
        zi = min(int((lz + roi[5] / 2) / (roi[5] / oz)), oz - 1)
        if pool == "max":
            if cntg[xi, yi, zi] == 0:
                res[xi, yi, zi] = f
            else:
                res[xi, yi, zi] = np.maximum(res[xi, yi, zi], f)
        else:
            res[xi, yi, zi] += f
        cntg[xi, yi, zi] += 1
    if pool == "avg":
        res = res / np.maximum(cntg[..., None], 1)
    return res


def test_roiaware_pool_matches_oracle():
    rng = np.random.RandomState(3)
    rois = np.array([[0, 0, 0, 4, 2, 2, 0.3], [5, 5, 0, 2, 2, 2, -0.7]],
                    np.float32)
    pts = np.concatenate([
        rng.randn(200, 3).astype(np.float32) * 1.2,
        rng.randn(200, 3).astype(np.float32) * 1.2 + np.array([5, 5, 0]),
    ])
    feats = rng.randn(400, 5).astype(np.float32)
    for pool in ("max", "avg"):
        got = np.asarray(roiaware_pool3d(
            jnp.asarray(rois), jnp.asarray(pts), jnp.asarray(feats),
            jnp.ones(400, bool), out_size=(3, 3, 3), pool=pool,
        ))
        for r in range(2):
            want = roiaware_oracle(rois[r], pts, feats, (3, 3, 3), pool)
            np.testing.assert_allclose(got[r], want, atol=1e-5,
                                       err_msg=f"{pool} roi {r}")


def test_roipoint_pool():
    rng = np.random.RandomState(4)
    rois = np.array([[0, 0, 0, 4, 4, 4, 0.0]], np.float32)
    pts = rng.uniform(-3, 3, (100, 3)).astype(np.float32)
    feats = rng.randn(100, 2).astype(np.float32)
    pooled, empty = roipoint_pool3d(jnp.asarray(rois), jnp.asarray(pts),
                                    jnp.asarray(feats), jnp.ones(100, bool),
                                    num_sampled=16)
    inside = np.where((np.abs(pts) < 2).all(1))[0]
    k = min(len(inside), 16)
    assert not bool(empty[0])
    np.testing.assert_allclose(np.asarray(pooled)[0, :k, :3], pts[inside[:k]],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(pooled)[0, :k, 3:],
                               feats[inside[:k]], atol=1e-6)

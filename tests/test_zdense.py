"""Dense-z pillar conv parity vs the windowed gather-GEMM formulation.

Both compute spconv SubMConv3d / SparseConv3d semantics; they must agree to
f32 matmul tolerance on random sparse scenes (including pillar-capacity
padding, empty pillars, and grid-boundary neighborhoods).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from findnpropagate_tpu.ops.sparse_ops import (
    _kernel_offsets,
    windowed_conv,
    yxz_linear_ids,
    yxz_offset_deltas,
    yxz_sentinel_start,
)
from findnpropagate_tpu.ops.zdense import (
    depillarize,
    pillarize,
    yx_linear_ids,
    zdense_downsample,
    zdense_subm,
)

SHAPE = (8, 24, 24)  # nz, ny, nx


def scene(v=300, c=16, seed=0, shape=SHAPE):
    nz, ny, nx = shape
    rng = np.random.RandomState(seed)
    # unique voxel coords
    lin = rng.choice(nz * ny * nx, size=v, replace=False)
    z = lin % nz
    y = (lin // nz) % ny
    x = lin // (nz * ny)
    coords = np.stack([z, y, x], axis=1).astype(np.int32)
    valid = rng.rand(v) < 0.9
    feats = rng.standard_normal((v, c)).astype(np.float32)
    feats[~valid] = 0
    return coords, valid, feats


def dense_oracle_subm(coords, valid, feats, w, shape):
    """Brute-force dense submanifold conv."""
    nz, ny, nx = shape
    c = feats.shape[1]
    cout = w.shape[2]
    grid = np.zeros((nz, ny, nx, c), np.float32)
    act = np.zeros((nz, ny, nx), bool)
    for (z, y, x), v, f in zip(coords, valid, feats):
        if v:
            grid[z, y, x] = f
            act[z, y, x] = True
    offs = np.asarray(_kernel_offsets((3, 3, 3)))
    out = np.zeros((nz, ny, nx, cout), np.float32)
    for k, (dz, dy, dx) in enumerate(offs):
        # out[t] += grid[t + off] @ w[k]  (windowed_conv convention)
        zs = np.zeros_like(grid)
        src = grid[
            max(0, dz): nz - max(0, -dz),
            max(0, dy): ny - max(0, -dy),
            max(0, dx): nx - max(0, -dx)]
        zs[max(0, -dz): nz - max(0, dz),
           max(0, -dy): ny - max(0, dy),
           max(0, -dx): nx - max(0, dx)] = src
        out += zs @ w[k]
    out[~act] = 0
    return out, act


@pytest.mark.parametrize("seed", [0, 3])
def test_zdense_subm_matches_dense_oracle(seed):
    nz, ny, nx = SHAPE
    c, cout = 16, 16
    coords, valid, feats = scene(seed=seed)
    rng = np.random.RandomState(100 + seed)
    w = rng.standard_normal((27, c, cout)).astype(np.float32) * 0.2

    v2_cap = 256
    ids2, coords2, pvalid, pfeats, pmask = pillarize(
        jnp.asarray(coords), jnp.asarray(valid), jnp.asarray(feats),
        SHAPE, v2_cap, nz)
    out = zdense_subm(ids2, pfeats, pmask, pvalid, jnp.asarray(w),
                      SHAPE, nz, c, zc=4)

    want, act = dense_oracle_subm(coords, valid, feats, w, SHAPE)
    got = np.asarray(out).reshape(v2_cap, nz, cout)
    c2 = np.asarray(coords2)
    pm = np.asarray(pmask)
    checked = 0
    for p in range(v2_cap):
        if not np.asarray(pvalid)[p]:
            assert np.all(got[p] == 0)
            continue
        y, x = c2[p]
        for z in range(nz):
            if pm[p, z]:
                np.testing.assert_allclose(
                    got[p, z], want[z, y, x], rtol=1e-4, atol=1e-4)
                checked += 1
            else:
                assert np.all(got[p, z] == 0)
    assert checked > 100


def test_zdense_subm_matches_windowed():
    """Exact cross-check vs the production windowed gather-GEMM conv."""
    nz, ny, nx = SHAPE
    c, cout = 16, 24
    coords, valid, feats = scene(v=400, c=c, seed=7)
    rng = np.random.RandomState(11)
    w = rng.standard_normal((27, c, cout)).astype(np.float32) * 0.2

    # windowed path needs ascending yxz ids + block padding
    ids3 = np.asarray(yxz_linear_ids(
        jnp.asarray(coords), jnp.asarray(valid), SHAPE))
    order = np.argsort(ids3)
    ids3_s = jnp.asarray(ids3[order])
    feats_s = jnp.asarray(feats[order])
    pad = (-len(ids3)) % 128
    ids3_p = jnp.concatenate(
        [ids3_s, ids3_s[-1] + 1 + jnp.arange(pad, dtype=jnp.int32)])
    feats_p = jnp.concatenate([feats_s, jnp.zeros((pad, c))])
    deltas = jnp.asarray(yxz_offset_deltas((3, 3, 3), SHAPE))
    ref, ovf = windowed_conv(
        ids3_p, feats_p, ids3_p, jnp.asarray(w), deltas,
        block=128, window=512,
        sentinel_start=yxz_sentinel_start(SHAPE),
        precision=jax.lax.Precision.HIGHEST)
    assert int(ovf) == 0

    v2_cap = 512  # must exceed the pillar count or neighborhoods break
    ids2, coords2, pvalid, pfeats, pmask = pillarize(
        jnp.asarray(coords), jnp.asarray(valid), jnp.asarray(feats),
        SHAPE, v2_cap, nz)
    assert int(jnp.sum(pvalid)) < v2_cap
    out = zdense_subm(ids2, pfeats, pmask, pvalid, jnp.asarray(w),
                      SHAPE, nz, c, zc=4)

    # map voxel list rows -> (pillar, z) and compare
    got = np.asarray(out).reshape(v2_cap, nz, cout)
    pid_of = {int(i): p for p, i in enumerate(np.asarray(ids2))
              if np.asarray(pvalid)[p]}
    ref_np = np.asarray(ref)
    sy = nx + 2
    for row in range(len(ids3)):
        i3 = int(ids3[order[row]])
        if i3 >= yxz_sentinel_start(SHAPE):
            continue
        z = i3 % (nz + 2) - 1
        x = (i3 // (nz + 2)) % (nx + 2) - 1
        y = i3 // ((nz + 2) * (nx + 2))
        p = pid_of[y * sy + x + 1]
        np.testing.assert_allclose(
            got[p, z], ref_np[row], rtol=2e-4, atol=2e-4)


def test_pillarize_depillarize_roundtrip():
    nz = SHAPE[0]
    coords, valid, feats = scene(v=200, seed=5)
    ids2, coords2, pvalid, pfeats, pmask = pillarize(
        jnp.asarray(coords), jnp.asarray(valid), jnp.asarray(feats),
        SHAPE, 256, nz)
    ids3, coords3, valid3, feats3 = depillarize(
        ids2, pvalid, pfeats, pmask, SHAPE, nz)
    # every valid input voxel appears exactly once with its features
    got = {}
    for i in range(len(valid3)):
        if np.asarray(valid3)[i]:
            key = tuple(np.asarray(coords3)[i])
            got[key] = np.asarray(feats3)[i]
    want = {tuple(c): f for c, v, f in zip(coords, valid, feats) if v}
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-6)


def test_zdense_downsample_matches_dense_oracle():
    nz, ny, nx = SHAPE
    c, cout = 16, 32
    coords, valid, feats = scene(v=350, seed=9)
    rng = np.random.RandomState(21)
    w = rng.standard_normal((27, c, cout)).astype(np.float32) * 0.2

    # dense oracle: strided conv + receptive-field activity
    grid = np.zeros((nz, ny, nx, c), np.float32)
    act = np.zeros((nz, ny, nx), bool)
    for (z, y, x), v, f in zip(coords, valid, feats):
        if v:
            grid[z, y, x] = f
            act[z, y, x] = True
    nzo, nyo, nxo = (nz + 2 - 3) // 2 + 1, (ny + 2 - 3) // 2 + 1, \
        (nx + 2 - 3) // 2 + 1
    offs = np.asarray(_kernel_offsets((3, 3, 3)))
    want = np.zeros((nzo, nyo, nxo, cout), np.float32)
    act_o = np.zeros((nzo, nyo, nxo), bool)
    for zo in range(nzo):
        for yo in range(nyo):
            for xo in range(nxo):
                for k, (dz, dy, dx) in enumerate(offs):
                    zi, yi, xi = 2 * zo + dz, 2 * yo + dy, 2 * xo + dx
                    if 0 <= zi < nz and 0 <= yi < ny and 0 <= xi < nx:
                        want[zo, yo, xo] += grid[zi, yi, xi] @ w[k]
                        act_o[zo, yo, xo] |= act[zi, yi, xi]
    want[~act_o] = 0

    ids2, coords2, pvalid, pfeats, pmask = pillarize(
        jnp.asarray(coords), jnp.asarray(valid), jnp.asarray(feats),
        SHAPE, 256, nz)
    out_shape = (nzo, nyo, nxo)
    ids2o, coords2o, pvo, pfo, pmo = zdense_downsample(
        ids2, coords2, pfeats, pmask, pvalid, jnp.asarray(w),
        SHAPE, out_shape, nz, nzo, c, 256, zc=2)

    got = np.asarray(pfo).reshape(256, nzo, cout)
    c2 = np.asarray(coords2o)
    pm = np.asarray(pmo)
    # activity parity + feature parity
    seen = set()
    for p in range(256):
        if not np.asarray(pvo)[p]:
            continue
        y, x = c2[p]
        for z in range(nzo):
            if pm[p, z]:
                np.testing.assert_allclose(
                    got[p, z], want[z, y, x], rtol=1e-4, atol=1e-4)
                seen.add((z, int(y), int(x)))
            else:
                assert not act_o[z, y, x]
                assert np.all(got[p, z] == 0)
    want_set = {(z, y, x) for z in range(nzo) for y in range(nyo)
                for x in range(nxo) if act_o[z, y, x]}
    assert seen == want_set

"""win_inverse_conv vs a brute-force transposed-conv oracle."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from findnpropagate_tpu.ops.sparse_ops import (
    win_downsample,
    win_inverse_conv,
    yxz_linear_ids,
)


def test_inverse_conv_matches_dense_transpose():
    rng = np.random.RandomState(0)
    fine_shape = (5, 16, 16)
    coarse_shape = (3, 8, 8)
    nz, ny, nx = fine_shape
    # random fine active set, sorted by yxz id
    n_active = 300
    lin = rng.choice(nz * ny * nx, n_active, replace=False)
    z = lin % nz
    y = (lin // nz) % ny
    x = lin // (nz * ny)
    coords = np.stack([z, y, x], 1).astype(np.int32)
    valid = np.ones(n_active, bool)
    ids = np.asarray(yxz_linear_ids(jnp.asarray(coords), jnp.asarray(valid),
                                    fine_shape))
    order = np.argsort(ids)
    ids, coords = ids[order], coords[order]
    pad = (-n_active) % 64
    f_ids = np.concatenate([ids, ids[-1] + 1 + np.arange(pad)]).astype(
        np.int32)
    f_coords = np.concatenate(
        [coords, -np.ones((pad, 3), np.int32)])
    f_valid = np.concatenate([valid, np.zeros(pad, bool)])

    # coarse active set from the forward downsample rule (sorted)
    c_ids, c_coords, c_valid = win_downsample(
        jnp.asarray(f_coords), jnp.asarray(f_valid), fine_shape,
        coarse_shape, 256)
    c_feats = rng.standard_normal(
        (256, 4)).astype(np.float32) * np.asarray(c_valid)[:, None]
    w = rng.standard_normal((27, 4, 6)).astype(np.float32) * 0.1

    out, ovf = win_inverse_conv(
        c_coords, c_valid, jnp.asarray(c_feats), jnp.asarray(f_ids),
        jnp.asarray(f_valid), fine_shape, coarse_shape, jnp.asarray(w),
        block=64, window=256)
    assert int(ovf) == 0
    out = np.asarray(out)

    # oracle: for every (coarse c, tap t): fine cell f = 2c + t - 1
    want = np.zeros((len(f_ids), 6), np.float32)
    fine_lut = {tuple(f_coords[i]): i for i in range(len(f_coords))
                if f_valid[i]}
    cc = np.asarray(c_coords)
    cv = np.asarray(c_valid)
    taps = [(tz, ty, tx) for tz in range(3) for ty in range(3)
            for tx in range(3)]
    for ci in range(len(cc)):
        if not cv[ci]:
            continue
        for k, (tz, ty, tx) in enumerate(taps):
            f = (2 * cc[ci][0] + tz - 1, 2 * cc[ci][1] + ty - 1,
                 2 * cc[ci][2] + tx - 1)
            fi = fine_lut.get(f)
            if fi is not None:
                want[fi] += c_feats[ci] @ w[k]
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)

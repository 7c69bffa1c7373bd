"""Sparse conv vs dense-conv oracle: submanifold and strided sparse convs
must equal a dense 3D convolution of the densified volume, evaluated at the
(exactly computed) active output sites."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from findnpropagate_tpu.ops.sparse_ops import (
    SparseGrid,
    build_grid,
    downsample_active_set,
    masked_batch_stats,
    sparse_to_dense,
    strided_conv,
    subm_conv,
)

SHAPE = (6, 12, 12)  # nz, ny, nx


def random_sparse(rng, n_active, v_cap, cin):
    nz, ny, nx = SHAPE
    # unique random cells
    lin = rng.choice(nz * ny * nx, n_active, replace=False)
    z, rem = lin // (ny * nx), lin % (ny * nx)
    y, x = rem // nx, rem % nx
    coords = np.full((v_cap, 3), -1, np.int32)
    coords[:n_active] = np.stack([z, y, x], -1)
    valid = np.zeros(v_cap, bool)
    valid[:n_active] = True
    feats = np.zeros((v_cap, cin), np.float32)
    feats[:n_active] = rng.randn(n_active, cin)
    return coords, valid, feats


def dense_conv3d(dense, weights, stride=1, pad=1):
    """dense (nz, ny, nx, Cin), weights (K, Cin, Cout) zyx C-order."""
    kz = ky = kx = round(weights.shape[0] ** (1 / 3))
    w = weights.reshape(kz, ky, kx, weights.shape[1], weights.shape[2])
    out = jax.lax.conv_general_dilated(
        dense[None],
        w,
        window_strides=(stride,) * 3,
        padding=[(pad, pad)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return np.asarray(out[0])


def test_subm_conv_matches_dense():
    rng = np.random.RandomState(0)
    cin, cout = 4, 6
    coords, valid, feats = random_sparse(rng, 60, 80, cin)
    weights = rng.randn(27, cin, cout).astype(np.float32)

    grid = build_grid(jnp.asarray(coords), jnp.asarray(valid), SHAPE)
    got = np.asarray(subm_conv(grid, jnp.asarray(feats), jnp.asarray(weights)))

    dense = np.asarray(sparse_to_dense(grid, jnp.asarray(feats)))
    want_dense = dense_conv3d(dense, weights)
    for i in range(60):
        z, y, x = coords[i]
        np.testing.assert_allclose(got[i], want_dense[z, y, x], rtol=1e-4,
                                   atol=1e-4)
    assert np.all(got[~valid] == 0)


def test_subm_conv_bias_and_1x1():
    rng = np.random.RandomState(1)
    cin = cout = 3
    coords, valid, feats = random_sparse(rng, 20, 32, cin)
    w = rng.randn(1, cin, cout).astype(np.float32)
    b = rng.randn(cout).astype(np.float32)
    grid = build_grid(jnp.asarray(coords), jnp.asarray(valid), SHAPE)
    got = np.asarray(
        subm_conv(grid, jnp.asarray(feats), jnp.asarray(w), jnp.asarray(b),
                  kernel_size=(1, 1, 1))
    )
    want = feats @ w[0] + b
    np.testing.assert_allclose(got[valid], want[valid], rtol=1e-4, atol=1e-4)


def test_downsample_active_set_exact():
    rng = np.random.RandomState(2)
    coords, valid, _ = random_sparse(rng, 40, 64, 1)
    grid = build_grid(jnp.asarray(coords), jnp.asarray(valid), SHAPE)
    out_shape = (3, 6, 6)
    oc, ov = downsample_active_set(grid, out_shape, max_out=256)
    oc, ov = np.asarray(oc), np.asarray(ov)

    # oracle: output cell active iff any input in its receptive field active
    nz, ny, nx = SHAPE
    active = np.zeros(SHAPE, bool)
    for i in range(40):
        active[tuple(coords[i])] = True
    want = set()
    for oz in range(out_shape[0]):
        for oy in range(out_shape[1]):
            for ox in range(out_shape[2]):
                hit = False
                for kz in range(3):
                    for ky in range(3):
                        for kx in range(3):
                            iz, iy, ix = 2 * oz + kz - 1, 2 * oy + ky - 1, 2 * ox + kx - 1
                            if 0 <= iz < nz and 0 <= iy < ny and 0 <= ix < nx:
                                hit |= active[iz, iy, ix]
                if hit:
                    want.add((oz, oy, ox))
    got = {tuple(c) for c, v in zip(oc, ov) if v}
    assert got == want


def test_strided_conv_matches_dense():
    rng = np.random.RandomState(3)
    cin, cout = 4, 5
    coords, valid, feats = random_sparse(rng, 50, 64, cin)
    weights = rng.randn(27, cin, cout).astype(np.float32)
    grid = build_grid(jnp.asarray(coords), jnp.asarray(valid), SHAPE)
    out_shape = (3, 6, 6)
    oc, ov = downsample_active_set(grid, out_shape, max_out=256)
    grid_out = build_grid(oc, ov, out_shape)
    got = np.asarray(
        strided_conv(grid, jnp.asarray(feats), grid_out, jnp.asarray(weights))
    )
    dense = np.asarray(sparse_to_dense(grid, jnp.asarray(feats)))
    want_dense = dense_conv3d(dense, weights, stride=2, pad=1)
    oc_np, ov_np = np.asarray(oc), np.asarray(ov)
    for i in range(len(oc_np)):
        if ov_np[i]:
            z, y, x = oc_np[i]
            np.testing.assert_allclose(got[i], want_dense[z, y, x],
                                       rtol=1e-4, atol=1e-4)


def test_asymmetric_kernel_strided():
    # conv_out in the reference: kernel (3,1,1), stride (2,1,1), pad (1? 0?)
    rng = np.random.RandomState(4)
    cin, cout = 3, 4
    coords, valid, feats = random_sparse(rng, 30, 48, cin)
    weights = rng.randn(3, cin, cout).astype(np.float32)
    grid = build_grid(jnp.asarray(coords), jnp.asarray(valid), SHAPE)
    out_shape = (3, 12, 12)
    oc, ov = downsample_active_set(
        grid, out_shape, max_out=128,
        kernel_size=(3, 1, 1), stride=(2, 1, 1), padding=(1, 0, 0),
    )
    grid_out = build_grid(oc, ov, out_shape)
    got = np.asarray(
        strided_conv(grid, jnp.asarray(feats), grid_out, jnp.asarray(weights),
                     kernel_size=(3, 1, 1), stride=(2, 1, 1), padding=(1, 0, 0))
    )
    dense = np.asarray(sparse_to_dense(grid, jnp.asarray(feats)))
    w = weights.reshape(3, 1, 1, cin, cout)
    want_dense = np.asarray(
        jax.lax.conv_general_dilated(
            jnp.asarray(dense)[None], jnp.asarray(w),
            window_strides=(2, 1, 1), padding=[(1, 1), (0, 0), (0, 0)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            precision=jax.lax.Precision.HIGHEST,
        )[0]
    )
    oc_np, ov_np = np.asarray(oc), np.asarray(ov)
    for i in range(len(oc_np)):
        if ov_np[i]:
            z, y, x = oc_np[i]
            np.testing.assert_allclose(got[i], want_dense[z, y, x],
                                       rtol=1e-4, atol=1e-4)


def test_masked_batch_stats():
    rng = np.random.RandomState(5)
    feats = rng.randn(20, 4).astype(np.float32)
    valid = np.zeros(20, bool)
    valid[:12] = True
    mean, var = masked_batch_stats(jnp.asarray(feats), jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(mean), feats[:12].mean(0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), feats[:12].var(0), atol=1e-5)


def test_capacity_overflow_truncates():
    rng = np.random.RandomState(6)
    coords, valid, feats = random_sparse(rng, 60, 80, 2)
    grid = build_grid(jnp.asarray(coords), jnp.asarray(valid), SHAPE)
    oc, ov = downsample_active_set(grid, (3, 6, 6), max_out=10)
    assert int(np.asarray(ov).sum()) == 10
    assert np.all(np.asarray(oc)[~np.asarray(ov)] == -1)

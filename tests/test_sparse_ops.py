"""Sparse conv vs dense-conv oracle: submanifold and strided sparse convs
must equal a dense 3D convolution of the densified volume, evaluated at the
(exactly computed) active output sites."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

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


# ---------------------------------------------------------------- windowed

def _sorted_win(coords, valid, feats, shape):
    from findnpropagate_tpu.ops.sparse_ops import yxz_linear_ids

    ids = np.asarray(yxz_linear_ids(jnp.asarray(coords), jnp.asarray(valid),
                                    shape))
    order = np.argsort(ids)
    return (jnp.asarray(ids[order]), jnp.asarray(coords[order]),
            jnp.asarray(valid[order]), jnp.asarray(feats[order]))


def test_subm_conv_windowed_full_density():
    """FULL occupancy (every cell active) — the hardest case for the window
    precondition (ADVICE r1): verify exactness against the gather path and a
    zero overflow count with an adequate window, and a NONZERO overflow
    count when the window is too small."""
    from findnpropagate_tpu.ops.sparse_ops import (
        subm_conv_windowed, yxz_offset_deltas,
    )

    shape = (4, 8, 8)  # nz, ny, nx -> 256 cells, all active
    nz, ny, nx = shape
    zz, yy, xx = np.meshgrid(np.arange(nz), np.arange(ny), np.arange(nx),
                             indexing="ij")
    coords = np.stack([zz, yy, xx], -1).reshape(-1, 3).astype(np.int32)
    v = coords.shape[0]
    rng = np.random.RandomState(3)
    cin, cout = 4, 5
    feats = rng.randn(v, cin).astype(np.float32)
    valid = np.ones(v, bool)
    weights = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32))

    grid = build_grid(jnp.asarray(coords), jnp.asarray(valid), shape)
    want = np.asarray(subm_conv(grid, jnp.asarray(feats), weights))

    ids, sc, sv, sf = _sorted_win(coords, valid, feats, shape)
    deltas = jnp.asarray(yxz_offset_deltas((3, 3, 3), shape))
    # worst id-span at full density: dy offset spans ~(nx+2)*(nz+2) ids but
    # only nx*nz actives; window must cover block + that span
    out, ovf = subm_conv_windowed(
        ids, sf, weights, deltas, block=64, window=128,
        precision=jax.lax.Precision.HIGHEST,
    )
    assert int(ovf) == 0
    # un-sort to compare
    from findnpropagate_tpu.ops.sparse_ops import yxz_linear_ids
    ids0 = np.asarray(yxz_linear_ids(jnp.asarray(coords),
                                     jnp.asarray(valid), shape))
    order = np.argsort(ids0)
    got = np.zeros_like(want)
    got[order] = np.asarray(out)
    np.testing.assert_allclose(got, want, atol=1e-4)

    # too-small window MUST be detected, not silently wrong
    _, ovf_small = subm_conv_windowed(
        ids, sf, weights, deltas, block=64, window=32,
        precision=jax.lax.Precision.HIGHEST,
    )
    assert int(ovf_small) > 0


def test_windowed_strided_matches_strided_conv():
    """Windowed strided conv (output voxels mapped into the input id space)
    must equal the table-gather strided conv on the same active sets."""
    from findnpropagate_tpu.ops.sparse_ops import (
        strided_base_ids, strided_deltas, win_downsample, windowed_conv,
    )

    rng = np.random.RandomState(5)
    cin, cout = 4, 6
    in_shape = SHAPE
    out_shape = tuple((n + 2 * 1 - 3) // 2 + 1 for n in in_shape)
    coords, valid, feats = random_sparse(rng, 90, 128, cin)
    weights = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32))

    # reference: exact active set + table-gather conv
    grid_in = build_grid(jnp.asarray(coords), jnp.asarray(valid), in_shape)
    oc_ref, ov_ref = downsample_active_set(grid_in, out_shape, max_out=128)
    grid_out = build_grid(oc_ref, ov_ref, out_shape)
    want = np.asarray(strided_conv(grid_in, jnp.asarray(feats), grid_out,
                                   weights))

    # windowed path
    ids, sc, sv, sf = _sorted_win(coords, valid, feats, in_shape)
    oi, oc, ov = win_downsample(sc, sv, in_shape, out_shape, 128)
    assert int(ov.sum()) == int(ov_ref.sum())
    deltas = jnp.asarray(strided_deltas((3, 3, 3), (2, 2, 2), (1, 1, 1),
                                        in_shape))
    base = strided_base_ids(oc, ov, (2, 2, 2), in_shape, out_shape)
    got, ovf = windowed_conv(ids, sf, base, weights, deltas, block=64,
                             window=128,
                             precision=jax.lax.Precision.HIGHEST)
    assert int(ovf) == 0

    # compare per-coordinate (orderings differ: zyx-major vs yxz-major)
    def keyed(c, v, f):
        d = {}
        for i in range(len(v)):
            if v[i]:
                d[tuple(np.asarray(c[i]))] = np.asarray(f[i])
        return d

    dw = keyed(np.asarray(grid_out.coords), np.asarray(grid_out.valid), want)
    dg = keyed(np.asarray(oc), np.asarray(ov), np.asarray(got))
    assert set(dw) == set(dg)
    for k in dw:
        np.testing.assert_allclose(dg[k], dw[k], atol=1e-4, err_msg=str(k))


def test_win_downsample_sorted_and_exact():
    """win_downsample output must be ascending in yxz id and cover exactly
    the spconv receptive-field active set."""
    from findnpropagate_tpu.ops.sparse_ops import win_downsample

    rng = np.random.RandomState(7)
    coords, valid, _ = random_sparse(rng, 70, 96, 1)
    out_shape = tuple((n + 2 - 3) // 2 + 1 for n in SHAPE)
    oi, oc, ov = win_downsample(jnp.asarray(coords), jnp.asarray(valid),
                                SHAPE, out_shape, 96)
    oi = np.asarray(oi)
    assert np.all(np.diff(oi) > 0), "ids must be strictly ascending"

    grid = build_grid(jnp.asarray(coords), jnp.asarray(valid), SHAPE)
    oc_ref, ov_ref = downsample_active_set(grid, out_shape, max_out=96)
    ref_set = {tuple(c) for c, v in zip(np.asarray(oc_ref), np.asarray(ov_ref)) if v}
    got_set = {tuple(c) for c, v in zip(np.asarray(oc), np.asarray(ov)) if v}
    assert ref_set == got_set


def test_win_downsample_scatter_matches_sort():
    """The sort-free scatter+rank-select downsample must reproduce
    win_downsample EXACTLY (ids, coords, valid — including the ascending
    sentinel tail) across kernel/stride/padding variants the backbones use
    and both over- and under-full max_out."""
    from findnpropagate_tpu.ops.sparse_ops import (
        win_downsample, win_downsample_scatter,
    )

    rng = np.random.RandomState(11)
    cases = [
        ((3, 3, 3), (2, 2, 2), (1, 1, 1), 96),
        ((3, 3, 3), (2, 2, 2), (0, 1, 1), 96),
        ((3, 1, 1), (2, 1, 1), (0, 0, 0), 128),
        ((3, 3, 3), (2, 2, 2), (1, 1, 1), 16),   # max_out overflow
    ]
    for kernel, stride, padding, max_out in cases:
        out_shape = tuple(
            (n + 2 * p - k) // s + 1
            for n, k, s, p in zip(SHAPE, kernel, stride, padding))
        coords, valid, _ = random_sparse(rng, 70, 96, 1)
        args = (jnp.asarray(coords), jnp.asarray(valid), SHAPE, out_shape,
                max_out)
        kw = dict(kernel_size=kernel, stride=stride, padding=padding)
        ri, rc, rv = win_downsample(*args, **kw)
        gi, gc, gv = win_downsample_scatter(*args, **kw, sel_block=64)
        np.testing.assert_array_equal(np.asarray(gv), np.asarray(rv),
                                      err_msg=str((kernel, stride, padding)))
        np.testing.assert_array_equal(np.asarray(gc), np.asarray(rc))
        # valid slots must agree on ids; sentinel tails are both ascending
        # and above the real range (exact values may differ by construction)
        gi, ri = np.asarray(gi), np.asarray(ri)
        v = np.asarray(rv)
        np.testing.assert_array_equal(gi[v], ri[v])
        assert np.all(np.diff(gi) > 0), "scatter ids must stay ascending"


def test_win_downsample_dense_matches_sort():
    """The dense occupancy + max-pool downsample must reproduce
    win_downsample EXACTLY (ids, coords, valid, ascending output) across
    the backbone's kernel/stride/padding variants."""
    from findnpropagate_tpu.ops.sparse_ops import (
        win_downsample, win_downsample_dense,
    )

    rng = np.random.RandomState(12)
    cases = [
        ((3, 3, 3), (2, 2, 2), (1, 1, 1), 96),
        ((3, 3, 3), (2, 2, 2), (0, 1, 1), 96),
        ((3, 1, 1), (2, 1, 1), (0, 0, 0), 128),
        ((3, 3, 3), (2, 2, 2), (1, 1, 1), 16),   # max_out overflow
    ]
    for kernel, stride, padding, max_out in cases:
        out_shape = tuple(
            (n + 2 * p - k) // s + 1
            for n, k, s, p in zip(SHAPE, kernel, stride, padding))
        coords, valid, _ = random_sparse(rng, 70, 96, 1)
        args = (jnp.asarray(coords), jnp.asarray(valid), SHAPE, out_shape,
                max_out)
        kw = dict(kernel_size=kernel, stride=stride, padding=padding)
        ri, rc, rv = win_downsample(*args, **kw)
        gi, gc, gv = win_downsample_dense(*args, **kw, sel_block=64)
        np.testing.assert_array_equal(np.asarray(gv), np.asarray(rv),
                                      err_msg=str((kernel, stride, padding)))
        np.testing.assert_array_equal(np.asarray(gc), np.asarray(rc))
        gi, ri = np.asarray(gi), np.asarray(ri)
        v = np.asarray(rv)
        np.testing.assert_array_equal(gi[v], ri[v],
                                      err_msg=str((kernel, stride, padding)))
        assert np.all(np.diff(gi) > 0), "dense ids must stay ascending"


def test_mask_rank_select_two_level_oracle():
    """Two-level rank select == first-k set positions, across sub_block
    splits, partial fills, and overflow (PERF.md round-3 session 5)."""
    from findnpropagate_tpu.ops.sparse_ops import _mask_rank_select

    rng = np.random.RandomState(7)
    for n, sel, sub, max_out, p in [
        (4096, 512, 128, 64, 0.01),
        (4096, 512, 128, 256, 0.05),     # overflow: more actives than slots
        (2048, 512, 64, 128, 0.03),
        (1024, 256, 256, 64, 0.02),      # sub == sel (degenerate one-level)
        (512, 512, 128, 32, 0.0),        # empty mask
    ]:
        mask = (rng.rand(n) < p).astype(np.int8)
        pos, ok = _mask_rank_select(jnp.asarray(mask), max_out, sel,
                                    sub_block=sub)
        pos, ok = np.asarray(pos), np.asarray(ok)
        want = np.flatnonzero(mask)[:max_out]
        assert ok.sum() == len(want), (n, sel, sub, max_out, p)
        np.testing.assert_array_equal(pos[ok], want)

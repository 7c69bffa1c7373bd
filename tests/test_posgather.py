"""Position-gather sparse conv (ops/pallas_posgather, interpret mode on
CPU): positions vs numpy searchsorted, forward parity with the XLA
windowed_conv reference, and band-overflow accounting.

Parity target: spconv SubMConv3d semantics
(/root/reference/pcdet/models/backbones_3d/spconv_backbone.py:70-184)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from findnpropagate_tpu.ops.pallas_posgather import (
    compute_positions,
    group_center_deltas,
    posgather_conv,
)
from findnpropagate_tpu.ops.sparse_ops import (
    windowed_conv,
    yxz_linear_ids,
    yxz_offset_deltas,
    yxz_sentinel_start,
)


def make_case(seed=0, density=0.15, v_cap=1024, shape=(9, 24, 24), c_in=5):
    rng = np.random.RandomState(seed)
    nz, ny, nx = shape
    n = min(int(nz * ny * nx * density), v_cap - 7)
    lin = rng.choice(nz * ny * nx, n, replace=False)
    coords = np.stack([lin % nz, (lin // nz) % ny, lin // (nz * ny)],
                      1).astype(np.int32)
    coords_p = np.full((v_cap, 3), -1, np.int32)
    coords_p[:n] = coords
    valid = np.zeros(v_cap, bool)
    valid[:n] = True
    ids = yxz_linear_ids(jnp.asarray(coords_p), jnp.asarray(valid), shape)
    order = jnp.argsort(ids)
    feats = jnp.asarray(
        rng.standard_normal((v_cap, c_in)).astype(np.float32) * 0.3)
    feats = feats * jnp.asarray(valid)[order][:, None]
    return (ids[order], jnp.asarray(valid)[order], feats,
            np.asarray(yxz_offset_deltas((3, 3, 3), shape)),
            yxz_sentinel_start(shape))


def test_positions_match_numpy():
    ids, valid, feats, deltas, sent = make_case(seed=3)
    lp = compute_positions(ids, ids, deltas, block=512, window=1024,
                           band=3, sentinel_start=sent, interpret=True)
    idsn = np.asarray(ids)
    lo = np.asarray(lp.lo)
    pos = np.asarray(lp.pos)
    for g, d in enumerate(group_center_deltas(deltas)):
        want = idsn + int(d)
        for bi in range(idsn.shape[0] // 512):
            sl = slice(bi * 512, (bi + 1) * 512)
            win = idsn[lo[bi]:lo[bi] + 1024]
            rank_np = np.searchsorted(win, want[sl])
            hit_np = np.isin(want[sl], win)
            got = pos[g, sl]
            np.testing.assert_array_equal(
                np.where(got >= 0, got, ~got), rank_np)
            np.testing.assert_array_equal(got >= 0, hit_np)


@pytest.mark.parametrize("seed,density", [(0, 0.15), (2, 0.02), (5, 0.08)])
def test_forward_parity_interpret(seed, density):
    ids, valid, feats, deltas, sent = make_case(seed=seed, density=density)
    ref, ovf_ref = windowed_conv(
        ids, feats, ids, _w(feats.shape[1], 7), jnp.asarray(deltas),
        block=512, window=1024, precision=jax.lax.Precision.HIGHEST,
        sentinel_start=sent)
    lp = compute_positions(ids, ids, deltas, block=512, window=1024,
                           band=3, sentinel_start=sent, interpret=True)
    out = posgather_conv(ids, feats, ids, _w(feats.shape[1], 7), lp,
                         sentinel_start=sent, compute_dtype=jnp.float32,
                         interpret=True)
    assert int(ovf_ref) == 0 and int(lp.overflow) == 0
    m = np.asarray(valid)[:, None]
    np.testing.assert_allclose(np.asarray(out) * m, np.asarray(ref) * m,
                               rtol=1e-5, atol=1e-5)


def _w(cin, cout, seed=11):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.standard_normal((27, cin, cout)
                                           ).astype(np.float32) * 0.2)


def test_epilogue_affine_relu_mask():
    ids, valid, feats, deltas, sent = make_case(seed=7)
    cin, cout = feats.shape[1], 8
    w = _w(cin, cout)
    rng = np.random.RandomState(1)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, cout).astype(np.float32))
    shift = jnp.asarray(rng.standard_normal(cout).astype(np.float32))
    ref, _ = windowed_conv(ids, feats, ids, w, jnp.asarray(deltas),
                           block=512, window=1024,
                           precision=jax.lax.Precision.HIGHEST,
                           sentinel_start=sent)
    ref = jnp.maximum(ref * scale[None, :] + shift[None, :], 0.0)
    ref = jnp.where((ids < sent)[:, None], ref, 0.0)
    lp = compute_positions(ids, ids, deltas, block=512, window=1024,
                           band=3, sentinel_start=sent, interpret=True)
    out = posgather_conv(ids, feats, ids, w, lp, scale=scale, shift=shift,
                         relu=True, sentinel_start=sent,
                         compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_band_fallback_exact_on_dense_scene():
    # density 0.4 packs >128 actives into many tap bands; with band=1 the
    # per-tile one-hot FALLBACK must fire on those tiles and reproduce the
    # reference exactly (band violations are handled, not counted)
    ids, valid, feats, deltas, sent = make_case(seed=1, density=0.4)
    lp1 = compute_positions(ids, ids, deltas, block=512, window=1024,
                            band=1, sentinel_start=sent, interpret=True)
    assert int(jnp.sum(lp1.flags)) > 0          # fallback actually fires
    assert int(lp1.overflow) == 0               # and is not an error
    w = _w(feats.shape[1], 7)
    ref, ovf_ref = windowed_conv(
        ids, feats, ids, w, jnp.asarray(deltas), block=512, window=1024,
        precision=jax.lax.Precision.HIGHEST, sentinel_start=sent)
    out = posgather_conv(ids, feats, ids, w, lp1, sentinel_start=sent,
                         compute_dtype=jnp.float32, interpret=True)
    assert int(ovf_ref) == 0
    m = np.asarray(valid)[:, None]
    np.testing.assert_allclose(np.asarray(out) * m, np.asarray(ref) * m,
                               rtol=1e-5, atol=1e-5)


def test_strided_deltas_grouping():
    from findnpropagate_tpu.ops.sparse_ops import strided_deltas

    d = strided_deltas((3, 3, 3), (2, 2, 2), (1, 1, 1), (21, 720, 720))
    centers = group_center_deltas(d)
    assert centers.shape == (9,)


def test_bev_aligned_diou_matches_numpy():
    # reference loss_utils.py:646-705 semantics (yaw ignored, axis-aligned)
    from findnpropagate_tpu.models.dense_heads.voxelnext_head import (
        _bev_aligned_diou)

    rng = np.random.RandomState(3)
    p = rng.uniform(0.5, 4.0, (32, 7)).astype(np.float32)
    g = rng.uniform(0.5, 4.0, (32, 7)).astype(np.float32)
    p[:, :3] = rng.uniform(-3, 3, (32, 3))
    g[:, :3] = p[:, :3] + rng.uniform(-1, 1, (32, 3))
    got = np.asarray(_bev_aligned_diou(jnp.asarray(p), jnp.asarray(g)))

    def ref_one(pb, gb):
        pmin = pb[:2] - pb[3:5] / 2
        pmax = pb[:2] + pb[3:5] / 2
        gmin = gb[:2] - gb[3:5] / 2
        gmax = gb[:2] + gb[3:5] / 2
        ixy = np.clip(np.minimum(pmax, gmax) - np.maximum(pmin, gmin), 0,
                      None)
        oxy = np.clip(np.maximum(pmax, gmax) - np.minimum(pmin, gmin), 0,
                      None)
        ih = max(min(pb[2] + pb[5] / 2, gb[2] + gb[5] / 2)
                 - max(pb[2] - pb[5] / 2, gb[2] - gb[5] / 2), 0.0)
        oh = max(max(pb[2] + pb[5] / 2, gb[2] + gb[5] / 2)
                 - min(pb[2] - pb[5] / 2, gb[2] - gb[5] / 2), 0.0)
        vi = ixy[0] * ixy[1] * ih
        vu = pb[3] * pb[4] * pb[5] + gb[3] * gb[4] * gb[5] - vi
        idg = np.sum((gb[:3] - pb[:3]) ** 2)
        odg = oxy[0] ** 2 + oxy[1] ** 2 + oh ** 2
        return np.clip(vi / max(vu, 1e-6) - idg / max(odg, 1e-6), -1, 1)

    want = np.array([ref_one(p[i], g[i]) for i in range(32)])
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_subm_diff_grad_parity():
    """posgather_subm_diff vs autodiff through the XLA windowed_conv:
    same outputs, same d_feats and dW (interpret mode)."""
    from findnpropagate_tpu.ops.pallas_posgather import posgather_subm_diff

    ids, valid, feats, deltas, sent = make_case(seed=9, density=0.1)
    cin, cout = feats.shape[1], 6
    w = _w(cin, cout, seed=21)
    lp = compute_positions(ids, ids, deltas, block=512, window=1024,
                           band=3, sentinel_start=sent, interpret=True)
    d27 = jnp.asarray(deltas)

    def loss_new(f, ww):
        out = posgather_subm_diff(ids, f, ww, d27, lp, dw_block=512,
                                  dw_window=1024, sentinel_start=sent,
                                  compute_dtype=jnp.float32,
                                  interpret=True)
        return jnp.sum(out * out)

    def loss_ref(f, ww):
        out, _ = windowed_conv(ids, f, ids, ww, d27, block=512,
                               window=1024,
                               precision=jax.lax.Precision.HIGHEST,
                               sentinel_start=sent)
        return jnp.sum(out * out)

    g_new = jax.grad(loss_new, argnums=(0, 1))(feats, w)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    m = np.asarray(valid)[:, None]
    np.testing.assert_allclose(np.asarray(g_new[0]) * m,
                               np.asarray(g_ref[0]) * m,
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g_new[1]), np.asarray(g_ref[1]),
                               rtol=2e-3, atol=2e-3)

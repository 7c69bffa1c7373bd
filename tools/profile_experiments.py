"""One-off chained experiments for the sparse-backbone optimization
(PERF.md round-2). Run on the real chip."""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def chain(fn, iters=8):
    s = fn(jnp.float32(0.0))
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    s = fn(jnp.float32(1.0))
    jax.block_until_ready(s)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    s = jnp.float32(0.0)
    for _ in range(iters):
        s = fn(s)
    jax.block_until_ready(s)
    tn = time.perf_counter() - t0
    return (tn - t1) / (iters - 1) * 1000.0


def main():
    from findnpropagate_tpu.ops.sparse_ops import (
        yxz_linear_ids, yxz_offset_deltas,
    )

    rng = np.random.RandomState(0)

    # ---- raw sort costs ---------------------------------------------------
    for n in (983_040, 122_880):
        keys = jnp.asarray(rng.randint(0, 90_000_000, n).astype(np.int32))

        @jax.jit
        def f_sort(s, keys=keys):
            k = keys + s.astype(jnp.int32)
            return jnp.sort(k)[:3].sum().astype(jnp.float32)

        @jax.jit
        def f_argsort(s, keys=keys):
            k = keys + s.astype(jnp.int32)
            o = jnp.argsort(k)
            return o[:3].sum().astype(jnp.float32)

        print(f"sort    {n}: {chain(f_sort):8.2f} ms", flush=True)
        print(f"argsort {n}: {chain(f_argsort):8.2f} ms", flush=True)

    # top_k as partial sort
    keys = jnp.asarray(rng.randint(0, 90_000_000, 983_040).astype(np.int32))

    @jax.jit
    def f_topk(s):
        k = keys + s.astype(jnp.int32)
        v, i = jax.lax.top_k(-k, 65600)
        return v[:3].sum().astype(jnp.float32)

    print(f"top_k 983k->65600: {chain(f_topk):8.2f} ms", flush=True)

    # ---- dense L2/L3 conv cost (the hybrid path) --------------------------
    for (nz, ny, nx, c) in ((11, 360, 360, 64), (5, 180, 180, 128)):
        x = jnp.asarray(rng.randn(1, nz, ny, nx, c).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 3, c, c).astype(np.float32) * 0.01)

        @jax.jit
        def f_conv(s, x=x, w=w):
            y = jax.lax.conv_general_dilated(
                x + s * 1e-9, w, (1, 1, 1), [(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
            return jnp.sum(y[0, 0, 0, :2, :2])

        print(f"dense conv3d {nz}x{ny}x{nx} C={c}: {chain(f_conv):8.2f} ms",
              flush=True)

    # ---- windowed subm variants at L0 scale -------------------------------
    nz, ny, nx = 42, 1440, 1440
    shape = (nz, ny, nx)
    v, n_act, cin = 122880, 118000, 16
    lin = rng.choice(nz * ny * nx, n_act, replace=False)
    z, rem = lin // (ny * nx), lin % (ny * nx)
    y, x = rem // nx, rem % nx
    coords = np.full((v, 3), -1, np.int32)
    coords[:n_act] = np.stack([z, y, x], -1)
    valid = np.zeros(v, bool)
    valid[:n_act] = True
    ids0 = np.asarray(yxz_linear_ids(jnp.asarray(coords), jnp.asarray(valid),
                                     shape))
    order = np.argsort(ids0)
    ids = jnp.asarray(ids0[order])
    feats = jnp.asarray(
        (rng.randn(v, cin) * valid[:, None]).astype(np.float32)[order])
    w = jnp.asarray(rng.randn(27, cin, cin).astype(np.float32))
    deltas = jnp.asarray(yxz_offset_deltas((3, 3, 3), shape))

    block, window = 640, 1280

    def shared_window_conv(ids, feats, w, deltas, transposed):
        """ONE union window per block shared by all 27 taps."""
        vt, cin = feats.shape
        k, _, cout = w.shape
        nb = vt // block
        first = ids[::block]
        lo = jnp.searchsorted(ids, first + deltas.min())
        lo = jnp.minimum(lo, vt - window).astype(jnp.int32)
        win_f = jax.vmap(
            lambda l: jax.lax.dynamic_slice(feats, (l, 0), (window, cin))
        )(lo)  # (NB, S, C)
        win_i = jax.vmap(
            lambda l: jax.lax.dynamic_slice(ids, (l,), (window,))
        )(lo)  # (NB, S)
        tgt = ids.reshape(nb, block)

        def body(carry, inputs):
            w_k, d_k = inputs
            onehot = (win_i[:, None, :] == (tgt + d_k)[:, :, None]
                      ).astype(feats.dtype)
            if transposed:
                # (NB, C, W): output lanes = W (wide), sublanes = C
                g = jnp.einsum("nsc,nws->ncw", win_f, onehot)
                return carry + jnp.einsum("ncw,co->nwo", g, w_k,
                                          precision=jax.lax.Precision.HIGHEST
                                          ), None
            g = jnp.einsum("nws,nsc->nwc", onehot, win_f)
            return carry + jnp.einsum("nwc,co->nwo", g, w_k,
                                      precision=jax.lax.Precision.HIGHEST
                                      ), None

        out0 = jnp.zeros((nb, block, cout), jnp.float32)
        out, _ = jax.lax.scan(body, out0, (w, deltas))
        return out.reshape(vt, cout)

    for transposed in (False, True):
        @jax.jit
        def f(s, transposed=transposed):
            out = shared_window_conv(ids, feats + s * 1e-9, w, deltas,
                                     transposed)
            return jnp.sum(out[:3, :3])

        print(f"subm shared-window transposed={transposed}: "
              f"{chain(f):8.2f} ms", flush=True)

    # single big einsum over all taps at once (no scan)
    @jax.jit
    def f_allk(s):
        vt, cin = feats.shape
        nb = vt // block
        first = ids[::block]
        lo = jnp.minimum(jnp.searchsorted(ids, first + deltas.min()),
                         vt - window).astype(jnp.int32)
        win_f = jax.vmap(
            lambda l: jax.lax.dynamic_slice(feats + s * 1e-9, (l, 0),
                                            (window, cin)))(lo)
        win_i = jax.vmap(
            lambda l: jax.lax.dynamic_slice(ids, (l,), (window,)))(lo)
        tgt = ids.reshape(nb, block)
        want = tgt[:, None, :] + deltas[None, :, None]  # (NB, K, W)
        onehot = (win_i[:, None, None, :] == want[..., None]
                  ).astype(feats.dtype)  # (NB, K, W, S)
        g = jnp.einsum("nkws,nsc->nwkc", onehot, win_f)
        out = jnp.einsum("nwkc,kco->nwo", g, w,
                         precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(out[0, :3, :3])

    print(f"subm all-taps one einsum: {chain(f_allk):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()

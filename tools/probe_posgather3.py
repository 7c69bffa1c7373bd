"""Compile each posgather kernel variant of the flagship backbone in
isolation to find which one hangs/crashes the remote Mosaic compile.

Variants (from transfusion_lidar.yaml): subm L0 (c16, win 2048),
strided L0->L1 (c16->32, win 2048), subm L1 (c32, win 3584),
strided L1->L2 (c32->64, win 6656), subm L2 (c64, win 3584),
strided L2->L3 (c64->64, win 8192).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from findnpropagate_tpu.ops.pallas_posgather import (
    compute_positions, posgather_conv)
from findnpropagate_tpu.ops.sparse_ops import (
    _yxz_strides, yxz_sentinel_start)


def synth_ids(v, shape, seed=0):
    rng = np.random.RandomState(seed)
    nz, ny, nx = shape
    sx, sy = _yxz_strides(shape)
    n = min(v * 3 // 4, nz * ny * nx // 2)
    lin = rng.choice(nz * ny * nx, n, replace=False)
    z = lin % nz
    y = (lin // nz) % ny
    x = lin // (nz * ny)
    ids = y * sy + (x + 1) * sx + (z + 1)
    ids = np.unique(ids)[: v]
    sent = yxz_sentinel_start(shape)
    pad = v - ids.shape[0]
    ids = np.concatenate([np.sort(ids), sent + np.arange(max(pad, 0))])
    return jnp.asarray(ids.astype(np.int32)), sent


def run(name, v, shape, cin, cout, window, band, tap, block=1024,
        tgt_v=None, strided=False):
    t0 = time.time()
    try:
        ids, sent = synth_ids(v, shape)
        rng = np.random.RandomState(1)
        sx, sy = _yxz_strides(shape)
        if strided:
            # fake strided: targets = every other id scaled (monotone base)
            deltas = np.asarray(
                [dy * sy + dx * sx + dz for dz in (-1, 0, 1)
                 for dy in (-1, 0, 1) for dx in (-1, 0, 1)], np.int32)
            tgt = ids[::2][: (tgt_v or v // 2)]
            padn = (-tgt.shape[0]) % block
            tgt = jnp.concatenate(
                [tgt, tgt[-1] + 2 + jnp.arange(padn, dtype=jnp.int32)])
        else:
            deltas = np.asarray(
                [dy * sy + dx * sx + dz for dz in (-1, 0, 1)
                 for dy in (-1, 0, 1) for dx in (-1, 0, 1)], np.int32)
            tgt = ids
        feats = jnp.asarray(
            rng.randn(ids.shape[0], cin).astype(np.float32) * 0.1)
        w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.05)

        @jax.jit
        def f(s, ids, tgt, feats):
            ff = feats * (1.0 + s * 1e-6)
            lp = compute_positions(ids, tgt, deltas, block=block,
                                   window=window, band=band,
                                   tap_window=tap, sentinel_start=sent)
            out = posgather_conv(ids, ff, tgt, w, lp, sentinel_start=sent)
            return (jnp.sum(jnp.abs(out).astype(jnp.float32))
                    + lp.overflow.astype(jnp.float32) * 1e-6) % 100.0

        r = float(f(jnp.float32(0.0), ids, tgt, feats))
        t_compile = time.time() - t0
        # quick timing
        t0b = time.time()
        for i in range(3):
            r = float(f(jnp.float32(0.5 + i), ids, tgt, feats))
        t_run = (time.time() - t0b) / 3 * 1000
        print(f"{name:30s}: compile {t_compile:6.1f}s  run {t_run:7.2f} ms",
              flush=True)
    except Exception as e:
        print(f"{name:30s}: FAIL after {time.time()-t0:.0f}s "
              f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    cases = {
        "l0subm": ("subm L0 c16 w3584", 121856, (41, 1440, 1440), 16, 16,
                   3584, 3, 1792, 1024, None, False),
        "l01down": ("strided L0->L1 w4608", 121856, (41, 1440, 1440), 16,
                    32, 4608, 6, 2816, 1024, 131072, True),
        "l1subm": ("subm L1 c32 w3584", 131072, (21, 720, 720), 32, 32,
                   3584, 3, 1792, 1024, None, False),
        "l12down": ("strided L1->L2 w7168", 131072, (21, 720, 720), 32, 64,
                    7168, 6, 5120, 1024, 49152, True),
        "l2subm": ("subm L2 c64 w3584", 49152, (11, 360, 360), 64, 64,
                   3584, 3, 1792, 1024, None, False),
        "l23down": ("strided L2->L3 w8192", 49152, (11, 360, 360), 64, 64,
                    8192, 6, 4608, 1024, 16384, True),
    }
    for key, args in cases.items():
        if which in ("all", key):
            run(*args)

"""Micro-profile the sparse backbone's internal ops at flagship scale on the
real chip (chained timing per PERF.md). Each op is timed in isolation with
realistic shapes: L0 = 1440x1440x41 grid, ~120k voxels.
"""

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
        strided_base_ids, strided_deltas, win_downsample, windowed_conv,
        yxz_linear_ids, yxz_offset_deltas,
    )

    rng = np.random.RandomState(0)
    nz, ny, nx = 42, 1440, 1440
    shape = (nz, ny, nx)
    v = 122880  # block-multiple of 640/1024/512
    n_act = 118000

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
    coords_s = jnp.asarray(coords[order])
    valid_s = jnp.asarray(valid[order])
    cin = 16
    feats = jnp.asarray(
        (rng.randn(v, cin) * valid[:, None]).astype(np.float32)[order]
    )
    w = jnp.asarray(rng.randn(27, cin, cin).astype(np.float32))
    deltas = jnp.asarray(yxz_offset_deltas((3, 3, 3), shape))

    # 1. entry argsort
    @jax.jit
    def f_sort(s):
        i2 = yxz_linear_ids(coords_s, valid_s, shape) + s.astype(jnp.int32)
        o = jnp.argsort(i2)
        return jnp.sum(o[:5]).astype(jnp.float32) + s * 0

    print(f"entry yxz ids+argsort (120k): {chain(f_sort):8.2f} ms", flush=True)

    # 2. one windowed subm conv at L0
    def mk_subm(block, window, prec):
        @jax.jit
        def f(s):
            out, ovf = windowed_conv(ids, feats + s * 1e-9, ids, w, deltas,
                                     block=block, window=window,
                                     precision=prec)
            return jnp.sum(out[:3, :3]) + ovf.astype(jnp.float32) * 0
        return f

    for block, window in ((640, 1024), (1024, 2048), (512, 1024)):
        ms = chain(mk_subm(block, window, None))
        print(f"subm windowed C=16 block={block} win={window}: {ms:8.2f} ms",
              flush=True)
    ms = chain(mk_subm(640, 1024, jax.lax.Precision.HIGHEST))
    print(f"subm windowed C=16 HIGHEST precision:  {ms:8.2f} ms", flush=True)

    # bf16 feats
    featsb = feats.astype(jnp.bfloat16)

    @jax.jit
    def f_bf16(s):
        out, ovf = windowed_conv(ids, featsb + s.astype(jnp.bfloat16) * 0,
                                 ids, w.astype(jnp.bfloat16), deltas,
                                 block=640, window=1024)
        return jnp.sum(out[:3, :3]).astype(jnp.float32)

    print(f"subm windowed C=16 bf16 feats:         {chain(f_bf16):8.2f} ms",
          flush=True)

    # 3. win_downsample L0 -> L1
    out_shape = tuple((n + 2 - 3) // 2 + 1 for n in shape)
    cap1 = 64000

    @jax.jit
    def f_down(s):
        oi, oc, ov = win_downsample(coords_s, valid_s, shape, out_shape, cap1)
        return (oi[:3].sum() + s.astype(jnp.int32)).astype(jnp.float32)

    print(f"win_downsample L0->L1 (8x cand sort):  {chain(f_down):8.2f} ms",
          flush=True)

    # 4. windowed strided conv L0 -> L1
    oi, oc, ov = jax.jit(
        lambda: win_downsample(coords_s, valid_s, shape, out_shape, cap1)
    )()
    sdel = jnp.asarray(strided_deltas((3, 3, 3), (2, 2, 2), (1, 1, 1), shape))
    base = strided_base_ids(oc, ov, (2, 2, 2), shape, out_shape)
    w2 = jnp.asarray(rng.randn(27, cin, 32).astype(np.float32))

    def mk_strided(window):
        @jax.jit
        def f(s):
            out, ovf = windowed_conv(ids, feats + s * 1e-9, base, w2,
                                     sdel, block=640, window=window)
            return jnp.sum(out[:3, :3]) + ovf.astype(jnp.float32) * 0
        return f

    for window in (2048, 4096):
        print(f"strided windowed L0->L1 win={window}:     "
              f"{chain(mk_strided(window)):8.2f} ms", flush=True)

    # 5. overflow counts at flagship window sizes (exactness sanity)
    @jax.jit
    def f_ovf():
        _, o1 = windowed_conv(ids, feats, ids, w, deltas, block=640,
                              window=1024)
        _, o2 = windowed_conv(ids, feats, base, w2, sdel, block=640,
                              window=4096)
        return o1, o2

    o1, o2 = f_ovf()
    print(f"overflow counts: subm={int(o1)} strided={int(o2)}", flush=True)


if __name__ == "__main__":
    main()

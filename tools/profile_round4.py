"""Round-4 consolidated microbench: per-lever timings in ONE process so the
relay compile cost stays small (each program is a single stage, not the
full model).

Measures (chained, data-dependent — PERF.md truth protocol):
  1. one L0 subm windowed conv (C16, V=120k) fori_loop vs unrolled taps
  2. the dense tail: 4x conv3d (1,5,180,180,128) + BN/relu, bf16 vs f32
  3. BaseBEVBackbone-shaped 2D stack on (1,180,180,256), bf16 vs f32
  4. reduce_window occupancy pool (41,1440,1440) int8 (downsample probe)

Usage: python tools/profile_round4.py [--iters 6]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def chain(fn, iters=6):
    s = fn(jnp.float32(0.0))
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    s = fn(jnp.float32(1.0))
    jax.block_until_ready(s)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    s = jnp.float32(0.5)
    for _ in range(iters):
        s = fn(s)
    jax.block_until_ready(s)
    tn = time.perf_counter() - t0
    return (tn - t1) / (iters - 1) * 1000.0


def bench_l0_subm(iters):
    from findnpropagate_tpu.ops.pallas_sparse import windowed_conv_pallas
    from findnpropagate_tpu.ops.sparse_ops import (
        yxz_linear_ids, yxz_offset_deltas, yxz_sentinel_start,
    )

    shape = (41, 1440, 1440)
    rng = np.random.RandomState(0)
    n = 120000
    # clustered actives like a lidar sweep: sample xy centers, fill z runs
    lin = rng.choice(shape[0] * shape[1] * shape[2], n, replace=False)
    z = lin % shape[0]
    y = (lin // shape[0]) % shape[1]
    x = lin // (shape[0] * shape[1])
    coords = jnp.asarray(np.stack([z, y, x], 1).astype(np.int32))
    valid = jnp.ones((n,), bool)
    ids = np.asarray(yxz_linear_ids(coords, valid, shape))
    ids = np.sort(ids)
    block = 1024
    pad = (-n) % block
    ids = np.concatenate([ids, ids[-1] + 1 + np.arange(pad)]).astype(np.int32)
    ids_j = jnp.asarray(ids)
    c = 16
    feats = jnp.asarray(rng.randn(ids.shape[0], c).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.randn(27, c, c).astype(np.float32) * 0.05)
    deltas = jnp.asarray(yxz_offset_deltas((3, 3, 3), shape))
    sent = yxz_sentinel_start(shape)
    scale = jnp.ones((c,), jnp.float32)
    shift = jnp.zeros((c,), jnp.float32)

    for unroll in (False, True):
        @jax.jit
        def f(s, unroll=unroll):
            ff = feats * (1.0 + s * 1e-6)
            out, ovf = windowed_conv_pallas(
                ids_j, ff.astype(jnp.bfloat16), ids_j, w, deltas,
                block=block, window=2048, sentinel_start=sent,
                compute_dtype=jnp.bfloat16, scale=scale, shift=shift,
                relu=True, tap_window=1280, unroll=unroll)
            # s*0.77 term keeps the chained scalar distinct every call —
            # the relay memoizes executions by input value, and a fixed-
            # point output would make iterations 2..N free (PERF.md)
            return (jnp.sum(jnp.abs(out).astype(jnp.float32)) % 100.0
                    + s * 0.77 % 7.0
                    + ovf.astype(jnp.float32) * 1e6)

        t = chain(f, iters)
        ovf = int(float(f(jnp.float32(0.0))) // 1e6)
        print(f"l0_subm unroll={unroll}: {t:7.2f} ms  ovf={ovf}", flush=True)


def bench_dense_tail(iters):
    rng = np.random.RandomState(1)
    x0 = jnp.asarray(rng.randn(1, 5, 180, 180, 128).astype(np.float32) * 0.1)
    ws = [jnp.asarray(rng.randn(3, 3, 3, 128, 128).astype(np.float32) * 0.02)
          for _ in range(4)]
    mask = jnp.asarray(rng.rand(1, 5, 180, 180) > 0.3)

    for dt in (jnp.bfloat16, jnp.float32):
        @jax.jit
        def f(s, dt=dt):
            x = (x0 * (1.0 + s * 1e-6)).astype(dt)
            for w in ws:
                y = jax.lax.conv_general_dilated(
                    x, w.astype(dt), (1, 1, 1), [(1, 1)] * 3,
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
                y = jnp.where(mask[..., None], y, 0.0)
                x = jax.nn.relu(y * 1.01 + 0.01)
            return (jnp.sum(jnp.abs(x).astype(jnp.float32)) % 100.0
                    + s * 0.77 % 7.0)

        print(f"dense_tail(4x conv3d 128ch) {dt.__name__}: "
              f"{chain(f, iters):7.2f} ms", flush=True)


def bench_bev(iters):
    rng = np.random.RandomState(2)
    x0 = jnp.asarray(rng.randn(1, 180, 180, 256).astype(np.float32) * 0.1)

    def stack(x, dt):
        w1 = jnp.asarray(
            rng.randn(3, 3, x.shape[-1], 128).astype(np.float32) * 0.02)
        x = x.astype(dt)
        h = jax.lax.conv_general_dilated(
            x, w1.astype(dt), (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        for _ in range(5):
            wi = jnp.asarray(
                rng.randn(3, 3, 128, 128).astype(np.float32) * 0.02)
            h = jax.nn.relu(jax.lax.conv_general_dilated(
                h, wi.astype(dt), (1, 1), [(1, 1)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
        w2 = jnp.asarray(
            rng.randn(3, 3, 128, 256).astype(np.float32) * 0.02)
        g = jax.lax.conv_general_dilated(
            h, w2.astype(dt), (2, 2), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        for _ in range(5):
            wi = jnp.asarray(
                rng.randn(3, 3, 256, 256).astype(np.float32) * 0.02)
            g = jax.nn.relu(jax.lax.conv_general_dilated(
                g, wi.astype(dt), (1, 1), [(1, 1)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
        return h, g

    for dt in (jnp.bfloat16, jnp.float32):
        @jax.jit
        def f(s, dt=dt):
            x = x0 * (1.0 + s * 1e-6)
            h, g = stack(x, dt)
            return ((jnp.sum(jnp.abs(h).astype(jnp.float32))
                     + jnp.sum(jnp.abs(g).astype(jnp.float32))) % 100.0
                    + s * 0.77 % 7.0)

        print(f"bev_stack(~BaseBEVBackbone) {dt.__name__}: "
              f"{chain(f, iters):7.2f} ms", flush=True)


def bench_occupancy_pool(iters):
    rng = np.random.RandomState(3)
    occ0 = jnp.asarray((rng.rand(41, 1440, 1440) > 0.998).astype(np.int8))

    @jax.jit
    def f(s):
        occ = occ0 + (s * 0).astype(jnp.int8)
        p = jax.lax.reduce_window(
            occ, np.int8(0), jax.lax.max, (3, 3, 3), (2, 2, 2),
            [(1, 1)] * 3)
        return jnp.sum(p.astype(jnp.float32)) % 100.0 + s * 0.77 % 7.0

    print(f"occupancy reduce_window int8: {chain(f, iters):7.2f} ms",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--only", default="all",
                    choices=["all", "l0", "dense", "bev", "occ"])
    args = ap.parse_args()
    if args.only in ("all", "l0"):
        bench_l0_subm(args.iters)
    if args.only in ("all", "dense"):
        bench_dense_tail(args.iters)
    if args.only in ("all", "bev"):
        bench_bev(args.iters)
    if args.only in ("all", "occ"):
        bench_occupancy_pool(args.iters)


if __name__ == "__main__":
    main()

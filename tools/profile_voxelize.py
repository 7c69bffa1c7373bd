"""Voxelizer internals at flagship scale (chained, per PERF.md truth
protocol): argsort vs segment-start scatter-min vs mean gathers."""
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
    t0 = time.perf_counter(); s = fn(jnp.float32(1.0)); jax.block_until_ready(s)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        s = fn(s + jnp.float32(i) * 0.01)
    jax.block_until_ready(s)
    return (time.perf_counter() - t0 - t1) / (iters - 1) * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--p", type=int, default=300000)
    args = ap.parse_args()
    b, p = args.batch, args.p
    rng = np.random.RandomState(0)
    pts = rng.uniform(-54, 54, (b, p, 5)).astype(np.float32)
    pts[..., 2] = rng.uniform(-5, 3, (b, p))
    pts = jnp.asarray(pts)
    mask = jnp.ones((b, p), bool)
    pcr = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    vs = (0.075, 0.075, 0.2)
    grid = (1440, 1440, 41)

    from findnpropagate_tpu.ops.voxelize import (
        compute_voxel_coords, voxelize_mean)

    @jax.jit
    def full(s):
        x = pts * (1.0 + (s % 1.0) * 1e-3)
        out = jax.vmap(lambda q, m: voxelize_mean(
            q, m, pcr, vs, grid, 120000, 10))(x, mask)
        return (jnp.sum(jnp.abs(out.means)) + jnp.sum(out.coords)
                ).astype(jnp.float32) % 1000.0
    print(f"voxelize_mean full      : {chain(full):8.2f} ms", flush=True)

    @jax.jit
    def sort_only(s):
        x = pts * (1.0 + (s % 1.0) * 1e-3)
        def one(q, m):
            xyz, ok = compute_voxel_coords(q, jnp.asarray(pcr), jnp.asarray(vs))
            lin = (xyz[:, 2] * 1440 + xyz[:, 1]) * 1440 + xyz[:, 0]
            lin = jnp.where(m & ok, lin, 1440 * 1440 * 41)
            order = jnp.argsort(lin, stable=True)
            return jnp.sum(order[:7]) + jnp.sum(lin[order[:5]])
        return jnp.sum(jax.vmap(one)(x, mask)).astype(jnp.float32) % 1000.0
    print(f"hash + stable argsort   : {chain(sort_only):8.2f} ms", flush=True)

    @jax.jit
    def sort_u32(s):
        x = pts * (1.0 + (s % 1.0) * 1e-3)
        def one(q, m):
            xyz, ok = compute_voxel_coords(q, jnp.asarray(pcr), jnp.asarray(vs))
            lin = (xyz[:, 2] * 1440 + xyz[:, 1]) * 1440 + xyz[:, 0]
            lin = jnp.where(m & ok, lin, 1440 * 1440 * 41)
            # non-stable sort of (key, idx) pairs
            idx = jnp.arange(p, dtype=jnp.int32)
            _, order = jax.lax.sort((lin, idx), num_keys=1)
            return jnp.sum(order[:7])
        return jnp.sum(jax.vmap(one)(x, mask)).astype(jnp.float32) % 1000.0
    print(f"hash + lax.sort pair    : {chain(sort_u32):8.2f} ms", flush=True)

    # sort float64-packed single key (key * P + idx) to avoid pair sort
    @jax.jit
    def sort_packed(s):
        x = pts * (1.0 + (s % 1.0) * 1e-3)
        def one(q, m):
            xyz, ok = compute_voxel_coords(q, jnp.asarray(pcr), jnp.asarray(vs))
            lin = (xyz[:, 2] * 1440 + xyz[:, 1]) * 1440 + xyz[:, 0]
            lin = jnp.where(m & ok, lin, 1440 * 1440 * 41).astype(jnp.int64)
            idx = jnp.arange(p, dtype=jnp.int64)
            packed = lin * p + idx
            sp = jax.lax.sort(packed)
            return jnp.sum((sp[:7] % p).astype(jnp.int32))
        return jnp.sum(jax.vmap(one)(x, mask)).astype(jnp.float32) % 1000.0
    try:
        print(f"hash + packed i64 sort  : {chain(sort_packed):8.2f} ms",
              flush=True)
    except Exception as e:
        print("packed sort failed:", repr(e)[:120], flush=True)


if __name__ == "__main__":
    main()

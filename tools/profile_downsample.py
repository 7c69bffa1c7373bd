"""Microbench the dense-occupancy downsample internals at L0->L1 flagship
scale (PERF.md round-3 session 5): where do the 17 ms go — occupancy
scatter, reduce_window max-pool (and its physical layout), rank-select, or
the strided conv? Also measures a (z, y, x)-major occupancy variant: the
current (y, x, z) layout pads nz=41 to 128 lanes (265 MB physical int8 at
L0), while z-major pads nx 1440->1536 (91 MB) and only the SMALL pooled
grid needs transposing back to yxz order.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def chain(fn, *args, iters=6):
    s = fn(jnp.float32(0.0), *args)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    s = fn(jnp.float32(1.0), *args)
    jax.block_until_ready(s)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    s = jnp.float32(0.5)
    for _ in range(iters):
        s = fn(s, *args)
    jax.block_until_ready(s)
    tn = time.perf_counter() - t0
    return (tn - t1) / (iters - 1) * 1000.0


def main():
    from findnpropagate_tpu.ops.sparse_ops import (
        _mask_rank_select, win_downsample_dense,
    )

    rng = np.random.RandomState(0)
    in_shape = (41, 1440, 1440)   # (nz, ny, nx)
    out_shape = (21, 720, 720)
    v = 120832
    nz_i, ny_i, nx_i = in_shape
    # clustered actives like a real sweep: ~40 clusters + ground plane band
    ys = rng.randint(0, ny_i, v).astype(np.int32)
    xs = rng.randint(0, nx_i, v).astype(np.int32)
    zs = np.clip(rng.poisson(6, v), 0, nz_i - 1).astype(np.int32)
    coords = jnp.asarray(np.stack([zs, ys, xs], 1))
    valid = jnp.asarray(np.ones((v,), bool))

    # full current path
    def f_full(s, c):
        cc = c + s.astype(jnp.int32) * 0
        oi, oc, ov = win_downsample_dense(cc, valid, in_shape, out_shape,
                                          65536)
        return (jnp.sum(oi % 97) + jnp.sum(oc) + jnp.sum(ov)).astype(
            jnp.float32) % 1000.0
    print(f"win_downsample_dense full : {chain(jax.jit(f_full), coords):7.1f} ms",
          flush=True)

    # occupancy scatter alone, (y, x, z) layout
    def f_occ_yxz(s, c):
        iy = c[:, 1] + s.astype(jnp.int32) * 0
        occ = jnp.zeros((ny_i, nx_i, nz_i), jnp.int8)
        occ = occ.at[iy, c[:, 2], c[:, 0]].max(
            jnp.int8(1), mode="drop", unique_indices=True)
        return jnp.sum(occ.astype(jnp.int32)).astype(jnp.float32) % 1000.0
    print(f"occ scatter (y,x,z)       : {chain(jax.jit(f_occ_yxz), coords):7.1f} ms",
          flush=True)

    # occupancy scatter alone, (z, y, x) layout
    def f_occ_zyx(s, c):
        iz = c[:, 0] + s.astype(jnp.int32) * 0
        occ = jnp.zeros((nz_i, ny_i, nx_i), jnp.int8)
        occ = occ.at[iz, c[:, 1], c[:, 2]].max(
            jnp.int8(1), mode="drop", unique_indices=True)
        return jnp.sum(occ.astype(jnp.int32)).astype(jnp.float32) % 1000.0
    print(f"occ scatter (z,y,x)       : {chain(jax.jit(f_occ_zyx), coords):7.1f} ms",
          flush=True)

    # scatter + pool, (y, x, z)
    def f_pool_yxz(s, c):
        iy = c[:, 1] + s.astype(jnp.int32) * 0
        occ = jnp.zeros((ny_i, nx_i, nz_i), jnp.int8)
        occ = occ.at[iy, c[:, 2], c[:, 0]].max(
            jnp.int8(1), mode="drop", unique_indices=True)
        pooled = jax.lax.reduce_window(
            occ, jnp.int8(0), jax.lax.max, (3, 3, 3), (2, 2, 2),
            ((1, 1), (1, 1), (1, 1)))
        return jnp.sum(pooled.astype(jnp.int32)).astype(jnp.float32) % 1000.0
    print(f"scatter+pool (y,x,z)      : {chain(jax.jit(f_pool_yxz), coords):7.1f} ms",
          flush=True)

    # scatter + pool in (z, y, x) + transpose pooled to (y, x, z)
    def f_pool_zyx(s, c):
        iz = c[:, 0] + s.astype(jnp.int32) * 0
        occ = jnp.zeros((nz_i, ny_i, nx_i), jnp.int8)
        occ = occ.at[iz, c[:, 1], c[:, 2]].max(
            jnp.int8(1), mode="drop", unique_indices=True)
        pooled = jax.lax.reduce_window(
            occ, jnp.int8(0), jax.lax.max, (3, 3, 3), (2, 2, 2),
            ((1, 1), (1, 1), (1, 1)))
        pooled = jnp.transpose(pooled, (1, 2, 0))   # -> (y, x, z)
        return jnp.sum(pooled.astype(jnp.int32)).astype(jnp.float32) % 1000.0
    print(f"scatter+pool+T (z,y,x)    : {chain(jax.jit(f_pool_zyx), coords):7.1f} ms",
          flush=True)

    # 2D variant: fold z into lanes of a 2D (y, x*nz) image? pool z and x
    # separately via two reduce_windows on a (y, x, z) grid is NOT equal to
    # 3D pool; but separable max-pool IS: max is associative per-dim.
    def f_pool_zyx_sep(s, c):
        iz = c[:, 0] + s.astype(jnp.int32) * 0
        occ = jnp.zeros((nz_i, ny_i, nx_i), jnp.int8)
        occ = occ.at[iz, c[:, 1], c[:, 2]].max(
            jnp.int8(1), mode="drop", unique_indices=True)
        p1 = jax.lax.reduce_window(   # pool z only
            occ, jnp.int8(0), jax.lax.max, (3, 1, 1), (2, 1, 1),
            ((1, 1), (0, 0), (0, 0)))
        p2 = jax.lax.reduce_window(   # pool y, x on the z-thin grid
            p1, jnp.int8(0), jax.lax.max, (1, 3, 3), (1, 2, 2),
            ((0, 0), (1, 1), (1, 1)))
        pooled = jnp.transpose(p2, (1, 2, 0))
        return jnp.sum(pooled.astype(jnp.int32)).astype(jnp.float32) % 1000.0
    print(f"scatter+sep-pool+T (zyx)  : {chain(jax.jit(f_pool_zyx_sep), coords):7.1f} ms",
          flush=True)

    # rank-select alone at L1 pooled size
    flat_len = int(np.prod((720, 720, 21)))
    pad = (-flat_len) % 512
    mask = jnp.asarray(
        (rng.rand(flat_len + pad) < 0.006).astype(np.int8))

    def f_rank(s, m):
        mm = jnp.where(s.astype(jnp.int8) * 0 == 0, m, m)
        pos, ok = _mask_rank_select(mm, 65536, 512)
        return (jnp.sum(pos % 97) + jnp.sum(ok)).astype(jnp.float32) % 1000.0
    print(f"rank-select 10.9M->65536  : {chain(jax.jit(f_rank), mask):7.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()

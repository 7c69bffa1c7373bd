"""Probe 4: cost of the position-precompute (XLA searchsorted) and of a
banded within-tile taa-gather Pallas kernel at L0 sparse-conv scale.

Design being evaluated (PERF.md round-5): neighbor POSITIONS for all 27
taps are precomputed once per level (searchsorted over the sorted id
list, shared by all 5 L0 subm convs); the conv kernel then replaces the
one-hot compare+matmul alignment with per-(tap, out-tile) 128-lane
permutes over a narrow banded window — positions are monotone per tap,
so each 128-target tile reads a <=B*128-wide slice of the window.
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def chain(fn, *args, iters=8):
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


def make_ids(v=120000, seed=0):
    """Sorted unique int32 ids resembling L0 guard-banded yxz ids."""
    rng = np.random.RandomState(seed)
    ids = np.sort(rng.choice(v * 50, v, replace=False).astype(np.int32))
    return ids


def bench_searchsorted():
    ids = jnp.asarray(make_ids())
    v = ids.shape[0]
    sy, sx = 62135, 43
    deltas = np.array([dy * sy + dx * sx + dz
                       for dz in (-1, 0, 1) for dy in (-1, 0, 1)
                       for dx in (-1, 0, 1)], np.int32)
    deltas = jnp.asarray(np.delete(deltas, 13))  # 26 non-center

    @jax.jit
    def f(s, ids):
        idq = ids + (s.astype(jnp.int32) % 2)  # perturb
        q = (idq[None, :] + deltas[:, None]).reshape(-1)
        pos = jnp.searchsorted(ids, q)
        return (jnp.sum(pos % 97).astype(jnp.float32)) % 100.0

    t = chain(f, ids)
    print(f"searchsorted 26x{v} queries          : {t:8.3f} ms", flush=True)

    # sorted-insertion variant: searchsorted with method?  also scalar gather
    @jax.jit
    def g(s, ids):
        idq = ids + (s.astype(jnp.int32) % 2)
        pos = jnp.searchsorted(ids, idq + 43)
        got = ids[jnp.clip(pos, 0, v - 1)]
        return (jnp.sum(got % 97) + jnp.sum(pos % 97)).astype(jnp.float32) % 100.0

    t = chain(g, ids)
    print(f"searchsorted 1 tap + scalar gather   : {t:8.3f} ms", flush=True)


def bench_banded_taa(c=16, w_blk=1024, band_tiles=3, taps=27, s_win=2048,
                     nb=118):
    """Kernel: per block, window feats (C, S) resident; per (tap, out-tile):
    gather (C, 128) outputs from band_tiles input tiles via taa + select.
    Grid of nb blocks to include per-block overheads. Positions random
    near-diagonal."""
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(c, s_win).astype(np.float32)
                        ).astype(jnp.bfloat16)
    # relative positions within band: (taps, w_blk) in [0, band*128)
    rel = jnp.asarray(
        rng.randint(0, band_tiles * 128, (taps, w_blk)).astype(np.int32))
    # per (tap, out-tile) 128-aligned band start in window
    starts = jnp.asarray(
        (rng.randint(0, (s_win - band_tiles * 128) // 128,
                     (nb, taps, w_blk // 128)) * 128).astype(np.int32))
    wt = jnp.asarray(rng.randn(c, taps * c).astype(np.float32)
                     ).astype(jnp.bfloat16)

    ot_n = w_blk // 128

    def kernel(starts_ref, feats_ref, rel_ref, w_ref, o_ref, gbuf):
        i = pl.program_id(0)
        f = feats_ref[:]                     # (C, S) resident
        for k in range(taps):
            for ot in range(ot_n):
                off = pl.multiple_of(starts_ref[i, k, ot], 128)
                band = feats_ref[:, pl.ds(off, band_tiles * 128)]
                idx = rel_ref[k, pl.ds(ot * 128, 128)]       # (128,)
                idxb = jnp.broadcast_to(idx[None, :], (c, 128))
                acc = jnp.zeros((c, 128), jnp.bfloat16)
                for bt in range(band_tiles):
                    tile = band[:, bt * 128:(bt + 1) * 128]
                    g = jnp.take_along_axis(
                        tile, jnp.clip(idxb - bt * 128, 0, 127), axis=1)
                    acc = jnp.where(
                        (idxb >= bt * 128) & (idxb < (bt + 1) * 128),
                        g, acc)
                gbuf[k * c:(k + 1) * c, ot * 128:(ot + 1) * 128] = acc
        o_ref[:] = jnp.dot(w_ref[:], gbuf[:],
                           preferred_element_type=jnp.float32
                           ).astype(o_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # feats (whole window)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rel
            pl.BlockSpec(memory_space=pltpu.VMEM),   # weights
        ],
        out_specs=pl.BlockSpec((c, w_blk), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((taps * c, w_blk), jnp.bfloat16)],
    )

    def call(feats, rel, wt):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((c, nb * w_blk), jnp.bfloat16),
            grid_spec=grid_spec,
        )(starts, feats, rel, wt)

    try:
        @jax.jit
        def f(s, feats, rel, wt):
            ff = feats * (1.0 + s.astype(jnp.bfloat16)
                          * jnp.asarray(1e-3, jnp.bfloat16))
            o = call(ff, rel, wt)
            return jnp.sum(jnp.abs(o).astype(jnp.float32)) % 100.0

        t = chain(f, feats, rel, wt)
        print(f"banded-taa {taps}taps band{band_tiles} {nb}blk  : "
              f"{t:8.3f} ms", flush=True)
    except Exception as e:
        print(f"banded-taa band{band_tiles}: FAIL {type(e).__name__}: "
              f"{str(e)[:160]}", flush=True)


def bench_onehot_ref(c=16, w_blk=1024, taps=27, s_win=2048, tap_win=1536,
                     nb=118):
    """Reference: current one-hot style per-tap compare+matmul, same grid."""
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(c, s_win).astype(np.float32)
                        ).astype(jnp.bfloat16)
    ids = jnp.asarray(
        np.sort(rng.choice(10 * s_win, s_win, replace=False)
                ).astype(np.int32))[None, :]
    want = jnp.asarray(
        rng.randint(0, 10 * s_win, (taps, w_blk)).astype(np.int32))
    wt = jnp.asarray(rng.randn(c, taps * c).astype(np.float32)
                     ).astype(jnp.bfloat16)

    def kernel(feats_ref, ids_ref, want_ref, w_ref, o_ref, gbuf):
        f = feats_ref[:]
        for k in range(taps):
            wi = ids_ref[0, pl.ds(0, tap_win)]
            wf = feats_ref[:, pl.ds(0, tap_win)]
            onehot = (wi[:, None] == want_ref[k, :][None, :]
                      ).astype(jnp.bfloat16)
            g = jnp.dot(wf, onehot, preferred_element_type=jnp.float32)
            gbuf[k * c:(k + 1) * c, :] = g.astype(jnp.bfloat16)
        o_ref[:] = jnp.dot(w_ref[:], gbuf[:],
                           preferred_element_type=jnp.float32
                           ).astype(o_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, w_blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((taps * c, w_blk), jnp.bfloat16)],
    )

    def call(feats, ids, want, wt):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((c, nb * w_blk), jnp.bfloat16),
            grid_spec=grid_spec,
        )(feats, ids, want, wt)

    @jax.jit
    def f(s, feats, ids, want, wt):
        ff = feats * (1.0 + s.astype(jnp.bfloat16)
                      * jnp.asarray(1e-3, jnp.bfloat16))
        o = call(ff, ids, want, wt)
        return jnp.sum(jnp.abs(o).astype(jnp.float32)) % 100.0

    t = chain(f, feats, ids, want, wt)
    print(f"onehot {taps}taps tapwin{tap_win} {nb}blk : {t:8.3f} ms",
          flush=True)


if __name__ == "__main__":
    bench_searchsorted()
    bench_banded_taa(band_tiles=2)
    bench_banded_taa(band_tiles=3)
    bench_banded_taa(band_tiles=4)
    bench_onehot_ref()

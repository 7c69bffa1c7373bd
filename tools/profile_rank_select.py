"""Variant shoot-out for the flat-mask rank select (first-k set positions
of a 10.9M int8 mask -> 65536 slots) that dominates the dense downsample.

Round-3 session-5 findings so far: one-level sel512 = 9.0 ms; two-level
512/128 = 12.4 ms; one-level sel128 = 11.2 ms -> the row gather / prefix
width is NOT the cost; the searchsorted of 65536 slots into the block
cumsum is. This script times a scatter-inversion variant: blk[p] =
#{csum_inc <= p} computed by a histogram scatter-add over the (nblk,)
cumsum values + one cumsum over the slot axis — O(nblk) scattered rows
instead of 65k binary-search gathers.
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


def scatter_inv(mask, max_out, sel):
    nblk = mask.shape[0] // sel
    mask_r = mask.reshape(nblk, sel)
    counts = jnp.sum(mask_r.astype(jnp.int32), axis=1)
    csum_inc = jnp.cumsum(counts)
    total = csum_inc[-1]
    p_slot = jnp.arange(max_out, dtype=jnp.int32)
    h = jnp.zeros((max_out,), jnp.int32).at[csum_inc].add(
        1, mode="drop")                       # csum >= max_out never matters
    blk = jnp.cumsum(h)                       # #{csum_inc <= p}
    blk = jnp.minimum(blk, nblk - 1)
    within = p_slot - (csum_inc - counts)[blk]
    rows = mask_r[blk].astype(jnp.int32)
    prefix = jnp.cumsum(rows, axis=1)
    pos = jnp.sum((prefix <= within[:, None]).astype(jnp.int32), axis=1)
    out_pos = blk * sel + pos
    out_valid = p_slot < jnp.minimum(total, max_out)
    return out_pos.astype(jnp.int32), out_valid


def main():
    rng = np.random.RandomState(0)
    flat_len = int(np.prod((720, 720, 21)))
    pad = (-flat_len) % 512
    mask_np = (rng.rand(flat_len + pad) < 0.006).astype(np.int8)
    mask = jnp.asarray(mask_np)
    max_out = 65536

    def consume(pos, ok):
        return (jnp.sum(pos % 97) + jnp.sum(ok)).astype(jnp.float32) % 1e3

    want = np.flatnonzero(mask_np)[:max_out]
    for name, fn in [
        ("scatterinv512", lambda m: scatter_inv(m, max_out, 512)),
        ("scatterinv1024", lambda m: scatter_inv(m, max_out, 1024)),
    ]:
        print(f"compiling {name}...", flush=True)
        pos, ok = jax.jit(fn)(mask)
        pos, ok = np.asarray(pos), np.asarray(ok)
        assert ok.sum() == len(want), name
        np.testing.assert_array_equal(pos[ok], want, err_msg=name)

        def f(s, m=mask, fn=fn):
            mm = jnp.where(s.astype(jnp.int8) * 0 == 0, m, m)
            return consume(*fn(mm))
        print(f"{name:14s}: {chain(jax.jit(f)):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()

"""Chained timing of the dense-z pillar subm conv vs the fused Pallas
windowed conv at flagship L0 scale (truth protocol: perturbed inputs,
consumed outputs, per-iteration sync, median)."""
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
    ap.add_argument("--v", type=int, default=120000)
    ap.add_argument("--c", type=int, default=16)
    ap.add_argument("--cout", type=int, default=16)
    ap.add_argument("--pillars", type=int, default=57344)
    ap.add_argument("--zc", type=int, default=8)
    ap.add_argument("--nconv", type=int, default=1)
    args = ap.parse_args()

    shape = (41, 1440, 1440)
    nz, ny, nx = shape
    rng = np.random.RandomState(0)
    # realistic ring-ish occupancy: sample pillar (y, x), then 2-3 z cells
    n_pil = args.v // 2
    py = rng.randint(0, ny, n_pil)
    px = rng.randint(0, nx, n_pil)
    zs = rng.randint(0, nz, (n_pil, 2))
    coords = np.stack(
        [zs.reshape(-1),
         np.repeat(py, 2), np.repeat(px, 2)], axis=1).astype(np.int32)
    coords = coords[: args.v]
    valid = np.ones(args.v, bool)
    feats = rng.standard_normal((args.v, args.c)).astype(np.float32)

    from findnpropagate_tpu.ops.zdense import pillarize, zdense_subm
    ids2, coords2, pvalid, pfeats, pmask = jax.block_until_ready(
        pillarize(jnp.asarray(coords), jnp.asarray(valid),
                  jnp.asarray(feats), shape, args.pillars, nz))
    print("pillars:", int(jnp.sum(pvalid)), "cap", args.pillars, flush=True)
    w = jnp.asarray(
        rng.standard_normal((27, args.c, args.cout)).astype(np.float32) * .1)

    @jax.jit
    def zd(s):
        x = pfeats * (1.0 + (s % 1.0) * 1e-3)
        for _ in range(args.nconv):
            x = zdense_subm(ids2, x.astype(jnp.bfloat16), pmask, pvalid, w,
                            shape, nz, args.c, zc=args.zc).astype(jnp.bfloat16)
        return jnp.sum(jnp.abs(x).astype(jnp.float32)) % 1000.0

    t = chain(zd)
    print(f"zdense_subm x{args.nconv}: {t:8.2f} ms "
          f"({t/args.nconv:6.2f} ms/conv)", flush=True)

    # pillarize cost itself
    fj = jnp.asarray(feats)
    @jax.jit
    def pz(s):
        out = pillarize(jnp.asarray(coords), jnp.asarray(valid),
                        fj * (1.0 + (s % 1.0) * 1e-3), shape,
                        args.pillars, nz)
        return jnp.sum(jnp.abs(out[3]).astype(jnp.float32)) % 1000.0
    print(f"pillarize: {chain(pz):8.2f} ms", flush=True)

    # reference: fused pallas windowed conv on the same scene
    from findnpropagate_tpu.ops.sparse_ops import (
        yxz_linear_ids, yxz_offset_deltas, yxz_sentinel_start)
    from findnpropagate_tpu.ops.pallas_sparse import windowed_conv_pallas
    ids3 = yxz_linear_ids(jnp.asarray(coords), jnp.asarray(valid), shape)
    order = jnp.argsort(ids3)
    ids3s = ids3[order]
    f3 = jnp.asarray(feats)[order]
    pad = (-args.v) % 1024
    ids3p = jnp.concatenate(
        [ids3s, ids3s[-1] + 1 + jnp.arange(pad, dtype=jnp.int32)])
    f3p = jnp.concatenate([f3, jnp.zeros((pad, args.c))])
    deltas = jnp.asarray(yxz_offset_deltas((3, 3, 3), shape))

    @jax.jit
    def wp(s):
        x = f3p * (1.0 + (s % 1.0) * 1e-3)
        for _ in range(args.nconv):
            x, _ = windowed_conv_pallas(
                ids3p, x.astype(jnp.bfloat16), ids3p, w, deltas,
                block=1024, window=2048, tap_window=1280,
                sentinel_start=int(yxz_sentinel_start(shape)))
            x = x.astype(jnp.bfloat16)
        return jnp.sum(jnp.abs(x).astype(jnp.float32)) % 1000.0

    t = chain(wp)
    print(f"pallas windowed x{args.nconv}: {t:8.2f} ms "
          f"({t/args.nconv:6.2f} ms/conv)", flush=True)


if __name__ == "__main__":
    main()

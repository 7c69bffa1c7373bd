"""Per-level posgather cost on the REAL bench scene: positions prelude and
marginal conv per level (subm L0/L1/L2, strided L0-1/L1-2/L2-3), chained
and nan-safe per the truth protocol."""

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
    from bench import build_transfusion_bench
    from findnpropagate_tpu.ops.pallas_posgather import (
        compute_positions, posgather_conv)
    from findnpropagate_tpu.ops.sparse_ops import (
        strided_base_ids, strided_deltas, strided_sentinel_start,
        win_downsample_dense, yxz_linear_ids, yxz_offset_deltas,
        yxz_sentinel_start)

    det, variables, batch = build_transfusion_bench(1)
    batch = jax.device_put(batch)

    @jax.jit
    def to_bb(variables, batch):
        b = det.apply(variables, dict(batch), train=False, upto=1)
        return b["voxel_coords"], b["voxel_mask"]

    coords0, mask0 = jax.block_until_ready(to_bb(variables, batch))
    shapes = [(41, 1440, 1440), (21, 720, 720), (11, 360, 360),
              (5, 180, 180)]
    caps = [120000, 131072, 49152, 16384]
    block = 1024

    # build per-level sorted id lists (as the backbone does)
    levels = []
    c, v = coords0[0], mask0[0]
    for li in range(3):
        ids = yxz_linear_ids(c, v, shapes[li])
        order = jnp.argsort(ids)
        ids_s = ids[order]
        pad = (-ids_s.shape[0]) % block
        sentp = yxz_sentinel_start(shapes[li])
        if pad:
            ids_s = jnp.concatenate([
                ids_s,
                jnp.maximum(ids_s[-1] + 1, sentp)
                + jnp.arange(pad, dtype=jnp.int32)])
        levels.append((ids_s, c[order], v[order]))
        padc = (0, 1, 1) if li == 2 else (1, 1, 1)
        _, c, v = win_downsample_dense(
            levels[li][1], levels[li][2], shapes[li], shapes[li + 1],
            caps[li + 1], padding=padc)
    print("level sizes:",
          [int(jnp.sum(lv[2])) for lv in levels], flush=True)

    rng = np.random.RandomState(0)
    chans = [16, 32, 64]
    win = [3584, 3584, 3584]
    tapw = [1792, 1792, 1792]
    bands = [3, 3, 3]

    for li in range(3):
        ids_s, cc, vv = levels[li]
        shape = shapes[li]
        cin = chans[li]
        d27 = np.asarray(yxz_offset_deltas((3, 3, 3), shape))
        sent = yxz_sentinel_start(shape)
        w = jnp.asarray(rng.randn(27, cin, cin).astype(np.float32) * 0.03)
        feats = jnp.asarray(
            rng.randn(ids_s.shape[0], cin).astype(np.float32) * 0.3)

        @jax.jit
        def pos_only(s, ids_s=ids_s, d27=d27, li=li):
            ii = ids_s + (s.astype(jnp.int32) % 2)
            lp = compute_positions(ii, ii, d27, block=block, window=win[li],
                                   band=bands[li], tap_window=tapw[li],
                                   sentinel_start=sent)
            return (jnp.sum(lp.pos % 97) + lp.overflow
                    ).astype(jnp.float32) % 100.0

        t_pos = chain(pos_only, iters=6)

        lp = compute_positions(ids_s, ids_s, d27, block=block,
                               window=win[li], band=bands[li],
                               tap_window=tapw[li], sentinel_start=sent)
        flags = int(jnp.sum(lp.flags))

        @jax.jit
        def conv3(s, feats=feats, ids_s=ids_s, w=w, lp=lp, sent=sent):
            ff = feats * (1.0 + (s % 1.0) * 1e-3)
            x = ff
            acc = jnp.float32(0.0)
            for _ in range(3):
                x = posgather_conv(ids_s, x, ids_s, w, lp,
                                   sentinel_start=sent)
                acc = acc + jnp.nan_to_num(
                    jnp.sum(jnp.abs(x).astype(jnp.float32)), nan=0.3) % 10.0
            return acc % 100.0

        @jax.jit
        def conv1(s, feats=feats, ids_s=ids_s, w=w, lp=lp, sent=sent):
            ff = feats * (1.0 + (s % 1.0) * 1e-3)
            x = posgather_conv(ids_s, ff, ids_s, w, lp, sentinel_start=sent)
            return jnp.nan_to_num(
                jnp.sum(jnp.abs(x).astype(jnp.float32)), nan=0.3) % 100.0

        t3 = chain(conv3, iters=6)
        t1c = chain(conv1, iters=6)
        print(f"L{li} subm (V={ids_s.shape[0]}, ovf={int(lp.overflow)}, "
              f"flags={flags}): pos {t_pos:6.2f} ms  conv1 {t1c:6.2f}  "
              f"conv3 {t3:6.2f}  marginal {(t3 - t1c) / 2:6.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()

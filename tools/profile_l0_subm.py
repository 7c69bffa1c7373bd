"""Microbench one L0 submanifold windowed conv (C16, V~121k) across
(block, window, tap_window) knob combos, with the overflow exactness
counter printed for each (a non-zero overflow disqualifies the combo).

PERF.md round-3: L0 subm x5 = 23.2 ms at (1024, 2048, 1536); the cost
model says ~15 us/block fixed + per-tap matmul MACs proportional to
tap_window/block — larger blocks amortize the fixed cost AND shrink the
tap-span-to-target ratio, bounded by the VMEM footprint of the per-tap
(tap_window, block) one-hot temp (~16 MB VMEM/core).
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
    from bench import build_transfusion_bench
    from findnpropagate_tpu.ops.sparse_ops import (
        yxz_linear_ids, yxz_offset_deltas, yxz_sentinel_start,
    )
    from findnpropagate_tpu.ops.pallas_sparse import windowed_conv_pallas

    det, variables, batch = build_transfusion_bench(1)
    batch = jax.device_put(batch)

    @jax.jit
    def to_bb_input(variables, batch):
        b = det.apply(variables, dict(batch), train=False, upto=1)
        return b["voxel_features"], b["voxel_coords"], b["voxel_mask"]

    feats0, coords0, mask0 = jax.block_until_ready(
        to_bb_input(variables, batch))
    s1 = (41, 1440, 1440)
    ids = yxz_linear_ids(coords0[0], mask0[0], s1)
    order = jnp.argsort(ids)
    ids = np.asarray(ids[order])
    deltas = jnp.asarray(yxz_offset_deltas((3, 3, 3), s1))
    sent = yxz_sentinel_start(s1)
    rng = np.random.RandomState(0)
    c = 16
    w = jnp.asarray(rng.randn(27, c, c).astype(np.float32) * 0.05)

    combos = [
        (1024, 2048, 1536),   # current flagship setting
        (1024, 2048, 1280),
        (1536, 2560, 2048),
        (1536, 3072, 1792),
        (2048, 3072, 2560),
        (2048, 4096, 2304),
    ]
    for block, window, tap in combos:
        v = ids.shape[0]
        pad = (-v) % block
        ids_p = np.concatenate(
            [ids, ids[-1] + 1 + np.arange(pad, dtype=np.int32)])
        ids_j = jnp.asarray(ids_p)
        feats = jnp.asarray(
            rng.randn(ids_p.shape[0], c).astype(np.float32) * 0.1)

        @jax.jit
        def f(s, ids_j=ids_j, feats=feats, block=block, window=window,
              tap=tap):
            ff = feats * (1.0 + s * 1e-6)
            out, ovf = windowed_conv_pallas(
                ids_j, ff.astype(jnp.bfloat16), ids_j, w, deltas,
                block=block, window=window, sentinel_start=sent,
                compute_dtype=jnp.bfloat16, tap_window=tap)
            return (jnp.sum(jnp.abs(out).astype(jnp.float32)) % 100.0
                    + ovf.astype(jnp.float32) * 1e6)

        try:
            t = chain(f)
            ovf = float(f(jnp.float32(0.0))) // 1e6
            print(f"block {block:5d} win {window:5d} tap {tap:5d} : "
                  f"{t:7.2f} ms  ovf={int(ovf)}", flush=True)
        except Exception as e:  # VMEM OOM etc
            print(f"block {block:5d} win {window:5d} tap {tap:5d} : "
                  f"FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()

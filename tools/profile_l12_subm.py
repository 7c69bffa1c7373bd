"""Sweep (window, tap_window) for L1 (C32, V<=65536) and L2 (C64,
V<=32768) subm convs, using active sets derived from the real bench scene
by the actual downsample rule. Overflow printed per combo (must be 0)."""

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
    from findnpropagate_tpu.ops.pallas_sparse import windowed_conv_pallas
    from findnpropagate_tpu.ops.sparse_ops import (
        win_downsample_dense, yxz_offset_deltas, yxz_sentinel_start,
    )

    det, variables, batch = build_transfusion_bench(1)
    batch = jax.device_put(batch)

    @jax.jit
    def to_bb_input(variables, batch):
        b = det.apply(variables, dict(batch), train=False, upto=1)
        return b["voxel_features"], b["voxel_coords"], b["voxel_mask"]

    _, coords0, mask0 = jax.block_until_ready(to_bb_input(variables, batch))
    s1, s2, s3 = (41, 1440, 1440), (21, 720, 720), (11, 360, 360)

    l1 = win_downsample_dense(coords0[0], mask0[0], s1, s2, 65536)
    l2 = win_downsample_dense(l1[1], l1[2], s2, s3, 32768)
    rng = np.random.RandomState(0)

    for name, (ids, coords, valid), shape, c, combos in [
        ("L1", l1, s2, 32, [(1024, 3584, 1536), (1024, 3584, 1280),
                            (1024, 3072, 1792), (1024, 4096, 1408)]),
        ("L2", l2, s3, 64, [(1024, 3584, 1536), (1024, 3584, 1280),
                            (1024, 3072, 1792), (512, 3584, 1536)]),
    ]:
        ids = np.asarray(ids)
        nact = int(np.asarray(valid).sum())
        print(f"{name}: active={nact} of {ids.shape[0]}", flush=True)
        deltas = jnp.asarray(yxz_offset_deltas((3, 3, 3), shape))
        sent = yxz_sentinel_start(shape)
        w = jnp.asarray(rng.randn(27, c, c).astype(np.float32) * 0.05)
        for block, window, tap in combos:
            v = ids.shape[0]
            pad = (-v) % block
            ids_p = np.concatenate(
                [ids, ids[-1] + 1 + np.arange(pad, dtype=np.int32)])
            ids_j = jnp.asarray(ids_p)
            feats = jnp.asarray(
                rng.randn(ids_p.shape[0], c).astype(np.float32) * 0.1)

            @jax.jit
            def f(s, ids_j=ids_j, feats=feats, w=w, deltas=deltas,
                  sent=sent, block=block, window=window, tap=tap):
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
                print(f"  {name} block {block:5d} win {window:5d} tap "
                      f"{tap:5d} : {t:7.2f} ms  ovf={int(ovf)}", flush=True)
            except Exception as e:
                print(f"  {name} block {block:5d} win {window:5d} tap "
                      f"{tap:5d} : FAILED {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()

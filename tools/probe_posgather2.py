"""Dev harness for ops/pallas_posgather: interpret-mode parity vs the XLA
windowed_conv reference on a small scene, then real-chip timing at L0
scale with ids from the bench scene.

Usage: python tools/probe_posgather2.py [--mode cpu|tpu]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def small_scene(v_cap=2048, shape=(9, 40, 40), density=0.15, seed=0):
    import numpy as np

    from findnpropagate_tpu.ops.sparse_ops import (
        yxz_linear_ids, yxz_sentinel_start)
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    nz, ny, nx = shape
    n = int(nz * ny * nx * density)
    lin = rng.choice(nz * ny * nx, min(n, v_cap), replace=False)
    z = lin % nz
    y = (lin // nz) % ny
    x = lin // (nz * ny)
    coords = np.stack([z, y, x], 1).astype(np.int32)
    v = coords.shape[0]
    coords_p = np.full((v_cap, 3), -1, np.int32)
    coords_p[:v] = coords
    valid = np.zeros(v_cap, bool)
    valid[:v] = True
    ids = yxz_linear_ids(jnp.asarray(coords_p), jnp.asarray(valid), shape)
    order = jnp.argsort(ids)
    ids = ids[order]
    valid_j = jnp.asarray(valid)[order]
    feats = rng.randn(v_cap, 5).astype(np.float32) * 0.3
    feats = jnp.asarray(feats) * valid_j[:, None]
    return ids, valid_j, feats, shape


def cpu_parity():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from findnpropagate_tpu.ops.pallas_posgather import (
        compute_positions, posgather_conv)
    from findnpropagate_tpu.ops.sparse_ops import (
        windowed_conv, yxz_offset_deltas, yxz_sentinel_start)

    rng = np.random.RandomState(1)
    for seed, density in [(0, 0.15), (1, 0.4), (2, 0.02)]:
        ids, valid, feats, shape = small_scene(seed=seed, density=density)
        deltas = np.asarray(yxz_offset_deltas((3, 3, 3), shape))
        sent = yxz_sentinel_start(shape)
        cin, cout = 5, 7
        w = rng.randn(27, cin, cout).astype(np.float32) * 0.2
        feats = feats[:, :cin]

        ref, ovf_ref = windowed_conv(
            ids, feats, ids, jnp.asarray(w), jnp.asarray(deltas),
            block=512, window=1024,
            precision=jax.lax.Precision.HIGHEST, sentinel_start=sent)

        lp = compute_positions(ids, ids, deltas, block=512, window=1024,
                               band=3, sentinel_start=sent, interpret=True)
        out = posgather_conv(ids, feats, ids, jnp.asarray(w), lp,
                             sentinel_start=sent, interpret=True)
        out = jnp.where(valid[:, None], out, 0.0)
        ref = jnp.where(valid[:, None], ref, 0.0)
        err = float(jnp.max(jnp.abs(out - ref)))
        scale = float(jnp.max(jnp.abs(ref))) + 1e-9
        print(f"seed {seed} density {density}: ovf={int(lp.overflow)} "
              f"(ref {int(ovf_ref)}) rel_err={err / scale:.2e}",
              flush=True)
        assert int(lp.overflow) == 0, "band/window overflow on small scene"
        assert err / scale < 2e-2, (err, scale)  # bf16 weight matmul
    print("CPU parity OK", flush=True)


def tpu_bench():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_transfusion_bench
    from findnpropagate_tpu.ops.pallas_posgather import (
        compute_positions, posgather_conv)
    from findnpropagate_tpu.ops.pallas_sparse import windowed_conv_pallas
    from findnpropagate_tpu.ops.sparse_ops import (
        yxz_linear_ids, yxz_offset_deltas, yxz_sentinel_start)

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

    det, variables, batch = build_transfusion_bench(1)
    batch = jax.device_put(batch)

    @jax.jit
    def to_bb(variables, batch):
        b = det.apply(variables, dict(batch), train=False, upto=1)
        return b["voxel_coords"], b["voxel_mask"]

    coords0, mask0 = jax.block_until_ready(to_bb(variables, batch))
    s1 = (41, 1440, 1440)
    ids = yxz_linear_ids(coords0[0], mask0[0], s1)
    ids = jnp.sort(ids)
    deltas = np.asarray(yxz_offset_deltas((3, 3, 3), s1))
    sent = yxz_sentinel_start(s1)
    rng = np.random.RandomState(0)
    c = 16
    w = jnp.asarray(rng.randn(27, c, c).astype(np.float32) * 0.05)
    v = ids.shape[0]
    block = 1024
    pad = (-v) % block
    if pad:
        ids = jnp.concatenate([ids, ids[-1] + 2 + jnp.arange(pad)])
    feats = jnp.asarray(rng.randn(ids.shape[0], c).astype(np.float32) * 0.1)

    window = 2048

    # positions prelude timing
    @jax.jit
    def pos_fn(s, ids):
        ii = ids + (s.astype(jnp.int32) % 2)
        lp = compute_positions(ii, ii, deltas, block=block, window=window,
                               band=3, sentinel_start=sent)
        return (jnp.sum(lp.pos % 97) + lp.overflow).astype(jnp.float32) \
            % 100.0

    t_pos = chain(pos_fn, ids)
    lp = compute_positions(ids, ids, deltas, block=block, window=window,
                           band=3, sentinel_start=sent)
    print(f"positions prelude: {t_pos:7.2f} ms  ovf={int(lp.overflow)}",
          flush=True)

    # conv timing (positions fixed)
    @jax.jit
    def conv_fn(s, ids, feats):
        ff = feats * (1.0 + s * 1e-6)
        lp2 = compute_positions(ids, ids, deltas, block=block,
                                window=window, band=3, sentinel_start=sent)
        out = posgather_conv(ids, ff, ids, w, lp2, sentinel_start=sent)
        return jnp.sum(jnp.abs(out).astype(jnp.float32)) % 100.0

    t_both = chain(conv_fn, ids, feats)
    print(f"positions + 1 conv: {t_both:7.2f} ms", flush=True)

    @jax.jit
    def conv5_fn(s, ids, feats):
        ff = feats * (1.0 + s * 1e-6)
        lp2 = compute_positions(ids, ids, deltas, block=block,
                                window=window, band=3, sentinel_start=sent)
        acc = jnp.float32(0.0)
        x = ff
        for i in range(5):
            x = posgather_conv(ids, x, ids, w, lp2, sentinel_start=sent)
            acc = acc + jnp.sum(jnp.abs(x).astype(jnp.float32)) % 10.0
        return acc % 100.0

    t5 = chain(conv5_fn, ids, feats)
    print(f"positions + 5 convs: {t5:7.2f} ms "
          f"(per conv {(t5 - t_pos) / 5:5.2f})", flush=True)

    # numeric check vs the one-hot pallas kernel on the real scene
    out_ref, ovf = windowed_conv_pallas(
        ids, feats, ids, w, jnp.asarray(deltas), block=block, window=window,
        sentinel_start=sent, compute_dtype=jnp.bfloat16, tap_window=1536)
    out_new = posgather_conv(ids, feats, ids, w, lp, sentinel_start=sent)
    err = float(jnp.max(jnp.abs(out_new - out_ref)))
    scale = float(jnp.max(jnp.abs(out_ref))) + 1e-9
    print(f"vs one-hot pallas: rel_err={err / scale:.2e} "
          f"(ovf ref {int(ovf)}, new {int(lp.overflow)})", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="cpu", choices=["cpu", "tpu"])
    args = ap.parse_args()
    if args.mode == "cpu":
        import os

        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        cpu_parity()
    else:
        tpu_bench()

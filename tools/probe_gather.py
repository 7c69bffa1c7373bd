"""Probe: does Mosaic support dynamic gather along lanes inside a Pallas
TPU kernel, and how fast is it at sparse-conv shapes?

If a (C, S) window can be gathered to (C, W) by a traced per-lane index
vector at VPU speed, the windowed sparse conv's one-hot compare+matmul
alignment (the ~300x useful-FLOP waste at L0, PERF.md) collapses to:
precomputed searchsorted positions (XLA, once per LEVEL, shared by all
5 L0 convs) + in-kernel lane gathers + ONE final weight matmul.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import functools

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


def probe_variant(name, kernel_body, c=16, s_win=2048, w=1024, taps=27,
                  dtype=jnp.bfloat16):
    """kernel_body(x_ref, idx_ref, o_ref, taps) -> writes (taps*C, W)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(c, s_win).astype(np.float32)).astype(dtype)
    idx = jnp.asarray(rng.randint(0, s_win, (taps, w)).astype(np.int32))

    def call(x, idx):
        return pl.pallas_call(
            functools.partial(kernel_body, taps=taps),
            out_shape=jax.ShapeDtypeStruct((taps * c, w), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)

    try:
        @jax.jit
        def f(seed, x, idx):
            xx = x * (1.0 + seed.astype(dtype) * jnp.asarray(1e-3, dtype))
            o = call(xx, idx)
            return jnp.sum(jnp.abs(o).astype(jnp.float32)) % 100.0

        t = chain(f, x, idx)
        # correctness
        o = call(x, idx)
        want = jnp.concatenate([x[:, idx[k]] for k in range(taps)], axis=0)
        ok = bool(jnp.allclose(o.astype(jnp.float32),
                               want.astype(jnp.float32)))
        print(f"{name:28s}: {t:8.3f} ms  correct={ok}", flush=True)
        return t
    except Exception as e:
        print(f"{name:28s}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None


def main():
    c, s_win, w, taps = 16, 2048, 1024, 27

    # variant 1: jnp.take along lanes, one tap at a time
    def body_take(x_ref, idx_ref, o_ref, taps):
        x = x_ref[:]
        for k in range(taps):
            o_ref[k * 16:(k + 1) * 16, :] = jnp.take(
                x, idx_ref[k, :], axis=1)

    probe_variant("take.axis1 x27", body_take)

    # variant 2: take_along_axis with broadcast idx
    def body_taa(x_ref, idx_ref, o_ref, taps):
        x = x_ref[:]
        for k in range(taps):
            idx = idx_ref[k, :]
            o_ref[k * 16:(k + 1) * 16, :] = jnp.take_along_axis(
                x, jnp.broadcast_to(idx[None, :], (x.shape[0], idx.shape[0])),
                axis=1)

    probe_variant("take_along_axis x27", body_taa)

    # variant 3: one fused take with flattened idx (27*W lanes at once)
    def body_take_flat(x_ref, idx_ref, o_ref, taps):
        x = x_ref[:]
        g = jnp.take(x, idx_ref[:].reshape(-1), axis=1)  # (C, taps*W)
        for k in range(taps):
            o_ref[k * 16:(k + 1) * 16, :] = g[:, k * 1024:(k + 1) * 1024]

    probe_variant("take.flat 27W", body_take_flat)

    # variant 4: gather along SUBLANES: x (S, C) rows
    def probe_sublane():
        rng = np.random.RandomState(0)
        x = jnp.asarray(
            rng.randn(s_win, c).astype(np.float32)).astype(jnp.bfloat16)
        idx = jnp.asarray(rng.randint(0, s_win, (taps, w)).astype(np.int32))

        def body(x_ref, idx_ref, o_ref):
            x = x_ref[:]
            for k in range(taps):
                o_ref[:, k * 16:(k + 1) * 16] = jnp.take(
                    x, idx_ref[k, :], axis=0)

        def call(x, idx):
            return pl.pallas_call(
                body,
                out_shape=jax.ShapeDtypeStruct((w, taps * c), jnp.bfloat16),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x, idx)

        try:
            @jax.jit
            def f(seed, x, idx):
                xx = x * (1.0 + seed.astype(jnp.bfloat16) * 1e-3)
                o = call(xx, idx)
                return jnp.sum(jnp.abs(o).astype(jnp.float32)) % 100.0

            t = chain(f, x, idx)
            o = call(x, idx)
            want = jnp.concatenate(
                [x[idx[k], :] for k in range(taps)], axis=1)
            ok = bool(jnp.allclose(o.astype(jnp.float32),
                                   want.astype(jnp.float32)))
            print(f"{'take.axis0(sublane) x27':28s}: {t:8.3f} ms  "
                  f"correct={ok}", flush=True)
        except Exception as e:
            print(f"{'take.axis0(sublane) x27':28s}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)

    probe_sublane()

    # reference: the one-hot compare+matmul gather at the same shapes
    def body_onehot(x_ref, ids_ref, want_ref, o_ref):
        x = x_ref[:]
        ids = ids_ref[0, :]
        for k in range(27):
            onehot = (ids[:, None] == want_ref[k, :][None, :]
                      ).astype(x.dtype)
            o_ref[k * 16:(k + 1) * 16, :] = jnp.dot(
                x, onehot, preferred_element_type=jnp.float32
            ).astype(x.dtype)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(c, s_win).astype(np.float32)
                    ).astype(jnp.bfloat16)
    ids = jnp.asarray(np.sort(rng.choice(10 * s_win, s_win, replace=False))
                      .astype(np.int32))[None, :]
    want = jnp.asarray(rng.randint(0, 10 * s_win, (taps, w)).astype(np.int32))

    def call(x, ids, want):
        return pl.pallas_call(
            body_onehot,
            out_shape=jax.ShapeDtypeStruct((taps * c, w), jnp.bfloat16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, ids, want)

    try:
        @jax.jit
        def f(seed, x, ids, want):
            xx = x * (1.0 + seed.astype(jnp.bfloat16) * 1e-3)
            o = call(xx, ids, want)
            return jnp.sum(jnp.abs(o).astype(jnp.float32)) % 100.0

        t = chain(f, x, ids, want)
        print(f"{'onehot compare+matmul x27':28s}: {t:8.3f} ms", flush=True)
    except Exception as e:
        print(f"{'onehot compare+matmul x27':28s}: FAILED "
              f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()

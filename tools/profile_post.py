"""Device-side 8-link chains: forward-only vs forward+post_process, to
attribute the gap between the stage profile (through dense_head) and the
latency bench."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def run(det, variables, batch, with_post, chain_len=4, iters=5):
    @jax.jit
    def chain(variables, batch, seed):
        s = seed
        for i in range(chain_len):
            b = dict(batch)
            b["points"] = b["points"] * (
                1.0 + (s % 1.0) * 1e-3 + jnp.float32(i) * 1e-5)
            out = det.apply(variables, b, train=False)
            if with_post:
                d = det.post_process(out)
                s = (jnp.nan_to_num(
                    jnp.sum(jnp.abs(d.boxes)) + jnp.sum(jnp.abs(d.scores)),
                    nan=0.11) + jnp.sum(d.count).astype(jnp.float32)) % 1.0
            else:
                leaves = [x for x in jax.tree.leaves(out)
                          if hasattr(x, "dtype")
                          and jnp.issubdtype(x.dtype, jnp.floating)]
                s = sum(jnp.sum(jnp.abs(l).astype(jnp.float32)) % 1000.0
                        for l in leaves) % 1.0
        return s

    s = chain(variables, batch, jnp.float32(0.271))
    float(s)
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        s = chain(variables, batch, s + jnp.float32(i) * 0.019)
        float(s)
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    return med / chain_len * 1000.0


def main():
    from bench import build_transfusion_bench

    det, variables, batch = build_transfusion_bench(1)
    batch = jax.device_put(batch)
    a = run(det, variables, batch, with_post=False)
    print(f"forward only      : {a:7.1f} ms/scan", flush=True)
    b = run(det, variables, batch, with_post=True)
    print(f"forward + post    : {b:7.1f} ms/scan", flush=True)


if __name__ == "__main__":
    main()

"""Chained per-stage profiling of the flagship inference path on the real
chip (axon relay memoizes; see PERF.md — all timings are data-dependent
chains). Prints ms per stage at full nuScenes scale.

Usage: python tools/profile_stages.py [--iters 8]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def chain_time(fn, *args, iters=8):
    """fn(*args, s) -> scalar; returns ms/call via chained execution."""
    import jax.numpy as jnp

    s = fn(*args, jnp.float32(0.0))
    float(s)  # compile+warm
    t0 = time.perf_counter()
    s = fn(*args, jnp.float32(1.0))
    float(s)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    s = jnp.float32(0.0)
    for _ in range(iters):
        s = fn(*args, s)
    float(s)
    tn = time.perf_counter() - t0
    return (tn - t1) / (iters - 1) * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--start", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_transfusion_bench

    det, variables, batch = build_transfusion_bench(args.batch)
    batch = jax.device_put(batch)

    # ---- stage-by-stage cumulative forward (module_order prefixes) -------
    cfg_keys = [("VFE", "vfe"), ("BACKBONE_3D", "backbone_3d"),
                ("MAP_TO_BEV", "map_to_bev"), ("BACKBONE_2D", "backbone_2d"),
                ("DENSE_HEAD", "dense_head")]
    names = ("voxelize",) + tuple(
        n for k, n in cfg_keys if k in det.model_cfg)

    def run_prefix(k):
        @jax.jit
        def f(variables, batch, s):
            b = dict(batch)
            # multiplicative + iteration-indexed perturbation (PERF.md truth
            # protocol) — the additive 1e-7 form can underflow f32 ulp and
            # turn later iterations into relay replays
            b["points"] = b["points"] * (1.0 + (s % 1.0) * 1e-3)
            b = det.apply(variables, b, train=False, upto=k)
            leaves = [x for x in jax.tree.leaves(b)
                      if hasattr(x, "dtype")
                      and jnp.issubdtype(x.dtype, jnp.floating)]
            # nan_to_num per leaf: the bench weights are random normals
            # whose activations overflow in bf16 — a nan chain scalar makes
            # every iteration's input IDENTICAL and the relay replays the
            # memoized execution (measured: a fake 66 ms "full forward"
            # vs the true 134 ms; PERF.md truth protocol, round 5)
            return sum(jnp.nan_to_num(
                jnp.sum(jnp.abs(l).astype(jnp.float32)) % 1000.0,
                nan=0.37 + 0.01 * i) for i, l in enumerate(leaves))
        return f

    prev = 0.0
    for k in range(args.start, len(names)):
        ms = chain_time(run_prefix(k), variables, batch, iters=args.iters)
        print(f"prefix {k:2d} +{names[k]:24s}: {ms:8.1f} ms  (+{ms-prev:7.1f})",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()

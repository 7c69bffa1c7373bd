"""Train-step decomposition at flagship scale (chained truth protocol).

Splits the 1.51-scans/s train step into: eval forward, loss forward
(targets/Hungarian included), backbone-only backward, full
value_and_grad, full train step (adam). Deltas attribute the cost.
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def chain(fn, iters=5):
    # chained-truth protocol (PERF.md / bench.py): warm up once, then time
    # `iters` chained calls and divide by exactly that count (ADVICE r4: a
    # separately-measured single call must not enter the divisor).
    s = fn(jnp.float32(0.0))
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for i in range(iters):
        s = fn(s + jnp.float32(i) * 0.01)
    jax.block_until_ready(s)
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--which", default="all")
    args = ap.parse_args()

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench as B

    det, variables, batch = B.build_transfusion_bench(args.batch,
                                                      training=True)
    batch = jax.device_put(batch)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    rng = jax.random.PRNGKey(7)

    def perturbed(b, s):
        b = dict(b)
        b["points"] = b["points"] * (1.0 + (s % 1.0) * 1e-3)
        return b

    names = [n for n in args.which.split(",")]

    def want(n):
        return args.which == "all" or n in names

    if want("eval_fwd"):
        @jax.jit
        def eval_fwd(s):
            out = det.apply(variables, perturbed(batch, s), train=False)
            d = det.post_process(out)
            return (jnp.nan_to_num(jnp.sum(jnp.abs(d.boxes)), nan=0.3)
                    ) % 1.0
        print(f"eval forward          : {chain(eval_fwd):8.1f} ms", flush=True)

    if want("loss_fwd"):
        @jax.jit
        def loss_fwd(s):
            loss, (tb, mut) = det.loss(
                {"params": params, "batch_stats": bstats},
                perturbed(batch, s), rng=rng)
            return jnp.nan_to_num(loss, nan=0.3) % 1.0
        print(f"loss forward          : {chain(loss_fwd):8.1f} ms", flush=True)

    if want("bb_grad"):
        # backward through the backbone only: surrogate loss on the BEV
        # features (module order: vfe, backbone_3d, map_to_bev ... )
        upto = list(det.module.module_order).index("backbone_2d")

        @jax.jit
        def bb_grad(s):
            def f(p):
                out = det.module.apply(
                    {"params": p, "batch_stats": bstats},
                    perturbed(batch, s), train=True, upto=upto,
                    rngs={"dropout": rng, "sampling": rng},
                    mutable=["batch_stats"])[0]
                return jnp.sum(jnp.abs(out["spatial_features"]
                                       .astype(jnp.float32)))
            g = jax.grad(f)(params)
            leaves = [jnp.sum(jnp.abs(l)) for l in jax.tree.leaves(g)]
            return (sum(leaves)).astype(jnp.float32) % 1.0
        print(f"backbone fwd+bwd      : {chain(bb_grad):8.1f} ms", flush=True)

    if want("bb_fwd"):
        upto = list(det.module.module_order).index("backbone_2d")

        @jax.jit
        def bb_fwd(s):
            out = det.module.apply(
                {"params": params, "batch_stats": bstats},
                perturbed(batch, s), train=True, upto=upto,
                rngs={"dropout": rng, "sampling": rng},
                mutable=["batch_stats"])[0]
            return jnp.sum(jnp.abs(out["spatial_features"]
                                   .astype(jnp.float32))) % 1.0
        print(f"backbone fwd (train)  : {chain(bb_fwd):8.1f} ms", flush=True)

    if want("full_vag"):
        @jax.jit
        def full_vag(s):
            def f(p):
                loss, (tb, mut) = det.loss(
                    {"params": p, "batch_stats": bstats},
                    perturbed(batch, s), rng=rng)
                return loss
            loss, g = jax.value_and_grad(f)(params)
            leaves = [jnp.sum(jnp.abs(l)) for l in jax.tree.leaves(g)]
            return (jnp.nan_to_num(loss, nan=0.2) + sum(leaves)) % 1.0
        print(f"full value_and_grad   : {chain(full_vag):8.1f} ms", flush=True)


if __name__ == "__main__":
    main()

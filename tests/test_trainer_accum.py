"""Gradient accumulation in make_train_step: a lax.scan over microbatches
must produce the same update as the flat batch (identical params, BN-free
toy model) and train to convergence. Device-free and quick — the full
TransFusion accum path is exercised by bench.py on the chip (the flat
batch-4 program is what crashes the relay compile helper; accumulation is
the production workaround, PERF.md round-3)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from findnpropagate_tpu.runtime.trainer import TrainState, make_train_step


class _ToyDetector:
    class Mod(nn.Module):
        @nn.compact
        def __call__(self, batch, train):
            return {"pred": nn.Dense(8)(batch["x"])}

    def __init__(self):
        self.mod = self.Mod()

    def init(self, key, batch):
        return self.mod.init(key, batch, True)

    def loss(self, variables, batch, rng=None):
        out, mut = self.mod.apply(
            variables, batch, True, mutable=["batch_stats"])
        per = jnp.mean((out["pred"] - batch["y"]) ** 2, axis=-1)
        l = jnp.mean(per)
        return l, ({"l2": l}, mut)


def _setup(b=8):
    det = _ToyDetector()
    rng = np.random.RandomState(0)
    batch = {"x": jnp.asarray(rng.randn(b, 16), jnp.float32),
             "y": jnp.asarray(rng.randn(b, 8), jnp.float32)}
    variables = det.init(jax.random.PRNGKey(0), batch)
    tx = optax.adam(1e-2)
    state = TrainState(jnp.zeros((), jnp.int32), variables["params"], {},
                       tx.init(variables["params"]))
    return det, tx, state, batch


def test_accum_matches_flat_batch_update():
    det, tx, state, batch = _setup()
    s1, m1 = make_train_step(det, tx, donate=False)(state, batch)
    for accum in (2, 4):
        s2, m2 = make_train_step(det, tx, donate=False,
                                 accum_steps=accum)(state, batch)
        # mean-of-microbatch-means == flat mean for equal microbatches
        np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(m2["grad_norm"]),
                                   float(m1["grad_norm"]), rtol=1e-4)
        for (p1, p2) in zip(jax.tree.leaves(s1.params),
                            jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                       rtol=1e-4, atol=1e-6)


def test_accum_trains_to_convergence():
    det, tx, state, batch = _setup()
    step = make_train_step(det, tx, donate=False, accum_steps=2)
    first = None
    for _ in range(30):
        state, m = step(state, batch)
        first = first if first is not None else float(m["loss"])
    assert int(state.step) == 30
    assert float(m["loss"]) < first * 0.3

"""Timed intra-epoch checkpointing (reference train_utils.py:249-257
`latest_model` saved every ckpt_save_time_interval seconds): a run killed
mid-epoch must resume from the timed save — same epoch, same iteration —
and finish with EXACTLY the params an uninterrupted run produces (the
per-step rng folds the step counter, so the replayed tail is bit-exact)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from findnpropagate_tpu.runtime.trainer import (
    TrainState,
    latest_intra_checkpoint,
    restore_checkpoint,
    save_intra_checkpoint,
    train_epochs,
)


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
        l = jnp.mean((out["pred"] - batch["y"]) ** 2)
        return l, ({"loss": l}, mut)


class _Loader:
    """Deterministic per-epoch batches; optionally raises after a global
    number of yielded batches (simulated preemption)."""

    def __init__(self, n=6, kill_after=None):
        self.n = n
        self.epoch = 0
        self.kill_after = kill_after
        self.yielded = 0

    def __len__(self):
        return self.n

    def set_epoch(self, e):
        self.epoch = e

    def __iter__(self):
        rng = np.random.RandomState(100 + self.epoch)
        for _ in range(self.n):
            if self.kill_after is not None and self.yielded >= self.kill_after:
                raise KeyboardInterrupt("preempted")
            self.yielded += 1
            yield {"x": jnp.asarray(rng.randn(4, 16), jnp.float32),
                   "y": jnp.asarray(rng.randn(4, 8), jnp.float32)}


def _fresh_state(det, tx):
    batch = {"x": jnp.zeros((4, 16), jnp.float32),
             "y": jnp.zeros((4, 8), jnp.float32)}
    variables = det.init(jax.random.PRNGKey(0), batch)
    return TrainState(jnp.zeros((), jnp.int32), variables["params"], {},
                      tx.init(variables["params"]))


def test_interrupt_and_resume_from_timed_save(tmp_path):
    det = _ToyDetector()
    tx = optax.adam(1e-2)

    # reference run: 2 epochs straight through
    ref_state, _ = train_epochs(
        det, _Loader(), _fresh_state(det, tx), tx, epochs=2,
        logger=None, ckpt_dir=None, log_interval=100)

    # interrupted run: timed save every step (interval 0), killed at
    # global batch 9 = mid-epoch 1
    ckpt_dir = tmp_path / "ckpt"
    state = _fresh_state(det, tx)
    with pytest.raises(KeyboardInterrupt):
        train_epochs(
            det, _Loader(kill_after=9), state, tx, epochs=2,
            logger=None, ckpt_dir=ckpt_dir, log_interval=100,
            ckpt_save_time_interval=0.0)

    intra = latest_intra_checkpoint(ckpt_dir)
    assert intra is not None
    path, epoch, it = intra
    assert epoch == 1 and 0 < it < 6  # genuinely mid-epoch
    resumed = restore_checkpoint(path, _fresh_state(det, tx))
    assert int(resumed.step) == epoch * 6 + it

    final, _ = train_epochs(
        det, _Loader(), resumed, tx, epochs=2, logger=None, ckpt_dir=None,
        log_interval=100, start_epoch=epoch, start_it=it)

    assert int(final.step) == int(ref_state.step) == 12
    for a, b in zip(jax.tree.leaves(final.params),
                    jax.tree.leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_intra_save_rotation_overwrites(tmp_path):
    det = _ToyDetector()
    tx = optax.adam(1e-2)
    s = _fresh_state(det, tx)
    save_intra_checkpoint(tmp_path, s, epoch=0, it=3)
    s2 = s._replace(step=jnp.asarray(7, jnp.int32))
    save_intra_checkpoint(tmp_path, s2, epoch=1, it=2)
    path, epoch, it = latest_intra_checkpoint(tmp_path)
    assert (epoch, it) == (1, 2)
    restored = restore_checkpoint(path, s)
    assert int(restored.step) == 7
    # exactly one latest_model slot on disk
    assert len(list(tmp_path.glob("latest_model*"))) == 2  # dir + meta

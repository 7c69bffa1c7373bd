"""Multi-device sharding tests — run in fresh subprocesses with an 8-device
CPU mesh (see conftest.py for why they can't share the main test process)."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent

SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, {repo!r} + '/tests')
import copy
import jax
import numpy as np
from test_pointpillar_e2e import DATA_CFG, MODEL_CFG, CLASS_NAMES
from findnpropagate_tpu.config import EDict
from findnpropagate_tpu.datasets import build_dataloader
from findnpropagate_tpu.models import build_network
from findnpropagate_tpu.parallel.mesh import make_mesh, shard_batch
from findnpropagate_tpu.runtime.optimization import build_optimizer
from findnpropagate_tpu.runtime.trainer import create_train_state, make_train_step

assert len(jax.devices()) == 8, jax.devices()
mesh = make_mesh()
ds, loader, _ = build_dataloader(copy.deepcopy(DATA_CFG), CLASS_NAMES,
                                 batch_size=8, training=True)
det = build_network(copy.deepcopy(MODEL_CFG), num_class=2, dataset=ds)
batch = next(iter(loader))
batch.pop('frame_id'); batch.pop('batch_size')
tx, _ = build_optimizer(EDict({{"OPTIMIZER": "adam", "LR": 0.003,
                               "WEIGHT_DECAY": 0.0, "GRAD_NORM_CLIP": 10.0}}), 10)
state = create_train_state(det, batch, tx, jax.random.PRNGKey(0))
batch = shard_batch(mesh, batch)
step = make_train_step(det, tx, mesh=mesh, donate=False)
state, metrics = step(state, batch)
loss = float(metrics['loss'])
assert np.isfinite(loss), loss
# gradient must be averaged across shards: params stay replicated
leaf = jax.tree.leaves(state.params)[0]
assert leaf.sharding.is_fully_replicated, leaf.sharding
print('SHARDED_OK', loss)
"""


def fresh_cpu_env(num_devices: int = 8):
    """Subprocess env: CPU-only JAX with N virtual devices, axon TPU plugin
    disabled (its sitecustomize pins the platform at interpreter start)."""
    env = dict(os.environ)
    for k in list(env):
        if k.startswith("PALLAS_AXON") or k.startswith("AXON_"):
            env.pop(k)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={num_devices}"
    return env


def test_sharded_train_step_8dev():
    script = SCRIPT.format(repo=str(REPO))
    res = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=1200, env=fresh_cpu_env(8),
    )
    assert res.returncode == 0, res.stdout + "\n" + res.stderr
    assert "SHARDED_OK" in res.stdout

"""Multi-host smoke: two real OS processes bootstrap jax.distributed over a
local coordinator, build one global data mesh across both, assemble a global
batch from per-process local shards (make_global_batch) and run a jitted
sharded value_and_grad step — the exact mechanism tools/train.py --dist uses
(ref: common_utils.init_dist_pytorch + DDP, common_utils.py:162-204)."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import os, sys
sys.path.insert(0, {repo!r})
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from findnpropagate_tpu.parallel.mesh import (
    init_distributed, make_global_batch, make_mesh,
)

rank = int(sys.argv[1])
idx, cnt = init_distributed(
    coordinator_address="localhost:{port}", num_processes=2, process_id=rank)
assert cnt == 2 and idx == rank, (idx, cnt)
assert len(jax.devices()) == 4, jax.devices()   # 2 procs x 2 virtual chips

mesh = make_mesh()   # global 4-device data mesh
# per-process local shard of the global batch (global batch = 4 rows)
local = {{
    "x": np.arange(8, dtype=np.float32).reshape(2, 4) + 100 * rank,
    "y": np.full((2,), float(rank), np.float32),
}}
gb = make_global_batch(mesh, local)
assert gb["x"].shape == (4, 4), gb["x"].shape

w = jnp.ones((4,), jnp.float32)

@jax.jit
def step(w, batch):
    def loss_fn(w):
        pred = batch["x"] @ w
        return jnp.mean((pred - batch["y"]) ** 2)
    return jax.value_and_grad(loss_fn)(w)

loss, grad = step(w, gb)
# the loss/grad reduce over the GLOBAL batch -> identical on every process
print("RESULT", rank, float(loss), float(jnp.sum(grad)))
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_global_mesh(tmp_path):
    port = _free_port()
    script = WORKER.format(repo=str(REPO), port=port)
    env = dict(os.environ)
    for k in list(env):
        if k.startswith(("PALLAS_AXON", "AXON_")):
            env.pop(k)
    procs = [
        subprocess.Popen([sys.executable, "-c", script, str(r)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, env=env)
        for r in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"rc={p.returncode}\n{out}\n{err}"
        outs.append(out)
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, rank, loss, gsum = line.split()
                results[int(rank)] = (float(loss), float(gsum))
    assert set(results) == {0, 1}, results
    # both processes computed the SAME global loss/grad (the all-reduce
    # happened through the sharded program)
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6)

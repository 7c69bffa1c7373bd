"""Device mesh + sharding helpers.

The reference parallelizes with torch DDP over NCCL (SURVEY.md §2.11,
pcdet/utils/common_utils.py:162-204). TPU-native equivalent: a
`jax.sharding.Mesh` with a 'data' axis; the batch is sharded along it and
parameters are replicated — gradient all-reduce is inserted by XLA from the
shardings (no explicit collectives needed). A 'model' axis is reserved for
future tensor sharding of the BEV grid.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices=None, data_axis="data", model_axis="model",
              model_parallel=1):
    devices = jax.devices()
    n = num_devices or len(devices)
    devices = np.asarray(devices[:n])
    assert n % model_parallel == 0
    grid = devices.reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (data_axis, model_axis))


def data_sharding(mesh, data_axis="data"):
    """Shard leading (batch) axis of every array leaf; replicate scalars."""

    def spec_for(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return NamedSharding(mesh, P(data_axis))
        return NamedSharding(mesh, P())

    return spec_for


def shard_batch(mesh, batch, data_axis="data"):
    """Place a host batch dict onto the mesh, batch-axis sharded."""
    spec = data_sharding(mesh, data_axis)
    out = {}
    for k, v in batch.items():
        if isinstance(v, (int, float, str, list)):
            out[k] = v
        else:
            out[k] = jax.device_put(v, spec(v))
    return out


def replicated(mesh):
    return NamedSharding(mesh, P())

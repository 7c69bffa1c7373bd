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


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None, local_device_ids=None):
    """Multi-host bootstrap — the jax.distributed.initialize equivalent of
    the reference's init_dist_pytorch / init_dist_slurm
    (pcdet/utils/common_utils.py:162-204). Resolves, in order:

      * explicit arguments;
      * torch.distributed.launch-style env (MASTER_ADDR/MASTER_PORT,
        WORLD_SIZE, RANK);
      * SLURM env (SLURM_NTASKS, SLURM_PROCID, SLURM_NODELIST — the
        coordinator is the first node, port 29500 unless MASTER_PORT set);
      * nothing set -> single-process no-op.

    Returns (process_index, process_count). After this, jax.devices() spans
    every host's chips; the data mesh from make_mesh() is global and
    per-process input feeding goes through make_global_batch().
    """
    import os

    env = os.environ
    if coordinator_address is None:
        if "MASTER_ADDR" in env and "WORLD_SIZE" in env:
            coordinator_address = (
                f"{env['MASTER_ADDR']}:{env.get('MASTER_PORT', '29500')}")
            num_processes = int(env["WORLD_SIZE"])
            process_id = int(env.get("RANK", 0))
        elif "SLURM_NTASKS" in env and int(env["SLURM_NTASKS"]) > 1:
            # first node of the list; expand "prefix[a-b,...]" to "prefixa"
            nodelist = env.get("SLURM_NODELIST", "localhost")
            if "[" in nodelist:
                prefix, rest = nodelist.split("[", 1)
                first = rest.split("-")[0].split(",")[0].rstrip("]")
                node = prefix + first
            else:
                node = nodelist.split(",")[0]
            coordinator_address = f"{node}:{env.get('MASTER_PORT', '29500')}"
            num_processes = int(env["SLURM_NTASKS"])
            process_id = int(env["SLURM_PROCID"])
        else:
            return 0, 1
    if num_processes is None or num_processes <= 1:
        return 0, 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return jax.process_index(), jax.process_count()


def make_global_batch(mesh, batch, data_axis="data"):
    """Multi-host batch feeding: each process provides its LOCAL shard (the
    dataloader is already sharded by process via shard_id/num_shards) and
    the result is one global jax.Array sharded along the data axis —
    replacing the reference's DistributedSampler + DDP input split."""
    from jax.sharding import NamedSharding

    out = {}
    for k, v in batch.items():
        if isinstance(v, (int, float, str, list)):
            out[k] = v
        else:
            arr = np.asarray(v)
            sharding = NamedSharding(mesh, P(data_axis))
            out[k] = jax.make_array_from_process_local_data(sharding, arr)
    return out


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

"""Training runtime: train state, sharded train/eval steps, checkpointing.

TPU-native replacement for tools/train_utils/train_utils.py (/root/reference):
the DDP + AMP + per-iter scheduler epoch loop becomes a single jitted
train_step over a device mesh (XLA inserts the gradient all-reduce from the
shardings); AMP GradScaler is unnecessary (bf16 on TPU needs no loss
scaling); checkpoints go through orbax with {step, params, batch_stats,
opt_state} like the reference's {epoch, it, model_state, optimizer_state}.
"""

from __future__ import annotations

import functools
import time
from pathlib import Path
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
import orbax.checkpoint as ocp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel.mesh import shard_batch


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(detector, example_batch, tx, rng):
    variables = detector.init(rng, example_batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    return TrainState(jnp.zeros((), jnp.int32), params, batch_stats, opt_state)


def _mesh_constraints(mesh):
    """(constrain_repl, constrain_data): sharding-constraint fns pinning a
    pytree replicated / batch-axis sharded on the mesh's 'data' axis.
    Applied INSIDE jit so correctness does not rest on caller placement."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    def constrain_repl(tree):
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, repl), tree
        )

    def constrain_data(tree):
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, data if getattr(x, "ndim", 0) >= 1 else repl
            ),
            tree,
        )

    return constrain_repl, constrain_data


def make_train_step(detector, tx, mesh=None, donate=True, seed: int = 17,
                    accum_steps: int = 1):
    """Returns train_step(state, batch) -> (state, metrics), jitted and
    (optionally) sharded: params/opt_state pinned replicated, batch pinned
    batch-axis-sharded over the mesh's 'data' axis via sharding constraints
    (XLA inserts the gradient all-reduce). `seed` drives the per-step rng
    (folded with the step counter) — plumbed from cfg/CLI.

    accum_steps > 1: gradient accumulation — the batch's leading axis is
    split into `accum_steps` microbatches swept by ONE lax.scan (grads and
    scalar metrics averaged, batch_stats chained through), so the compiled
    program and peak activations stay at microbatch size while the
    optimizer sees the full effective batch. The batch size must divide
    evenly."""

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        loss, (tb, mut) = detector.loss(variables, batch, rng=rng)
        return loss, (tb, mut.get("batch_stats", batch_stats))

    if mesh is not None:
        constrain_repl, constrain_data = _mesh_constraints(mesh)

    def grads_and_metrics(params, batch_stats, batch, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if accum_steps <= 1:
            (loss, (tb, new_bs)), grads = grad_fn(
                params, batch_stats, batch, rng)
            return loss, tb, new_bs, grads

        def split(x):
            b = x.shape[0]
            assert b % accum_steps == 0, (b, accum_steps)
            return x.reshape((accum_steps, b // accum_steps) + x.shape[1:])

        micro = jax.tree.map(split, batch)

        def body(carry, mb_and_idx):
            bs, grads_acc, loss_acc, tb_acc = carry
            mb, idx = mb_and_idx
            (loss, (tb, new_bs)), grads = grad_fn(
                params, bs, mb, jax.random.fold_in(rng, idx))
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            loss_acc = loss_acc + loss
            tb_acc = jax.tree.map(jnp.add, tb_acc, tb) if tb_acc else tb
            return (new_bs, grads_acc, loss_acc, tb_acc), None

        zero_grads = jax.tree.map(jnp.zeros_like, params)
        mb0 = jax.tree.map(lambda x: x[0], micro)
        # one traced eval to get the tb structure without running twice:
        tb_shape = jax.eval_shape(
            lambda p, s, b: loss_fn(p, s, b, rng)[1][0],
            params, batch_stats, mb0)
        tb0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), tb_shape)
        (new_bs, grads, loss, tb), _ = jax.lax.scan(
            body, (batch_stats, zero_grads, jnp.zeros(()), tb0),
            (micro, jnp.arange(accum_steps)))
        inv = 1.0 / accum_steps
        grads = jax.tree.map(lambda g: g * inv, grads)
        tb = jax.tree.map(lambda t: t * inv, tb)
        return loss * inv, tb, new_bs, grads

    def train_step(state: TrainState, batch):
        if mesh is not None:
            state = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, P())
                ),
                state,
            )
            batch = constrain_data(batch)
        rng = jax.random.fold_in(jax.random.PRNGKey(seed), state.step)
        loss, tb, new_bs, grads = grads_and_metrics(
            state.params, state.batch_stats, batch, rng
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(tb)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(state.step + 1, new_params, new_bs, new_opt)
        if mesh is not None:
            new_state = constrain_repl(new_state)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(detector, mesh=None, with_overflow=False):
    if mesh is not None:
        _, constrain_data = _mesh_constraints(mesh)

    def eval_step(variables, batch):
        if mesh is not None:
            variables = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, P())
                ),
                variables,
            )
            batch = constrain_data(batch)
        out = detector.apply(variables, batch, train=False)
        dets = detector.post_process(out)
        if not with_overflow:
            return dets
        # surface the windowed-conv exactness counter so eval drivers can
        # assert it is zero (VERDICT r3 #8; bench.py runs the same audit)
        return dets, out.get("sparse_window_overflow", jnp.zeros((), jnp.int32))

    return jax.jit(eval_step)


# ---------------------------------------------------------------- checkpoints

def save_checkpoint(ckpt_dir, state: TrainState, step=None, max_keep: int = 5):
    ckpt_dir = Path(ckpt_dir).resolve()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    step = int(step if step is not None else state.step)
    path = ckpt_dir / f"checkpoint_{step}"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state._asdict()), force=True)
    ckptr.wait_until_finished()
    # rotation (reference train_utils.py:315-321)
    ckpts = sorted(
        ckpt_dir.glob("checkpoint_*"), key=lambda p: int(p.name.split("_")[-1])
    )
    for old in ckpts[:-max_keep]:
        import shutil

        shutil.rmtree(old, ignore_errors=True)
    return path


def latest_checkpoint(ckpt_dir):
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    ckpts = sorted(
        ckpt_dir.glob("checkpoint_*"), key=lambda p: int(p.name.split("_")[-1])
    )
    return ckpts[-1] if ckpts else None


def save_intra_checkpoint(ckpt_dir, state: TrainState, epoch: int, it: int):
    """Wall-clock-timed mid-epoch save (reference train_utils.py:249-257
    `latest_model` every ckpt_save_time_interval seconds): one rotating
    slot plus a json sidecar recording (epoch, it) so a preempted run can
    resume inside the epoch instead of losing hours of nuScenes work.
    Written to a fresh dir + atomic rename so a preemption mid-save can
    never corrupt the only resume point."""
    import json
    import shutil

    ckpt_dir = Path(ckpt_dir).resolve()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    tmp = ckpt_dir / "latest_model.tmp"
    final = ckpt_dir / "latest_model"
    meta_tmp = ckpt_dir / "latest_model.meta.json.tmp"
    meta = ckpt_dir / "latest_model.meta.json"
    shutil.rmtree(tmp, ignore_errors=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(tmp, jax.device_get(state._asdict()), force=True)
    ckptr.wait_until_finished()
    meta_tmp.write_text(
        json.dumps({"epoch": int(epoch), "it": int(it),
                    "step": int(state.step)}))
    shutil.rmtree(final, ignore_errors=True)
    tmp.rename(final)
    meta_tmp.rename(meta)  # meta last: stale meta only re-trains some iters
    return final


def latest_intra_checkpoint(ckpt_dir):
    """(path, epoch, it) of the timed mid-epoch save, or None. Prefer it
    over the per-epoch checkpoint when it is newer (larger global step)."""
    import json

    path = Path(ckpt_dir) / "latest_model"
    meta = Path(ckpt_dir) / "latest_model.meta.json"
    if not meta.exists() or not path.exists():
        return None
    m = json.loads(meta.read_text())
    return path, int(m["epoch"]), int(m["it"])


def restore_checkpoint(path, state: TrainState) -> TrainState:
    ckptr = ocp.StandardCheckpointer()
    target = jax.device_get(state._asdict())
    restored = ckptr.restore(Path(path).resolve(), target)
    return TrainState(**restored)


# ---------------------------------------------------------------- epoch loops

def train_epochs(detector, loader, state, tx, epochs, mesh=None, logger=None,
                 ckpt_dir=None, log_interval=10, ckpt_save_interval=1,
                 start_epoch=0, hooks=None, writer=None, schedule=None,
                 seed: int = 17, accum_steps: int = 1,
                 ckpt_save_time_interval=None, start_it: int = 0):
    """Simple epoch driver (reference train_model, train_utils.py:264-325).

    ckpt_save_time_interval (seconds): wall-clock-timed `latest_model`
    saves inside the epoch (train_utils.py:249-257) so preemption loses at
    most one interval; resume via latest_intra_checkpoint + start_it.
    start_it: skip the first iterations of start_epoch (mid-epoch resume —
    the loader re-runs its deterministic epoch order and already-trained
    batches are skipped without being loaded through the model)."""
    train_step = make_train_step(detector, tx, mesh=mesh, seed=seed,
                                 accum_steps=accum_steps)
    emit = logger.info if logger else print
    history = []
    global_it = start_epoch * len(loader) + start_it
    last_timed_save = time.time()
    for epoch in range(start_epoch, epochs):
        loader.set_epoch(epoch)
        if hooks:
            for h in hooks:
                h(epoch=epoch, loader=loader)
        t0 = time.time()
        # step-time telemetry (reference train_utils.py:139-142,184-236):
        # data time measured per-iter; true steps/sec from the blocking
        # sync at each log interval (train_step dispatch is async)
        data_time = 0.0
        t_iter = time.time()
        t_last_log = time.time()
        for it, batch in enumerate(loader):
            data_time += time.time() - t_iter
            if epoch == start_epoch and it < start_it:
                t_iter = time.time()
                continue
            if mesh is not None:
                if jax.process_count() > 1:
                    # multi-host: assemble one global array from each
                    # process's local shard (parallel/mesh.py)
                    from ..parallel.mesh import make_global_batch

                    batch = make_global_batch(mesh, batch)
                else:
                    batch = shard_batch(mesh, batch)
            batch.pop("frame_id", None)
            batch.pop("batch_size", None)
            state, metrics = train_step(state, batch)
            global_it += 1
            if (ckpt_save_time_interval is not None and ckpt_dir is not None
                    and time.time() - last_timed_save
                    > ckpt_save_time_interval):
                jax.block_until_ready(state.params)
                save_intra_checkpoint(ckpt_dir, state, epoch, it + 1)
                last_timed_save = time.time()
                emit(f"timed checkpoint saved at epoch {epoch} it {it + 1}")
            if it % log_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                # runtime exactness sanitizer (VERDICT r3 #8): nonzero means
                # the windowed sparse conv silently truncated neighbor spans
                # — the run computes WRONG activations until TAP_WINDOW /
                # WINDOWED_WINDOW / LEVEL_CAPACITIES are enlarged.
                if m.get("sparse_window_overflow", 0) > 0:
                    import warnings

                    warnings.warn(
                        "sparse_window_overflow="
                        f"{int(m['sparse_window_overflow'])} — windowed "
                        "sparse conv truncated neighbors; enlarge "
                        "TAP_WINDOW/WINDOWED_WINDOW (results are wrong)",
                        RuntimeWarning, stacklevel=1)
                history.append(m)
                dt_log = time.time() - t_last_log
                steps = max(1, log_interval if it else 1)
                m["data_time"] = data_time / steps
                m["step_time"] = dt_log / steps
                data_time = 0.0
                t_last_log = time.time()
                emit(
                    f"epoch {epoch} it {it}/{len(loader)} "
                    + " ".join(f"{k}={v:.4f}" for k, v in m.items())
                )
                if writer is not None:
                    for k, v in m.items():
                        writer.add_scalar(f"train/{k}", v, global_it)
                    if schedule is not None:
                        writer.add_scalar(
                            "meta_data/learning_rate",
                            float(schedule(global_it)), global_it,
                        )
                # device telemetry every 3 log intervals (the reference
                # shells out to gpustat, train_utils.py:233-236)
                if it % (3 * log_interval) == 0:
                    try:
                        ms = jax.local_devices()[0].memory_stats() or {}
                        used = ms.get("bytes_in_use", 0) / 2**30
                        lim = ms.get("bytes_limit", 0) / 2**30
                        emit(f"device mem {used:.2f}/{lim:.2f} GiB")
                    except Exception:
                        pass
            t_iter = time.time()
        emit(f"epoch {epoch} done in {time.time()-t0:.1f}s")
        if ckpt_dir is not None and (epoch + 1) % ckpt_save_interval == 0:
            save_checkpoint(ckpt_dir, state, step=epoch + 1)
    if writer is not None:
        writer.flush()
    return state, history

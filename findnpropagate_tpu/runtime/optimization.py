"""Optimizer / LR schedule construction via optax.

Mirrors the reference's tools/train_utils/optimization (fastai adam_onecycle
with OneCycle LR + momentum cycling, adam, sgd; /root/reference). optax's
built-in schedules replace the fastai scheduler machinery; gradient clipping
matches GRAD_NORM_CLIP (train_utils.py:174).
"""

from __future__ import annotations

import optax


def build_lr_schedule(opt_cfg, total_steps: int):
    lr = float(opt_cfg["LR"])
    name = opt_cfg.get("OPTIMIZER", "adam_onecycle")
    if name == "adam_onecycle":
        # fastai OneCycle: warmup to LR over PCT_START then cosine anneal.
        pct = float(opt_cfg.get("PCT_START", 0.4))
        div = float(opt_cfg.get("DIV_FACTOR", 10))
        return optax.cosine_onecycle_schedule(
            transition_steps=max(total_steps, 1),
            peak_value=lr,
            pct_start=pct,
            div_factor=div,
            final_div_factor=1e4 / div,
        )
    decay_steps = [int(s * total_steps) for s in opt_cfg.get("DECAY_STEP_LIST", [])]
    if decay_steps:
        rate = float(opt_cfg.get("LR_DECAY", 0.1))
        return optax.piecewise_constant_schedule(
            lr, {s: rate for s in decay_steps}
        )
    return optax.constant_schedule(lr)


def build_optimizer(opt_cfg, total_steps: int):
    name = opt_cfg.get("OPTIMIZER", "adam_onecycle")
    schedule = build_lr_schedule(opt_cfg, total_steps)
    wd = float(opt_cfg.get("WEIGHT_DECAY", 0.0))
    clip = float(opt_cfg.get("GRAD_NORM_CLIP", 10.0))

    if name in ("adam", "adam_onecycle"):
        base = optax.adamw(schedule, weight_decay=wd) if wd > 0 else optax.adam(schedule)
    elif name == "sgd":
        base = optax.sgd(
            schedule, momentum=float(opt_cfg.get("MOMENTUM", 0.9))
        )
    else:
        raise KeyError(f"unknown optimizer {name}")

    tx = optax.chain(optax.clip_by_global_norm(clip), base)
    return tx, schedule

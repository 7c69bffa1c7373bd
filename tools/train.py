"""Training CLI — mirrors the reference's tools/train.py surface
(/root/reference tools/train.py:65-276): cfg file + overrides, auto-resume,
epoch loop, checkpoints, post-train eval hook.
"""

from __future__ import annotations

import argparse
import datetime
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from findnpropagate_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file, log_config_to_file
from findnpropagate_tpu.datasets import build_dataloader
from findnpropagate_tpu.models import build_network
from findnpropagate_tpu.parallel.mesh import init_distributed, make_mesh
from findnpropagate_tpu.runtime.optimization import build_optimizer
from findnpropagate_tpu.runtime.trainer import (
    create_train_state,
    latest_checkpoint,
    restore_checkpoint,
    train_epochs,
)
from findnpropagate_tpu.utils.logging import create_logger


def parse_config():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--workers", type=int, default=0)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--dist", action="store_true",
                        help="multi-host: jax.distributed.initialize from "
                             "MASTER_ADDR/WORLD_SIZE/RANK or SLURM env "
                             "(tools/scripts/dist_train.sh)")
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()
    cfg_from_yaml_file(args.cfg_file, cfg)
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def main():
    args, _ = parse_config()
    np.random.seed(args.seed)
    proc_idx, proc_cnt = (0, 1)
    if args.dist:
        proc_idx, proc_cnt = init_distributed()

    batch_size = args.batch_size or cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU
    epochs = args.epochs or cfg.OPTIMIZATION.NUM_EPOCHS

    output_dir = Path("output") / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    ckpt_dir = output_dir / "ckpt"
    output_dir.mkdir(parents=True, exist_ok=True)
    logger = create_logger(
        output_dir / f"log_train_{datetime.datetime.now():%Y%m%d-%H%M%S}.txt"
    )
    logger.info(f"devices: {jax.devices()}")
    log_config_to_file(cfg, logger=logger)

    mesh = make_mesh()
    n_dev = mesh.devices.size
    global_batch = batch_size * n_dev if n_dev > 1 else batch_size
    # multi-host: each process loads and feeds its own 1/proc_cnt slice
    local_batch = global_batch // proc_cnt
    logger.info(f"mesh {mesh.shape}, global batch {global_batch}, "
                f"process {proc_idx}/{proc_cnt}")

    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=local_batch,
        training=True, seed=args.seed, logger=logger,
        shard_id=proc_idx, num_shards=proc_cnt,
    )
    detector = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=dataset)

    total_steps = len(loader) * epochs
    tx, schedule = build_optimizer(cfg.OPTIMIZATION, total_steps)

    example = next(iter(loader))
    example.pop("frame_id", None)
    example.pop("batch_size", None)
    rng = jax.random.PRNGKey(args.seed)
    state = create_train_state(detector, example, tx, rng)

    start_epoch = 0
    start_it = 0
    resume = args.ckpt or latest_checkpoint(ckpt_dir)
    # prefer the timed mid-epoch save when it is newer than the per-epoch
    # checkpoint (reference train_utils.py:249-257 latest_model)
    from findnpropagate_tpu.runtime.trainer import latest_intra_checkpoint

    intra = None if args.ckpt else latest_intra_checkpoint(ckpt_dir)
    if intra is not None:
        epoch_no = (int(Path(resume).name.split("_")[-1]) if resume else 0)
        if intra[1] >= epoch_no:
            resume, start_epoch, start_it = intra[0], intra[1], intra[2]
    if resume:
        logger.info(f"resuming from {resume}"
                    + (f" (epoch {start_epoch}, it {start_it})"
                       if start_it else ""))
        state = restore_checkpoint(resume, state)
        if not start_it:
            start_epoch = int(Path(resume).name.split("_")[-1])

    from findnpropagate_tpu.utils.metrics import (
        BatchingSummaryWriter,
        disable_augmentation_hook,
    )

    writer = BatchingSummaryWriter(output_dir / "tensorboard")
    hooks = []
    if "HOOK" in cfg and "DisableAugmentationHook" in cfg.HOOK:
        hooks.append(
            disable_augmentation_hook(
                cfg.HOOK.DisableAugmentationHook, loader, epochs, logger=logger
            )
        )

    state, history = train_epochs(
        detector, loader, state, tx, epochs, mesh=mesh, logger=logger,
        ckpt_dir=ckpt_dir, start_epoch=start_epoch, start_it=start_it,
        hooks=hooks, writer=writer, schedule=schedule, seed=args.seed,
        accum_steps=int(cfg.OPTIMIZATION.get("GRAD_ACCUM_STEPS", 1)),
        ckpt_save_time_interval=float(
            cfg.OPTIMIZATION.get("CKPT_SAVE_TIME_INTERVAL", 300.0)),
    )
    writer.close()
    logger.info("training done")


if __name__ == "__main__":
    main()

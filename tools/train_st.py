"""Self-training CLI — "Propagate".

Mirrors tools/train_st.py (/root/reference tools/train_st.py:117-316):
builds the ST-augmented train loader plus a second augmentation-stripped
"inference" loader for pseudo extraction, registers the pseudo augmentor
hooks, and runs train_model_st (warmup epochs, per-interval extraction,
unknown-down-weighted training).
"""

from __future__ import annotations

import argparse
import datetime
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from findnpropagate_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file
from findnpropagate_tpu.datasets import build_dataloader
from findnpropagate_tpu.models import build_network
from findnpropagate_tpu.openvocab.pseudo_labels import PseudoLoader, PseudoProcessor
from findnpropagate_tpu.openvocab.self_training import (
    register_pseudo_hooks,
    train_model_st,
)
from findnpropagate_tpu.parallel.mesh import make_mesh
from findnpropagate_tpu.runtime.optimization import build_optimizer
from findnpropagate_tpu.runtime.trainer import create_train_state
from findnpropagate_tpu.utils.logging import create_logger


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--pseudo_path", type=str, default=None)
    parser.add_argument("--st_path", type=str, default=None)
    parser.add_argument("--st_warmup", type=int, default=3)
    parser.add_argument("--st_interval", type=int, default=1)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--set", dest="set_cfgs", default=None,
                        nargs=argparse.REMAINDER)
    args = parser.parse_args()
    cfg_from_yaml_file(args.cfg_file, cfg)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs, cfg)

    np.random.seed(args.seed)
    output_dir = Path("output") / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    output_dir.mkdir(parents=True, exist_ok=True)
    logger = create_logger(
        output_dir / f"log_train_st_{datetime.datetime.now():%Y%m%d-%H%M%S}.txt"
    )

    known = list(cfg.get("KNOWN_CLASS_NAMES", cfg.CLASS_NAMES))
    all_names = list(cfg.get("FULL_CLASS_NAMES", cfg.CLASS_NAMES))
    st_path = args.st_path or str(output_dir / "st_labels")
    ploader = PseudoLoader(
        known, pseudo_path=args.pseudo_path, self_train_path=st_path,
        all_class_names=all_names,
    )
    register_pseudo_hooks(ploader)
    processor = PseudoProcessor(known, self_training_folder=st_path,
                                all_class_names=all_names)

    batch_size = args.batch_size or cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU
    epochs = args.epochs or cfg.OPTIMIZATION.NUM_EPOCHS

    dataset, train_loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=batch_size,
        training=True, seed=args.seed, logger=logger,
    )
    # inference loader: TRAIN split with augmentations stripped
    # (train_st.py:184-210)
    inf_dataset, inf_loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=batch_size,
        training=True, logger=logger,
    )
    inf_dataset.data_augmentor = None
    inf_dataset.training = False
    inf_dataset.data_processor.training = False
    # unwrap the prefetcher to reach the shuffling inner loader
    (inf_loader.loader if hasattr(inf_loader, "loader")
     else inf_loader).shuffle = False

    detector = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                             dataset=dataset)
    mesh = make_mesh()
    total_steps = len(train_loader) * epochs
    tx, _ = build_optimizer(cfg.OPTIMIZATION, total_steps)

    example = next(iter(train_loader))
    example.pop("frame_id", None)
    example.pop("batch_size", None)
    state = create_train_state(detector, example, tx, jax.random.PRNGKey(args.seed))

    state = train_model_st(
        detector, train_loader, inf_loader, state, tx, epochs, processor,
        mesh=mesh, logger=logger, ckpt_dir=output_dir / "ckpt",
        st_warmup=args.st_warmup, st_interval=args.st_interval,
        seed=args.seed,
        ckpt_save_time_interval=float(
            cfg.OPTIMIZATION.get("CKPT_SAVE_TIME_INTERVAL", 300.0)),
    )
    logger.info("self-training done")


if __name__ == "__main__":
    main()

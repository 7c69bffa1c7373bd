"""Evaluation CLI — mirrors the reference's tools/test.py surface
(/root/reference tools/test.py:58-137): single-checkpoint eval with recall
stats and dataset metric computation.
"""

from __future__ import annotations

import argparse
import datetime
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from findnpropagate_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file
from findnpropagate_tpu.datasets import build_dataloader
from findnpropagate_tpu.models import build_network
from findnpropagate_tpu.runtime.optimization import build_optimizer
from findnpropagate_tpu.runtime.trainer import (
    create_train_state,
    latest_checkpoint,
    make_eval_step,
    restore_checkpoint,
)
from findnpropagate_tpu.utils.logging import create_logger


def parse_config():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--infer_time", action="store_true")
    parser.add_argument("--max_batches", type=int, default=None)
    parser.add_argument("--watch", action="store_true",
                        help="repeat_eval_ckpt: poll the ckpt dir and "
                             "evaluate every new checkpoint")
    parser.add_argument("--max_waiting_mins", type=float, default=30.0)
    parser.add_argument("--wait_interval", type=float, default=30.0)
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()
    cfg_from_yaml_file(args.cfg_file, cfg)
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def eval_ckpt(detector, loader, dataset, variables, logger, class_names,
              infer_time=False, max_batches=None, known_classes=None):
    from findnpropagate_tpu.models.post_processing import recall_record

    eval_step = make_eval_step(detector, with_overflow=True)
    known_labels = tuple(
        class_names.index(n) + 1 for n in (known_classes or ())
        if n in class_names
    ) or None
    det_annos = []
    times = []
    recall_acc = {}
    for bi, batch in enumerate(loader):
        if max_batches is not None and bi >= max_batches:
            break
        frame_ids = batch.pop("frame_id", None)
        batch.pop("batch_size", None)
        t0 = time.time()
        dets, win_ovf = eval_step(variables, batch)
        if int(win_ovf) > 0:
            logger.warning(
                "sparse_window_overflow=%d — windowed sparse conv truncated "
                "neighbors; enlarge TAP_WINDOW/WINDOWED_WINDOW (metrics are "
                "computed on WRONG activations)", int(win_ovf))
        jax.block_until_ready(dets.boxes)
        times.append(time.time() - t0)
        boxes = np.asarray(dets.boxes)
        scores = np.asarray(dets.scores)
        labels = np.asarray(dets.labels)
        counts = np.asarray(dets.count)
        if "gt_boxes" in batch:
            # live recall telemetry with known/unknown buckets
            # (detector3d_template.py:314-399)
            for i in range(boxes.shape[0]):
                slot = np.arange(boxes.shape[1]) < counts[i]
                rec = recall_record(
                    dets.boxes[i], jax.numpy.asarray(slot),
                    batch["gt_boxes"][i], known_labels=known_labels,
                )
                for k, v in rec.items():
                    recall_acc[k] = recall_acc.get(k, 0) + int(v)
        for i in range(boxes.shape[0]):
            n = int(counts[i])
            det_annos.append(
                {"boxes": boxes[i, :n], "scores": scores[i, :n],
                 "labels": labels[i, :n],
                 "frame_id": frame_ids[i] if frame_ids else None}
            )
    if infer_time and len(times) > 1:
        bsz = boxes.shape[0]
        sec_per_scan = float(np.mean(times[1:])) / bsz
        logger.info(f"sec_per_example: {sec_per_scan:.4f} "
                    f"({1.0/sec_per_scan:.2f} scans/sec)")
    result_str, result_dict = dataset.evaluation(
        det_annos, class_names, known_classes=known_classes
    )
    if recall_acc:
        gt = max(recall_acc.get("gt", 0), 1)
        nk = max(recall_acc.get("num_known", 0), 1)
        nu = max(recall_acc.get("num_unknown", 0), 1)
        for k, v in sorted(recall_acc.items()):
            if k.startswith("recall_known"):
                result_dict[k] = v / nk
            elif k.startswith("recall_unknown"):
                result_dict[k] = v / nu
            elif k.startswith("recall"):
                result_dict[k] = v / gt
        logger.info("recall telemetry: " + " ".join(
            f"{k}={v}" for k, v in sorted(recall_acc.items())))
    logger.info("\n" + result_str)
    return det_annos, result_dict


def repeat_eval_ckpt(detector, loader, dataset, state, logger, class_names,
                     ckpt_dir, eval_dir, known_classes=None,
                     max_batches=None, max_waiting_mins=30.0,
                     wait_interval=30.0):
    """Watch-folder eval loop (reference tools/test.py:90-137
    repeat_eval_ckpt + get_no_evaluated_ckpt): evaluates every new
    checkpoint_<step> under ckpt_dir, records evaluated steps in
    eval_list.txt, gives up after max_waiting_mins without new ones."""
    record = Path(eval_dir) / "eval_list.txt"
    evaluated = set()
    if record.exists():
        evaluated = {l.strip() for l in record.read_text().splitlines()
                     if l.strip()}
    waited = 0.0
    results = {}
    while True:
        ckpts = sorted(
            Path(ckpt_dir).glob("checkpoint_*"),
            key=lambda p: int(p.name.split("_")[-1]),
        )
        todo = [p for p in ckpts if p.name not in evaluated]
        if not todo:
            if waited >= max_waiting_mins * 60:
                logger.info("repeat_eval: max wait reached, exiting")
                return results
            time.sleep(wait_interval)
            waited += wait_interval
            continue
        waited = 0.0
        for p in todo:
            try:
                st = restore_checkpoint(p, state)
            except Exception as e:  # partial/corrupt ckpt: retry later
                logger.warning(f"repeat_eval: cannot load {p}: {e}")
                continue
            variables = {"params": st.params, "batch_stats": st.batch_stats}
            logger.info(f"repeat_eval: evaluating {p.name}")
            _, result = eval_ckpt(
                detector, loader, dataset, variables, logger, class_names,
                max_batches=max_batches, known_classes=known_classes,
            )
            results[p.name] = result
            evaluated.add(p.name)
            with open(record, "a") as f:
                f.write(p.name + "\n")
            with open(Path(eval_dir) / f"result_{p.name}.json", "w") as f:
                json.dump(result, f, indent=2)


def main():
    args, _ = parse_config()
    output_dir = Path("output") / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    eval_dir = output_dir / "eval"
    eval_dir.mkdir(parents=True, exist_ok=True)
    logger = create_logger(
        eval_dir / f"log_eval_{datetime.datetime.now():%Y%m%d-%H%M%S}.txt"
    )

    batch_size = args.batch_size or cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=batch_size,
        training=False, logger=logger,
    )
    detector = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=dataset)

    example = next(iter(loader))
    example.pop("frame_id", None)
    example.pop("batch_size", None)
    tx, _ = build_optimizer(cfg.OPTIMIZATION, 1)
    state = create_train_state(detector, example, tx, jax.random.PRNGKey(0))
    ckpt = args.ckpt or latest_checkpoint(output_dir / "ckpt")
    if ckpt:
        logger.info(f"loading {ckpt}")
        state = restore_checkpoint(ckpt, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    known = cfg.get("KNOWN_CLASS_NAMES")
    if args.watch:
        repeat_eval_ckpt(
            detector, loader, dataset, state, logger, cfg.CLASS_NAMES,
            ckpt_dir=output_dir / "ckpt", eval_dir=eval_dir,
            known_classes=known, max_batches=args.max_batches,
            max_waiting_mins=args.max_waiting_mins,
            wait_interval=args.wait_interval,
        )
        return
    _, result = eval_ckpt(
        detector, loader, dataset, variables, logger, cfg.CLASS_NAMES,
        infer_time=args.infer_time, max_batches=args.max_batches,
        known_classes=known,
    )
    with open(eval_dir / "result.json", "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()

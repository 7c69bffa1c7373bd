"""Demo CLI — folder-of-bin-files inference + matplotlib visualization.

Mirrors tools/demo.py + tools/demo_pyplot.py (/root/reference
tools/demo.py:24-120): loads raw point-cloud .bin/.npy files, runs the
configured detector, and renders either BEV plots (--mode bev) or true-3D
scenes with box wireframes (--mode 3d, tools/visual_utils/
pyplot_vis_utils.py — matplotlib mplot3d; this environment has no
open3d/mayavi).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from findnpropagate_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file
from findnpropagate_tpu.datasets import DATASET_REGISTRY
from findnpropagate_tpu.datasets.dataset import DatasetTemplate
from findnpropagate_tpu.models import build_network
from findnpropagate_tpu.runtime.trainer import (
    create_train_state,
    make_eval_step,
    restore_checkpoint,
)
from findnpropagate_tpu.runtime.optimization import build_optimizer
from findnpropagate_tpu.utils.geometry_np import boxes_to_corners_bev
from findnpropagate_tpu.utils.logging import create_logger


class DemoDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, data_path, ext=".bin"):
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=False)
        self.files = sorted(Path(data_path).glob(f"*{ext}"))
        self.ext = ext

    def __len__(self):
        return len(self.files)

    def __getitem__(self, index):
        f = self.files[index]
        if self.ext == ".bin":
            points = np.fromfile(str(f), np.float32).reshape(-1, 5)[:, :4]
        else:
            points = np.load(str(f))
        return self.prepare_data({"points": points, "frame_id": f.stem})


def draw_bev(points, dets, out_path, pcr):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 10))
    ax.scatter(points[:, 0], points[:, 1], s=0.2, c="gray", alpha=0.5)
    boxes, scores, labels, count = dets
    for i in range(int(count)):
        corners = boxes_to_corners_bev(boxes[i : i + 1, :7])[0]
        loop = np.concatenate([corners, corners[:1]], axis=0)
        ax.plot(loop[:, 0], loop[:, 1], "r-", lw=1)
        ax.text(boxes[i, 0], boxes[i, 1], f"{int(labels[i])}:{scores[i]:.2f}",
                fontsize=6, color="blue")
    ax.set_xlim(pcr[0], pcr[3])
    ax.set_ylim(pcr[1], pcr[4])
    ax.set_aspect("equal")
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", required=True)
    parser.add_argument("--data_path", required=True)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--ext", default=".bin")
    parser.add_argument("--out_dir", default="demo_out")
    parser.add_argument("--mode", default="bev", choices=["bev", "3d"],
                        help="bev: top-down plot; 3d: mplot3d scene with "
                             "box wireframes")
    parser.add_argument("--set", dest="set_cfgs", default=None,
                        nargs=argparse.REMAINDER)
    args = parser.parse_args()
    cfg_from_yaml_file(args.cfg_file, cfg)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs, cfg)

    logger = create_logger()
    dataset = DemoDataset(cfg.DATA_CONFIG, cfg.CLASS_NAMES, args.data_path,
                          ext=args.ext)
    logger.info(f"found {len(dataset)} files")
    detector = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                             dataset=dataset)
    batch = dataset.collate_batch([dataset[0]])
    batch.pop("frame_id")
    batch.pop("batch_size")
    tx, _ = build_optimizer(cfg.OPTIMIZATION, 1)
    state = create_train_state(detector, batch, tx, jax.random.PRNGKey(0))
    if args.ckpt:
        state = restore_checkpoint(args.ckpt, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    eval_step = make_eval_step(detector)

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for i in range(len(dataset)):
        sample = dataset[i]
        b = dataset.collate_batch([sample])
        fid = b.pop("frame_id")[0]
        b.pop("batch_size")
        dets = eval_step(variables, b)
        count = int(np.asarray(dets.count[0]))
        if args.mode == "3d":
            from visual_utils.pyplot_vis_utils import save_scene

            save_scene(
                out_dir / f"{fid}.png", sample["points"],
                ref_boxes=np.asarray(dets.boxes[0])[:count],
                ref_scores=np.asarray(dets.scores[0])[:count],
                ref_labels=np.asarray(dets.labels[0])[:count].astype(int),
                bv_range=(cfg.DATA_CONFIG.POINT_CLOUD_RANGE[0],
                          cfg.DATA_CONFIG.POINT_CLOUD_RANGE[1],
                          cfg.DATA_CONFIG.POINT_CLOUD_RANGE[3],
                          cfg.DATA_CONFIG.POINT_CLOUD_RANGE[4]),
            )
        else:
            draw_bev(
                sample["points"],
                (np.asarray(dets.boxes[0]), np.asarray(dets.scores[0]),
                 np.asarray(dets.labels[0]), count),
                out_dir / f"{fid}.png",
                cfg.DATA_CONFIG.POINT_CLOUD_RANGE,
            )
        logger.info(f"{fid}: {count} detections")


if __name__ == "__main__":
    main()

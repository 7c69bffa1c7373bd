"""CLIP crop-scoring debug CLI.

Parity target: /root/reference/tools/test_clip_crops.py — projects GT boxes
into every camera, extracts square crops, scores them with the CLIP text
classifier, and reports per-class accuracy plus optional matplotlib crop
grids. Used to sanity-check the VLM relabeling stage (CLIPBoxClassification)
before wiring it into self-training.

TPU-native differences: crops/scoring run through the jax CLIP path in
openvocab/box_classification.py (FlaxCLIPModel); with --stub the image
encoder is replaced by the deterministic stub (no CLIP weights in this
environment), which still exercises projection/crop geometry end to end.

Usage:
  python tools/test_clip_crops.py --cfg_file tools/cfgs/nuscenes_models/transfusion_lidar.yaml \
      --max_samples 8 [--stub] [--save_dir crops_out]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg_file", required=True)
    ap.add_argument("--max_samples", type=int, default=8)
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--stub", action="store_true",
                    help="use the deterministic stub image encoder "
                         "(no CLIP weights needed)")
    ap.add_argument("--model_name", default="openai/clip-vit-base-patch32")
    ap.add_argument("--save_dir", default=None,
                    help="dump per-sample crop grids (matplotlib)")
    ap.add_argument("--set", dest="set_cfgs", nargs="...", default=None)
    return ap.parse_args()


def main():
    args = parse_args()
    import jax.numpy as jnp

    from findnpropagate_tpu.config import (
        cfg, cfg_from_list, cfg_from_yaml_file)
    from findnpropagate_tpu.datasets import build_dataloader
    from findnpropagate_tpu.openvocab.box_classification import (
        CLIPBoxClassification, project_boxes_to_cameras)
    from findnpropagate_tpu.utils.logging import create_logger

    cfg_from_yaml_file(args.cfg_file, cfg)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs, cfg)
    logger = create_logger()

    data_cfg = cfg.DATA_CONFIG
    # camera matrices are required; mirror the reference's CAMERA_CONFIG
    # swap-in (test_clip_crops.py builds a camera-enabled dataset)
    data_cfg["CAMERA_CONFIG"] = data_cfg.get(
        "CAMERA_CONFIG", {"USE_CAM": True, "CAM_WITHOUT_IMAGE": False})
    ds, loader, _ = build_dataloader(
        data_cfg, cfg.CLASS_NAMES, batch_size=args.batch_size,
        training=False, logger=logger)

    clip_cls = CLIPBoxClassification(
        class_names=cfg.CLASS_NAMES, model_name=args.model_name)
    if args.stub:
        # deterministic seam (same as tests/test_box_classification.py):
        # image "features" = mean crop RGB; text features = random unit rows
        class _StubCLIP:
            def get_image_features(self, pixel_values):
                return jnp.mean(jnp.asarray(pixel_values), axis=(2, 3))

        rng = np.random.RandomState(0)
        t = rng.standard_normal((len(cfg.CLASS_NAMES), 3)).astype(np.float32)
        t /= np.linalg.norm(t, axis=1, keepdims=True)
        clip_cls._model = _StubCLIP()
        clip_cls._text_features = jnp.asarray(t)

    correct = np.zeros(len(cfg.CLASS_NAMES), np.int64)
    total = np.zeros(len(cfg.CLASS_NAMES), np.int64)
    n_done = 0
    for batch in loader:
        if n_done >= args.max_samples:
            break
        if "images" not in batch or "gt_boxes" not in batch:
            logger.warning("sample lacks images/gt_boxes; skipping")
            continue
        for b in range(batch["gt_boxes"].shape[0]):
            gt = np.asarray(batch["gt_boxes"][b])
            gt_mask = np.asarray(batch.get(
                "gt_boxes_mask", np.ones(len(gt), bool))[b]) \
                if "gt_boxes_mask" in batch else gt[:, 3] > 0
            boxes = gt[gt_mask][:, :7]
            labels = gt[gt_mask][:, -1].astype(np.int64)  # 1-indexed
            if not len(boxes):
                continue
            images = jnp.asarray(batch["images"][b])
            l2i = jnp.asarray(batch["trans_lidar_to_image"][b])
            new_labels, probs = clip_cls.relabel(
                jnp.asarray(boxes), l2i, images)
            new_labels = np.asarray(new_labels)
            for li, gl in zip(new_labels, labels):
                total[gl - 1] += 1
                correct[gl - 1] += int(li == gl)
            if args.save_dir:
                _save_crop_grid(
                    Path(args.save_dir), n_done, np.asarray(images),
                    np.asarray(project_boxes_to_cameras(
                        jnp.asarray(boxes), l2i)[0]),
                    labels, new_labels, cfg.CLASS_NAMES)
            n_done += 1
            if n_done >= args.max_samples:
                break

    logger.info("CLIP crop classification accuracy (GT boxes -> CLIP label):")
    for i, name in enumerate(cfg.CLASS_NAMES):
        if total[i]:
            logger.info(f"  {name:22s}: {correct[i]}/{total[i]} "
                        f"({100.0*correct[i]/total[i]:.1f}%)")
    tot = total.sum()
    logger.info(f"  overall: {correct.sum()}/{tot} "
                f"({100.0*correct.sum()/max(tot,1):.1f}%)")


def _save_crop_grid(out_dir, idx, images, boxes2d, gt_labels, pred_labels,
                    class_names):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Rectangle

    out_dir.mkdir(parents=True, exist_ok=True)
    ncam = images.shape[0]
    fig, axes = plt.subplots(2, (ncam + 1) // 2, figsize=(16, 7))
    for c, ax in zip(range(ncam), axes.reshape(-1)):
        img = images[c]
        img = (img - img.min()) / max(float(img.max() - img.min()), 1e-6)
        ax.imshow(img)
        for n in range(boxes2d.shape[1]):
            x1, y1, x2, y2 = boxes2d[c, n]
            if x2 <= x1 or y2 <= y1:
                continue
            ok = gt_labels[n] == pred_labels[n]
            ax.add_patch(Rectangle((x1, y1), x2 - x1, y2 - y1, fill=False,
                                   edgecolor="lime" if ok else "red",
                                   linewidth=1.2))
            ax.text(x1, y1 - 2,
                    class_names[int(pred_labels[n]) - 1][:10],
                    color="lime" if ok else "red", fontsize=6)
        ax.set_axis_off()
    fig.tight_layout()
    fig.savefig(out_dir / f"crops_{idx:04d}.png", dpi=120)
    plt.close(fig)


if __name__ == "__main__":
    main()

"""Greedy Box Seeker extraction CLI — "Find".

Mirrors tools/extract_pseudo_labels.py (/root/reference tools/
extract_pseudo_labels.py:42-148): runs the frustum proposer (no training)
over the train split with augmentations stripped, saves per-frame pseudo
labels to the store, reports running recall when GT is available.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

from findnpropagate_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file
from findnpropagate_tpu.datasets import build_dataloader
from findnpropagate_tpu.openvocab.frustum_proposer import FrustumProposerOG
from findnpropagate_tpu.openvocab.preprocessed_detector import PreprocessedDetector
from findnpropagate_tpu.openvocab.pseudo_labels import PseudoLabelStore
from findnpropagate_tpu.utils.logging import create_logger


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--save_path", type=str, required=True)
    parser.add_argument("--max_frames", type=int, default=None)
    parser.add_argument("--set", dest="set_cfgs", default=None,
                        nargs=argparse.REMAINDER)
    args = parser.parse_args()
    cfg_from_yaml_file(args.cfg_file, cfg)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs, cfg)

    logger = create_logger()
    # strip augs BEFORE building: the proposer consumes raw geometry, and
    # pseudo hooks (load_frustum_pseudos etc.) are only registered by the
    # ST runtime (reference extract_pseudo_labels.py builds the loader with
    # the aug queue emptied)
    if "DATA_AUGMENTOR" in cfg.DATA_CONFIG:
        cfg.DATA_CONFIG.DATA_AUGMENTOR.AUG_CONFIG_LIST = []
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=1, training=True,
        logger=logger,
    )
    dataset.data_augmentor = None

    head_cfg = cfg.MODEL.DENSE_HEAD
    from findnpropagate_tpu.openvocab.alt_proposers import (
        ALT_PROPOSER_REGISTRY,
    )

    alt_mode = head_cfg.NAME in ALT_PROPOSER_REGISTRY
    kitti_mode = head_cfg.NAME == "FrustumProposerOGKITTI"
    if alt_mode:
        params = dict(head_cfg.get("PARAMS", {}))
        if head_cfg.NAME == "GTProposals":
            seeker = ALT_PROPOSER_REGISTRY[head_cfg.NAME]
        else:
            seeker = ALT_PROPOSER_REGISTRY[head_cfg.NAME](
                cfg.CLASS_NAMES, **params)
    elif kitti_mode:
        from findnpropagate_tpu.openvocab.frustum_proposer_kitti import (
            FrustumProposerOGKITTI,
        )

        seeker = FrustumProposerOGKITTI.from_config(head_cfg, cfg.CLASS_NAMES)
    elif head_cfg.NAME == "FrustumProposerSEG":
        from findnpropagate_tpu.openvocab.frustum_proposer_seg import (
            FrustumProposerSEG,
        )

        seeker = FrustumProposerSEG.from_config(head_cfg, cfg.CLASS_NAMES)
    else:
        seeker = FrustumProposerOG.from_config(head_cfg, cfg.CLASS_NAMES)
    preds_paths = head_cfg.get("PREDS_PATHS", [])
    detector2d = PreprocessedDetector(preds_paths, cfg.CLASS_NAMES) \
        if preds_paths else None
    store = PseudoLabelStore(args.save_path)

    recalls, total_gt = 0, 0
    for i in range(len(dataset)):
        if args.max_frames is not None and i >= args.max_frames:
            break
        data = dataset[i]
        if alt_mode:
            # host-side ablation proposers (GTProposals / FrustumProposer /
            # DBSCAN / OV3DET / CLIP2Scene)
            if head_cfg.NAME == "GTProposals":
                boxes, scores, labels = seeker(
                    np.asarray(data["gt_boxes"], np.float32))
            elif head_cfg.NAME.startswith("CLIP2Scene"):
                seg = data.get("point_seg_labels")
                if seg is None:
                    logger.warning("no point_seg_labels; skipping frame")
                    continue
                boxes, scores, labels = seeker.propose(
                    data["points"][:, :3], np.asarray(seg))
            else:
                if detector2d is None:
                    logger.warning("no PREDS_PATHS configured; nothing "
                                   "to extract")
                    break
                dets = detector2d.infer(data.get("camera_paths", []))
                dm = np.asarray(dets["det_mask"], bool)
                boxes, scores, labels = seeker.propose(
                    data["points"][:, :3],
                    np.asarray(dets["det_boxes"])[dm],
                    np.asarray(dets["det_labels"])[dm],
                    np.asarray(dets["det_scores"])[dm],
                    np.asarray(dets["det_cams"])[dm],
                    np.asarray(data["lidar2image"], np.float32))
            store.save(data["frame_id"], boxes, scores, labels)
            if data.get("gt_boxes") is not None and len(data["gt_boxes"]):
                from findnpropagate_tpu.utils.geometry_np import (
                    boxes_bev_iou_cpu,
                )

                gt = np.asarray(data["gt_boxes"])[:, :7]
                total_gt += len(gt)
                if len(boxes):
                    iou = boxes_bev_iou_cpu(gt, boxes[:, :7])
                    recalls += int((iou.max(axis=1) > 0.25).sum())
            continue
        if detector2d is None:
            logger.warning("no PREDS_PATHS configured; nothing to extract")
            break
        P = dataset.max_points
        pts = np.zeros((P, 3), np.float32)
        n = min(len(data["points"]), P)
        pts[:n] = data["points"][:n, :3]
        pmask = np.zeros(P, bool)
        pmask[:n] = True
        if kitti_mode:
            dets = detector2d.infer_kitti(data["frame_id"])
            calib = data["calib"]
            out = seeker.propose(
                jnp.asarray(pts), jnp.asarray(pmask),
                jnp.asarray(dets["det_boxes"]),
                jnp.asarray(dets["det_labels"]),
                jnp.asarray(dets["det_scores"]), jnp.asarray(dets["det_mask"]),
                jnp.asarray(calib["P2"]), jnp.asarray(calib["R0"]),
                jnp.asarray(calib["V2C"]),
            )
        else:
            dets = detector2d.infer(data.get("camera_paths", []))
            out = seeker.propose(
                jnp.asarray(pts), jnp.asarray(pmask),
                jnp.asarray(dets["det_boxes"]), jnp.asarray(dets["det_labels"]),
                jnp.asarray(dets["det_scores"]), jnp.asarray(dets["det_cams"]),
                jnp.asarray(dets["det_mask"]),
                jnp.asarray(data["lidar2image"], jnp.float32),
                jnp.asarray(data["camera2lidar"], jnp.float32),
                jnp.asarray(data["camera_intrinsics"], jnp.float32),
            )
        valid = np.asarray(out.valid)
        store.save(
            data["frame_id"],
            np.asarray(out.boxes)[valid],
            np.asarray(out.scores)[valid],
            np.asarray(out.labels)[valid],
        )
        if data.get("gt_boxes") is not None and len(data["gt_boxes"]):
            from findnpropagate_tpu.utils.geometry_np import boxes_bev_iou_cpu

            gt = np.asarray(data["gt_boxes"])[:, :7]
            total_gt += len(gt)
            if valid.any():
                iou = boxes_bev_iou_cpu(gt, np.asarray(out.boxes)[valid][:, :7])
                recalls += int((iou.max(axis=1) > 0.25).sum())
        if i % 50 == 0:
            logger.info(
                f"frame {i}: recall so far "
                f"{recalls}/{total_gt} ({recalls / max(total_gt, 1):.3f})"
            )
    store.stamp_epoch(0)
    logger.info(f"done; final recall {recalls}/{total_gt}")


if __name__ == "__main__":
    main()

"""Self-training orchestration ("Propagate") — train_model_st equivalent.

Parity with tools/train_utils/train_utils.py:327-465 (/root/reference):
per epoch, once past ST_WARMUP and on every ST_INTERVAL, run the current
model over the (augmentation-stripped) train split, optionally relabel
unknowns with CLIP/GLIP, and save per-frame pseudo labels
(PseudoProcessor.save_predictions); training epochs then consume them
through the PseudoLoader augmentor hooks and the head merges them via
PseudoProcessor.combine_gt_with_pseudos with unknown down-weighting.
"""

from __future__ import annotations

import time

import jax
import numpy as np

from ..datasets.augmentor.data_augmentor import register_extra
from ..parallel.mesh import shard_batch
from ..runtime.trainer import make_eval_step, save_checkpoint
from .pseudo_labels import PseudoLoader, PseudoProcessor


def register_pseudo_hooks(loader: PseudoLoader):
    """Register the reference's augmentor hook names
    (data_augmentor.py:327-361) against a PseudoLoader instance."""
    register_extra(
        "load_frustum_pseudos",
        lambda cfg, aug: loader.load_frustum_pseudos,
    )
    register_extra(
        "load_selftrain_pseudos",
        lambda cfg, aug: loader.load_selftrain_pseudos,
    )
    register_extra(
        "unknowns_copy_paste",
        lambda cfg, aug: loader.unknowns_copy_paste,
    )


def build_relabeler(opt_cfg, class_names, detector2d=None,
                    image_provider=None):
    """VLM relabeler factory — the CLIP_TYPE dispatch of the reference's ST
    loop (train_utils.py:49-112): CROP -> CLIPBoxClassification,
    MASKCLIP -> CLIPBoxClassificationMaskCLIP, GLIP -> GLIPBoxClassification.

    Returns a callable (boxes, batch, i, labels, scores) -> (labels, scores)
    matching extract_pseudo_labels' hook, or None when relabeling is off.
    `image_provider(batch, i)` must return (NCAM, H, W, 3) images for the
    CROP/MASKCLIP modes (the reference swaps in a camera-enabled loader)."""
    import jax.numpy as jnp

    if not opt_cfg.get("CLIP_UNK_RELABEL", False):
        return None
    clip_type = str(opt_cfg.get("CLIP_TYPE", "CROP")).upper()
    from .box_classification import (
        CLIPBoxClassification,
        CLIPBoxClassificationMaskCLIP,
        GLIPBoxClassification,
    )

    if clip_type == "GLIP":
        glip = GLIPBoxClassification(num_classes=len(class_names))

        def relabel(boxes, batch, i, labels, scores):
            dets = detector2d.infer(batch.get("camera_paths", [[]])[i]) \
                if detector2d is not None else None
            if dets is None:
                return labels, scores
            l, s = glip.relabel(
                jnp.asarray(boxes[:, :7]),
                jnp.asarray(batch["lidar2image"][i]),
                jnp.asarray(dets["det_boxes"]),
                jnp.asarray(dets["det_labels"]),
                jnp.asarray(dets["det_scores"]),
                jnp.asarray(dets["det_cams"]),
                jnp.asarray(dets["det_mask"]))
            return np.asarray(l), np.asarray(s)

        return relabel

    cls = CLIPBoxClassification if clip_type == "CROP" \
        else CLIPBoxClassificationMaskCLIP
    vlm = cls(class_names=class_names)

    def relabel(boxes, batch, i, labels, scores):
        if image_provider is None:
            return labels, scores
        images = image_provider(batch, i)
        l, s = vlm.relabel(
            jnp.asarray(boxes[:, :7]),
            jnp.asarray(batch["lidar2image"][i]),
            jnp.asarray(images))
        return np.asarray(l), np.asarray(s)

    return relabel


def pseudo_labels_exist(processor: PseudoProcessor, epoch: int) -> bool:
    """Epoch-stamp check preventing re-extraction after restart
    (train_utils.py:16-34)."""
    return processor.store is not None and processor.store.stamped_epoch() == epoch


def extract_pseudo_labels(detector, variables, inference_loader, processor,
                          epoch, logger=None, relabeler=None,
                          max_batches=None):
    """Run the model over the train split and save pseudo labels
    (train_utils.py:36-123)."""
    eval_step = make_eval_step(detector)
    emit = logger.info if logger else print
    t0 = time.time()
    n = 0
    for bi, batch in enumerate(inference_loader):
        if max_batches is not None and bi >= max_batches:
            break
        frame_ids = batch.pop("frame_id", None)
        batch.pop("batch_size", None)
        dets = eval_step(variables, batch)
        boxes = np.asarray(dets.boxes)
        scores = np.asarray(dets.scores)
        labels = np.asarray(dets.labels)
        counts = np.asarray(dets.count)
        data_dicts = []
        det_dicts = []
        for i in range(boxes.shape[0]):
            k = int(counts[i])
            b, s, l = boxes[i, :k], scores[i, :k], labels[i, :k]
            if relabeler is not None and k > 0:
                l, s = relabeler(b, batch, i, l, s)
            det_dicts.append(
                {"pred_boxes": b, "pred_scores": s, "pred_labels": l}
            )
            data_dicts.append({"frame_id": frame_ids[i]})
            n += 1
        processor.save_predictions(data_dicts, det_dicts)
    processor.stamp_epoch(epoch)
    emit(f"extracted pseudo labels for {n} frames in {time.time()-t0:.1f}s")


def train_model_st(detector, train_loader, inference_loader, state, tx,
                   epochs, processor: PseudoProcessor, mesh=None, logger=None,
                   ckpt_dir=None, st_warmup=3, st_interval=1, relabeler=None,
                   log_interval=10, seed: int = 17,
                   ckpt_save_time_interval=None):
    """ST epoch driver (train_utils.py:327-449). ckpt_save_time_interval:
    wall-clock-timed latest_model saves inside epochs (the reference's
    train_one_epoch does this for ST runs too, train_utils.py:249-257)."""
    from ..runtime.trainer import make_train_step, save_intra_checkpoint

    train_step = make_train_step(detector, tx, mesh=mesh, seed=seed)
    emit = logger.info if logger else print
    last_timed_save = time.time()
    for epoch in range(epochs):
        if epoch >= st_warmup and (epoch - st_warmup) % st_interval == 0:
            if not pseudo_labels_exist(processor, epoch):
                variables = {"params": state.params,
                             "batch_stats": state.batch_stats}
                extract_pseudo_labels(
                    detector, variables, inference_loader, processor, epoch,
                    logger=logger, relabeler=relabeler,
                )
        train_loader.set_epoch(epoch)
        t0 = time.time()
        for it, batch in enumerate(train_loader):
            batch = shard_batch(mesh, batch) if mesh is not None else batch
            batch.pop("frame_id", None)
            batch.pop("batch_size", None)
            state, metrics = train_step(state, batch)
            if (ckpt_save_time_interval is not None and ckpt_dir is not None
                    and time.time() - last_timed_save
                    > ckpt_save_time_interval):
                import jax

                jax.block_until_ready(state.params)
                save_intra_checkpoint(ckpt_dir, state, epoch, it + 1)
                last_timed_save = time.time()
                emit(f"timed checkpoint saved at st epoch {epoch} it {it+1}")
            if it % log_interval == 0:
                emit(
                    f"st epoch {epoch} it {it}/{len(train_loader)} "
                    + " ".join(
                        f"{k}={float(v):.4f}" for k, v in metrics.items()
                    )
                )
        emit(f"st epoch {epoch} done in {time.time()-t0:.1f}s")
        if ckpt_dir is not None:
            save_checkpoint(ckpt_dir, state, step=epoch + 1)
    return state

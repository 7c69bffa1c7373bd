"""Metrics / logging writers.

Parity with the reference's logging surface (SURVEY.md §2.12): a
tensorboardX summary writer plus the reference's batching WandbSummaryWriter
behavior (tools/train.py:25-63 — scalars are buffered until a tag repeats,
then flushed as one step). wandb itself is absent in this environment, so
the buffering writer degrades to tensorboardX/file output.
"""

from __future__ import annotations

from pathlib import Path


class AverageMeter:
    """(common_utils.py:280)"""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class SummaryWriter:
    """tensorboardX-backed scalar writer; silently no-ops if unavailable."""

    def __init__(self, log_dir, rank: int = 0):
        self.rank = rank
        self._tb = None
        if rank == 0:
            try:
                from tensorboardX import SummaryWriter as TBWriter

                Path(log_dir).mkdir(parents=True, exist_ok=True)
                self._tb = TBWriter(log_dir=str(log_dir))
            except Exception:
                self._tb = None

    def add_scalar(self, tag, value, step):
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def flush(self):
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()


class BatchingSummaryWriter(SummaryWriter):
    """The reference's WandbSummaryWriter semantics (tools/train.py:25-63):
    buffer scalars until a tag repeats, then flush the whole buffer as one
    logical step. When the wandb package is importable AND `project` (or
    $WANDB_PROJECT) is set, the flushed buffer is ALSO sent to
    `wandb.log` — mirroring `wandb.init(project=..., name=run_name,
    dir=log_dir)` / `wandb.log(self.last_update)`; otherwise it degrades
    to tensorboardX/file output only."""

    def __init__(self, log_dir, rank: int = 0, project=None, run_name=None):
        super().__init__(log_dir, rank)
        self._buffer = {}
        self._step = 0
        self._wandb = None
        if rank == 0:
            import os

            project = project or os.environ.get("WANDB_PROJECT")
            if project:
                try:
                    import wandb

                    wandb.init(project=project, name=run_name,
                               dir=str(log_dir))
                    self._wandb = wandb
                except Exception:
                    self._wandb = None

    def add_scalar(self, tag, value, step=None):
        if tag in self._buffer:
            self._flush_buffer()
        self._buffer[tag] = (float(value), step)

    def _flush_buffer(self):
        if not self._buffer:
            return
        for tag, (value, step) in self._buffer.items():
            super().add_scalar(tag, value, self._step if step is None else step)
        if self._wandb is not None:
            self._wandb.log({t: v for t, (v, _) in self._buffer.items()})
        self._buffer.clear()
        self._step += 1

    def flush(self):
        self._flush_buffer()
        super().flush()


def disable_augmentation_hook(hook_cfg, dataloader, total_epochs, logger=None):
    """DisableAugmentationHook (train_utils.py:450-465): returns an epoch
    hook that strips the listed augmentations for the last NUM_LAST_EPOCHS."""
    disable_list = list(hook_cfg.get("DISABLE_AUG_LIST", []))
    num_last = int(hook_cfg.get("NUM_LAST_EPOCHS", 5))

    def hook(epoch, loader=None, **kw):
        loader = loader or dataloader
        if epoch < total_epochs - num_last:
            return
        aug = getattr(loader.dataset, "data_augmentor", None)
        if aug is None:
            return
        kept = []
        removed = []
        for fn in aug.queue:
            name = getattr(fn, "func", fn).__name__ if hasattr(fn, "func") \
                else type(fn).__name__
            key = {
                "DataBaseSampler": "gt_sampling",
            }.get(name, getattr(fn, "keywords", {}).get("config", {}).get("NAME", name))
            if key in disable_list or name in disable_list:
                removed.append(key)
            else:
                kept.append(fn)
        if removed and logger:
            logger.info(f"epoch {epoch}: disabled augmentations {removed}")
        aug.queue = kept

    return hook

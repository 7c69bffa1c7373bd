"""Dataset layer.

Mirrors the reference's build_dataloader surface
(pcdet/datasets/__init__.py:54-84, /root/reference). Host side stays numpy
(augmentation, filtering, padding); voxelization moves ON DEVICE into the
model jit. The loader is a plain python iterator producing fixed-shape numpy
batches — no torch DataLoader.
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from .dataset import DatasetTemplate
from .kitti import KittiDataset
from .misc_datasets import (
    Argo2Dataset,
    CustomDataset,
    LyftDataset,
    PandasetDataset,
)
from .nuscenes import NuScenesDataset
from .once import ONCEDataset
from .synthetic import SyntheticDataset
from .waymo import WaymoDataset

DATASET_REGISTRY = {
    "SyntheticDataset": SyntheticDataset,
    "KittiDataset": KittiDataset,
    "NuScenesDataset": NuScenesDataset,
    "WaymoDataset": WaymoDataset,
    "ONCEDataset": ONCEDataset,
    "LyftDataset": LyftDataset,
    "CustomDataset": CustomDataset,
    "Argo2Dataset": Argo2Dataset,
    "PandasetDataset": PandasetDataset,
}


class DataLoader:
    """Deterministic epoch-based loader with per-epoch shuffling and
    fixed-shape batch collation. `shard_id`/`num_shards` give the reference's
    DistributedSampler behavior for multi-host setups."""

    def __init__(self, dataset, batch_size, shuffle=True, seed=0,
                 shard_id=0, num_shards=1, drop_last=True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.drop_last = drop_last
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            order = rng.permutation(n)
        order = order[self.shard_id :: self.num_shards]
        nb = len(self)
        for b in range(nb):
            idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
            if len(idxs) == 0:
                break
            samples = [self.dataset[int(i)] for i in idxs]
            yield self.dataset.collate_batch(samples)


class PrefetchLoader:
    """Background-thread prefetcher wrapping a DataLoader so host-side
    augmentation/collation overlaps device compute (the reference gets this
    from torch DataLoader workers; here a single daemon thread fills a
    bounded queue — the jitted train step dispatches asynchronously, so one
    producer thread keeps the chip fed)."""

    def __init__(self, loader: "DataLoader", prefetch: int = 2):
        self.loader = loader
        self.prefetch = int(prefetch)

    def set_epoch(self, epoch):
        self.loader.set_epoch(epoch)

    def __len__(self):
        return len(self.loader)

    @property
    def dataset(self):
        return self.loader.dataset

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err = []

        def worker():
            try:
                for item in self.loader:
                    q.put(item)
            except BaseException as e:  # surface worker errors to consumer
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item


def build_dataloader(dataset_cfg, class_names, batch_size, dist=False,
                     training=True, seed=0, logger=None, shard_id=0,
                     num_shards=1, prefetch=2, **kwargs):
    dataset_cls = DATASET_REGISTRY[dataset_cfg["DATASET"]]
    dataset = dataset_cls(
        dataset_cfg=dataset_cfg,
        class_names=class_names,
        training=training,
        logger=logger,
    )
    loader = DataLoader(
        dataset, batch_size, shuffle=training, seed=seed,
        shard_id=shard_id, num_shards=num_shards, drop_last=training,
    )
    if prefetch and prefetch > 0:
        loader = PrefetchLoader(loader, prefetch=prefetch)
    return dataset, loader, None

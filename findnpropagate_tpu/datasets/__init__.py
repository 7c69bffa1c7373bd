"""Dataset layer.

Mirrors the reference's build_dataloader surface
(pcdet/datasets/__init__.py:54-84, /root/reference). Host side stays numpy
(augmentation, filtering, padding); voxelization moves ON DEVICE into the
model jit. The loader is a plain python iterator producing fixed-shape numpy
batches — no torch DataLoader.
"""

from __future__ import annotations

import numpy as np

from .dataset import DatasetTemplate
from .kitti import KittiDataset
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


def build_dataloader(dataset_cfg, class_names, batch_size, dist=False,
                     training=True, seed=0, logger=None, shard_id=0,
                     num_shards=1, **kwargs):
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
    return dataset, loader, None

"""MeanVFE: per-voxel mean of point features.

Behavioral parity with pcdet/models/backbones_3d/vfe/mean_vfe.py:6-31
(/root/reference): mean over the valid points of each voxel (normalizer
clamped to >= 1). Batched fixed-shape layout: (B, V, T, C) -> (B, V, C).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class MeanVFE(nn.Module):
    model_cfg: dict
    num_point_features: int
    voxel_size: tuple = ()
    point_cloud_range: tuple = ()
    grid_size: tuple = ()

    @property
    def output_dim(self):
        return self.num_point_features

    @nn.compact
    def __call__(self, batch, train: bool):
        if "voxels" not in batch and "voxel_features" in batch:
            # Fused path: the on-device voxelizer (ops.voxelize.voxelize_mean)
            # already produced the per-voxel means without materializing the
            # (B, V, T, C) bucket. Nothing left to do.
            return batch
        voxels = batch["voxels"]          # (B, V, T, C)
        num_points = batch["voxel_num_points"]  # (B, V)
        t = voxels.shape[2]
        slot = jnp.arange(t)[None, None, :]
        point_mask = slot < num_points[..., None]  # (B, V, T)
        summed = jnp.sum(voxels * point_mask[..., None], axis=2)
        normalizer = jnp.clip(num_points[..., None].astype(voxels.dtype), 1.0)
        batch["voxel_features"] = summed / normalizer  # (B, V, C)
        return batch

"""Sparse -> dense BEV projection modules.

PointPillarScatter: parity with pcdet/models/backbones_2d/map_to_bev/
pointpillar_scatter.py:5-37 (/root/reference) — scatter per-pillar features
into a dense (ny, nx) canvas. TPU version: one batched scatter with a dummy
overflow row instead of a per-sample Python loop; output layout NHWC.

HeightCompression: parity with height_compression.py:4-26 — collapse the
sparse 3D volume's z axis into channels. Here the sparse backbone hands us a
dense (B, nz, ny, nx, C) volume (or we densify from sparse voxel features);
we reshape to (B, ny, nx, nz*C).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class PointPillarScatter(nn.Module):
    model_cfg: dict
    grid_size: tuple  # (nx, ny, nz)

    @property
    def num_bev_features(self):
        return int(self.model_cfg["NUM_BEV_FEATURES"])

    @nn.compact
    def __call__(self, batch, train: bool):
        pillar_features = batch["pillar_features"]  # (B, V, C)
        coords = batch["voxel_coords"]              # (B, V, 3) zyx, -1 pad
        voxel_mask = batch["voxel_mask"]            # (B, V)
        nx, ny, nz = (int(g) for g in self.grid_size)
        assert nz == 1, "PointPillarScatter requires nz == 1"
        b, v, c = pillar_features.shape

        ys = coords[..., 1]
        xs = coords[..., 2]
        flat = ys * nx + xs
        flat = jnp.where(voxel_mask, flat, ny * nx)  # overflow slot

        feats = jnp.where(voxel_mask[..., None], pillar_features, 0.0)

        def scatter_one(f, idx):
            canvas = jnp.zeros((ny * nx + 1, c), dtype=f.dtype)
            canvas = canvas.at[idx].set(f)
            return canvas[: ny * nx]

        canvas = jax.vmap(scatter_one)(feats, flat)  # (B, ny*nx, C)
        batch["spatial_features"] = canvas.reshape(b, ny, nx, c)
        return batch


class HeightCompression(nn.Module):
    model_cfg: dict
    grid_size: tuple = ()

    @property
    def num_bev_features(self):
        return int(self.model_cfg["NUM_BEV_FEATURES"])

    @nn.compact
    def __call__(self, batch, train: bool):
        dense = batch["encoded_spconv_tensor"]  # (B, nz, ny, nx, C)
        b, nz, ny, nx, c = dense.shape
        # (B, ny, nx, nz*C): z folds into channels, matching the reference's
        # (N, C*D, H, W) view modulo layout.
        x = jnp.transpose(dense, (0, 2, 3, 1, 4)).reshape(b, ny, nx, nz * c)
        batch["spatial_features"] = x
        batch["spatial_features_stride"] = batch.get("encoded_spconv_tensor_stride", 8)
        return batch


class Conv2DCollapse(nn.Module):
    """CaDDN z-collapse (map_to_bev/conv2d_collapse.py:1-38): the dense
    camera voxel volume folds z into channels and a 1x1 conv + BN + ReLU
    reduces to NUM_BEV_FEATURES."""

    model_cfg: dict
    grid_size: tuple = ()

    @property
    def num_bev_features(self):
        return int(self.model_cfg["NUM_BEV_FEATURES"])

    @nn.compact
    def __call__(self, batch, train: bool):
        dense = batch["voxel_features_dense"]   # (B, nz, ny, nx, C)
        b, nz, ny, nx, c = dense.shape
        x = jnp.transpose(dense, (0, 2, 3, 1, 4)).reshape(b, ny, nx, nz * c)
        x = nn.Conv(self.num_bev_features, (1, 1), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        batch["spatial_features"] = nn.relu(x)
        batch["spatial_features_stride"] = 1
        return batch

"""PillarVFE — PointPillars feature network.

Behavioral parity with pcdet/models/backbones_3d/vfe/pillar_vfe.py:8-123
(/root/reference): per-point features are augmented with cluster offsets
(point - pillar mean) and center offsets (point - pillar grid-cell center),
zero-masked, then passed through PFN layers (Linear -> BN -> ReLU -> max over
points); non-final layers concat the per-pillar max back onto each point.

TPU-native differences: batched fixed-capacity layout (B, V, T, C) so the
whole thing is a handful of big dense matmuls on the MXU; no 50k-row chunking
(that was a CUDA BatchNorm workaround).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..blocks import MaskedBatchNorm


class PFNLayer(nn.Module):
    out_channels: int
    last_layer: bool = False
    use_norm: bool = True

    @nn.compact
    def __call__(self, x, pillar_valid, train: bool):
        # x: (B, V, T, C); pillar_valid: (B, V) bool — real (non-padded)
        # pillars. The reference's BatchNorm1d (pillar_vfe.py:38-39,41) runs
        # over the ragged (N_real, C, T) tensor: statistics cover ALL T point
        # slots of real pillars (zero-padded slots included) but no padded
        # pillar rows, and padded slots' BN outputs do participate in the
        # max — so the mask here is pillar-level, not slot-level.
        out = self.out_channels if self.last_layer else self.out_channels // 2
        x = nn.Dense(out, use_bias=not self.use_norm)(x)
        if self.use_norm:
            x = MaskedBatchNorm(out)(x, pillar_valid[..., None], train)
        x = nn.relu(x)
        x_max = jnp.max(x, axis=2, keepdims=True)  # (B, V, 1, C')
        if self.last_layer:
            return x_max[:, :, 0, :]
        return jnp.concatenate(
            [x, jnp.broadcast_to(x_max, x.shape)], axis=-1
        )


class PillarVFE(nn.Module):
    model_cfg: dict
    num_point_features: int
    voxel_size: tuple
    point_cloud_range: tuple
    grid_size: tuple = ()

    @property
    def output_dim(self):
        return int(self.model_cfg["NUM_FILTERS"][-1])

    @nn.compact
    def __call__(self, batch, train: bool):
        voxels = batch["voxels"]                 # (B, V, T, C)
        num_points = batch["voxel_num_points"]   # (B, V)
        coords = batch["voxel_coords"]           # (B, V, 3) zyx

        use_abs_xyz = bool(self.model_cfg.get("USE_ABSLOTE_XYZ", True))
        with_distance = bool(self.model_cfg.get("WITH_DISTANCE", False))
        use_norm = bool(self.model_cfg.get("USE_NORM", True))

        vx, vy, vz = (float(v) for v in self.voxel_size)
        x_off = vx / 2 + float(self.point_cloud_range[0])
        y_off = vy / 2 + float(self.point_cloud_range[1])
        z_off = vz / 2 + float(self.point_cloud_range[2])

        t = voxels.shape[2]
        normalizer = jnp.clip(num_points[..., None, None].astype(voxels.dtype), 1.0)
        points_mean = jnp.sum(voxels[..., :3], axis=2, keepdims=True) / normalizer
        f_cluster = voxels[..., :3] - points_mean

        cf = coords.astype(voxels.dtype)
        centers = jnp.stack(
            [
                cf[..., 2] * vx + x_off,
                cf[..., 1] * vy + y_off,
                cf[..., 0] * vz + z_off,
            ],
            axis=-1,
        )  # (B, V, 3) xyz
        f_center = voxels[..., :3] - centers[:, :, None, :]

        feats = [voxels if use_abs_xyz else voxels[..., 3:], f_cluster, f_center]
        if with_distance:
            feats.append(
                jnp.linalg.norm(voxels[..., :3], axis=-1, keepdims=True)
            )
        features = jnp.concatenate(feats, axis=-1)

        # zero out padded point slots (reference pillar_vfe.py:115-118)
        slot = jnp.arange(t)[None, None, :]
        point_valid = slot < num_points[..., None]  # (B, V, T)
        features = features * point_valid[..., None].astype(features.dtype)

        pillar_valid = num_points > 0  # (B, V): real pillars have >=1 point
        num_filters: Sequence[int] = self.model_cfg["NUM_FILTERS"]
        for i, nf in enumerate(num_filters):
            features = PFNLayer(
                out_channels=int(nf),
                last_layer=(i == len(num_filters) - 1),
                use_norm=use_norm,
            )(features, pillar_valid, train)

        batch["pillar_features"] = features  # (B, V, C_out)
        return batch

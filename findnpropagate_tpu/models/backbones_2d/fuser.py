"""ConvFuser — BEVFusion camera+lidar BEV fusion.

Parity target: pcdet/models/backbones_2d/fuser/convfuser.py:1-32
(/root/reference): channel-concat of spatial_features (lidar BEV) and
spatial_features_img (camera BEV), 3x3 conv + BN + ReLU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class ConvFuser(nn.Module):
    model_cfg: Any

    @nn.compact
    def __call__(self, batch, train: bool):
        out_ch = int(self.model_cfg["OUT_CHANNEL"])
        lidar = batch["spatial_features"]
        img = batch["spatial_features_img"]
        if img.shape[1:3] != lidar.shape[1:3]:
            import jax

            img = jax.image.resize(
                img, (img.shape[0],) + lidar.shape[1:3] + (img.shape[-1],),
                method="bilinear")
        x = jnp.concatenate([lidar, img], axis=-1)
        x = nn.Conv(out_ch, (3, 3), padding="SAME", use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        batch["spatial_features"] = nn.relu(x)
        return batch


FUSER_REGISTRY = {"ConvFuser": ConvFuser}

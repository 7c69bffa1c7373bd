"""GeneralizedLSSFPN image neck.

Parity target: pcdet/models/backbones_image/img_neck/generalized_lss.py
(/root/reference, ~76 LoC): lateral 1x1 convs whose input is the stage
feature CONCATENATED with the upsampled next-higher stage, then 3x3 fpn
convs; returns the chosen output levels.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class GeneralizedLSSFPN(nn.Module):
    model_cfg: Any

    @nn.compact
    def __call__(self, batch, train: bool):
        cfg = self.model_cfg
        out_ch = int(cfg.get("OUT_CHANNELS", 256))
        feats = list(batch["image_features"])
        n = len(feats)
        # top-down: lateral(cat(x_i, up(x_{i+1}))) -> 3x3
        outs = [None] * n
        prev = feats[-1]
        for i in range(n - 1, -1, -1):
            if i == n - 1:
                cat = feats[i]
            else:
                up = jax.image.resize(
                    prev, feats[i].shape[:3] + (prev.shape[-1],),
                    method="nearest")
                cat = jnp.concatenate([feats[i], up], axis=-1)
            lat = nn.Conv(out_ch, (1, 1), use_bias=False,
                          name=f"lateral{i}")(cat)
            lat = nn.BatchNorm(use_running_average=not train,
                               name=f"lateral{i}_bn")(lat)
            lat = nn.relu(lat)
            y = nn.Conv(out_ch, (3, 3), padding="SAME", use_bias=False,
                        name=f"fpn{i}")(lat)
            y = nn.BatchNorm(use_running_average=not train,
                             name=f"fpn{i}_bn")(y)
            outs[i] = nn.relu(y)
            prev = outs[i]
        batch["image_fpn"] = outs
        return batch

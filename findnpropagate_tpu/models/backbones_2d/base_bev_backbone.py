"""BaseBEVBackbone — SECOND-style multi-scale dense BEV CNN.

Behavioral parity with pcdet/models/backbones_2d/base_bev_backbone.py:6-112
(/root/reference): per-level [strided conv + N convs] blocks, transpose-conv
upsampling back to a common stride, channel concat. NHWC layout; everything
fuses under XLA.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..blocks import BN_KW, ConvBNReLU, DeconvBNReLU


class BaseBEVBackbone(nn.Module):
    model_cfg: dict
    input_channels: int

    @property
    def num_bev_features(self):
        cfg = self.model_cfg
        ups = cfg.get("NUM_UPSAMPLE_FILTERS", []) or []
        if ups:
            c_in = sum(int(u) for u in ups)
        else:
            c_in = int((cfg.get("NUM_FILTERS") or [self.input_channels])[-1])
        return c_in

    @nn.compact
    def __call__(self, batch, train: bool):
        cfg = self.model_cfg
        layer_nums = cfg.get("LAYER_NUMS", []) or []
        layer_strides = cfg.get("LAYER_STRIDES", []) or []
        num_filters = cfg.get("NUM_FILTERS", []) or []
        upsample_strides = cfg.get("UPSAMPLE_STRIDES", []) or []
        num_upsample_filters = cfg.get("NUM_UPSAMPLE_FILTERS", []) or []
        # eval-only bf16 compute (`DTYPE: bf16`): the (B, H, W, 128..256)
        # maps here are multi-GB at saturating batch; params stay f32
        dt = jnp.bfloat16 if (
            str(cfg.get("DTYPE", "f32")).lower() in ("bf16", "bfloat16")
            and not train) else None

        x = batch["spatial_features"]  # (B, H, W, C)
        if dt is not None:
            x = x.astype(dt)
        ups = []
        for i, (n, s, f) in enumerate(zip(layer_nums, layer_strides, num_filters)):
            x = ConvBNReLU(int(f), 3, int(s), dtype=dt,
                           name=f"block{i}_down")(x, train)
            for k in range(int(n)):
                x = ConvBNReLU(int(f), 3, 1, dtype=dt,
                               name=f"block{i}_conv{k}")(x, train)
            stride = 1
            for s2 in layer_strides[: i + 1]:
                stride *= int(s2)
            batch[f"spatial_features_{stride}x"] = x
            if upsample_strides:
                ups.append(
                    DeconvBNReLU(
                        int(num_upsample_filters[i]),
                        stride=upsample_strides[i],
                        dtype=dt,
                        name=f"deblock{i}",
                    )(x, train)
                )
            else:
                ups.append(x)

        if len(ups) > 1:
            x = jnp.concatenate(ups, axis=-1)
        elif ups:
            x = ups[0]

        if len(upsample_strides) > len(layer_nums):
            x = DeconvBNReLU(
                x.shape[-1], stride=int(upsample_strides[-1]), dtype=dt,
                name="deblock_extra"
            )(x, train)

        batch["spatial_features_2d"] = x.astype(jnp.float32)
        return batch


class BaseBEVBackboneV1(nn.Module):
    """V1 variant (base_bev_backbone.py:115-204, /root/reference): consumes
    the PillarNet multi_scale_2d_features (dense x_conv4 / x_conv5) instead
    of one spatial_features map; block i processes source i and deblocks
    upsample + concat."""

    model_cfg: dict
    input_channels: int = 0

    @property
    def num_bev_features(self):
        ups = self.model_cfg.get("NUM_UPSAMPLE_FILTERS", []) or []
        return sum(int(u) for u in ups)

    @nn.compact
    def __call__(self, batch, train: bool):
        cfg = self.model_cfg
        layer_nums = cfg.get("LAYER_NUMS", [])
        num_filters = cfg.get("NUM_FILTERS", [])
        upsample_strides = cfg.get("UPSAMPLE_STRIDES", [])
        num_up = cfg.get("NUM_UPSAMPLE_FILTERS", [])
        ms = batch["multi_scale_2d_features"]
        srcs = [ms["x_conv4_dense"] if "x_conv4_dense" in ms
                else ms["x_conv4"], ms["x_conv5"]]
        ups = []
        for i, (n, f) in enumerate(zip(layer_nums, num_filters)):
            x = srcs[i]
            for k in range(int(n)):
                x = ConvBNReLU(int(f), 3, 1, name=f"block{i}_conv{k}")(x, train)
            ups.append(DeconvBNReLU(int(num_up[i]),
                                    stride=int(upsample_strides[i]),
                                    name=f"deblock{i}")(x, train))
        x = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
        batch["spatial_features_2d"] = x
        return batch

"""Image ResNet backbones.

Parity targets (/root/reference): pcdet/models/backbones_image/resnet.py
(ResNet18, mmdet-style, returns the OUT_INDICES stage features) and
clip_resnet.py (CLIPResNet — the CLIP-modified ResNet: 3-conv stem with
avg-pool antialiased downsampling and bottleneck blocks whose stride lives
in an avg-pool before conv2).

flax/NHWC; BatchNorm everywhere (frozen-stats eval via train flag).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class BasicBlock(nn.Module):
    channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        y = nn.Conv(self.channels, (3, 3), strides=(self.stride,) * 2,
                    padding="SAME", use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        if self.stride != 1 or x.shape[-1] != self.channels:
            identity = nn.Conv(self.channels, (1, 1),
                               strides=(self.stride,) * 2,
                               use_bias=False)(x)
            identity = nn.BatchNorm(use_running_average=not train)(identity)
        return nn.relu(y + identity)


class ResNet18(nn.Module):
    """4-stage ResNet18 returning the configured stage outputs."""

    model_cfg: Any

    @nn.compact
    def __call__(self, batch, train: bool):
        x = batch["camera_imgs"]
        if x.ndim == 5:  # (B, N, H, W, 3) -> (B*N, H, W, 3)
            x = x.reshape((-1,) + x.shape[2:])
        out_indices = tuple(self.model_cfg.get("OUT_INDICES", (0, 1, 2, 3)))
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME",
                    use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        outs = []
        for si, (ch, stride) in enumerate(
                [(64, 1), (128, 2), (256, 2), (512, 2)]):
            x = BasicBlock(ch, stride)(x, train)
            x = BasicBlock(ch, 1)(x, train)
            if si in out_indices:
                outs.append(x)
        batch["image_features"] = outs
        return batch


class Bottleneck(nn.Module):
    """CLIP bottleneck: stride implemented as an avg-pool before conv3's
    input (clip_resnet.py semantics)."""

    channels: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out_ch = self.channels * self.expansion
        y = nn.Conv(self.channels, (1, 1), use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        if self.stride > 1:
            y = nn.avg_pool(y, (self.stride,) * 2, strides=(self.stride,) * 2)
        y = nn.Conv(out_ch, (1, 1), use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        if self.stride > 1 or x.shape[-1] != out_ch:
            identity = nn.avg_pool(x, (self.stride,) * 2,
                                   strides=(self.stride,) * 2) \
                if self.stride > 1 else x
            identity = nn.Conv(out_ch, (1, 1), use_bias=False)(identity)
            identity = nn.BatchNorm(use_running_average=not train)(identity)
        return nn.relu(y + identity)


class CLIPResNet(nn.Module):
    """CLIP-modified ResNet (3-conv stem + avgpool, bottleneck stages)."""

    model_cfg: Any

    @nn.compact
    def __call__(self, batch, train: bool):
        x = batch["camera_imgs"]
        if x.ndim == 5:  # (B, N, H, W, 3) -> (B*N, H, W, 3)
            x = x.reshape((-1,) + x.shape[2:])
        layers = list(self.model_cfg.get("LAYERS", (3, 4, 6, 3)))
        width = int(self.model_cfg.get("WIDTH", 64))
        out_indices = tuple(self.model_cfg.get("OUT_INDICES", (0, 1, 2, 3)))
        # 3-conv stem
        for ch, st in [(width // 2, 2), (width // 2, 1), (width, 1)]:
            x = nn.Conv(ch, (3, 3), strides=(st, st), padding="SAME",
                        use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.relu(x)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        outs = []
        ch = width
        for si, n_blocks in enumerate(layers):
            stride = 1 if si == 0 else 2
            x = Bottleneck(ch, stride)(x, train)
            for _ in range(n_blocks - 1):
                x = Bottleneck(ch, 1)(x, train)
            if si in out_indices:
                outs.append(x)
            ch *= 2
        batch["image_features"] = outs
        return batch

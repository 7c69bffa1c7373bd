"""Shared flax building blocks.

BatchNorm settings match the reference's torch defaults (eps=1e-3,
momentum=0.01 in torch convention => flax momentum 0.99).
Convs operate in NHWC (TPU-native layout); the reference's NCHW is an
implementation detail we do not carry over.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

BN_KW = dict(epsilon=1e-3, momentum=0.99)


class ConvBNReLU(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)] if self.kernel_size == 3 else "SAME",
            use_bias=False,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, **BN_KW)(x)
        return nn.relu(x)


class DeconvBNReLU(nn.Module):
    features: int
    stride: float = 2  # >=1: transpose conv upsample; <1: strided conv downsample

    @nn.compact
    def __call__(self, x, train: bool):
        if self.stride >= 1:
            s = int(round(self.stride))
            x = nn.ConvTranspose(
                self.features, (s, s), strides=(s, s), use_bias=False
            )(x)
        else:
            s = int(round(1 / self.stride))
            x = nn.Conv(
                self.features, (s, s), strides=(s, s), use_bias=False
            )(x)
        x = nn.BatchNorm(use_running_average=not train, **BN_KW)(x)
        return nn.relu(x)


class MLP(nn.Module):
    hidden: Sequence[int]

    @nn.compact
    def __call__(self, x, train: bool):
        for h in self.hidden:
            x = nn.Dense(h, use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train, **BN_KW)(x)
            x = nn.relu(x)
        return x

"""Shared flax building blocks.

BatchNorm settings match the reference's torch defaults (eps=1e-3,
momentum=0.01 in torch convention => flax momentum 0.99).
Convs operate in NHWC (TPU-native layout); the reference's NCHW is an
implementation detail we do not carry over.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

BN_KW = dict(epsilon=1e-3, momentum=0.99)


class MaskedBatchNorm(nn.Module):
    """BatchNorm whose statistics are computed over VALID cells only
    (torch eps=1e-3, momentum=0.01). The reference's BatchNorm1d sees
    exactly the ragged active set; on the fixed-capacity TPU layout an
    unmasked BN would dilute mean/var with padded rows, so every BN over a
    padded axis (sparse voxels, pillar slots) must go through this.

    x: (..., C); valid: bool, broadcastable to x's leading dims.
    """

    features: int
    epsilon: float = 1e-3
    momentum: float = 0.99

    def setup(self):
        self.scale = self.param(
            "scale", nn.initializers.ones, (self.features,))
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.features,))
        self.ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,))
        )
        self.ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,))
        )

    def affine(self):
        """Eval-mode BN as per-channel (scale, shift): y = x*scale + shift.
        Used to fuse the BN into a conv kernel's epilogue."""
        k = jax.lax.rsqrt(self.ra_var.value + self.epsilon) * self.scale
        return k, self.bias - self.ra_mean.value * k

    def __call__(self, x, valid, train: bool):
        scale, bias = self.scale, self.bias
        ra_mean, ra_var = self.ra_mean, self.ra_var
        if train:
            m = jnp.broadcast_to(valid[..., None], x.shape).astype(x.dtype)
            reduce_axes = tuple(range(x.ndim - 1))
            n = jnp.clip(jnp.sum(m, axis=reduce_axes), 1.0)
            mean = jnp.sum(x * m, axis=reduce_axes) / n
            var = jnp.sum(((x - mean) ** 2) * m, axis=reduce_axes) / n
            ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
            ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        # preserve the input dtype (the hybrid dense levels run bf16 at
        # eval; f32 affine params must not silently upcast the tensor)
        return jnp.where(valid[..., None], y, 0.0).astype(x.dtype)


class ConvBNReLU(nn.Module):
    # dtype: computation dtype (params stay f32) — bf16 on the eval path
    # halves the multi-GB dense BEV tensors and doubles MXU throughput
    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)] if self.kernel_size == 3 else "SAME",
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         **BN_KW)(x)
        return nn.relu(x)


class DeconvBNReLU(nn.Module):
    features: int
    stride: float = 2  # >=1: transpose conv upsample; <1: strided conv downsample
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        if self.stride >= 1:
            s = int(round(self.stride))
            x = nn.ConvTranspose(
                self.features, (s, s), strides=(s, s), use_bias=False,
                dtype=self.dtype,
            )(x)
        else:
            s = int(round(1 / self.stride))
            x = nn.Conv(
                self.features, (s, s), strides=(s, s), use_bias=False,
                dtype=self.dtype,
            )(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         **BN_KW)(x)
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

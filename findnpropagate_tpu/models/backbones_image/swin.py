"""SwinTransformer image backbone.

Behavioral parity with pcdet/models/backbones_image/swin.py:1-736
(/root/reference; mmdet Swin port): patch embedding, stages of
(shifted-)window multi-head self-attention blocks with relative position
bias, patch merging between stages, LayerNorm on the OUT_INDICES outputs.

TPU design: all window partitions are static reshapes (image and window
sizes are static); attention over (num_windows*B, win^2, C) tiles maps
straight onto the MXU. No masking tricks beyond the standard shifted-window
attention mask, which is a compile-time constant.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def window_partition(x, ws):
    """(B, H, W, C) -> (B*nH*nW, ws, ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)


def window_reverse(wins, ws, h, w):
    b = wins.shape[0] // (h // ws * w // ws)
    x = wins.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _rel_pos_index(ws):
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int

    @nn.compact
    def __call__(self, x, mask=None):
        """x: (nW*B, N, C); mask: (nW, N, N) or None."""
        b_, n, c = x.shape
        ws = self.window_size
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, use_bias=True, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = q * (head_dim ** -0.5)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k)

        rel_bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, self.num_heads))
        idx = jnp.asarray(_rel_pos_index(ws)).reshape(-1)
        bias = rel_bias_table[idx].reshape(n, n, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(b_, self.num_heads, n, n)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b_, n, c)
        return nn.Dense(self.dim, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, hw):
        h, w = hw
        b, l, c = x.shape
        ws = min(self.window_size, h, w)
        shift = self.shift if ws < min(h, w) else 0

        shortcut = x
        y = nn.LayerNorm()(x).reshape(b, h, w, c)
        pad_b = (-h) % ws
        pad_r = (-w) % ws
        if pad_b or pad_r:
            y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            # compile-time attention mask for the wrapped windows
            img_mask = np.zeros((1, hp, wp, 1), np.float32)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                for wss in (slice(0, -ws), slice(-ws, -shift),
                            slice(-shift, None)):
                    img_mask[:, hs, wss, :] = cnt
                    cnt += 1
            mw = window_partition(jnp.asarray(img_mask), ws).reshape(
                -1, ws * ws)
            attn_mask = jnp.where(
                mw[:, None, :] != mw[:, :, None], -100.0, 0.0)
        else:
            attn_mask = None
        wins = window_partition(y, ws).reshape(-1, ws * ws, c)
        wins = WindowAttention(self.dim, self.num_heads, ws,
                               name="attn")(wins, attn_mask)
        y = window_reverse(wins.reshape(-1, ws, ws, c), ws, hp, wp)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        y = y[:, :h, :w].reshape(b, l, c)
        x = shortcut + y

        y = nn.LayerNorm()(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio))(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim)(y)
        return x + y


class PatchMerging(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x, hw):
        h, w = hw
        b, l, c = x.shape
        y = x.reshape(b, h, w, c)
        if h % 2 or w % 2:
            y = jnp.pad(y, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        y = jnp.concatenate(
            [y[:, 0::2, 0::2], y[:, 1::2, 0::2],
             y[:, 0::2, 1::2], y[:, 1::2, 1::2]], axis=-1)
        h2, w2 = (h + 1) // 2, (w + 1) // 2
        y = y.reshape(b, h2 * w2, 4 * c)
        y = nn.LayerNorm()(y)
        return nn.Dense(2 * self.dim, use_bias=False)(y), (h2, w2)


class SwinTransformer(nn.Module):
    model_cfg: Any

    @nn.compact
    def __call__(self, batch, train: bool):
        cfg = self.model_cfg
        embed = int(cfg.get("EMBED_DIMS", 96))
        depths = list(cfg.get("DEPTHS", (2, 2, 6, 2)))
        heads = list(cfg.get("NUM_HEADS", (3, 6, 12, 24)))
        ws = int(cfg.get("WINDOW_SIZE", 7))
        patch = int(cfg.get("PATCH_SIZE", 4))
        out_indices = tuple(cfg.get("OUT_INDICES", (1, 2, 3)))

        x = batch["camera_imgs"]
        if x.ndim == 5:  # (B, N, H, W, 3) -> (B*N, H, W, 3)
            x = x.reshape((-1,) + x.shape[2:])
        x = nn.Conv(embed, (patch, patch), strides=(patch, patch),
                    name="patch_embed")(x)
        b, h, w, c = x.shape
        x = nn.LayerNorm()(x.reshape(b, h * w, c))
        hw = (h, w)
        outs = []
        dim = embed
        for si, (depth, nh) in enumerate(zip(depths, heads)):
            for bi in range(depth):
                x = SwinBlock(dim, nh, ws, shift=0 if bi % 2 == 0 else ws // 2,
                              name=f"stage{si}_block{bi}")(x, hw)
            if si in out_indices:
                y = nn.LayerNorm(name=f"out_norm{si}")(x)
                outs.append(y.reshape(b, hw[0], hw[1], dim))
            if si < len(depths) - 1:
                x, hw = PatchMerging(dim, name=f"merge{si}")(x, hw)
                dim *= 2
        batch["image_features"] = outs
        return batch

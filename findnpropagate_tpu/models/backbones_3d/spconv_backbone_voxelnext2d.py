"""VoxelNeXt-2D fully-sparse pillar backbone (VoxelResBackBone8xVoxelNeXt2D).

Behavioral parity with pcdet/models/backbones_3d/spconv_backbone_voxelnext2d.py
:70-219 (/root/reference): the 2D analogue of VoxelNeXt — six sparse 2D
stages over the pillar BEV grid (conv1 = 3 residual blocks at stride 1;
conv2..conv6 = strided down + 4/6/3/3/3 residual blocks, strides 2..32),
conv5/conv6 actives rescaled (x2 / x4) into the stride-8 grid and
concatenated onto conv4 with coinciding cells summed (bev_out), then a
dilating 3x3 sparse conv + a submanifold shared conv emit the final sparse
BEV list for VoxelNeXtHead — no dense BEV map.

TPU design: rides the windowed sparse pipeline with shape (1, ny, nx) and
(1, 3, 3) kernels throughout (same machinery as the 3D VoxelNeXt; pillar
ids are (y, x)-major guard-banded ids), fixed per-level capacities.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ...ops.sparse_ops import bev_merge
from .spconv_backbone import (
    MaskedBatchNorm,
    SparseConvParam,
    _SparseStack,
    conv_out_dim,
)

K2D = (1, 3, 3)


class VoxelResBackBone8xVoxelNeXt2D(_SparseStack):
    """Input: `pillar_features` (B, V, C) + `voxel_coords` (z ignored)."""

    residual: bool = True

    def setup(self):
        nx, ny, nz = (int(g) for g in self.grid_size)
        cfg = self.model_cfg
        chans = [int(c) for c in
                 cfg.get("CHANNELS", [32, 64, 128, 256, 256, 256])]
        self.chans = chans
        self.out_channels = int(cfg.get("OUT_CHANNEL", chans[3]))
        self.use_bias = bool(cfg.get("USE_BIAS", True))
        caps = cfg.get("LEVEL_CAPACITIES", None)
        c0 = int(cfg.get("MAX_VOXELS", 60000))
        if caps is None:
            caps = [c0, c0, c0 // 2, c0 // 4, c0 // 8, c0 // 16, c0 // 32]
        self.caps = [int(c) for c in caps]
        self.max_bev = int(cfg.get("MAX_BEV_VOXELS", self.caps[4] * 2))
        assert chans[3] == chans[4] == chans[5], (
            "conv4/5/6 channel counts must match for the multi-scale concat")

        shapes = [(1, ny, nx)]
        for _ in range(5):
            p = shapes[-1]
            shapes.append((1, conv_out_dim(p[1], 3, 2, 1),
                           conv_out_dim(p[2], 3, 2, 1)))
        self.level_shapes = shapes                 # strides 1..32
        self.bev_shape = (shapes[3][1], shapes[3][2])

        c1, c2, c3, c4, c5, c6 = chans
        # block counts per stage (spconv_backbone_voxelnext2d.py:81-129)
        nb = [int(x) for x in
              cfg.get("BLOCKS_PER_STAGE", [3, 4, 6, 3, 3, 3])]
        self.blocks1 = self._make_stage(c1, c1, first_stride=None, name=1,
                                        num_blocks=nb[0], kernel=K2D)
        self.blocks2 = self._make_stage(c1, c2, first_stride=(2, None),
                                        name=2, num_blocks=nb[1], kernel=K2D)
        self.blocks3 = self._make_stage(c2, c3, first_stride=(2, None),
                                        name=3, num_blocks=nb[2], kernel=K2D)
        self.blocks4 = self._make_stage(c3, c4, first_stride=(2, None),
                                        name=4, num_blocks=nb[3], kernel=K2D)
        self.blocks5 = self._make_stage(c4, c5, first_stride=(2, None),
                                        name=5, num_blocks=nb[4], kernel=K2D)
        self.blocks6 = self._make_stage(c5, c6, first_stride=(2, None),
                                        name=6, num_blocks=nb[5], kernel=K2D)

        self.w_out = SparseConvParam(c4, self.out_channels, kernel=K2D)
        self.bn_out = MaskedBatchNorm(self.out_channels)
        self.w_shared = SparseConvParam(self.out_channels, self.out_channels,
                                        kernel=K2D, use_bias=True)
        self.bn_shared = MaskedBatchNorm(self.out_channels)

    @property
    def num_point_features(self):
        return self.out_channels

    @property
    def num_bev_features(self):
        return self.out_channels

    def __call__(self, batch, train: bool):
        feats = batch.get("pillar_features", batch.get("voxel_features"))
        coords = batch["voxel_coords"].at[..., 0].set(0)
        valid = batch["voxel_mask"]
        assert feats.shape[-1] == self.chans[0], (
            "pillar VFE output must equal CHANNELS[0]")
        assert str(self.model_cfg.get("SUBM_MODE", "windowed")) \
            == "windowed", "VoxelNeXt2D runs the windowed pipeline only"
        s = self.level_shapes
        ovf_acc = []

        level = self._win_entry(coords, valid, feats, s[0], ovf_acc)
        level = self._blocks(self.blocks1, level, train, ovf_acc, kernel=K2D)

        multi_scale = {"x_conv1": level}
        levels = [None] * 7
        levels[1] = level
        blocks = [None, self.blocks1, self.blocks2, self.blocks3,
                  self.blocks4, self.blocks5, self.blocks6]
        for li in range(2, 7):
            level = self._down(level, blocks[li]["down"],
                               blocks[li]["down_bn"], train, s[li - 1],
                               self.caps[min(li, len(self.caps) - 1)],
                               ovf_acc, kernel=K2D, stride=(1, 2, 2),
                               padding=(0, 1, 1))
            level = self._blocks(blocks[li], level, train, ovf_acc,
                                 kernel=K2D)
            levels[li] = level
            if li <= 5:
                multi_scale[f"x_conv{li}"] = level

        def collect(level):
            _, (ids, c, v, f), _ = level
            return c, v, f

        c4, v4, f4 = collect(levels[4])
        c5, v5, f5 = collect(levels[5])
        c6, v6, f6 = collect(levels[6])
        bev_ids, bev_coords, bev_valid, bev_feats = jax.vmap(
            lambda a, b, c_, d, e, f_, g, h, i: bev_merge(
                [a, d, g], [b, e, h], [c_, f_, i], (1, 2, 4),
                self.bev_shape, self.max_bev,
            )
        )(c4, v4, f4, c5, v5, f5, c6, v6, f6)

        block = self._win_cfg()[0]
        v = bev_ids.shape[1]
        pad = (-v) % block
        if pad:
            bev_ids = jnp.concatenate(
                [bev_ids, bev_ids[:, -1:] + 1 + jnp.arange(pad)[None, :]],
                axis=1)
            bev_coords = jnp.pad(bev_coords, ((0, 0), (0, pad), (0, 0)),
                                 constant_values=-1)
            bev_valid = jnp.pad(bev_valid, ((0, 0), (0, pad)))
            bev_feats = jnp.pad(bev_feats, ((0, 0), (0, pad), (0, 0)))

        shape2d = (1,) + self.bev_shape
        level = ("win", (bev_ids, bev_coords, bev_valid, bev_feats), shape2d)
        level = self._down(level, self.w_out, self.bn_out, train, shape2d,
                           bev_ids.shape[1], ovf_acc, kernel=K2D,
                           stride=(1, 1, 1), padding=(0, 1, 1))
        level = self._subm(level, self.w_shared, self.bn_shared, train,
                           ovf_acc, kernel=K2D)

        ids, coords2d, valid2d, feats2d = level[1]
        batch["encoded_sparse_bev"] = {
            "ids": ids, "coords": coords2d, "valid": valid2d,
            "features": feats2d,
        }
        batch["encoded_sparse_bev_shape"] = self.bev_shape
        batch["encoded_spconv_tensor_stride"] = 8
        batch["multi_scale_2d_features"] = multi_scale
        batch["multi_scale_2d_strides"] = {
            "x_conv1": 1, "x_conv2": 2, "x_conv3": 4, "x_conv4": 8,
            "x_conv5": 16,
        }
        if ovf_acc:
            batch["sparse_window_overflow"] = sum(ovf_acc)
        return batch

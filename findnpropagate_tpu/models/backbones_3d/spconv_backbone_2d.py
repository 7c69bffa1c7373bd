"""PillarNet sparse 2D backbones (PillarBackBone8x / PillarRes18BackBone8x).

Behavioral parity with pcdet/models/backbones_3d/spconv_backbone_2d.py
:114-300 (/root/reference): four sparse 2D stages over the pillar BEV grid
(stride 1 -> 8; res variant uses SparseBasicBlocks), densified at stride 8,
plus a dense stride-16 conv5 stage; emits multi_scale_2d_features for
BaseBEVBackboneV1.

TPU design: the 2D sparse stages ride the same windowed machinery as the 3D
backbones with shape (1, ny, nx) and (1, 3, 3) kernels — pillar BEV ids are
plain (y, x)-major guard-banded ids.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .spconv_backbone import (
    MaskedBatchNorm,
    SparseConvParam,
    _SparseStack,
    conv_out_dim,
)


class PillarRes18BackBone8x(_SparseStack):
    residual: bool = True

    def setup(self):
        nx, ny, nz = (int(g) for g in self.grid_size)
        cfg = self.model_cfg
        self.use_bias = bool(cfg.get("USE_BIAS", self.residual))
        chans = [int(c) for c in cfg.get("CHANNELS", [32, 64, 128, 256, 256])]
        self.chans = chans
        caps = cfg.get("LEVEL_CAPACITIES", None)
        c0 = int(cfg.get("MAX_VOXELS", 60000))
        if caps is None:
            caps = [c0, c0, c0 // 2, c0 // 4]
        self.caps = [int(c) for c in caps]

        s1 = (1, ny, nx)
        shapes = [s1]
        for _ in range(3):
            p = shapes[-1]
            shapes.append((1, conv_out_dim(p[1], 3, 2, 1),
                           conv_out_dim(p[2], 3, 2, 1)))
        self.level_shapes = shapes  # strides 1, 2, 4, 8

        c1, c2, c3, c4, c5 = chans
        # true 2D kernels: 9-tap weights matching the (1, 3, 3) deltas the
        # forward passes to _subm/_down (the 3D default left 27-tap weights
        # against 9 deltas — reshape error at trace time)
        K2D = (1, 3, 3)
        self.blocks1 = self._make_stage(c1, c1, first_stride=None, name=1,
                                        kernel=K2D)
        self.blocks2 = self._make_stage(c1, c2, first_stride=(2, None),
                                        name=2, kernel=K2D)
        self.blocks3 = self._make_stage(c2, c3, first_stride=(2, None),
                                        name=3, kernel=K2D)
        self.blocks4 = self._make_stage(c3, c4, first_stride=(2, None),
                                        name=4, kernel=K2D)
        # dense stride-16 stage (conv5)
        self.conv5_down = nn.Conv(c5, (3, 3), strides=(2, 2), padding="SAME",
                                  use_bias=False)
        self.conv5_bn = nn.BatchNorm(epsilon=1e-3, momentum=0.99)
        self.conv5_res = [
            (nn.Conv(c5, (3, 3), padding="SAME", use_bias=False),
             nn.BatchNorm(epsilon=1e-3, momentum=0.99),
             nn.Conv(c5, (3, 3), padding="SAME", use_bias=False),
             nn.BatchNorm(epsilon=1e-3, momentum=0.99))
            for _ in range(2)
        ]
        self.num_point_features = c5

    @property
    def num_bev_features(self):
        return self.chans[4]

    def __call__(self, batch, train: bool):
        feats = batch["pillar_features"]      # (B, V, C)
        coords = batch["voxel_coords"]        # (B, V, 3) zyx (z==0 pillars)
        valid = batch["voxel_mask"]
        coords2d = coords.at[..., 0].set(0)
        s = self.level_shapes
        ovf = []

        level = self._win_entry(coords2d, valid, feats, s[0], ovf)
        level = self._blocks(self.blocks1, level, train, ovf,
                             kernel=(1, 3, 3))
        multi = {"x_conv1": level}
        blocks = {2: self.blocks2, 3: self.blocks3, 4: self.blocks4}
        for li in (2, 3, 4):
            level = self._down(level, blocks[li]["down"],
                               blocks[li]["down_bn"], train, s[li - 1],
                               self.caps[min(li, len(self.caps) - 1)], ovf,
                               kernel=(1, 3, 3), stride=(1, 2, 2),
                               padding=(0, 1, 1))
            level = self._blocks(blocks[li], level, train, ovf,
                                 kernel=(1, 3, 3))
            multi[f"x_conv{li}"] = level

        dense = self._to_dense(level)[1]      # (B, 1, ny8, nx8, C)
        x4 = dense[:, 0]                      # (B, ny8, nx8, C)
        x = nn.relu(self.conv5_bn(self.conv5_down(x4),
                                  use_running_average=not train))
        for c1m, b1m, c2m, b2m in self.conv5_res:
            idn = x
            y = nn.relu(b1m(c1m(x), use_running_average=not train))
            y = b2m(c2m(y), use_running_average=not train)
            x = nn.relu(y + idn)
        batch["multi_scale_2d_features"] = {
            **multi, "x_conv4_dense": x4, "x_conv5": x,
        }
        batch["spatial_features"] = x4
        batch["spatial_features_stride"] = 8
        if ovf:
            batch["sparse_window_overflow"] = sum(ovf)
        return batch


# non-res variant shares the machinery with plain conv stages
class PillarBackBone8x(PillarRes18BackBone8x):
    residual: bool = False

"""VoxelNeXt fully-sparse backbone (VoxelResBackBone8xVoxelNeXt).

Behavioral parity with pcdet/models/backbones_3d/spconv_backbone_voxelnext.py
:72-225 (/root/reference): the residual 8x stack extended with two extra
downsample stages (conv5 stride 16, conv6 stride 32), whose active voxels are
rescaled (x2 / x4) into the stride-8 grid and concatenated onto conv4's
active set; z is collapsed by summing features of coinciding BEV cells
(bev_out), then a sparse 3x3 2D conv (active-set dilation) + a submanifold
3x3 shared conv produce the final sparse BEV representation — no dense BEV
map is ever materialized.

TPU design: runs entirely on the repo's windowed sparse pipeline
(ops/sparse_ops.py). The BEV stage reuses the same 3D machinery with shape
(1, ny, nx): bev_merge emits a sorted fixed-capacity active list, the
dilating conv is win_downsample with stride 1, and the head's submanifold 2D
convs window the same id list. This is the most TPU-native detector in the
suite: the hot path is all slice-DMA + MXU matmuls over one compact list.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.sparse_ops import bev_merge
from .spconv_backbone import MaskedBatchNorm, SparseConvParam, _SparseStack, conv_out_dim


class VoxelResBackBone8xVoxelNeXt(_SparseStack):
    """Windowed-pipeline VoxelNeXt backbone. Requires SUBM_MODE 'windowed'
    (the head consumes the sparse active list; no dense fallback)."""

    residual: bool = True

    def setup(self):
        nx, ny, nz = (int(g) for g in self.grid_size)
        self.sparse_shape = (nz + 1, ny, nx)
        cfg = self.model_cfg
        chans = cfg.get("CHANNELS", [16, 32, 64, 128, 128])
        self.out_channels = int(cfg.get("OUT_CHANNEL", 128))
        self.use_bias = bool(cfg.get("USE_BIAS", True))
        caps = cfg.get("LEVEL_CAPACITIES", None)
        c0 = int(cfg.get("MAX_VOXELS", 60000))
        if caps is None:
            caps = [c0, c0, c0 // 2, c0 // 4, c0 // 8, c0 // 16, c0 // 32]
        self.caps = [int(c) for c in caps]
        self.max_bev = int(cfg.get("MAX_BEV_VOXELS", self.caps[4] * 2))
        self.chans = [int(c) for c in chans]
        assert self.chans[3] == self.chans[4], (
            "VoxelNeXt multi-scale concat stacks rows, so conv4/conv5/conv6 "
            "channel counts must match (reference default 128)")

        # strided convs: k3 s2 p1 by default; SPCONV_KERNEL_SIZES (the
        # ioubranch-large variant uses [5, 5, 3, 3]) widens the downsample
        # kernels of stages 2-5 (k s2 p=k//2 keeps the output shapes of the
        # k3 case — reference spconv_backbone_voxelnext.py:75,95-127)
        ks = [int(v) for v in cfg.get("SPCONV_KERNEL_SIZES", [3, 3, 3, 3])]
        self.down_kernels = ks + [3]          # stages 2..6
        shapes = [self.sparse_shape]
        for _ in range(5):
            shapes.append(tuple(conv_out_dim(n, 3, 2, 1) for n in shapes[-1]))
        self.level_shapes = shapes  # s1..s6
        self.bev_shape = (shapes[3][1], shapes[3][2])  # stride-8 (ny, nx)

        c1, c2, c3, c4, c5 = self.chans
        dk = [(k, k, k) for k in self.down_kernels]
        self.w_input = SparseConvParam(self.input_channels, c1)
        self.bn_input = MaskedBatchNorm(c1)
        self.blocks1 = self._make_stage(c1, c1, first_stride=None, name=1)
        self.blocks2 = self._make_stage(c1, c2, first_stride=(2, (1, 1, 1)), name=2, down_kernel=dk[0])
        self.blocks3 = self._make_stage(c2, c3, first_stride=(2, (1, 1, 1)), name=3, down_kernel=dk[1])
        self.blocks4 = self._make_stage(c3, c4, first_stride=(2, (1, 1, 1)), name=4, down_kernel=dk[2])
        self.blocks5 = self._make_stage(c4, c5, first_stride=(2, (1, 1, 1)), name=5, down_kernel=dk[3])
        self.blocks6 = self._make_stage(c5, c5, first_stride=(2, (1, 1, 1)), name=6, down_kernel=dk[4])

        # sparse 2D output stage (spconv_backbone_voxelnext.py:129-139)
        self.w_out = SparseConvParam(c4, self.out_channels, kernel=(1, 3, 3))
        self.bn_out = MaskedBatchNorm(self.out_channels)
        self.w_shared = SparseConvParam(self.out_channels, self.out_channels,
                                        kernel=(1, 3, 3), use_bias=True)
        self.bn_shared = MaskedBatchNorm(self.out_channels)

    @property
    def num_point_features(self):
        return self.out_channels

    @property
    def num_bev_features(self):
        return self.out_channels

    def __call__(self, batch, train: bool):
        feats = batch["voxel_features"]
        coords = batch["voxel_coords"]
        valid = batch["voxel_mask"]

        assert str(self.model_cfg.get("SUBM_MODE", "windowed")) == "windowed", \
            "VoxelNeXt runs on the windowed sparse pipeline only"
        s = self.level_shapes
        ovf_acc = []

        level = self._win_entry(coords, valid, feats, s[0], ovf_acc)
        level = self._subm(level, self.w_input, self.bn_input, train, ovf_acc)
        level = self._blocks(self.blocks1, level, train, ovf_acc)

        multi_scale = {"x_conv1": level}
        levels = [None] * 7
        blocks = [None, self.blocks1, self.blocks2, self.blocks3,
                  self.blocks4, self.blocks5, self.blocks6]
        for li in range(2, 7):
            dkn = self.down_kernels[li - 2]
            level = self._down(level, blocks[li]["down"],
                               blocks[li]["down_bn"], train, s[li - 1],
                               self.caps[min(li, len(self.caps) - 1)],
                               ovf_acc, kernel=(dkn, dkn, dkn),
                               padding=(dkn // 2,) * 3)
            level = self._blocks(blocks[li], level, train, ovf_acc)
            levels[li] = level
            if li <= 4:
                multi_scale[f"x_conv{li}"] = level

        # multi-scale concat + z collapse (bev_out)
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

        # pad the BEV list to a block multiple for the windowed convs
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

        # conv_out: sparse (dilating) 3x3 2D conv, stride 1
        level = self._down(level, self.w_out, self.bn_out, train, shape2d,
                           bev_ids.shape[1], ovf_acc, kernel=(1, 3, 3),
                           stride=(1, 1, 1), padding=(0, 1, 1))
        # shared_conv: submanifold 3x3 2D conv
        level = self._subm(level, self.w_shared, self.bn_shared, train,
                           ovf_acc, kernel=(1, 3, 3))

        ids, coords2d, valid2d, feats2d = level[1]
        batch["encoded_sparse_bev"] = {
            "ids": ids, "coords": coords2d, "valid": valid2d,
            "features": feats2d,
        }
        batch["encoded_sparse_bev_shape"] = self.bev_shape
        batch["encoded_spconv_tensor_stride"] = 8
        batch["multi_scale_3d_features"] = multi_scale
        if ovf_acc:
            batch["sparse_window_overflow"] = sum(ovf_acc)
        return batch

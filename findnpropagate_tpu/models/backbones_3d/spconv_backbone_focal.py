"""VoxelBackBone8xFocal — Focals Conv backbone (CVPR'22 Focal Sparse Conv).

Behavioral parity with pcdet/models/backbones_3d/spconv_backbone_focal.py:
101-248 and focal_sparse_conv/focal_sparse_conv.py:9-224 (/root/reference):
the plain VoxelBackBone8x topology (input subm; stage1 = one subm; stages
2-4 = strided down + two subm) with a FocalSparseConv closing stages 1-3.
Each focal conv predicts per-voxel cubic importances (a 3x3x3 subm conv
with K^3 output channels), splits voxels into foreground (top `THRESHOLD`
fraction by the center importance, or a hard threshold) and background,
DILATES the active set with zero-feature cells at the foreground voxels'
important kernel offsets, and then runs its main subm conv + BN + ReLU
over the enlarged set. Training adds a focal loss supervising the center
importance against voxel-center-in-gt-box targets (`loss_box_of_pts`).

TPU formulation: fixed-capacity active lists. Dilation is a sorted
merge/dedup/cap over guard-banded yxz ids (`ops/sparse_ops.focal_dilate`)
on the windowed path, and 26 mask shifts on the hybrid dense path
(numerically identical semantics: new cells carry zero features and only
matter as conv targets). The reference's TOPK mode takes the top
N*threshold of the dynamic voxel count; here the cut is the per-sample
masked quantile of the importance — the same selection at fixed shape.
The USE_IMG multimodal branch (DeepLab semantic features) is gated behind
IMAGE_BACKBONE-style configs and not replicated — the lidar-only focal
path is what the reference's shipped configs exercise.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.sparse_ops import (
    _kernel_offsets,
    focal_dilate,
    yxz_offset_deltas,
    yxz_sentinel_start,
)
from ...utils.geometry import points_in_boxes_mask
from ..blocks import MaskedBatchNorm
from .spconv_backbone import SparseConvParam, _SparseStack, conv_out_dim


def focal_importance_loss(mask_voxel, valid, targets, gamma: float = 2.0,
                          eps: float = 1e-7):
    """FocalLoss (focal_sparse_utils.py:7-37): 2-class softmax focal loss of
    the center importance vs in-gt-box targets, mean over ALL class slots of
    valid voxels (the reference's .mean() runs over an (N, 2) tensor)."""
    m = jnp.clip(mask_voxel, eps, 1.0 - eps)
    p_pos = m
    p_neg = 1.0 - m
    t = targets.astype(jnp.float32)
    loss_pos = -t * jnp.log(p_pos) * (1 - p_pos) ** gamma
    loss_neg = -(1 - t) * jnp.log(p_neg) * (1 - p_neg) ** gamma
    per = (loss_pos + loss_neg) / 2.0     # mean over the 2 class slots
    per = jnp.where(valid, per, 0.0)
    return jnp.sum(per) / jnp.clip(jnp.sum(valid), 1)


class VoxelBackBone8xFocal(_SparseStack):
    """Focal variant. Extra cfg keys: THRESHOLD (0.5), TOPK (True),
    MASK_MULTI (False), FOCAL_DILATE_FACTOR (1.5), plus the base stack's
    windowed/hybrid knobs. Requires `voxel_size`/`point_cloud_range` for
    the training-time importance loss."""

    residual: bool = False

    def setup(self):
        super().setup()
        c1, c2, c3 = self.chans[1], self.chans[2], self.chans[3]
        use_img = bool(self.model_cfg.get("USE_IMG", False))
        img_ch = int(self.model_cfg.get("IMAGE_CHANNEL", 3))
        focal = {}
        for idx, c in ((1, c1), (2, c2), (3, c3)):
            cin_imp = c + (img_ch if use_img else 0)
            focal[f"f{idx}_imp"] = SparseConvParam(cin_imp, 27)
            focal[f"f{idx}_conv"] = SparseConvParam(c, c)
            focal[f"f{idx}_bn"] = MaskedBatchNorm(c)
        self.focal_mods = focal

    @property
    def num_point_features(self):
        return self.out_channels

    def _focal_cfg(self):
        cfg = self.model_cfg
        return (float(cfg.get("THRESHOLD", 0.5)),
                bool(cfg.get("TOPK", True)),
                bool(cfg.get("MASK_MULTI", False)),
                float(cfg.get("FOCAL_DILATE_FACTOR", 1.5)))

    def _fg_mask(self, mask_voxel, valid):
        """Foreground selection (split_voxels:110-117): TOPK keeps the top
        `threshold` fraction of valid voxels (masked-quantile cut at fixed
        shape); otherwise a hard threshold."""
        threshold, topk, _, _ = self._focal_cfg()
        if topk:
            mv = jnp.where(valid, mask_voxel, -jnp.inf)
            n_valid = jnp.clip(jnp.sum(valid), 1)
            k = jnp.clip((n_valid * threshold).astype(jnp.int32), 1)
            sorted_mv = jnp.sort(mv)[::-1]
            cut = sorted_mv[jnp.clip(k - 1, 0, mv.shape[0] - 1)]
            return valid & (mask_voxel >= cut)
        return valid & (mask_voxel > threshold)

    def _img_feats_at(self, batch, coords, stage_stride):
        """USE_IMG multimodal branch (reference
        focal_sparse_conv.py:60-118 construct_multimodal_features): voxel
        centers projected through the KITTI calib, image features sampled
        bilinearly at the projections (out-of-view -> 0). The reference
        samples pretrained-DeepLab features; this environment has no such
        checkpoint, so the sampled features are the raw RGB planes
        (image_channel=3, the reference's default) — same fusion topology,
        weights learned from scratch."""
        imgs = batch["images"]                    # (B, H, W, 3)
        l2c = batch["trans_lidar_to_cam"]         # (B, 4, 4)
        c2i = batch["trans_cam_to_img"]           # (B, 3, 4)
        h, w = imgs.shape[1], imgs.shape[2]

        def one(img, l2c_i, c2i_i, coords_i):
            ctr = self._voxel_centers(coords_i, stage_stride)     # (V, 3)
            ones = jnp.ones((ctr.shape[0], 1), jnp.float32)
            cam = (jnp.concatenate([ctr, ones], -1) @ l2c_i.T)[:, :3]
            uvw = cam @ c2i_i[:, :3].T + c2i_i[:, 3]
            depth = jnp.clip(uvw[:, 2], 1e-3)
            u = uvw[:, 0] / depth
            v = uvw[:, 1] / depth
            inview = ((uvw[:, 2] > 0.1) & (u >= 0) & (u < w - 1)
                      & (v >= 0) & (v < h - 1))
            u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, w - 2)
            v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, h - 2)
            du = jnp.clip(u - u0, 0.0, 1.0)[:, None]
            dv = jnp.clip(v - v0, 0.0, 1.0)[:, None]
            f00 = img[v0, u0]
            f01 = img[v0, u0 + 1]
            f10 = img[v0 + 1, u0]
            f11 = img[v0 + 1, u0 + 1]
            f = (f00 * (1 - du) * (1 - dv) + f01 * du * (1 - dv)
                 + f10 * (1 - du) * dv + f11 * du * dv)
            return jnp.where(inview[:, None], f, 0.0)

        return jax.vmap(one)(imgs.astype(jnp.float32), l2c, c2i, coords)

    def _voxel_centers(self, coords, stage_stride):
        """Voxel centers in world coords (focal_sparse_conv.py:203-204:
        spatial indices scaled back to the full-resolution grid)."""
        vx, vy, vz = (float(v) for v in self.voxel_size)
        pcr = self.point_cloud_range
        x = coords[:, 2].astype(jnp.float32) * stage_stride * vx + float(pcr[0])
        y = coords[:, 1].astype(jnp.float32) * stage_stride * vy + float(pcr[1])
        z = coords[:, 0].astype(jnp.float32) * stage_stride * vz + float(pcr[2])
        return jnp.stack([x, y, z], axis=-1)

    def _focal(self, level, idx, stage_stride, train, ovf_acc, batch,
               loss_acc):
        threshold, _, mask_multi, dilate_factor = self._focal_cfg()
        imp_mod = self.focal_mods[f"f{idx}_imp"]
        conv_mod = self.focal_mods[f"f{idx}_conv"]
        bn_mod = self.focal_mods[f"f{idx}_bn"]
        w_imp, _ = imp_mod()

        kind, a, m = level
        if kind == "win":
            ids, coords, valid, feats = a
            shape = m
            block, window, _, prec = self._win_cfg()
            deltas = jnp.asarray(yxz_offset_deltas((3, 3, 3), shape))
            sent = yxz_sentinel_start(shape)
            imp_in = feats
            if bool(self.model_cfg.get("USE_IMG", False)):
                img_ch = int(self.model_cfg.get("IMAGE_CHANNEL", 3))
                if "images" in batch:
                    img_f = self._img_feats_at(batch, coords, stage_stride)
                    img_f = jnp.where(valid[..., None], img_f, 0.0)
                else:
                    # image-less batches (e.g. lidar-only eval) still run
                    # the multimodal weights with zeroed image planes
                    img_f = jnp.zeros(
                        feats.shape[:-1] + (img_ch,), feats.dtype)
                imp_in = jnp.concatenate([feats, img_f], axis=-1)
            imp, ovf = jax.vmap(
                lambda i, f: self._win_conv(
                    i, f, i, w_imp, deltas, block, window, prec, sent, train)
            )(ids, imp_in)
            ovf_acc.append(jnp.sum(ovf))
            imp = jax.nn.sigmoid(imp)                    # (B, V, 27)
            mask_voxel = imp[..., -1]
            mask_kernel = imp[..., :-1]

            if train and "gt_boxes" in batch:
                centers = jax.vmap(
                    lambda c: self._voxel_centers(c, stage_stride))(coords)
                tgt = jax.vmap(
                    lambda p, bx: jnp.any(
                        points_in_boxes_mask(p, bx[:, :7])
                        & (bx[:, 3] > 0)[:, None], axis=0)
                )(centers, jnp.asarray(batch["gt_boxes"][..., :-1]))
                loss_acc.append(jax.vmap(focal_importance_loss)(
                    mask_voxel, valid, tgt).mean())

            if mask_multi:
                feats = feats * mask_voxel[..., None]
            fg = jax.vmap(self._fg_mask)(mask_voxel, valid)
            cand = fg[..., None] & (mask_kernel >= threshold)

            cap = ids.shape[1]
            new_cap = -(-int(cap * dilate_factor) // block) * block
            nids, ncoords, nvalid, nfeats = jax.vmap(
                lambda i, f, cm: focal_dilate(i, f, cm, shape, new_cap)
            )(ids, feats, cand)
            level = ("win", (nids, ncoords, nvalid, nfeats), shape)
            return self._subm(level, conv_mod, bn_mod, train, ovf_acc)

        if kind == "dense":
            x, mask = a, m
            imp = self._dense_conv(x, w_imp, None, (3, 3, 3), (1, 1, 1),
                                   (1, 1, 1))
            imp = jax.nn.sigmoid(jnp.where(mask[..., None], imp, 0.0))
            mask_voxel = imp[..., -1]
            mask_kernel = imp[..., :-1]

            if train and "gt_boxes" in batch:
                b, nz, ny, nx = mask.shape
                zz, yy, xx = jnp.meshgrid(
                    jnp.arange(nz), jnp.arange(ny), jnp.arange(nx),
                    indexing="ij")
                coords = jnp.stack(
                    [zz.reshape(-1), yy.reshape(-1), xx.reshape(-1)], -1)
                centers = self._voxel_centers(coords, stage_stride)
                tgt = jax.vmap(
                    lambda bx: jnp.any(
                        points_in_boxes_mask(centers, bx[:, :7])
                        & (bx[:, 3] > 0)[:, None], axis=0)
                )(jnp.asarray(batch["gt_boxes"][..., :-1]))
                loss_acc.append(jax.vmap(focal_importance_loss)(
                    mask_voxel.reshape(b, -1), mask.reshape(b, -1),
                    tgt).mean())

            if self._focal_cfg()[2]:  # mask_multi
                x = x * mask_voxel[..., None]
            fg = jax.vmap(self._fg_mask)(
                mask_voxel.reshape(mask.shape[0], -1),
                mask.reshape(mask.shape[0], -1),
            ).reshape(mask.shape)

            offs = np.asarray(_kernel_offsets((3, 3, 3)))
            keep = ~np.all(offs == 0, axis=1)
            offs = offs[keep]
            new_mask = mask
            for k, (dz, dy, dx) in enumerate(offs):
                sel = fg & (mask_kernel[..., k] >= threshold)
                shifted = jnp.roll(sel, (int(dz), int(dy), int(dx)),
                                   axis=(1, 2, 3))
                # roll wraps; zero the wrapped border slabs
                if dz:
                    shifted = shifted.at[:, 0 if dz > 0 else -1].set(False)
                if dy:
                    shifted = shifted.at[:, :, 0 if dy > 0 else -1].set(False)
                if dx:
                    shifted = shifted.at[:, :, :, 0 if dx > 0 else -1].set(
                        False)
                new_mask = new_mask | shifted
            level = ("dense", jnp.where(new_mask[..., None], x, 0.0),
                     new_mask)
            return self._subm(level, conv_mod, bn_mod, train, ovf_acc)

        raise NotImplementedError(
            "FocalSparseConv needs SUBM_MODE=windowed or a dense level "
            "(set DENSE_FROM_LEVEL)")

    def __call__(self, batch, train: bool):
        feats = batch["voxel_features"]
        coords = batch["voxel_coords"]
        valid = batch["voxel_mask"]

        s1, s2, s3, s4, s_out = self.level_shapes
        dense_from = int(self.model_cfg.get("DENSE_FROM_LEVEL", 1))
        windowed = str(self.model_cfg.get("SUBM_MODE", "windowed")) \
            == "windowed"
        ovf_acc = []
        loss_acc = []

        if windowed:
            level = self._win_entry(coords, valid, feats, s1, ovf_acc)
        else:
            raise NotImplementedError(
                "VoxelBackBone8xFocal runs the windowed/hybrid pipeline "
                "(SUBM_MODE=windowed)")
        if dense_from <= 0:
            level = self._to_dense(level)

        level = self._subm(level, self.w_input, self.bn_input, train, ovf_acc)
        # stage 1: one subm block + focal (spconv_backbone_focal.py:158-161)
        level = self._subm(level, self.blocks1["conv0"], self.blocks1["bn0"],
                           train, ovf_acc)
        level = self._focal(level, 1, 1, train, ovf_acc, batch, loss_acc)
        lvl1 = level

        level = self._down(level, self.blocks2["down"],
                           self.blocks2["down_bn"], train, s2, self.caps[2],
                           ovf_acc, dense_out=dense_from <= 1)
        level = self._blocks(self.blocks2, level, train, ovf_acc)
        level = self._focal(level, 2, 2, train, ovf_acc, batch, loss_acc)
        lvl2 = level

        level = self._down(level, self.blocks3["down"],
                           self.blocks3["down_bn"], train, s3, self.caps[3],
                           ovf_acc, dense_out=dense_from <= 2)
        level = self._blocks(self.blocks3, level, train, ovf_acc)
        level = self._focal(level, 3, 4, train, ovf_acc, batch, loss_acc)
        lvl3 = level

        level = self._down(level, self.blocks4["down"],
                           self.blocks4["down_bn"], train, s4, self.caps[4],
                           ovf_acc, padding=(0, 1, 1),
                           dense_out=dense_from <= 3)
        level = self._blocks(self.blocks4, level, train, ovf_acc)
        lvl4 = level

        level = self._down(level, self.w_out, self.bn_out, train, s_out,
                           self.caps[4], ovf_acc, kernel=(3, 1, 1),
                           stride=(2, 1, 1), padding=(0, 0, 0),
                           dense_out=dense_from <= 4)

        level = self._to_dense(level)
        batch["encoded_spconv_tensor"] = level[1]
        batch["encoded_spconv_tensor_stride"] = 8
        batch["multi_scale_3d_features"] = {
            "x_conv1": lvl1, "x_conv2": lvl2, "x_conv3": lvl3, "x_conv4": lvl4,
        }
        if ovf_acc:
            batch["sparse_window_overflow"] = sum(ovf_acc)
        if loss_acc:
            # loss_box_of_pts (spconv_backbone_focal.py:243): summed over
            # the focal convs, composed into the total by the detector
            batch["loss_box_of_pts"] = sum(loss_acc)
        return batch

"""DepthLSSTransform — lift-splat-shoot with point-depth assistance.

Behavioral parity with pcdet/models/view_transforms/depth_lss.py:15-257
(/root/reference, the BEVFusion LSS): a sparse lidar-depth map is rasterized
per camera and encoded (dtransform); depthnet predicts D depth bins + C
context channels; the frustum grid (image u/v x depth bins) is lifted to
lidar via camera2lidar o K^-1 (undoing image augs first); outer product of
softmax depth x context splats through bev_pool into the dense BEV grid.

TPU design: the per-sample python rasterization loop becomes one vmapped
masked scatter; bev_pool is a single deterministic XLA scatter-add
(ops/bev_pool.py); all shapes static.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.bev_pool import bev_pool


class DepthLSSTransform(nn.Module):
    model_cfg: Any

    def setup(self):
        cfg = self.model_cfg
        self.image_size = tuple(int(v) for v in cfg["IMAGE_SIZE"])
        self.feature_size = tuple(int(v) for v in cfg["FEATURE_SIZE"])
        self.xbound = [float(v) for v in cfg["XBOUND"]]
        self.ybound = [float(v) for v in cfg["YBOUND"]]
        self.zbound = [float(v) for v in cfg["ZBOUND"]]
        self.dbound = [float(v) for v in cfg["DBOUND"]]
        self.C = int(cfg["OUT_CHANNEL"])
        self.D = int(round((self.dbound[1] - self.dbound[0]) / self.dbound[2]))
        self.nx = int(round((self.xbound[1] - self.xbound[0]) / self.xbound[2]))
        self.ny = int(round((self.ybound[1] - self.ybound[0]) / self.ybound[2]))
        self.nz = int(round((self.zbound[1] - self.zbound[0]) / self.zbound[2]))
        self.downsample_factor = int(cfg.get("DOWNSAMPLE", 1))

        def conv_bn(ch, k, s=1):
            return (nn.Conv(ch, (k, k), strides=(s, s), padding="SAME"),
                    nn.BatchNorm())

        self.dt_layers = [conv_bn(8, 1), conv_bn(32, 5, 4), conv_bn(64, 5, 2)]
        self.dn_layers = [conv_bn(int(cfg["IN_CHANNEL"]), 3),
                          conv_bn(int(cfg["IN_CHANNEL"]), 3)]
        self.dn_out = nn.Conv(self.D + self.C, (1, 1))
        if self.downsample_factor > 1:
            self.ds_layers = [conv_bn(self.C, 3), conv_bn(self.C, 3, 2),
                              conv_bn(self.C, 3)]

    def frustum(self):
        """(D, fH, fW, 3) [u, v, depth] (create_frustum)."""
        ih, iw = self.image_size
        fh, fw = self.feature_size
        ds = np.arange(self.dbound[0], self.dbound[1], self.dbound[2])
        xs = np.linspace(0, iw - 1, fw)
        ys = np.linspace(0, ih - 1, fh)
        g = np.zeros((len(ds), fh, fw, 3), np.float32)
        g[..., 0] = xs[None, None, :]
        g[..., 1] = ys[None, :, None]
        g[..., 2] = ds[:, None, None]
        return jnp.asarray(g)

    def get_geometry(self, c2l, intr, img_aug, lidar_aug):
        """Per camera: frustum (D, fH, fW, 3) -> lidar xyz.
        c2l/intr/img_aug (4, 4); lidar_aug (4, 4)."""
        f = self.frustum()
        pts = f - img_aug[:3, 3]
        pts = jnp.einsum("ij,dhwj->dhwi", jnp.linalg.inv(img_aug[:3, :3]),
                         pts)
        pts = jnp.concatenate(
            [pts[..., :2] * pts[..., 2:3], pts[..., 2:3]], -1)
        combine = c2l[:3, :3] @ jnp.linalg.inv(intr[:3, :3])
        pts = jnp.einsum("ij,dhwj->dhwi", combine, pts) + c2l[:3, 3]
        pts = jnp.einsum("ij,dhwj->dhwi", lidar_aug[:3, :3], pts) \
            + lidar_aug[:3, 3]
        return pts

    def rasterize_depth(self, points, points_mask, l2i, img_aug, lidar_aug):
        """Sparse per-camera depth map from lidar points (forward:205-244).
        points (P, 3); l2i/img_aug (NCAM, 4, 4). Returns (NCAM, H, W, 1)."""
        ih, iw = self.image_size
        pts = points - lidar_aug[:3, 3]
        pts = jnp.einsum("ij,pj->pi", jnp.linalg.inv(lidar_aug[:3, :3]), pts)
        cam = jnp.einsum("nij,pj->npi", l2i[:, :3, :3], pts) + \
            l2i[:, None, :3, 3]
        dist = cam[..., 2]
        z = jnp.clip(dist, 1e-5, 1e5)
        uv1 = jnp.concatenate([cam[..., :2] / z[..., None],
                               jnp.ones_like(z)[..., None]], -1)
        uv = jnp.einsum("nij,npj->npi", img_aug[:, :3, :3], uv1) + \
            img_aug[:, None, :3, 3]
        u = uv[..., 0]
        v = uv[..., 1]
        on = (points_mask[None] & (dist > 0)
              & (u >= 0) & (u < iw) & (v >= 0) & (v < ih))
        ui = jnp.clip(u.astype(jnp.int32), 0, iw - 1)
        vi = jnp.clip(v.astype(jnp.int32), 0, ih - 1)
        flat = jnp.where(on, vi * iw + ui, ih * iw)

        def one(flat_c, dist_c):
            d = jnp.zeros((ih * iw + 1,), jnp.float32)
            # last-writer-wins like the reference's index assignment
            d = d.at[flat_c].max(jnp.where(flat_c < ih * iw, dist_c, 0.0))
            return d[:-1].reshape(ih, iw, 1)

        return jax.vmap(one)(flat, dist)

    def _stack(self, layers, x, train):
        for conv, bn in layers:
            x = conv(x)
            x = bn(x, use_running_average=not train)
            x = nn.relu(x)
        return x

    def __call__(self, batch, train: bool):
        feats = batch["image_fpn"][0]            # (B*N, fH, fW, C_in)
        b_n = feats.shape[0]
        ncam = batch["camera2lidar"].shape[1]
        b = b_n // ncam

        lidar_aug = batch.get("lidar_aug_matrix")
        if lidar_aug is None:
            lidar_aug = jnp.broadcast_to(jnp.eye(4), (b, 4, 4))
        img_aug = batch.get("img_aug_matrix")
        if img_aug is None:
            img_aug = jnp.broadcast_to(jnp.eye(4), (b, ncam, 4, 4))

        depth = jax.vmap(
            lambda p, m, l2i, ia, la: self.rasterize_depth(p, m, l2i, ia, la)
        )(batch["points"][..., :3], batch["points_mask"],
          batch["lidar2image"], img_aug, lidar_aug)   # (B, N, H, W, 1)

        d = depth.reshape((b_n,) + depth.shape[2:])
        d = self._stack(self.dt_layers, d, train)
        x = jnp.concatenate([d, feats], axis=-1)
        x = self._stack(self.dn_layers, x, train)
        x = self.dn_out(x)                        # (B*N, fH, fW, D+C)
        depth_probs = jax.nn.softmax(x[..., : self.D], axis=-1)
        ctx = x[..., self.D:]
        lifted = depth_probs[..., None] * ctx[..., None, :]
        # (B*N, fH, fW, D, C) -> (B, N, D, fH, fW, C)
        fh, fw = self.feature_size
        lifted = lifted.reshape(b, ncam, fh, fw, self.D, self.C)
        lifted = jnp.transpose(lifted, (0, 1, 4, 2, 3, 5))

        geom = jax.vmap(jax.vmap(
            lambda c2l, intr, ia, la: self.get_geometry(c2l, intr, ia, la),
            in_axes=(0, 0, 0, None)), in_axes=(0, 0, 0, 0))(
            batch["camera2lidar"], batch["camera_intrinsics"], img_aug,
            lidar_aug)                            # (B, N, D, fH, fW, 3)

        dx = jnp.asarray([self.xbound[2], self.ybound[2], self.zbound[2]])
        lo = jnp.asarray([self.xbound[0], self.ybound[0], self.zbound[0]])
        cell = jnp.floor((geom - lo) / dx).astype(jnp.int32)

        def pool_one(cells, f):
            n = cells.reshape(-1, 3)
            return bev_pool(f.reshape(-1, self.C), n,
                            jnp.ones(n.shape[0], bool),
                            self.nx, self.ny, self.nz)

        bev = jax.vmap(pool_one)(cell, lifted)    # (B, ny, nx, nz*C)
        if self.downsample_factor > 1:
            bev = self._stack(self.ds_layers, bev, train)
        batch["spatial_features_img"] = bev
        return batch

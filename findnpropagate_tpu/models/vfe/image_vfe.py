"""ImageVFE — CaDDN's camera-only voxel feature encoder.

Behavioral parity with pcdet/models/backbones_3d/vfe/image_vfe.py and its
modules (/root/reference: image_vfe_modules/ffn/* depth FFN,
image_vfe_modules/f2v/frustum_grid_generator.py + frustum_to_voxel.py +
sampler.py): an image encoder predicts per-pixel depth-bin logits; frustum
features = channel features x softmax depth distribution; every lidar voxel
center is projected into the camera (trans_lidar_to_cam / trans_cam_to_img),
its continuous depth mapped to a bin by the LID/UD/SID discretization
(transform_utils.bin_depths:56-92), and the frustum grid is sampled
trilinearly at (u, v, depth-bin).

TPU design: the grid_sample becomes an explicit gather-lerp over the static
frustum tensor; the DDN backbone (DeepLab-ResNet101 in the reference) is a
configurable conv encoder — checkpoint import can overlay pretrained
weights, and the depth-distribution semantics are identical.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def bin_depths(depth, mode, depth_min, depth_max, num_bins,
               with_valid=False):
    """Continuous depth -> fractional bin index (transform_utils.py:56-92).

    with_valid: also return the domain mask. The reference's torch code
    produces NaN for depths outside the discretization's domain (sqrt/log
    of a negative) which grid_sample then silently zero-pads; under jax
    a NaN index would poison GRADIENTS through the untaken branch of the
    sampler's `where`, so the domain is clamped here and callers mask with
    `valid` instead."""
    if mode == "UD":
        bin_size = (depth_max - depth_min) / num_bins
        idx = (depth - depth_min) / bin_size
        valid = jnp.ones_like(depth, bool)
    elif mode == "LID":
        bin_size = 2 * (depth_max - depth_min) / (num_bins * (1 + num_bins))
        arg = 1 + 8 * (depth - depth_min) / bin_size
        valid = arg > 0
        idx = -0.5 + 0.5 * jnp.sqrt(jnp.maximum(arg, 1e-6))
    elif mode == "SID":
        valid = depth > -1
        idx = num_bins * (
            jnp.log1p(jnp.maximum(depth, -1 + 1e-6)) - np.log(1 + depth_min)
        ) / (np.log(1 + depth_max) - np.log(1 + depth_min))
    else:
        raise NotImplementedError(mode)
    return (idx, valid) if with_valid else idx


class ImageVFE(nn.Module):
    model_cfg: Any
    num_point_features: int = 0
    voxel_size: tuple = ()
    point_cloud_range: tuple = ()
    grid_size: tuple = ()

    @property
    def output_dim(self):
        return int(self.model_cfg["FFN"].get("CHANNELS", 32))

    @nn.compact
    def __call__(self, batch, train: bool):
        cfg = self.model_cfg
        disc = cfg["DISC_CFG"]
        d_min = float(disc["depth_min"])
        d_max = float(disc["depth_max"])
        num_bins = int(disc["num_bins"])
        mode = str(disc.get("mode", "LID"))
        ch = int(cfg["FFN"].get("CHANNELS", 32))
        stride = int(cfg["FFN"].get("STRIDE", 4))

        imgs = batch["camera_imgs"]
        if imgs.ndim == 5:           # (B, 1, H, W, 3) single camera
            imgs = imgs[:, 0]
        x = imgs
        s = 1
        while s < stride:
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME",
                        use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.relu(x)
            s *= 2
        x = nn.Conv(ch, (3, 3), padding="SAME", use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        feats = nn.relu(x)                       # (B, h, w, C)
        depth_logits = nn.Conv(num_bins + 1, (1, 1),
                               name="depth_head")(feats)
        batch["depth_logits"] = depth_logits     # (+1 = out-of-range bin)
        probs = jax.nn.softmax(depth_logits, axis=-1)[..., :num_bins]
        frustum = feats[..., None, :] * probs[..., None]  # (B, h, w, D, C)

        # voxel centers -> camera
        nx, ny, nz = (int(g) for g in self.grid_size)
        vs = self.voxel_size
        pcr = self.point_cloud_range
        xs = (np.arange(nx) + 0.5) * vs[0] + pcr[0]
        ys = (np.arange(ny) + 0.5) * vs[1] + pcr[1]
        zs = (np.arange(nz) + 0.5) * vs[2] + pcr[2]
        gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
        centers = jnp.asarray(
            np.stack([gx, gy, gz], -1).reshape(-1, 3), jnp.float32)

        l2c = batch["trans_lidar_to_cam"]        # (B, 4, 4)
        c2i = batch["trans_cam_to_img"]          # (B, 3, 4)
        h_f, w_f = feats.shape[1:3]

        def sample_one(fr, l2c_b, c2i_b):
            cam = centers @ l2c_b[:3, :3].T + l2c_b[:3, 3]
            proj = cam @ c2i_b[:3, :3].T + c2i_b[:3, 3]
            depth = proj[:, 2]
            u = proj[:, 0] / jnp.clip(depth, 1e-5)
            v = proj[:, 1] / jnp.clip(depth, 1e-5)
            uf = u / stride - 0.5
            vf = v / stride - 0.5
            df, dok = bin_depths(depth, mode, d_min, d_max, num_bins,
                                 with_valid=True)
            ok = (dok & (depth > 0) & (uf > -1) & (uf < w_f) & (vf > -1)
                  & (vf < h_f) & (df > -1) & (df < num_bins))

            def lerp_axis(f):
                f0 = jnp.floor(f).astype(jnp.int32)
                return f0, f - f0

            u0, ua = lerp_axis(uf)
            v0, va = lerp_axis(vf)
            d0, da = lerp_axis(df)
            out = 0.0
            for dv, wv in ((0, 1 - va), (1, va)):
                for du, wu in ((0, 1 - ua), (1, ua)):
                    for dd, wd in ((0, 1 - da), (1, da)):
                        vi = jnp.clip(v0 + dv, 0, h_f - 1)
                        ui = jnp.clip(u0 + du, 0, w_f - 1)
                        di = jnp.clip(d0 + dd, 0, num_bins - 1)
                        out = out + fr[vi, ui, di] * (
                            wv * wu * wd)[:, None]
            out = jnp.where(ok[:, None], out, 0.0)
            return out.reshape(nx, ny, nz, -1)

        vox = jax.vmap(sample_one)(frustum, l2c, c2i)  # (B, nx, ny, nz, C)
        # dense voxel volume in (B, nz, ny, nx, C) like HeightCompression's
        # input convention
        batch["voxel_features_dense"] = jnp.transpose(vox, (0, 3, 2, 1, 4))
        return batch


def ddn_loss(out_batch, model_cfg):
    """Depth-distribution supervision (image_vfe.get_loss + ddn_loss/*,
    /root/reference): per-pixel focal cross-entropy between the predicted
    depth-bin logits and the binned lidar depth. The reference reads
    precomputed depth maps; here the sparse target rasterizes from the
    batch's lidar points (pixels with no return carry zero weight)."""
    import jax
    import jax.numpy as jnp

    cfg = model_cfg
    disc = cfg["DISC_CFG"]
    d_min, d_max = float(disc["depth_min"]), float(disc["depth_max"])
    num_bins = int(disc["num_bins"])
    mode = str(disc.get("mode", "LID"))
    stride = int(cfg["FFN"].get("STRIDE", 4))
    w_depth = float(cfg.get("LOSS", {}).get("WEIGHT", 3.0))
    gamma = float(cfg.get("LOSS", {}).get("GAMMA", 2.0))

    logits = out_batch["depth_logits"]          # (B, h, w, D+1)
    b, h, w, _ = logits.shape
    pts = out_batch["points"][..., :3]
    pmask = out_batch["points_mask"]
    l2c = out_batch["trans_lidar_to_cam"]
    c2i = out_batch["trans_cam_to_img"]

    def target_one(p, m, l2c_b, c2i_b):
        cam = p @ l2c_b[:3, :3].T + l2c_b[:3, 3]
        proj = cam @ c2i_b[:3, :3].T + c2i_b[:3, 3]
        depth = proj[:, 2]
        u = (proj[:, 0] / jnp.clip(depth, 1e-5) / stride).astype(jnp.int32)
        v = (proj[:, 1] / jnp.clip(depth, 1e-5) / stride).astype(jnp.int32)
        ok = m & (depth > 0) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
        idx, iok = bin_depths(depth, mode, d_min, d_max, num_bins,
                              with_valid=True)
        tgt_bin = jnp.clip(jnp.floor(idx), 0, num_bins).astype(jnp.int32)
        tgt_bin = jnp.where(~iok | (idx < 0) | (idx > num_bins), num_bins,
                            tgt_bin)
        flat = jnp.where(ok, v * w + u, h * w)
        # nearest (min-depth) return wins per pixel
        depth_map = jnp.full((h * w + 1,), jnp.inf).at[flat].min(
            jnp.where(ok, depth, jnp.inf))
        bin_map = jnp.full((h * w + 1,), num_bins, jnp.int32).at[flat].min(
            jnp.where(ok, tgt_bin, num_bins))
        has = jnp.isfinite(depth_map[:-1])
        return bin_map[:-1].reshape(h, w), has.reshape(h, w)

    tgt, has = jax.vmap(target_one)(pts, pmask, l2c, c2i)
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    onehot = jax.nn.one_hot(tgt, num_bins + 1)
    ce = -jnp.sum(onehot * logp, axis=-1)
    pt = jnp.sum(onehot * p, axis=-1)
    # max(0): 1 - pt can round slightly negative, and a negative base with
    # a float exponent is NaN
    focal = (jnp.maximum(1 - pt, 0.0) ** gamma) * ce
    loss = jnp.sum(focal * has) / jnp.clip(jnp.sum(has), 1.0) * w_depth
    return loss, {"depth_loss": loss}

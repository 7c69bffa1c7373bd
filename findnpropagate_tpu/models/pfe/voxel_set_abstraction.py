"""VoxelSetAbstraction — PV-RCNN keypoint feature extraction.

Parity target: pcdet/models/backbones_3d/pfe/voxel_set_abstraction.py
(/root/reference): FPS keypoints from raw points, multi-scale set
abstraction (MSG ball query + shared MLP + max pool) over raw points and
the sparse-conv feature levels, plus bilinear BEV interpolation; outputs
fused keypoint features for the PVRCNN ROI head and the pre-fusion features
for PointHeadSimple.

TPU design: fixed keypoint/voxel capacities; ball queries are full
(K x V) distance programs (ops/pointnet2) — fine at the KITTI-scale caps
PV-RCNN uses; sparse levels come from the windowed backbone's native
(coords, valid, feats) form (dense hybrid levels are compacted by top_k).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.pointnet2 import farthest_point_sample, query_and_group
from ..blocks import MaskedBatchNorm


def level_actives(level, cap: int):
    """Any backbone level -> (coords (B, V, 3) zyx, feats (B, V, C),
    valid (B, V)) with V <= cap (top_k compaction for dense levels)."""
    kind = level[0]
    if kind == "win":
        (_ids, coords, valid, feats), _shape = level[1], level[2]
        return coords, feats, valid
    if kind == "sparse":
        grids, feats = level[1], level[2]
        return grids.coords, feats, grids.valid
    # dense: (B, nz, ny, nx, C) + mask
    x, mask = level[1], level[2]
    b, nz, ny, nx, c = x.shape
    flat = x.reshape(b, -1, c)
    m = mask.reshape(b, -1)
    key = jnp.where(m, 1.0, 0.0)
    _, idx = jax.lax.top_k(key, min(cap, key.shape[1]))  # active-first
    lin = idx
    z = lin // (ny * nx)
    rem = lin % (ny * nx)
    y = rem // nx
    xx = rem % nx
    coords = jnp.stack([z, y, xx], axis=-1).astype(jnp.int32)
    feats = jnp.take_along_axis(flat, idx[..., None], axis=1)
    valid = jnp.take_along_axis(m, idx, axis=1)
    return coords, feats, valid


class SALayer(nn.Module):
    """MSG set abstraction: per radius, ball query + shared MLP + max.

    BATCHED module: flax layers run on (B, K, S, C) tensors; only the pure
    grouping primitive is vmapped (flax submodules must not be called under
    plain jax.vmap — leaked-tracer hazard)."""

    mlps: tuple          # ((c1, c2), (c1, c2)) per radius group
    radii: tuple
    nsamples: tuple

    @nn.compact
    def __call__(self, kp_xyz, kp_valid, src_xyz, src_valid, src_feats,
                 train: bool):
        """kp (B, K, 3); src (B, V, 3); src_feats (B, V, C) or None.
        Returns (B, K, sum of last mlp channels)."""
        outs = []
        for gi, (mlp, radius, nsample) in enumerate(
                zip(self.mlps, self.radii, self.nsamples)):
            if src_feats is None:
                grouped, cnt = jax.vmap(
                    lambda q, qv, sx, sv: query_and_group(
                        q, qv, sx, sv, None, float(radius), int(nsample),
                        use_xyz=True)
                )(kp_xyz, kp_valid, src_xyz, src_valid)
            else:
                grouped, cnt = jax.vmap(
                    lambda q, qv, sx, sv, sf: query_and_group(
                        q, qv, sx, sv, sf, float(radius), int(nsample),
                        use_xyz=True)
                )(kp_xyz, kp_valid, src_xyz, src_valid, src_feats)
            # grouped: (B, K, S, 3+C); cnt: (B, K)
            x = grouped
            gvalid = (cnt > 0)[..., None] & (
                jnp.arange(int(nsample))[None, None, :]
                < jnp.maximum(cnt, 1)[..., None])
            for li, ch in enumerate(mlp):
                x = nn.Dense(int(ch), use_bias=False,
                             name=f"g{gi}_fc{li}")(x)
                x = MaskedBatchNorm(int(ch), name=f"g{gi}_bn{li}")(
                    x, gvalid, train)
                x = nn.relu(x)
            x = jnp.max(x, axis=2)          # (B, K, ch)
            x = jnp.where((cnt > 0)[..., None], x, 0.0)
            outs.append(x)
        return jnp.concatenate(outs, axis=-1)


class VectorPoolLayer(nn.Module):
    """VectorPool aggregation (PV-RCNN++; reference
    pointnet2_stack/voxel_pool_modules.py VectorPoolAggregationModuleMSG +
    vector_pool CUDA): in-radius neighbors bin into a G^3 local grid around
    each keypoint, per-cell mean relative features, flattened through a
    Dense channel mix — position-sensitive aggregation without per-sample
    MLPs over every neighbor."""

    grid: int
    radius: float
    nsample: int
    out_channels: int

    @nn.compact
    def __call__(self, kp_xyz, kp_valid, src_xyz, src_valid, src_feats,
                 train: bool):
        g = int(self.grid)
        grouped, cnt = jax.vmap(
            lambda q, qv, sx, sv, sf: query_and_group(
                q, qv, sx, sv, sf, float(self.radius), int(self.nsample),
                use_xyz=True)
        )(kp_xyz, kp_valid, src_xyz, src_valid, src_feats)
        # grouped: (B, K, S, 3+C) with relative xyz leading
        rel = grouped[..., :3]
        cell = jnp.clip(
            jnp.floor((rel + self.radius) / (2 * self.radius / g)),
            0, g - 1).astype(jnp.int32)
        flat = (cell[..., 0] * g + cell[..., 1]) * g + cell[..., 2]
        slot_ok = (jnp.arange(grouped.shape[2])[None, None, :]
                   < jnp.maximum(cnt, 0)[..., None]) & (cnt > 0)[..., None]
        flat = jnp.where(slot_ok, flat, g ** 3)
        c = grouped.shape[-1]

        def scatter_cells(fl, gr):
            acc = jnp.zeros((g ** 3 + 1, c), gr.dtype).at[fl].add(gr)
            n = jnp.zeros((g ** 3 + 1,), gr.dtype).at[fl].add(1.0)
            return (acc[:-1] / jnp.clip(n[:-1, None], 1.0)).reshape(-1)

        cells = jax.vmap(jax.vmap(scatter_cells))(
            flat, jnp.where(slot_ok[..., None], grouped, 0.0))
        out = nn.Dense(self.out_channels, use_bias=False, name="mix")(cells)
        out = MaskedBatchNorm(self.out_channels, name="mix_bn")(
            out, kp_valid, train)
        return nn.relu(out)


def sectorized_proposal_centric_mask(points, pmask, rois, roi_valid,
                                     sample_radius_with_roi):
    """(P,) candidate mask: points within roi_radius + sample_radius of any
    ROI center (voxel_set_abstraction.py sample_points_with_roi:45-76)."""
    centers = rois[:, :3]
    r = jnp.linalg.norm(rois[:, 3:6], axis=-1) / 2 + sample_radius_with_roi
    d = jnp.linalg.norm(points[:, None, :3] - centers[None], axis=-1)
    return pmask & jnp.any((d < r[None]) & roi_valid[None], axis=1)


def sector_fps(points, cand_mask, k: int, num_sectors: int):
    """Sector-partitioned FPS (voxel_set_abstraction.py sector_fps:78-110):
    each of `num_sectors` azimuth sectors FPS-samples k/num_sectors points
    from its candidates. Returns (k,) indices into `points`."""
    angles = jnp.arctan2(points[:, 1], points[:, 0]) + np.pi
    sector = jnp.clip((angles / (2 * np.pi / num_sectors)).astype(jnp.int32),
                      0, num_sectors - 1)
    per = k // num_sectors
    idx_parts = []
    for s in range(num_sectors):
        m = cand_mask & (sector == s)
        take = per + (k - per * num_sectors if s == num_sectors - 1 else 0)
        idx_parts.append(farthest_point_sample(points[:, :3], m, take))
    return jnp.concatenate(idx_parts)


class VoxelSetAbstraction(nn.Module):
    model_cfg: Any
    voxel_size: tuple
    point_cloud_range: tuple
    num_rawpoint_features: int = 4

    @nn.compact
    def __call__(self, batch, train: bool):
        cfg = self.model_cfg
        k = int(cfg["NUM_KEYPOINTS"])
        sources = list(cfg["FEATURES_SOURCE"])
        sa_cfg = cfg["SA_LAYER"]
        pcr = self.point_cloud_range
        vx, vy, vz = (float(v) for v in self.voxel_size)

        points = batch["points"]            # (B, P, 3+F)
        pmask = batch["points_mask"]
        b = points.shape[0]

        # --- keypoints (get_sampled_points:227-262): plain FPS, or the
        # PV-RCNN++ sectorized proposal-centric sampling (SPC,
        # sectorized_proposal_centric_sampling:206-226) when rois are in the
        # batch (pv_rcnn_plusplus.py runs the proposal layer before the pfe)
        method = str(cfg.get("SAMPLE_METHOD", "FPS")).upper()
        if method == "SPC" and "rois" in batch:
            spc = cfg.get("SPC_SAMPLING", {})
            radius = float(spc.get("SAMPLE_RADIUS_WITH_ROI", 1.6))
            sectors = int(spc.get("NUM_SECTORS", 6))
            kp_idx = jax.vmap(
                lambda p, m, r, rv: sector_fps(
                    p[:, :3],
                    sectorized_proposal_centric_mask(p, m, r, rv, radius),
                    k, sectors)
            )(points, pmask, batch["rois"][..., :7], batch["roi_valid"])
        else:
            kp_idx = jax.vmap(
                lambda p, m: farthest_point_sample(p[:, :3], m, k)
            )(points, pmask)
        kp_xyz = jnp.take_along_axis(points[..., :3], kp_idx[..., None],
                                     axis=1)               # (B, K, 3)
        kp_valid = jnp.take_along_axis(pmask, kp_idx, axis=1)

        feats_list = []
        # --- BEV bilinear interpolation (:176-194)
        if "bev" in sources:
            bev = batch["spatial_features"]  # (B, H, W, C) H=y, W=x
            stride = int(batch.get("spatial_features_stride", 8))
            xs = (kp_xyz[..., 0] - pcr[0]) / vx / stride
            ys = (kp_xyz[..., 1] - pcr[1]) / vy / stride

            def bil(feat, xf, yf):
                h, w, c = feat.shape
                x0 = jnp.floor(xf).astype(jnp.int32)
                y0 = jnp.floor(yf).astype(jnp.int32)
                wx = xf - x0
                wy = yf - y0

                def tap(yi, xi):
                    ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
                    v = feat[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
                    return jnp.where(ok[..., None], v, 0.0)

                return (tap(y0, x0) * ((1 - wx) * (1 - wy))[..., None]
                        + tap(y0, x0 + 1) * (wx * (1 - wy))[..., None]
                        + tap(y0 + 1, x0) * ((1 - wx) * wy)[..., None]
                        + tap(y0 + 1, x0 + 1) * (wx * wy)[..., None])

            feats_list.append(jax.vmap(bil)(bev, xs, ys))

        # --- raw points SA
        if "raw_points" in sources:
            sa = SALayer(
                mlps=tuple(tuple(m) for m in sa_cfg["raw_points"]["MLPS"]),
                radii=tuple(sa_cfg["raw_points"]["POOL_RADIUS"]),
                nsamples=tuple(sa_cfg["raw_points"]["NSAMPLE"]),
                name="sa_raw",
            )
            raw_feats = points[..., 3:3 + self.num_rawpoint_features - 3]
            if raw_feats.shape[-1] == 0:
                raw_feats = None
            feats_list.append(
                sa(kp_xyz, kp_valid, points[..., :3], pmask, raw_feats,
                   train))

        # --- sparse conv levels
        ms = batch.get("multi_scale_3d_features", {})
        for name in sources:
            if not name.startswith("x_conv"):
                continue
            level = ms[name]
            ds = int(sa_cfg[name].get("DOWNSAMPLE_FACTOR", 1))
            coords, feats, valid = level_actives(level, cap=65536)
            # zyx voxel coords -> xyz centers (voxel sizes scaled by the
            # level's downsample factor; z uses the +1 sparse dim origin)
            cf = coords.astype(jnp.float32)
            centers = jnp.stack([
                (cf[..., 2] + 0.5) * vx * ds + pcr[0],
                (cf[..., 1] + 0.5) * vy * ds + pcr[1],
                (cf[..., 0] + 0.5) * vz * ds + pcr[2],
            ], axis=-1)
            vp_cfg = sa_cfg[name].get("VECTOR_POOL")
            if vp_cfg:
                # PV-RCNN++: VectorPool aggregation instead of MSG SA
                vp = VectorPoolLayer(
                    grid=int(vp_cfg.get("GRID_SIZE", 3)),
                    radius=float(vp_cfg.get("POOL_RADIUS",
                                            sa_cfg[name]["POOL_RADIUS"][0])),
                    nsample=int(vp_cfg.get("NSAMPLE",
                                           sa_cfg[name]["NSAMPLE"][0])),
                    out_channels=int(vp_cfg.get("OUT_CHANNELS", 32)),
                    name=f"vp_{name}",
                )
                feats_list.append(
                    vp(kp_xyz, kp_valid, centers, valid, feats, train))
                continue
            sa = SALayer(
                mlps=tuple(tuple(m) for m in sa_cfg[name]["MLPS"]),
                radii=tuple(sa_cfg[name]["POOL_RADIUS"]),
                nsamples=tuple(sa_cfg[name]["NSAMPLE"]),
                name=f"sa_{name}",
            )
            feats_list.append(
                sa(kp_xyz, kp_valid, centers, valid, feats, train))

        fused = jnp.concatenate(feats_list, axis=-1)      # (B, K, Ctot)
        batch["point_features_before_fusion"] = fused
        out = nn.Dense(int(cfg["NUM_OUTPUT_FEATURES"]), use_bias=False,
                       name="vsa_point_feature_fusion")(fused)
        out = MaskedBatchNorm(int(cfg["NUM_OUTPUT_FEATURES"]),
                              name="fusion_bn")(out, kp_valid, train)
        out = nn.relu(out)
        batch["point_features"] = out
        batch["point_coords"] = kp_xyz
        batch["point_valid"] = kp_valid
        return batch

"""Dynamic VFEs — voxelization without a per-voxel point cap.

Parity targets: pcdet/models/backbones_3d/vfe/dynamic_mean_vfe.py:14 and
dynamic_pillar_vfe.py:49,145 (/root/reference), which use torch_scatter
over hashed coords. TPU design: the batch already carries `points` +
`point_voxel_idx` style assignments from the on-device voxelizer; here we
segment-reduce per-point features into per-voxel slots with
jax.ops.segment_sum/max — no T cap, every in-range point contributes.

These operate on the RAW points (B, P, C) + the voxel slot of each point
(computed by ops.voxelize with max_points_per_voxel=1 semantics is lossy, so
the detector recomputes assignments here from coords directly).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..blocks import MaskedBatchNorm


def _point_slots(points, points_mask, coords, voxel_mask, voxel_size,
                 point_cloud_range, grid_size):
    """Per-point voxel slot via the SAME linear hash the voxelizer used.
    points (P, 3+), coords (V, 3) zyx. Returns (P,) int32 slot or V."""
    nx, ny, nz = (int(g) for g in grid_size)
    v = coords.shape[0]
    lo = jnp.asarray(point_cloud_range[:3], points.dtype)
    vs = jnp.asarray(voxel_size, points.dtype)
    xyz = jnp.floor((points[:, :3] - lo) / vs).astype(jnp.int32)
    inside = points_mask & jnp.all(
        (xyz >= 0) & (xyz < jnp.asarray([nx, ny, nz])), axis=-1)
    lin_p = (xyz[:, 2] * ny + xyz[:, 1]) * nx + xyz[:, 0]
    lin_v = (coords[:, 0] * ny + coords[:, 1]) * nx + coords[:, 2]
    lin_v = jnp.where(voxel_mask, lin_v, -1)
    # map lin -> slot with a dense table (one scatter; reused per call)
    table = jnp.full((nx * ny * nz + 1,), v, jnp.int32)
    table = table.at[jnp.where(voxel_mask, lin_v, nx * ny * nz)].set(
        jnp.where(voxel_mask, jnp.arange(v, dtype=jnp.int32), v))
    slot = table[jnp.where(inside, lin_p, nx * ny * nz)]
    return jnp.where(inside, slot, v)


class DynamicMeanVFE(nn.Module):
    """Per-voxel mean over ALL points (dynamic_mean_vfe.py:14)."""

    model_cfg: dict
    num_point_features: int
    voxel_size: tuple
    point_cloud_range: tuple
    grid_size: tuple = ()

    @property
    def output_dim(self):
        return self.num_point_features

    @nn.compact
    def __call__(self, batch, train: bool):
        def one(points, pmask, coords, vmask):
            v = coords.shape[0]
            slot = _point_slots(points, pmask, coords, vmask,
                                self.voxel_size, self.point_cloud_range,
                                self.grid_size)
            ssum = jax.ops.segment_sum(points, slot, num_segments=v + 1)
            cnt = jax.ops.segment_sum(
                jnp.ones((points.shape[0],), points.dtype), slot,
                num_segments=v + 1)
            return (ssum[:v] / jnp.maximum(cnt[:v, None], 1.0)) \
                * vmask[:, None]

        batch["voxel_features"] = jax.vmap(one)(
            batch["points"], batch["points_mask"],
            batch["voxel_coords"], batch["voxel_mask"])
        return batch


class DynamicPillarVFE(nn.Module):
    """PointPillars PFN over ALL points of each pillar
    (dynamic_pillar_vfe.py:49): per-point features with cluster/center
    offsets, Linear+BN+ReLU, segment-max per pillar."""

    model_cfg: dict
    num_point_features: int
    voxel_size: tuple
    point_cloud_range: tuple
    grid_size: tuple = ()

    @property
    def output_dim(self):
        return int(self.model_cfg["NUM_FILTERS"][-1])

    @nn.compact
    def __call__(self, batch, train: bool):
        use_abs = bool(self.model_cfg.get("USE_ABSLOTE_XYZ", True))
        with_dist = bool(self.model_cfg.get("WITH_DISTANCE", False))
        num_filters: Sequence[int] = self.model_cfg["NUM_FILTERS"]
        vx, vy, vz = (float(s) for s in self.voxel_size)
        x_off = vx / 2 + float(self.point_cloud_range[0])
        y_off = vy / 2 + float(self.point_cloud_range[1])
        z_off = vz / 2 + float(self.point_cloud_range[2])

        points = batch["points"]          # (B, P, C)
        pmask = batch["points_mask"]
        coords = batch["voxel_coords"]    # (B, V, 3) zyx
        vmask = batch["voxel_mask"]
        b, p, _ = points.shape
        v = coords.shape[1]

        slots = jax.vmap(
            lambda pts, pm, c, vm: _point_slots(
                pts, pm, c, vm, self.voxel_size, self.point_cloud_range,
                self.grid_size)
        )(points, pmask, coords, vmask)   # (B, P)

        def seg_sum(x, slot):
            return jax.ops.segment_sum(x, slot, num_segments=v + 1)[:v]

        psum = jax.vmap(seg_sum)(points[..., :3], slots)
        cnt = jax.vmap(seg_sum)(
            jnp.ones((b, p, 1), points.dtype), slots)[..., 0]
        mean = psum / jnp.maximum(cnt[..., None], 1.0)  # (B, V, 3)
        slot_c = jnp.clip(slots, 0, v - 1)
        pt_mean = jnp.take_along_axis(mean, slot_c[..., None], axis=1)
        f_cluster = points[..., :3] - pt_mean

        cf = coords.astype(points.dtype)
        centers = jnp.stack(
            [cf[..., 2] * vx + x_off, cf[..., 1] * vy + y_off,
             cf[..., 0] * vz + z_off], axis=-1)   # (B, V, 3)
        pt_center = jnp.take_along_axis(centers, slot_c[..., None], axis=1)
        f_center = points[..., :3] - pt_center

        feats = [points if use_abs else points[..., 3:], f_cluster, f_center]
        if with_dist:
            feats.append(jnp.linalg.norm(points[..., :3], axis=-1,
                                         keepdims=True))
        x = jnp.concatenate(feats, axis=-1)
        pvalid = slots < v
        x = x * pvalid[..., None].astype(x.dtype)

        for i, nf in enumerate(num_filters):
            x = nn.Dense(int(nf), use_bias=False, name=f"pfn{i}_dense")(x)
            x = MaskedBatchNorm(int(nf), name=f"pfn{i}_bn")(x, pvalid, train)
            x = nn.relu(x)
            # segment-max into pillars
            def one_max(xx, slot, pv):
                init = jnp.full((v + 1, xx.shape[-1]), -jnp.inf, xx.dtype)
                out = init.at[slot].max(
                    jnp.where(pv[:, None], xx, -jnp.inf))[:v]
                return jnp.where(jnp.isfinite(out), out, 0.0)
            x_max = jax.vmap(one_max)(x, slots, pvalid)  # (B, V, nf)
            if i == len(num_filters) - 1:
                batch["pillar_features"] = x_max * vmask[..., None]
                return batch
            # concat per-point features with their pillar max
            x_max_pt = jnp.take_along_axis(x_max, slot_c[..., None], axis=1)
            x = jnp.concatenate([x, x_max_pt], axis=-1)
        return batch


class DynamicPillarVFESimple2D(nn.Module):
    """Simplified dynamic pillar VFE (dynamic_pillar_vfe.py:145 under
    /root/reference, `DynamicPillarVFESimple2D`): center offsets only — no
    cluster mean — with the z offset measured from the range floor, then the
    same Linear+BN+ReLU + segment-max PFN stack. PillarNet's canonical VFE."""

    model_cfg: dict
    num_point_features: int
    voxel_size: tuple
    point_cloud_range: tuple
    grid_size: tuple = ()

    @property
    def output_dim(self):
        return int(self.model_cfg["NUM_FILTERS"][-1])

    @nn.compact
    def __call__(self, batch, train: bool):
        use_abs = bool(self.model_cfg.get("USE_ABSLOTE_XYZ", True))
        with_dist = bool(self.model_cfg.get("WITH_DISTANCE", False))
        num_filters: Sequence[int] = self.model_cfg["NUM_FILTERS"]
        vx, vy, vz = (float(s) for s in self.voxel_size)
        x_off = vx / 2 + float(self.point_cloud_range[0])
        y_off = vy / 2 + float(self.point_cloud_range[1])
        z_off = vz / 2 + float(self.point_cloud_range[2])

        points = batch["points"]          # (B, P, C)
        pmask = batch["points_mask"]
        coords = batch["voxel_coords"]    # (B, V, 3) zyx
        vmask = batch["voxel_mask"]
        b, p, _ = points.shape
        v = coords.shape[1]

        slots = jax.vmap(
            lambda pts, pm, c, vm: _point_slots(
                pts, pm, c, vm, self.voxel_size, self.point_cloud_range,
                self.grid_size)
        )(points, pmask, coords, vmask)   # (B, P)
        slot_c = jnp.clip(slots, 0, v - 1)

        cf = coords.astype(points.dtype)
        centers = jnp.stack(
            [cf[..., 2] * vx + x_off, cf[..., 1] * vy + y_off], axis=-1)
        pt_center = jnp.take_along_axis(centers, slot_c[..., None]
                                        .repeat(2, -1), axis=1)
        f_center = jnp.concatenate(
            [points[..., 0:2] - pt_center,
             points[..., 2:3] - z_off], axis=-1)

        feats = [f_center, points if use_abs else points[..., 3:]]
        if with_dist:
            feats.append(jnp.linalg.norm(points[..., :3], axis=-1,
                                         keepdims=True))
        x = jnp.concatenate(feats, axis=-1)
        pvalid = slots < v
        x = x * pvalid[..., None].astype(x.dtype)

        for i, nf in enumerate(num_filters):
            x = nn.Dense(int(nf), use_bias=False, name=f"pfn{i}_dense")(x)
            x = MaskedBatchNorm(int(nf), name=f"pfn{i}_bn")(x, pvalid, train)
            x = nn.relu(x)

            def one_max(xx, slot, pv):
                init = jnp.full((v + 1, xx.shape[-1]), -jnp.inf, xx.dtype)
                out = init.at[slot].max(
                    jnp.where(pv[:, None], xx, -jnp.inf))[:v]
                return jnp.where(jnp.isfinite(out), out, 0.0)
            x_max = jax.vmap(one_max)(x, slots, pvalid)  # (B, V, nf)
            if i == len(num_filters) - 1:
                batch["pillar_features"] = x_max * vmask[..., None]
                return batch
            x_max_pt = jnp.take_along_axis(x_max, slot_c[..., None], axis=1)
            x = jnp.concatenate([x, x_max_pt], axis=-1)
        return batch

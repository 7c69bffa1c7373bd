"""PointNet2MSG backbone (PointRCNN's point-based encoder).

Behavioral parity with pcdet/models/backbones_3d/pointnet2_backbone.py:9-102
(/root/reference): 4 multi-scale-grouping SA levels (FPS -> per-radius ball
query + shared MLP + max-pool, concat across radii) followed by feature
propagation (three-NN inverse-distance interpolation + MLP) back to the full
point set. Consumes ops/pointnet2.py (the TPU FPS/ball-query/three-nn
primitives, replacing the pointnet2_batch CUDA extension).

TPU design: fixed-shape padded point lists (B, P, F) with validity masks —
no per-sample ragged reshapes; each SA level is a vmapped fixed-capacity
program whose distance matrices tile onto the MXU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.pointnet2 import (
    farthest_point_sample,
    query_and_group,
    three_interpolate,
    three_nn,
)
from ..blocks import MaskedBatchNorm


class _MLP(nn.Module):
    """Shared per-point MLP (Conv2d-1x1 + BN + ReLU chains)."""

    channels: tuple
    name_prefix: str = "mlp"

    @nn.compact
    def __call__(self, x, valid, train: bool):
        for i, ch in enumerate(self.channels):
            x = nn.Dense(int(ch), use_bias=False,
                         name=f"{self.name_prefix}{i}")(x)
            x = MaskedBatchNorm(int(ch), name=f"{self.name_prefix}{i}_bn")(
                x, valid, train)
            x = nn.relu(x)
        return x


class SAModuleMSG(nn.Module):
    """PointnetSAModuleMSG (pointnet2_modules.py): FPS centers, per-radius
    query+group+MLP+max, concat."""

    npoint: int
    radii: tuple
    nsamples: tuple
    mlps: tuple  # tuple of channel tuples, one per radius

    @nn.compact
    def __call__(self, xyz, mask, feats, train: bool):
        """xyz (B, P, 3); feats (B, P, C) or None. Returns
        (new_xyz (B, M, 3), new_mask (B, M), new_feats (B, M, C'))."""

        def centers_one(x, m):
            idx = farthest_point_sample(x, m, self.npoint)
            n_valid = jnp.sum(m)
            cmask = jnp.arange(self.npoint) < n_valid
            return x[idx], cmask

        new_xyz, new_mask = jax.vmap(centers_one)(xyz, mask)
        outs = []
        for ri, (radius, ns, mlp) in enumerate(
                zip(self.radii, self.nsamples, self.mlps)):
            def group_one(cx, cm, x, m, f):
                g, cnt = query_and_group(cx, cm, x, m, f, float(radius),
                                         int(ns), use_xyz=True)
                return g, cnt

            grouped, cnt = jax.vmap(group_one)(
                new_xyz, new_mask, xyz, mask,
                feats if feats is not None else
                jnp.zeros(xyz.shape[:2] + (0,), xyz.dtype))
            b, m_, s, c = grouped.shape
            h = _MLP(tuple(mlp), name=f"radius{ri}")(
                grouped.reshape(b, m_ * s, c),
                jnp.repeat(new_mask, s, axis=1), train,
            ).reshape(b, m_, s, -1)
            # empty groups (cnt==0) max to 0 like the CUDA empty_ball_mask
            h = jnp.where((cnt > 0)[..., None, None], h, 0.0)
            outs.append(jnp.max(h, axis=2))
        new_feats = jnp.concatenate(outs, axis=-1)
        new_feats = jnp.where(new_mask[..., None], new_feats, 0.0)
        return new_xyz, new_mask, new_feats


class FPModule(nn.Module):
    """PointnetFPModule: three-NN interpolation + MLP."""

    mlp: tuple

    @nn.compact
    def __call__(self, unknown, unknown_mask, known, known_mask,
                 unknown_feats, known_feats, train: bool):
        def interp_one(u, um, k, km, kf):
            dist, idx = three_nn(u, um, k, km)
            return three_interpolate(kf, idx, dist)

        interp = jax.vmap(interp_one)(unknown, unknown_mask, known,
                                      known_mask, known_feats)
        if unknown_feats is not None:
            x = jnp.concatenate([interp, unknown_feats], axis=-1)
        else:
            x = interp
        x = _MLP(tuple(self.mlp), name="fp")(x, unknown_mask, train)
        return jnp.where(unknown_mask[..., None], x, 0.0)


class PointNet2MSG(nn.Module):
    model_cfg: Any
    input_channels: int   # raw point feature count incl. xyz
    grid_size: tuple = ()

    def setup(self):
        sa_cfg = self.model_cfg["SA_CONFIG"]
        self.npoints = [int(n) for n in sa_cfg["NPOINTS"]]
        channel_in = self.input_channels - 3
        sa_modules = []
        skip_channels = [channel_in]
        for k in range(len(self.npoints)):
            mlps = [list(m) for m in sa_cfg["MLPS"][k]]
            channel_out = 0
            for m in mlps:
                channel_out += m[-1]
            sa_modules.append(SAModuleMSG(
                npoint=self.npoints[k],
                radii=tuple(float(r) for r in sa_cfg["RADIUS"][k]),
                nsamples=tuple(int(n) for n in sa_cfg["NSAMPLE"][k]),
                mlps=tuple(tuple(m) for m in mlps),
                name=f"sa{k}",
            ))
            skip_channels.append(channel_out)
            channel_in = channel_out
        self.sa_modules = sa_modules

        fp_mlps = self.model_cfg["FP_MLPS"]
        fp_modules = []
        for k in range(len(fp_mlps)):
            fp_modules.append(FPModule(
                mlp=tuple(int(c) for c in fp_mlps[k]), name=f"fp{k}"))
        self.fp_modules = fp_modules
        self._out_channels = int(fp_mlps[0][-1])

    @property
    def num_point_features(self):
        return self._out_channels

    @property
    def num_bev_features(self):
        return self._out_channels

    def __call__(self, batch, train: bool):
        points = batch["points"]          # (B, P, F)
        mask = batch["points_mask"]
        xyz = points[..., :3]
        feats = points[..., 3:] if points.shape[-1] > 3 else None

        l_xyz, l_mask, l_feats = [xyz], [mask], [feats]
        for sa in self.sa_modules:
            nx, nm, nf = sa(l_xyz[-1], l_mask[-1], l_feats[-1], train)
            l_xyz.append(nx)
            l_mask.append(nm)
            l_feats.append(nf)

        for i in range(-1, -(len(self.fp_modules) + 1), -1):
            l_feats[i - 1] = self.fp_modules[i](
                l_xyz[i - 1], l_mask[i - 1], l_xyz[i], l_mask[i],
                l_feats[i - 1], l_feats[i], train,
            )

        batch["point_features"] = l_feats[0]       # (B, P, C)
        batch["point_coords"] = xyz                # (B, P, 3)
        batch["point_valid"] = mask
        return batch

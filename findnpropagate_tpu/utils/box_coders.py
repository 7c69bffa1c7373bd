"""Box coders, matching pcdet/utils/box_coder_utils.py (/root/reference)
numerically but as stateless JAX functions.

Boxes/anchors: (..., 7+C) [x, y, z, dx, dy, dz, heading, ...].
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class ResidualCoder:
    """ResidualCoder (box_coder_utils.py:5-80): anchor-delta encoding with
    diagonal-normalized centers, log dims, raw or sincos heading."""

    code_size: int = 7
    encode_angle_by_sincos: bool = False

    @property
    def full_code_size(self):
        return self.code_size + (1 if self.encode_angle_by_sincos else 0)

    def encode(self, boxes, anchors):
        anchors = jnp.concatenate(
            [anchors[..., 0:3], jnp.clip(anchors[..., 3:6], 1e-5), anchors[..., 6:]],
            axis=-1,
        )
        boxes = jnp.concatenate(
            [boxes[..., 0:3], jnp.clip(boxes[..., 3:6], 1e-5), boxes[..., 6:]],
            axis=-1,
        )
        xa, ya, za, dxa, dya, dza, ra = [anchors[..., i] for i in range(7)]
        xg, yg, zg, dxg, dyg, dzg, rg = [boxes[..., i] for i in range(7)]
        diagonal = jnp.sqrt(dxa**2 + dya**2)
        xt = (xg - xa) / diagonal
        yt = (yg - ya) / diagonal
        zt = (zg - za) / dza
        dxt = jnp.log(dxg / dxa)
        dyt = jnp.log(dyg / dya)
        dzt = jnp.log(dzg / dza)
        if self.encode_angle_by_sincos:
            rts = [jnp.cos(rg) - jnp.cos(ra), jnp.sin(rg) - jnp.sin(ra)]
        else:
            rts = [rg - ra]
        cts = [boxes[..., i] - anchors[..., i] for i in range(7, boxes.shape[-1])]
        return jnp.stack([xt, yt, zt, dxt, dyt, dzt, *rts, *cts], axis=-1)

    def decode(self, encodings, anchors):
        xa, ya, za, dxa, dya, dza, ra = [anchors[..., i] for i in range(7)]
        if self.encode_angle_by_sincos:
            xt, yt, zt, dxt, dyt, dzt, cost, sint = [
                encodings[..., i] for i in range(8)
            ]
            extra_start = 8
        else:
            xt, yt, zt, dxt, dyt, dzt, rt = [encodings[..., i] for i in range(7)]
            extra_start = 7
        diagonal = jnp.sqrt(dxa**2 + dya**2)
        xg = xt * diagonal + xa
        yg = yt * diagonal + ya
        zg = zt * dza + za
        dxg = jnp.exp(dxt) * dxa
        dyg = jnp.exp(dyt) * dya
        dzg = jnp.exp(dzt) * dza
        if self.encode_angle_by_sincos:
            rg = jnp.arctan2(sint + jnp.sin(ra), cost + jnp.cos(ra))
        else:
            rg = rt + ra
        extras = [
            encodings[..., extra_start + i] + anchors[..., 7 + i]
            for i in range(anchors.shape[-1] - 7)
        ]
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *extras], axis=-1)


@dataclass(frozen=True)
class PointResidualCoder:
    """PointResidualCoder (box_coder_utils.py:166-222): residuals relative to a
    point with per-class mean sizes; heading as sincos."""

    code_size: int = 8
    use_mean_size: bool = True
    mean_size: tuple = ()

    def encode(self, gt_boxes, points, gt_classes=None):
        xg, yg, zg = gt_boxes[..., 0], gt_boxes[..., 1], gt_boxes[..., 2]
        dxg = jnp.clip(gt_boxes[..., 3], 1e-5)
        dyg = jnp.clip(gt_boxes[..., 4], 1e-5)
        dzg = jnp.clip(gt_boxes[..., 5], 1e-5)
        rg = gt_boxes[..., 6]
        xa, ya, za = points[..., 0], points[..., 1], points[..., 2]
        if self.use_mean_size:
            mean = jnp.asarray(self.mean_size)[gt_classes - 1]
            dxa, dya, dza = mean[..., 0], mean[..., 1], mean[..., 2]
            diagonal = jnp.sqrt(dxa**2 + dya**2)
            xt = (xg - xa) / diagonal
            yt = (yg - ya) / diagonal
            zt = (zg - za) / dza
            dxt = jnp.log(dxg / dxa)
            dyt = jnp.log(dyg / dya)
            dzt = jnp.log(dzg / dza)
        else:
            xt, yt, zt = xg - xa, yg - ya, zg - za
            dxt, dyt, dzt = jnp.log(dxg), jnp.log(dyg), jnp.log(dzg)
        extras = [gt_boxes[..., 7 + i] for i in range(gt_boxes.shape[-1] - 7)]
        return jnp.stack(
            [xt, yt, zt, dxt, dyt, dzt, jnp.cos(rg), jnp.sin(rg), *extras], axis=-1
        )

    def decode(self, encodings, points, pred_classes=None):
        xt, yt, zt = encodings[..., 0], encodings[..., 1], encodings[..., 2]
        dxt, dyt, dzt = encodings[..., 3], encodings[..., 4], encodings[..., 5]
        cost, sint = encodings[..., 6], encodings[..., 7]
        xa, ya, za = points[..., 0], points[..., 1], points[..., 2]
        if self.use_mean_size:
            mean = jnp.asarray(self.mean_size)[pred_classes - 1]
            dxa, dya, dza = mean[..., 0], mean[..., 1], mean[..., 2]
            diagonal = jnp.sqrt(dxa**2 + dya**2)
            xg = xt * diagonal + xa
            yg = yt * diagonal + ya
            zg = zt * dza + za
            dxg = jnp.exp(dxt) * dxa
            dyg = jnp.exp(dyt) * dya
            dzg = jnp.exp(dzt) * dza
        else:
            xg, yg, zg = xt + xa, yt + ya, zt + za
            dxg, dyg, dzg = jnp.exp(dxt), jnp.exp(dyt), jnp.exp(dzt)
        rg = jnp.arctan2(sint, cost)
        extras = [encodings[..., 8 + i] for i in range(encodings.shape[-1] - 8)]
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *extras], axis=-1)

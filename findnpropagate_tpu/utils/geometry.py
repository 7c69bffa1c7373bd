"""Core 3D box / point geometry, as pure jittable JAX functions.

Box convention matches the reference exactly (pcdet/utils/box_utils.py:28-53,
pcdet/utils/common_utils.py:21-57 under /root/reference): boxes are
(N, 7+C) = [x, y, z, dx, dy, dz, heading, ...] with (x, y, z) the box CENTER
in the LiDAR frame, heading about +z with x==>y positive rotation.

Everything here is static-shape and differentiable where meaningful; masks,
not dynamic shapes, express validity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Corner template in the reference's corner order (box_utils.py:30-37):
#        7 -------- 4
#       /|         /|
#      6 -------- 5 .
#      | |        | |
#      . 3 -------- 0
#      |/         |/
#      2 -------- 1
CORNER_TEMPLATE = np.array(
    [
        [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
        [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
    ],
    dtype=np.float32,
) / 2.0


def limit_period(val, offset: float = 0.5, period: float = np.pi):
    """Wrap `val` into [-offset*period, (1-offset)*period). (common_utils.py:21)"""
    return val - jnp.floor(val / period + offset) * period


def rotation_matrix_z(angle):
    """(...,) angles -> (..., 3, 3) rotation matrices for row-vector points.

    Matches reference `rotate_points_along_z` (common_utils.py:35-57):
    points_rot = points @ R with R = [[cos, sin, 0], [-sin, cos, 0], [0,0,1]].
    """
    cosa = jnp.cos(angle)
    sina = jnp.sin(angle)
    zeros = jnp.zeros_like(angle)
    ones = jnp.ones_like(angle)
    rot = jnp.stack(
        [cosa, sina, zeros, -sina, cosa, zeros, zeros, zeros, ones], axis=-1
    )
    return rot.reshape(angle.shape + (3, 3))


def rotate_points_along_z(points, angle):
    """points: (B, N, 3+C) with angle (B,), or unbatched (N, 3+C) with a
    scalar angle (the form jax.vmap presents). Rotates xyz, passes extra
    dims through."""
    rot = rotation_matrix_z(angle)
    if points.ndim == 2:
        xyz = jnp.einsum(
            "nd,de->ne", points[..., 0:3], rot,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        xyz = jnp.einsum(
            "bnd,bde->bne", points[..., 0:3], rot,
            precision=jax.lax.Precision.HIGHEST,
        )
    return jnp.concatenate([xyz, points[..., 3:]], axis=-1)


def rotate_points_2d(points, angle):
    """points: (..., 2); angle broadcastable. Positive x==>y rotation."""
    cosa = jnp.cos(angle)
    sina = jnp.sin(angle)
    x = points[..., 0] * cosa - points[..., 1] * sina
    y = points[..., 0] * sina + points[..., 1] * cosa
    return jnp.stack([x, y], axis=-1)


def boxes_to_corners_3d(boxes3d):
    """(N, 7) -> (N, 8, 3) corners in the reference's order (box_utils.py:28)."""
    template = jnp.asarray(CORNER_TEMPLATE, dtype=boxes3d.dtype)
    corners = boxes3d[:, None, 3:6] * template[None, :, :]
    corners = rotate_points_along_z(corners, boxes3d[:, 6])
    return corners + boxes3d[:, None, 0:3]


def boxes_to_corners_bev(boxes):
    """(..., 7) -> (..., 4, 2) BEV corners, counter-clockwise for +dims.

    Corner order: (+x,+y), (-x,+y), (-x,-y), (+x,-y) in the box frame,
    rotated by heading and translated to center.
    """
    h = boxes[..., 3] / 2
    w = boxes[..., 4] / 2
    template = jnp.stack(
        [
            jnp.stack([h, w], axis=-1),
            jnp.stack([-h, w], axis=-1),
            jnp.stack([-h, -w], axis=-1),
            jnp.stack([h, -w], axis=-1),
        ],
        axis=-2,
    )  # (..., 4, 2)
    rot = rotate_points_2d(template, boxes[..., None, 6])
    return rot + boxes[..., None, 0:2]


def points_in_boxes_mask(points, boxes, z_margin: float = 0.0, xy_margin: float = 0.0):
    """points (P, 3), boxes (N, 7) -> (N, P) bool: point inside rotated 3D box.

    Semantics follow the reference CUDA `check_pt_in_box3d`
    (roiaware_pool3d_kernel.cu): translate to center, rotate by -heading,
    |local| <= dim/2 (z via |z - cz| <= dz/2).
    """
    shift = points[None, :, 0:3] - boxes[:, None, 0:3]  # (N, P, 3)
    cosa = jnp.cos(-boxes[:, 6])[:, None]
    sina = jnp.sin(-boxes[:, 6])[:, None]
    local_x = shift[..., 0] * cosa - shift[..., 1] * sina
    local_y = shift[..., 0] * sina + shift[..., 1] * cosa
    in_x = jnp.abs(local_x) <= boxes[:, None, 3] / 2 + xy_margin
    in_y = jnp.abs(local_y) <= boxes[:, None, 4] / 2 + xy_margin
    in_z = jnp.abs(shift[..., 2]) <= boxes[:, None, 5] / 2 + z_margin
    return in_x & in_y & in_z


def points_in_boxes_index(points, boxes, boxes_mask=None):
    """points (P, 3), boxes (N, 7) -> (P,) int32 index of first containing box, -1 if none.

    Equivalent of the reference `points_in_boxes_gpu` wrapper semantics
    (pcdet/ops/roiaware_pool3d/roiaware_pool3d_utils.py).
    """
    inside = points_in_boxes_mask(points, boxes)  # (N, P)
    if boxes_mask is not None:
        inside = inside & boxes_mask[:, None]
    any_in = jnp.any(inside, axis=0)
    first = jnp.argmax(inside, axis=0).astype(jnp.int32)
    return jnp.where(any_in, first, -1)


def mask_points_by_range(points, limit_range):
    """(P, >=2) points, [x0,y0,z0,x1,y1,z1] -> (P,) bool (x/y only, as reference)."""
    return (
        (points[:, 0] >= limit_range[0])
        & (points[:, 0] <= limit_range[3])
        & (points[:, 1] >= limit_range[1])
        & (points[:, 1] <= limit_range[4])
    )


def mask_boxes_outside_range(boxes, limit_range):
    """Center-in-range mask, (N, >=7) -> (N,). (box_utils.py:96-110 center mode)"""
    centers = boxes[:, 0:3]
    lo = jnp.asarray(limit_range[0:3], dtype=boxes.dtype)
    hi = jnp.asarray(limit_range[3:6], dtype=boxes.dtype)
    return jnp.all((centers >= lo) & (centers <= hi), axis=-1)


def get_voxel_centers(voxel_coords, downsample_times, voxel_size, point_cloud_range):
    """voxel_coords (N, 3) in zyx order -> (N, 3) xyz centers (common_utils.py:84)."""
    centers = voxel_coords[:, ::-1].astype(jnp.float32)  # zyx -> xyz
    vs = jnp.asarray(voxel_size, dtype=jnp.float32) * downsample_times
    lo = jnp.asarray(point_cloud_range[0:3], dtype=jnp.float32)
    return (centers + 0.5) * vs + lo


def enlarge_box3d(boxes3d, extra_width=(0.0, 0.0, 0.0)):
    """(N, 7+C) -> same with dims enlarged by 2*extra_width (box_utils.py)."""
    ew = jnp.asarray(extra_width, dtype=boxes3d.dtype)
    return jnp.concatenate(
        [boxes3d[:, 0:3], boxes3d[:, 3:6] + ew[None] * 2, boxes3d[:, 6:]], axis=-1
    )

"""Greedy Box Seeker + Oracle, KITTI variant (FrustumProposerOGKITTI).

Behavioral parity with pcdet/models/dense_heads/frustum_proposals_v1_kitti.py
:38-737 (/root/reference): single front camera, KITTI P2/R0/Tr_velo2cam
calibration, 7-class anchor table, and the KITTI oracle score
``dns_w + density/sum + iou_w*iou + dst_w*dist_rank`` (:652-654 — note the
different formula vs the nuScenes variant's max-normalized weighted sum).

TPU redesign: like the nuScenes seeker (frustum_proposer.py), the whole
per-frame pipeline is ONE fixed-shape jitted program vmapped over a padded
detection list; masked quantiles / sorts replace dynamic subsetting, and the
KITTI calibration (lidar->rect->img and back) is applied as dense jnp matmuls.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nms import nms_normal_bev
from ..utils.geometry import boxes_to_corners_3d, points_in_boxes_mask
from .camera import boxes_2d_iou, get_cam_frustum, masked_quantile, nms_2d

# KITTI per-class size anchors (frustum_proposals_v1_kitti.py:157-165):
# car, tram (construction-veh anchor), truck, van (truck), person_sitting
# (pedestrian), cyclist, pedestrian.
KITTI_ANCHORS = np.array(
    [
        [3.9, 1.6, 1.56],
        [6.37, 2.85, 3.19],
        [6.93, 2.51, 2.84],
        [6.93, 2.51, 2.84],
        [0.8, 0.6, 1.73],
        [1.76, 0.6, 1.73],
        [0.8, 0.6, 1.73],
    ],
    dtype=np.float32,
)

# matching class-name order for the anchor table
KITTI_SEEKER_CLASSES = ('Car', 'Tram', 'Truck', 'Van', 'Person_sitting',
                        'Cyclist', 'Pedestrian')


class KittiSeekerOutput(NamedTuple):
    boxes: jax.Array    # (D*topk, 7)
    scores: jax.Array   # (D*topk,) 2D-detection score per kept proposal
    oracle: jax.Array   # (D*topk,)
    labels: jax.Array   # (D*topk,) int32 1-indexed
    valid: jax.Array    # (D*topk,) bool


def lidar_to_img_kitti(pts, P2, R0, V2C):
    """(P, 3) lidar -> ((P, 2) image uv, (P,) rect depth).

    Exact Calibration.lidar_to_img semantics (pcdet/utils/
    calibration_kitti.py:72-98): pts_rect = hom(pts) @ (R0 @ V2C).T;
    uv = (hom(rect) @ P2.T)[:, :2] / rect_z; depth = proj_z - P2.T[3, 2].
    """
    rect = pts @ (R0 @ V2C[:, :3]).T + (R0 @ V2C[:, 3])
    proj = rect @ P2[:, :3].T + P2[:, 3]
    uv = proj[:, :2] / rect[:, 2:3]
    depth = proj[:, 2] - P2[2, 3]
    return uv, depth


def img_to_lidar_kitti(uvd, P2, R0, V2C):
    """(L, 3) [u, v, rect-depth] -> (L, 3) lidar xyz (img_to_rect +
    rect_to_lidar, calibration_kitti.py:100-118)."""
    cu, cv = P2[0, 2], P2[1, 2]
    fu, fv = P2[0, 0], P2[1, 1]
    tx = P2[0, 3] / (-fu)
    ty = P2[1, 3] / (-fv)
    d = uvd[:, 2]
    x = (uvd[:, 0] - cu) * d / fu + tx
    y = (uvd[:, 1] - cv) * d / fv + ty
    rect = jnp.stack([x, y, d], axis=1)
    M = jnp.asarray(R0) @ jnp.concatenate(
        [V2C[:, :3], V2C[:, 3:4]], axis=1
    )  # (3, 4) combined rect = M @ hom(lidar)
    R = M[:, :3]
    t = M[:, 3]
    inv = jnp.linalg.inv(R)
    return (rect - t) @ inv.T


@dataclass(frozen=True)
class FrustumProposerOGKITTI:
    """Config container + jitted KITTI seeker. Defaults = reference
    constructor defaults (frustum_proposals_v1_kitti.py:42-44)."""

    class_names: tuple = KITTI_SEEKER_CLASSES
    anchors: tuple = tuple(map(tuple, KITTI_ANCHORS.tolist()))
    lq: float = 0.336
    uq: float = 0.356
    cq: float = 0.46
    iou_w: float = 0.95
    dst_w: float = 0.226
    dns_w: float = 0.05
    min_cam_iou: float = 0.3
    size_min: float = 0.957
    size_max: float = 1.2
    ry_min: float = 0.0
    ry_max: float = float(np.pi)
    num_mags: int = 6
    num_sizes: int = 4
    num_rotations: int = 10
    max_dist: float = 70.0
    topk: int = 1
    nms_2d_thresh: float = 0.7
    nms_normal: float = 0.7
    score_thr: float = 0.1
    clamp_bottom: float = 0.0
    search_depth: float | None = None
    det_chunk: int = 8  # lax.map chunking (see FrustumProposerOG.det_chunk)
    frustum_min: float = 2.0
    # clamp extents for back-projected corners (:100-101, :609-610) — the
    # reference keeps the nuScenes [900, 1600] here
    image_size: tuple = (900, 1600)
    point_cloud_range: tuple = (0.0, -40.0, -3.0, 70.4, 40.0, 1.0)

    @classmethod
    def from_config(cls, model_cfg, class_names=None):
        p = dict(model_cfg.get("PARAMS", {}))
        kw = {}
        remap = {"nms_2d": "nms_2d_thresh"}
        for k, v in p.items():
            key = remap.get(k, k)
            if key in cls.__dataclass_fields__:
                kw[key] = v
        if class_names is not None:
            kw["class_names"] = tuple(class_names)
        return cls(**kw)

    def base_boxes(self):
        """(num_class, R*S, 7) zero-centered proposal templates
        (frustum_proposals_v1_kitti.py:168-182)."""
        anchors = np.asarray(self.anchors, np.float32)
        sizes = np.linspace(self.size_min, self.size_max, self.num_sizes)
        rots = np.linspace(self.ry_min, self.ry_max, self.num_rotations)
        n_cls = anchors.shape[0]
        base = np.zeros((n_cls, self.num_rotations, self.num_sizes, 7),
                        np.float32)
        base[:, :, :, 3:6] = anchors[:, None, None, :]
        base[:, :, :, 6] = rots[None, :, None]
        base[:, :, :, 3:6] *= sizes[None, None, :, None]
        return base.reshape(n_cls, -1, 7)

    def propose(self, points, points_mask, det_boxes, det_labels, det_scores,
                det_mask, P2, R0, V2C):
        """Single KITTI frame.

        points (P, >=3); det_* (D, ...) padded 2D detections (boxes xyxy,
        labels 1-indexed into class_names/anchors); P2 (3, 4), R0 (3, 3),
        V2C (3, 4). Returns KittiSeekerOutput with D*topk slots.
        """
        pts = points[:, :3]

        # single-camera projection once (:351-352; reference's
        # project_to_camera applies no bounds mask for KITTI :693-702)
        uv_all, depth_all = lidar_to_img_kitti(pts, P2, R0, V2C)

        # per-class 2D NMS over camera-0 detections (:346-348), then the
        # score_thr gate (:356-357)
        m = det_mask & (det_scores >= self.score_thr)
        keep = nms_2d(det_boxes, det_scores, det_labels,
                      self.nms_2d_thresh, valid=det_mask) & m

        base_boxes = jnp.asarray(self.base_boxes())        # (C, RS, 7)
        base_corners = jnp.asarray(
            boxes_to_corners_3d(base_boxes.reshape(-1, 7))
        ).reshape(base_boxes.shape[0], -1, 8, 3)

        h_img, w_img = self.image_size

        def per_det(box, label, score, kept):
            cls = jnp.clip(label - 1, 0)
            x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
            on_box = (
                points_mask
                & (uv_all[:, 1] < y2) & (uv_all[:, 1] >= y1)
                & (uv_all[:, 0] < x2) & (uv_all[:, 0] >= x1)
            )
            n_box_pts = jnp.sum(on_box)

            # frustum depth bounds from point-depth quantiles (:379-392)
            q_lo = masked_quantile(depth_all, on_box, self.lq)
            if self.search_depth is None:
                q_hi = masked_quantile(depth_all, on_box, self.uq)
            else:
                q_hi = q_lo + self.search_depth
            fmax = jnp.minimum(q_hi, self.max_dist)      # :415
            fmin = jnp.maximum(q_lo, self.frustum_min)   # :416
            cz = masked_quantile(depth_all, on_box, self.cq)

            # 2D-box centre lifted to lidar (:392-395)
            centre_xyz = img_to_lidar_kitti(
                jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, cz])[None],
                P2, R0, V2C,
            )[0]

            frust_corners_img = get_cam_frustum(
                jnp.stack([x1, y1, fmin, x2, y2, fmax])
            )  # (8, 3) [u, v, depth]
            frust_box = img_to_lidar_kitti(frust_corners_img, P2, R0, V2C)

            if self.clamp_bottom > 0:
                # clamp frustum corners to the on-box points' extent (:539-547)
                big = jnp.float32(1e9)
                for d in range(3):
                    pmin = jnp.min(jnp.where(on_box, pts[:, d], big))
                    pmax = jnp.max(jnp.where(on_box, pts[:, d], -big))
                    f1 = jnp.maximum(pmin, jnp.min(frust_box[:, d]))
                    f2 = jnp.minimum(pmax, jnp.max(frust_box[:, d]))
                    frust_box = frust_box.at[:, d].set(
                        jnp.clip(frust_box[:, d], f1, f2))

            # BEV frustum box: mean of vertical corner pairs (:549)
            frust_bev = jnp.stack(
                [(frust_box[2 * i] + frust_box[2 * i + 1]) / 2
                 for i in range(4)]
            )
            close = jnp.mean(frust_bev[:2], axis=0)
            far = jnp.mean(frust_bev[2:], axis=0)
            center_vec = far - close
            if self.search_depth is not None:
                center_vec = center_vec / (
                    jnp.linalg.norm(center_vec) + 1e-9) * self.search_depth
            mags = jnp.linspace(0.0, 1.0, self.num_mags)[:, None]
            centers = close[None, :] + center_vec[None, :] * mags  # (M, 3)

            corners = base_corners[cls][None] + centers[:, None, None, :]
            boxes3d = jnp.broadcast_to(
                base_boxes[cls][None],
                (self.num_mags,) + base_boxes[cls].shape,
            )
            boxes3d = jnp.concatenate(
                [boxes3d[..., :3] + centers[:, None, :], boxes3d[..., 3:]],
                axis=-1,
            )
            corners = corners.reshape(-1, 8, 3)
            boxes3d = boxes3d.reshape(-1, 7)
            n_prop = boxes3d.shape[0]

            # front-centering via softmin over corner norms (:586-592)
            rank = jax.nn.softmax(-jnp.linalg.norm(corners, axis=2), axis=1)
            wfc = jnp.sum(rank[..., None] * corners, axis=1)  # (N, 3)
            shift = boxes3d[:, :3] - wfc
            boxes3d = boxes3d.at[:, :3].add(shift)
            corners = corners + shift[:, None, :]

            # distance filter on the PRE-shift front centres (:595-596)
            prop_valid = jnp.linalg.norm(wfc, axis=-1) < self.max_dist

            # back-projected 2D IoU vs the detection box (:606-620)
            uv_c, _ = lidar_to_img_kitti(corners.reshape(-1, 3), P2, R0, V2C)
            uv_c = uv_c.reshape(n_prop, 8, 2)
            uv_c = jnp.stack(
                [jnp.clip(uv_c[..., 0], 0, w_img),
                 jnp.clip(uv_c[..., 1], 0, h_img)], axis=-1)
            proj_boxes = jnp.concatenate(
                [uv_c.min(axis=1), uv_c.max(axis=1)], axis=-1)
            ious = boxes_2d_iou(proj_boxes, box[None])[:, 0]

            # distance rank to the lifted 2D-box centre, min/max over the
            # dist-filtered set (:622-629)
            d = jnp.linalg.norm(wfc - centre_xyz[None, :], axis=-1)
            d_min = jnp.min(jnp.where(prop_valid, d, jnp.inf))
            d_max = jnp.max(jnp.where(prop_valid, d, -jnp.inf))
            dists_ranked = 1 - (d - d_min) / (d_max - d_min + 1e-8)

            prop_valid = prop_valid & (ious > self.min_cam_iou)  # :632

            # density over the on-box points, sum-normalized over the valid
            # set (:644-652)
            inside = points_in_boxes_mask(pts, boxes3d)  # (N, P)
            in_frust = inside & on_box[None, :]
            counts = jnp.sum(in_frust, axis=1).astype(jnp.float32)
            total = jnp.sum(jnp.where(prop_valid, counts, 0.0))
            soft_density = counts / (total + 1e-8)

            # KITTI oracle score (:654): additive with a constant dns_w term
            oracle = (
                self.dns_w + soft_density
                + self.iou_w * ious
                + self.dst_w * dists_ranked
            )
            oracle = jnp.where(prop_valid, oracle, -1e9)

            # axis-aligned NMS + topk (:657-668)
            idx, _ = nms_normal_bev(
                boxes3d, oracle, self.nms_normal,
                pre_maxsize=n_prop, post_maxsize=self.topk,
                valid_mask=prop_valid,
            )
            sel = jnp.clip(idx, 0)
            ok = kept & (idx >= 0) & (n_box_pts > 0)
            return boxes3d[sel], oracle[sel], ok

        d_all = det_boxes.shape[0]
        chunk = max(c for c in range(1, min(self.det_chunk, d_all) + 1)
                    if d_all % c == 0)

        def chunk_fn(args):
            return jax.vmap(per_det)(*args)

        def to_chunks(x):
            return x.reshape((d_all // chunk, chunk) + x.shape[1:])

        boxes_o, oracle_o, valid_o = jax.lax.map(
            chunk_fn,
            (to_chunks(det_boxes), to_chunks(det_labels),
             to_chunks(det_scores), to_chunks(keep)),
        )
        boxes_o = boxes_o.reshape((d_all,) + boxes_o.shape[2:])
        oracle_o = oracle_o.reshape((d_all,) + oracle_o.shape[2:])
        valid_o = valid_o.reshape((d_all,) + valid_o.shape[2:])

        k = self.topk
        d = det_scores.shape[0]
        return KittiSeekerOutput(
            boxes=boxes_o.reshape(d * k, 7),
            scores=jnp.repeat(det_scores, k),
            oracle=oracle_o.reshape(d * k),
            labels=jnp.repeat(det_labels.astype(jnp.int32), k),
            valid=valid_o.reshape(d * k),
        )

"""FrustumProposerSEG — segmentation-filtered Greedy Box Seeker.

Parity target: /root/reference/pcdet/models/dense_heads/
frustum_proposals_seg.py:52-742. The SEG variant is the OG seeker
(quantile frustums, per-class base-box grids, front-centre re-anchoring,
multiplicative oracle blend, frustum BEV NMS — all already in
FrustumProposerOG) with one extra stage: each detection's in-frustum
points are filtered by a Frustum-PointNets instance-segmentation network
before the depth quantiles and density counts (:394-410):

  * frustums with > seg_pts_thr points are rotated so their centroid
    lies on +x (FrustumRotation, :37-50), run through
    PointNetInstanceSeg with a 6-way hierarchy one-hot
    (label_to_hierarchy_label, :96), and only points predicted
    foreground with confidence > seg_thr survive;
  * smaller frustums pass through unfiltered.

TPU design: the filter is one jitted program vmapped over detections —
first-K in-box points are selected with top_k (static shapes), the seg
net runs on the (D, K, 3) slab, and the per-point verdicts scatter back
into a (D, P) mask consumed by FrustumProposerOG.propose's
det_point_mask input. The reference's pretrained seg weights
(seg_epoch_5.pth) are not shipped; pass trained params in, or leave
None to disable filtering (the proposer then equals OG)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.frustum_pointnets import PointNetInstanceSeg
from .camera import project_to_camera
from .frustum_proposer import FrustumProposerOG

# det label (0-indexed) -> hierarchy class (frustum_proposals_seg.py:96)
LABEL_TO_HIERARCHY = (0, 1, 1, 2, 2, 3, 4, 4, 5, 5)


class FrustumProposerSEG:
    """Wraps FrustumProposerOG with the PointNet foreground filter."""

    def __init__(self, class_names, seg_params=None, seg_thr: float = 0.5,
                 seg_pts_thr: int = 50, max_seg_points: int = 512,
                 n_seg_classes: int = 6, **og_kwargs):
        self.og = FrustumProposerOG(class_names=tuple(class_names),
                                    **og_kwargs)
        self.seg_net = PointNetInstanceSeg(n_classes=n_seg_classes)
        self.seg_params = seg_params
        self.seg_thr = float(seg_thr)
        self.seg_pts_thr = int(seg_pts_thr)
        self.max_seg_points = int(max_seg_points)
        self.n_seg_classes = int(n_seg_classes)

    @classmethod
    def from_config(cls, model_cfg, class_names, seg_params=None):
        p = dict(model_cfg.get("PARAMS", {}))
        seg_kw = {k: p.pop(k) for k in
                  ("seg_thr", "seg_pts_thr", "max_seg_points") if k in p}
        og = FrustumProposerOG.from_config(model_cfg, class_names)
        kw = {f: getattr(og, f) for f in og.__dataclass_fields__
              if f != "class_names"}
        return cls(class_names, seg_params=seg_params, **seg_kw, **kw)

    @partial(jax.jit, static_argnums=0)
    def seg_point_masks(self, seg_params, points, points_mask, det_boxes,
                        det_labels, det_cams, det_mask, lidar2image,
                        lidar_aug_matrix=None):
        """(D, P) bool foreground mask per detection."""
        pts = points[:, :3]
        p = pts.shape[0]
        k = min(self.max_seg_points, p)
        cam_coords, on_img = project_to_camera(
            pts, lidar2image, lidar_aug_matrix, self.og.image_size)
        on_img = on_img & points_mask[None, :]
        lab2h = jnp.asarray(LABEL_TO_HIERARCHY, jnp.int32)

        def per_det(box, label, cam, valid):
            uvd = cam_coords[cam]
            on_box = (on_img[cam]
                      & (uvd[:, 1] < box[3]) & (uvd[:, 1] >= box[1])
                      & (uvd[:, 0] < box[2]) & (uvd[:, 0] >= box[0]))
            n = jnp.sum(on_box)
            # first-k in-box points, in point order (static shapes)
            order = on_box.astype(jnp.float32) * (2.0 * p) \
                - jnp.arange(p, dtype=jnp.float32)
            _, idx = jax.lax.top_k(order, k)
            sel_valid = on_box[idx]
            sel = pts[idx]
            # FrustumRotation: centroid onto +x (:37-50)
            m = sel_valid[:, None].astype(sel.dtype)
            ctr = (sel * m).sum(0) / jnp.clip(m.sum(), 1.0)
            rot = jnp.arctan2(ctr[1], ctr[0])
            c, s = jnp.cos(-rot), jnp.sin(-rot)
            rx = sel[:, 0] * c - sel[:, 1] * s
            ry = sel[:, 0] * s + sel[:, 1] * c
            rsel = jnp.stack([rx, ry, sel[:, 2]], -1)
            one_hot = jax.nn.one_hot(
                lab2h[jnp.clip(label - 1, 0, len(LABEL_TO_HIERARCHY) - 1)],
                self.n_seg_classes)
            logits = self.seg_net.apply(
                seg_params, rsel[None], one_hot[None], sel_valid[None],
                False)[0]                                     # (k, 2)
            prob = jax.nn.sigmoid(logits)
            fg = ((prob[:, 1] >= prob[:, 0])
                  & (prob[:, 1] > self.seg_thr) & sel_valid)
            mask = jnp.zeros((p,), bool).at[idx].set(fg)
            use = valid & (n > self.seg_pts_thr)
            return jnp.where(use, mask, jnp.ones((p,), bool))

        return jax.vmap(per_det)(
            det_boxes, det_labels, jnp.clip(det_cams, 0), det_mask)

    def propose(self, points, points_mask, det_boxes, det_labels,
                det_scores, det_cams, det_mask, lidar2image, camera2lidar,
                intrinsics, lidar_aug_matrix=None):
        det_point_mask = None
        if self.seg_params is not None:
            det_point_mask = self.seg_point_masks(
                self.seg_params, points, points_mask, det_boxes,
                det_labels, det_cams, det_mask, lidar2image,
                lidar_aug_matrix)
        return self.og.propose(
            points, points_mask, det_boxes, det_labels, det_scores,
            det_cams, det_mask, lidar2image, camera2lidar, intrinsics,
            lidar_aug_matrix, det_point_mask=det_point_mask)

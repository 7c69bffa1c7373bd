"""Alternate open-vocab proposers — ablation baselines.

Parity targets (/root/reference):
  * GTProposals (pcdet/models/dense_heads/gt_proposals.py:24-59): the
    recall-upper-bound oracle that emits the gt boxes as detections.
  * FrustumProposer (frustum_proposals.py:383-1098) family
    (FrustumClusterProposer / FrustumDBSCAN): cluster the in-frustum points
    of each cached 2D detection, place per-class anchor boxes at cluster
    centers over a yaw sweep, score by back-projected 2D IoU + point
    density, keep the top-k.

These are extraction-time research baselines (the reference runs them as
untrainable torch modules full of data-dependent python); here they are
host-side numpy drivers that reuse the same camera geometry as the main
Greedy Box Seeker. Clustering uses sklearn DBSCAN when available and a
small numpy fallback otherwise.
"""

from __future__ import annotations

import numpy as np

from .frustum_proposer import NUSCENES_ANCHORS


def gt_proposals(gt_boxes, max_label: int = 10):
    """(M, 8) padded gt -> (boxes (K, 7), scores, labels) — GTProposals."""
    labels = gt_boxes[:, -1].astype(np.int64)
    keep = (labels > 0) & (labels <= max_label)
    boxes = gt_boxes[keep, :7]
    labels = labels[keep]
    return boxes, np.ones(len(boxes), np.float32), labels


def _dbscan(points, eps, min_samples):
    try:
        from sklearn.cluster import DBSCAN

        return DBSCAN(eps=eps, min_samples=min_samples).fit_predict(points)
    except Exception:
        # numpy fallback: grid-hash connected components
        labels = np.full(len(points), -1, np.int64)
        if not len(points):
            return labels
        cell = np.floor(points / eps).astype(np.int64)
        key = {tuple(c): [] for c in cell}
        for i, c in enumerate(cell):
            key[tuple(c)].append(i)
        visited = np.zeros(len(points), bool)
        cur = 0
        for i in range(len(points)):
            if visited[i]:
                continue
            stack = [i]
            members = []
            while stack:
                j = stack.pop()
                if visited[j]:
                    continue
                visited[j] = True
                members.append(j)
                cj = cell[j]
                for dz in (-1, 0, 1):
                    for dy in (-1, 0, 1):
                        for dx in (-1, 0, 1):
                            nb = (cj[0] + dx, cj[1] + dy, cj[2] + dz)
                            for k in key.get(nb, []):
                                if not visited[k] and np.linalg.norm(
                                        points[k] - points[j]) <= eps:
                                    stack.append(k)
            if len(members) >= min_samples:
                labels[np.asarray(members)] = cur
                cur += 1
        return labels


class FrustumClusterProposer:
    """Cluster-based frustum proposer (FrustumProposer /
    FrustumClusterProposer / FrustumDBSCAN semantics)."""

    def __init__(self, class_names, anchors=None, num_rot: int = 10,
                 eps: float = 0.8, min_samples: int = 5,
                 min_cam_iou: float = 0.1, iou_w: float = 0.9,
                 dns_w: float = 0.5, score_thr: float = 0.1,
                 topk: int = 1, max_dist: float = 60.0,
                 image_size=(900, 1600)):
        self.class_names = list(class_names)
        self.anchors = np.asarray(
            anchors if anchors is not None else NUSCENES_ANCHORS, np.float32)
        self.num_rot = num_rot
        self.eps = eps
        self.min_samples = min_samples
        self.min_cam_iou = min_cam_iou
        self.iou_w = iou_w
        self.dns_w = dns_w
        self.score_thr = score_thr
        self.topk = topk
        self.max_dist = max_dist
        self.image_size = image_size

    def _project(self, pts, l2i):
        hom = pts @ l2i[:3, :3].T + l2i[:3, 3]
        depth = hom[:, 2]
        uv = hom[:, :2] / np.clip(depth[:, None], 1e-5, None)
        return uv, depth

    def propose(self, points, det_boxes, det_labels, det_scores, det_cams,
                lidar2image):
        """points (P, 3+); cached dets (D, ...); lidar2image (NCAM, 4, 4).
        Returns (boxes (K, 7), scores, labels) numpy arrays."""
        h_img, w_img = self.image_size
        pts = points[:, :3]
        out_boxes, out_scores, out_labels = [], [], []
        for di in range(len(det_boxes)):
            if det_scores[di] < self.score_thr:
                continue
            cam = int(det_cams[di])
            l2i = lidar2image[cam]
            uv, depth = self._project(pts, l2i)
            x1, y1, x2, y2 = det_boxes[di]
            on = ((depth > 0) & (uv[:, 0] >= x1) & (uv[:, 0] < x2)
                  & (uv[:, 1] >= y1) & (uv[:, 1] < y2)
                  & (np.linalg.norm(pts, axis=1) < self.max_dist))
            box_pts = pts[on]
            if len(box_pts) < self.min_samples:
                continue
            cl = _dbscan(box_pts, self.eps, self.min_samples)
            anchor = self.anchors[int(det_labels[di]) - 1]
            cands, scores = [], []
            for cid in range(cl.max() + 1):
                members = box_pts[cl == cid]
                ctr = members.mean(axis=0)
                for rot in np.linspace(0, np.pi, self.num_rot,
                                       endpoint=False):
                    cand = np.array([ctr[0], ctr[1], ctr[2],
                                     anchor[0], anchor[1], anchor[2], rot],
                                    np.float32)
                    # back-projected IoU
                    from ..utils.geometry_np import boxes_to_corners_3d

                    cor = boxes_to_corners_3d(cand[None])[0]
                    uvc, dc = self._project(cor, l2i)
                    uvc[:, 0] = np.clip(uvc[:, 0], 0, w_img)
                    uvc[:, 1] = np.clip(uvc[:, 1], 0, h_img)
                    px1, py1 = uvc.min(axis=0)
                    px2, py2 = uvc.max(axis=0)
                    ix = max(0.0, min(px2, x2) - max(px1, x1))
                    iy = max(0.0, min(py2, y2) - max(py1, y1))
                    inter = ix * iy
                    union = ((px2 - px1) * (py2 - py1)
                             + (x2 - x1) * (y2 - y1) - inter)
                    iou = inter / max(union, 1e-9)
                    if iou <= self.min_cam_iou:
                        continue
                    # density: members inside candidate
                    sh = members - cand[:3]
                    c_, s_ = np.cos(-rot), np.sin(-rot)
                    lx = sh[:, 0] * c_ - sh[:, 1] * s_
                    ly = sh[:, 0] * s_ + sh[:, 1] * c_
                    inside = ((np.abs(lx) <= anchor[0] / 2)
                              & (np.abs(ly) <= anchor[1] / 2)
                              & (np.abs(sh[:, 2]) <= anchor[2] / 2))
                    dens = inside.mean() if len(members) else 0.0
                    cands.append(cand)
                    scores.append(self.iou_w * iou + self.dns_w * dens)
            if not cands:
                continue
            order = np.argsort(-np.asarray(scores))[: self.topk]
            for oi in order:
                out_boxes.append(cands[oi])
                out_scores.append(float(det_scores[di]))
                out_labels.append(int(det_labels[di]))
        if not out_boxes:
            return (np.zeros((0, 7), np.float32), np.zeros(0, np.float32),
                    np.zeros(0, np.int64))
        return (np.stack(out_boxes), np.asarray(out_scores, np.float32),
                np.asarray(out_labels, np.int64))


class FrustumDBSCAN:
    """FrustumDBSCAN (frustum_dbscan.py:38-351): cluster the in-frustum
    points of each cached 2D detection with DBSCAN and emit an
    AXIS-ALIGNED min/max bounding box per cluster (yaw 0) — no anchor
    priors, no scoring; the detection's label/score ride along. Options:
    `combine_clusters` collapses all non-noise points into one cluster
    (frustum_dbscan.py:304-308); `cluster_together` pools every frustum's
    points (with label/camera features) into ONE clustering and
    majority-votes each cluster's label (:219-266)."""

    def __init__(self, class_names, eps: float = 0.8, min_samples: int = 5,
                 min_cluster_size: int = 5, combine_clusters: bool = False,
                 cluster_together: bool = False, score_thr: float = 0.1,
                 max_dist: float = 60.0, image_size=(900, 1600)):
        self.class_names = list(class_names)
        self.eps = eps
        self.min_samples = min_samples
        self.min_cluster_size = min_cluster_size
        self.combine_clusters = combine_clusters
        self.cluster_together = cluster_together
        self.score_thr = score_thr
        self.max_dist = max_dist
        self.image_size = image_size

    def _project(self, pts, l2i):
        hom = pts @ l2i[:3, :3].T + l2i[:3, 3]
        depth = hom[:, 2]
        uv = hom[:, :2] / np.clip(depth[:, None], 1e-5, None)
        return uv, depth

    @staticmethod
    def _minmax_box(xyz):
        lo = xyz.min(axis=0)
        hi = xyz.max(axis=0)
        ctr = (lo + hi) / 2
        dim = hi - lo
        return np.array([ctr[0], ctr[1], ctr[2], dim[0], dim[1], dim[2],
                         0.0], np.float32)

    def propose(self, points, det_boxes, det_labels, det_scores, det_cams,
                lidar2image):
        pts = points[:, :3]
        frusts = []            # (xyz, label, score)
        for di in range(len(det_boxes)):
            if det_scores[di] < self.score_thr:
                continue
            cam = int(det_cams[di])
            uv, depth = self._project(pts, lidar2image[cam])
            x1, y1, x2, y2 = det_boxes[di]
            on = ((depth > 0) & (uv[:, 0] >= x1) & (uv[:, 0] < x2)
                  & (uv[:, 1] >= y1) & (uv[:, 1] < y2)
                  & (np.linalg.norm(pts, axis=1) < self.max_dist))
            if on.sum() == 0:
                continue
            frusts.append((pts[on], int(det_labels[di]),
                           float(det_scores[di])))

        out_boxes, out_scores, out_labels = [], [], []

        def emit(xyz, label, score):
            out_boxes.append(self._minmax_box(xyz))
            out_labels.append(label)
            out_scores.append(score)

        if self.cluster_together and frusts:
            # pooled clustering; per-cluster majority label (:245-252)
            X = np.concatenate([f[0] for f in frusts])
            lab = np.concatenate(
                [np.full(len(f[0]), f[1]) for f in frusts])
            sc = np.concatenate(
                [np.full(len(f[0]), f[2], np.float32) for f in frusts])
            cl = _dbscan(X, self.eps, self.min_samples)
            for cid in range(cl.max() + 1):
                m = cl == cid
                if m.sum() < self.min_cluster_size:
                    continue
                vals, counts = np.unique(lab[m], return_counts=True)
                emit(X[m], int(vals[np.argmax(counts)]),
                     float(sc[m].mean()))
        else:
            for xyz, label, score in frusts:
                if len(xyz) <= max(2, self.min_samples):
                    continue
                cl = _dbscan(xyz, self.eps, self.min_samples)
                if self.combine_clusters:
                    cl = np.where(cl >= 0, 0, -1)
                for cid in range(cl.max() + 1):
                    m = cl == cid
                    if m.sum() < self.min_cluster_size:
                        continue
                    emit(xyz[m], label, score)

        if not out_boxes:
            return (np.zeros((0, 7), np.float32),
                    np.zeros(0, np.float32), np.zeros(0, np.int64))
        return (np.stack(out_boxes), np.asarray(out_scores, np.float32),
                np.asarray(out_labels, np.int64))


def compute_pca_bbox(xyz):
    """PCA-yaw oriented bounding box (frustum_ov3ddet.py:34-68
    compute_bbox): yaw from the first 2D principal component, min/max
    extents in the de-rotated frame, center rotated back. Returns
    (cx, cy, cz, dx, dy, dz, yaw) with the reference's `-yaw` convention
    applied by CALLERS (they negate)."""
    xy = xyz[:, :2] - xyz[:, :2].mean(axis=0)
    cov = xy.T @ xy / max(len(xy), 1)
    _, vecs = np.linalg.eigh(cov)
    v = vecs[:, -1]                      # principal component
    yaw = float(np.arctan2(v[1], v[0]))
    c, s = np.cos(-yaw), np.sin(-yaw)
    rot = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    local = xyz @ rot.T
    lo, hi = local.min(axis=0), local.max(axis=0)
    dims = hi - lo
    ctr_local = (lo + hi) / 2
    ctr = ctr_local @ np.array([[np.cos(yaw), -np.sin(yaw), 0],
                                [np.sin(yaw), np.cos(yaw), 0],
                                [0, 0, 1.0]]).T
    return (float(ctr[0]), float(ctr[1]), float(ctr[2]),
            float(dims[0]), float(dims[1]), float(dims[2]), yaw)


class FrustumOV3DET:
    """OV-3DET-style proposer (frustum_ov3ddet.py:70-188): per 2D
    detection, subsample the frustum points to <= 3000, DBSCAN(0.75, 20),
    drop only the NOISE points (all clusters kept together), and fit one
    PCA-yaw oriented min/max box; needs >= `min_points` frustum points."""

    def __init__(self, class_names, eps: float = 0.75,
                 min_samples: int = 20, min_points: int = 100,
                 subsample_to: int = 3000, score_thr: float = 0.1,
                 max_dist: float = 60.0, image_size=(900, 1600)):
        self.class_names = list(class_names)
        self.eps = eps
        self.min_samples = min_samples
        self.min_points = min_points
        self.subsample_to = subsample_to
        self.score_thr = score_thr
        self.max_dist = max_dist
        self.image_size = image_size

    def propose(self, points, det_boxes, det_labels, det_scores, det_cams,
                lidar2image):
        pts = points[:, :3]
        out_boxes, out_scores, out_labels = [], [], []
        for di in range(len(det_boxes)):
            if det_scores[di] < self.score_thr:
                continue
            l2i = lidar2image[int(det_cams[di])]
            hom = pts @ l2i[:3, :3].T + l2i[:3, 3]
            depth = hom[:, 2]
            uv = hom[:, :2] / np.clip(depth[:, None], 1e-5, None)
            x1, y1, x2, y2 = det_boxes[di]
            on = ((depth > 0) & (uv[:, 0] >= x1) & (uv[:, 0] < x2)
                  & (uv[:, 1] >= y1) & (uv[:, 1] < y2)
                  & (np.linalg.norm(pts, axis=1) < self.max_dist))
            fr = pts[on]
            step = max(1, len(fr) // self.subsample_to)
            fr = fr[::step]
            if len(fr) < self.min_points:
                continue
            cl = _dbscan(fr, self.eps, self.min_samples)
            keep = cl >= 0
            if keep.sum() < 1:
                continue
            xc, yc, zc, l, w, h, yaw = compute_pca_bbox(fr[keep])
            out_boxes.append(
                np.array([xc, yc, zc, l, w, h, -yaw], np.float32))
            out_labels.append(int(det_labels[di]))
            out_scores.append(float(det_scores[di]))
        if not out_boxes:
            return (np.zeros((0, 7), np.float32),
                    np.zeros(0, np.float32), np.zeros(0, np.int64))
        return (np.stack(out_boxes), np.asarray(out_scores, np.float32),
                np.asarray(out_labels, np.int64))


# CLIP2Scene semantic label space (clip2scene_proposals.py:22-39)
CLASSES_NUSCENES_SEG = (
    "barrier", "bicycle", "bus", "car", "construction_vehicle",
    "motorcycle", "pedestrian", "traffic_cone", "trailer", "truck",
    "driveable_surface", "other_flat", "sidewalk", "terrain", "manmade",
    "vegetation",
)
BG_LABEL = 100


class Clip2SceneProposer:
    """CLIP2SceneProposer (clip2scene_proposals.py:40-152): per-POINT
    semantic labels (cached CLIP2Scene predictions, passed in directly
    instead of the reference's hard-coded .pth paths) are mapped into the
    detector class space, background dropped, foreground clustered per
    class with DBSCAN (or pooled over xyz+label when `cluster_together`),
    and each cluster emits one PCA-yaw oriented box with the majority
    label, score 1.0."""

    def __init__(self, class_names, eps: float = 0.25,
                 min_samples: int = 15, min_cluster_size: int = 10,
                 cluster_together: bool = False):
        self.class_names = list(class_names)
        self.eps = eps
        self.min_samples = min_samples
        self.min_cluster_size = min_cluster_size
        self.cluster_together = cluster_together
        # seg label (1-indexed) -> det label (1-indexed) or BG
        self.label_map = np.full(len(CLASSES_NUSCENES_SEG) + 1, BG_LABEL,
                                 np.int64)
        self.label_map[0] = BG_LABEL
        for k, seg in enumerate(CLASSES_NUSCENES_SEG):
            for v, det in enumerate(self.class_names):
                if seg == det:
                    self.label_map[k + 1] = v + 1

    def propose(self, points, point_seg_labels):
        """points (P, 3+); point_seg_labels (P,) CLIP2Scene 0..16."""
        pts = points[:, :3]
        lab = self.label_map[np.clip(point_seg_labels, 0,
                                     len(self.label_map) - 1)]
        fg = lab != BG_LABEL
        pts, lab = pts[fg], lab[fg]
        out_boxes, out_scores, out_labels = [], [], []

        def emit(xyz, members_lab):
            if len(xyz) < self.min_cluster_size:
                return
            counts = np.bincount(members_lab)
            xc, yc, zc, l, w, h, yaw = compute_pca_bbox(xyz)
            out_boxes.append(
                np.array([xc, yc, zc, l, w, h, -yaw], np.float32))
            out_labels.append(int(np.argmax(counts)))
            out_scores.append(1.0)

        if self.cluster_together and len(pts):
            X = np.concatenate([pts, lab[:, None].astype(np.float64)], 1)
            cl = _dbscan(X, self.eps, self.min_samples)
            for cid in range(cl.max() + 1):
                m = cl == cid
                emit(pts[m], lab[m])
        else:
            for det_label in range(1, len(self.class_names) + 1):
                m = lab == det_label
                if m.sum() == 0:
                    continue
                cl = _dbscan(pts[m], self.eps, self.min_samples)
                sub = pts[m]
                sl = lab[m]
                for cid in range(cl.max() + 1):
                    cm = cl == cid
                    emit(sub[cm], sl[cm])
        if not out_boxes:
            return (np.zeros((0, 7), np.float32),
                    np.zeros(0, np.float32), np.zeros(0, np.int64))
        return (np.stack(out_boxes), np.asarray(out_scores, np.float32),
                np.asarray(out_labels, np.int64))

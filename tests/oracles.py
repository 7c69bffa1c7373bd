"""Brute-force numpy oracles for geometry kernels (float64, Python loops).

Independent implementations used only to validate the JAX ops — Sutherland-
Hodgman convex clipping for rotated box intersection, direct point-in-box
tests, and a reference greedy NMS.
"""

import numpy as np


def box_to_corners_bev(box):
    """box: [x, y, dx, dy, heading] -> (4, 2) CCW corners."""
    x, y, dx, dy, r = box
    local = np.array(
        [[dx / 2, dy / 2], [-dx / 2, dy / 2], [-dx / 2, -dy / 2], [dx / 2, -dy / 2]]
    )
    c, s = np.cos(r), np.sin(r)
    rot = np.array([[c, -s], [s, c]])
    return local @ rot.T + np.array([x, y])


def polygon_area(poly):
    if len(poly) < 3:
        return 0.0
    p = np.asarray(poly)
    x, y = p[:, 0], p[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def clip_polygon(subject, clip):
    """Sutherland–Hodgman: clip `subject` polygon by convex `clip` polygon (CCW)."""

    def is_inside(p, a, b):
        return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) >= 0

    def line_intersect(p1, p2, a, b):
        d1 = p2 - p1
        d2 = b - a
        denom = d1[0] * d2[1] - d1[1] * d2[0]
        t = ((a[0] - p1[0]) * d2[1] - (a[1] - p1[1]) * d2[0]) / denom
        return p1 + t * d1

    output = [np.asarray(p, dtype=np.float64) for p in subject]
    clip = np.asarray(clip, dtype=np.float64)
    n = len(clip)
    for i in range(n):
        a, b = clip[i], clip[(i + 1) % n]
        input_list = output
        output = []
        if not input_list:
            break
        s = input_list[-1]
        for e in input_list:
            if is_inside(e, a, b):
                if not is_inside(s, a, b):
                    output.append(line_intersect(s, e, a, b))
                output.append(e)
            elif is_inside(s, a, b):
                output.append(line_intersect(s, e, a, b))
            s = e
    return output


def rotated_overlap_bev(box_a, box_b):
    """Exact intersection area of two rotated BEV boxes [x,y,dx,dy,r]."""
    ca = box_to_corners_bev(box_a)
    cb = box_to_corners_bev(box_b)
    return polygon_area(clip_polygon(ca, cb))


def rotated_iou_bev(box_a, box_b):
    inter = rotated_overlap_bev(box_a, box_b)
    ua = box_a[2] * box_a[3] + box_b[2] * box_b[3] - inter
    return inter / max(ua, 1e-8)


def iou3d(box_a, box_b):
    """box: [x, y, z, dx, dy, dz, r]."""
    inter_bev = rotated_overlap_bev(box_a[[0, 1, 3, 4, 6]], box_b[[0, 1, 3, 4, 6]])
    za0, za1 = box_a[2] - box_a[5] / 2, box_a[2] + box_a[5] / 2
    zb0, zb1 = box_b[2] - box_b[5] / 2, box_b[2] + box_b[5] / 2
    inter_h = max(0.0, min(za1, zb1) - max(za0, zb0))
    inter = inter_bev * inter_h
    va = box_a[3] * box_a[4] * box_a[5]
    vb = box_b[3] * box_b[4] * box_b[5]
    return inter / max(va + vb - inter, 1e-6)


def greedy_nms(boxes, scores, thresh, iou_fn):
    """Reference greedy NMS: returns kept indices in score order."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            if iou_fn(boxes[i], boxes[j]) > thresh:
                suppressed[j] = True
    return keep


def points_in_box(points, box):
    """points (P,3), box [x,y,z,dx,dy,dz,r] -> (P,) bool."""
    shift = points[:, :3] - box[:3]
    c, s = np.cos(-box[6]), np.sin(-box[6])
    lx = shift[:, 0] * c - shift[:, 1] * s
    ly = shift[:, 0] * s + shift[:, 1] * c
    return (
        (np.abs(lx) <= box[3] / 2)
        & (np.abs(ly) <= box[4] / 2)
        & (np.abs(shift[:, 2]) <= box[5] / 2)
    )

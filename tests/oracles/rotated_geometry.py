"""Numpy oracle for rotated-box geometry.

A faithful transcription of the reference's Detectron2-derived C++/CUDA
algorithm (`/root/reference/python/jdet/ops/nms_rotated.py:16-258`) used as
the ground truth for testing the vectorized TPU implementation. Sequential
and slow by design — test-only.
"""
import numpy as np


def get_rotated_vertices(box):
    cx, cy, w, h, a = box
    cos2 = np.cos(a) * 0.5
    sin2 = np.sin(a) * 0.5
    pts = np.zeros((4, 2))
    pts[0] = [cx - sin2 * h - cos2 * w, cy + cos2 * h - sin2 * w]
    pts[1] = [cx + sin2 * h - cos2 * w, cy - cos2 * h - sin2 * w]
    pts[2] = [2 * cx - pts[0][0], 2 * cy - pts[0][1]]
    pts[3] = [2 * cx - pts[1][0], 2 * cy - pts[1][1]]
    return pts


def _cross(a, b):
    return a[0] * b[1] - b[0] * a[1]


def get_intersection_points(pts1, pts2):
    vec1 = [pts1[(i + 1) % 4] - pts1[i] for i in range(4)]
    vec2 = [pts2[(i + 1) % 4] - pts2[i] for i in range(4)]
    inter = []
    for i in range(4):
        for j in range(4):
            det = _cross(vec2[j], vec1[i])
            if abs(det) <= 1e-14:
                continue
            vec12 = pts2[j] - pts1[i]
            t1 = _cross(vec2[j], vec12) / det
            t2 = _cross(vec1[i], vec12) / det
            if 0.0 <= t1 <= 1.0 and 0.0 <= t2 <= 1.0:
                inter.append(pts1[i] + vec1[i] * t1)

    for (pa, pb, va) in ((pts1, pts2, vec2), (pts2, pts1, vec1)):
        ab = va[0]
        da = va[3]
        abdab = ab @ ab
        addad = da @ da
        for i in range(4):
            ap = pa[i] - pb[0]
            apdab = ap @ ab
            apdad = -(ap @ da)
            if apdab >= 0 and apdad >= 0 and apdab <= abdab and apdad <= addad:
                inter.append(pa[i])
    return np.array(inter) if inter else np.zeros((0, 2))


def convex_hull_graham(p):
    num_in = len(p)
    if num_in < 2:
        return p
    t = 0
    for i in range(1, num_in):
        if p[i][1] < p[t][1] or (p[i][1] == p[t][1] and p[i][0] < p[t][0]):
            t = i
    start = p[t].copy()
    q = p - start
    q[[0, t]] = q[[t, 0]]
    dist = (q * q).sum(1)

    # sort points 1..n-1 by angle (cross-product comparator), ties by dist
    def cmp_key(i):
        return (np.arctan2(q[i][1], q[i][0]), dist[i])

    idx = sorted(range(1, num_in), key=cmp_key)
    q[1:] = q[idx]
    dist[1:] = dist[idx]

    k = 1
    while k < num_in and dist[k] <= 1e-8:
        k += 1
    if k == num_in:
        return start[None, :]
    out = [q[0], q[k]]
    for i in range(k + 1, num_in):
        while len(out) > 1 and _cross(q[i] - out[-2], out[-1] - out[-2]) >= 0:
            out.pop()
        out.append(q[i])
    return np.array(out) + start


def polygon_area(q):
    m = len(q)
    if m <= 2:
        return 0.0
    area = 0.0
    for i in range(1, m - 1):
        area += abs(_cross(q[i] - q[0], q[i + 1] - q[0]))
    return area / 2.0


def rotated_boxes_intersection(box1, box2):
    pts1 = get_rotated_vertices(box1)
    pts2 = get_rotated_vertices(box2)
    pts = get_intersection_points(pts1, pts2)
    if len(pts) <= 2:
        return 0.0
    hull = convex_hull_graham(pts)
    return polygon_area(hull)


def single_box_iou_rotated(box1, box2, mode="iou"):
    area1 = box1[2] * box1[3]
    area2 = box2[2] * box2[3]
    inter = rotated_boxes_intersection(box1, box2)
    if mode == "iou":
        denom = area1 + area2 - inter
    else:
        denom = area1
    if denom <= 1e-9:
        return 0.0
    return inter / denom


def box_iou_rotated_np(boxes1, boxes2, mode="iou"):
    out = np.zeros((len(boxes1), len(boxes2)))
    for i, b1 in enumerate(boxes1):
        for j, b2 in enumerate(boxes2):
            out[i, j] = single_box_iou_rotated(b1, b2, mode)
    return out


def nms_rotated_np(boxes, scores, iou_threshold):
    """Greedy rotated NMS; returns kept indices in score order."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i or scores[j] > scores[i]:
                continue
            if single_box_iou_rotated(boxes[i], boxes[j]) > iou_threshold:
                suppressed[j] = True
    return np.array(keep, dtype=np.int64)

"""Numpy loop-level transcriptions of reference target/encode pipelines.

Each function mirrors one reference routine statement-by-statement (file
references relative to /root/reference/python/jdet/) so the repo's batched
jax formulations can be lockstep-tested against them:

- GVFixCoder.encode/decode, GVRatioCoder.encode
  (models/boxes/coder.py:144-233)
- CSLCoder.encode/decode (models/boxes/coder.py:521-604)
- FCOSHead._get_target_single (models/roi_heads/fcos_head.py:599-670)
- RoI-Transformer second-stage target/refine kernels:
  hbb2obb_v2 / choose_best_obb_batch / choose_best_Rroi_batch /
  dbbox2delta_v3 / choose_best_match_batch + dbbox2delta_v2
  (= best_match_dbbox2delta) / delta2dbbox_v3
  (ops/bbox_transforms.py:7-64,206-370,444-480;
  models/roi_heads/rbbox_head.py:113-160,377-449)

Transcriptions preserve the reference's tie-breaking (first-occurrence
argmax/argmin), truncation (`.long()` truncates toward zero), window
boundaries (rect window covers offsets [-radius, radius)), and the
axis-aligned h_mask override in GVFix.
"""
import numpy as np

INF = 1e8


# ---------------------------------------------------------------------------
# Gliding vertex (coder.py:144-233)
# ---------------------------------------------------------------------------


def gv_fix_encode_np(polys):
    """GVFixCoder.encode (coder.py:148-186). polys (n, 8) float64."""
    n = polys.shape[0]
    out = np.zeros((n, 4), np.float64)
    for i in range(n):
        xs = polys[i, 0::2]
        ys = polys[i, 1::2]
        # jittor argmax/argmin return first occurrence on ties
        max_x_idx = int(np.argmax(xs))
        min_x_idx = int(np.argmin(xs))
        max_y_idx = int(np.argmax(ys))
        min_y_idx = int(np.argmin(ys))
        min_x, max_x = xs[min_x_idx], xs[max_x_idx]
        min_y, max_y = ys[min_y_idx], ys[max_y_idx]
        pts = polys[i].reshape(4, 2)
        # polys_ordered rows: [min_y vertex, max_x vertex, max_y vertex,
        # min_x vertex]
        v_top = pts[min_y_idx]
        v_right = pts[max_x_idx]
        v_down = pts[max_y_idx]
        v_left = pts[min_x_idx]
        dt = (v_top[0] - min_x) / (max_x - min_x)
        dr = (v_right[1] - min_y) / (max_y - min_y)
        dd = (max_x - v_down[0]) / (max_x - min_x)
        dl = (max_y - v_left[1]) / (max_y - min_y)
        h_mask = (v_top[1] - v_right[1] == 0) or (v_right[0] - v_down[0] == 0)
        out[i] = 1.0 if h_mask else (dt, dr, dd, dl)
    return out


def gv_fix_decode_np(hbbs, fix_deltas):
    """GVFixCoder.decode (coder.py:188-207), K=1 class."""
    n = hbbs.shape[0]
    out = np.zeros((n, 8), np.float64)
    for i in range(n):
        x1, y1, x2, y2 = hbbs[i]
        w = x2 - x1
        h = y2 - y1
        dt, dr, dd, dl = fix_deltas[i]
        out[i] = [x1 + w * dt, y1, x2, y1 + h * dr,
                  x2 - w * dd, y2, x1, y2 - h * dl]
    return out


def gv_ratio_encode_np(polys):
    """GVRatioCoder.encode (coder.py:209-233): shoelace poly area over
    AABB area."""
    n = polys.shape[0]
    out = np.zeros((n, 1), np.float64)
    for i in range(n):
        xs = polys[i, 0::2]
        ys = polys[i, 1::2]
        h_area = (xs.max() - xs.min()) * (ys.max() - ys.min())
        area = 0.0
        for j in range(4):
            area += 0.5 * (xs[j] * ys[(j + 1) % 4] - xs[(j + 1) % 4] * ys[j])
        out[i, 0] = abs(area) / h_area
    return out


# ---------------------------------------------------------------------------
# CSL (coder.py:521-604)
# ---------------------------------------------------------------------------


def csl_encode_np(angles, omega=1, window="gaussian", radius=6):
    """CSLCoder.encode. angles (n,) radians (the head feeds the encoded
    delta angle, csl_rretina_head.py:574-578). `.long()` truncates toward
    zero; scatter writes duplicate indices last-wins (only relevant for
    omega > 1 where the gaussian base range wraps more than once)."""
    L = int(180 // omega)
    n = angles.shape[0]
    out = np.zeros((n, L), np.float64)
    deg = angles * (180.0 / np.pi)
    a = np.trunc((deg + 45.0) / omega).astype(np.int64)  # .long()
    if window == "pulse":
        for i in range(n):
            out[i, a[i] % L] = 1.0
        return out
    if window in ("rect", "triangle"):
        base = np.arange(-radius, radius)  # note: excludes +radius
        val = (np.ones_like(base, np.float64) if window == "rect"
               else 1.0 - np.abs(base / float(radius)))
    else:  # gaussian
        base = np.arange(-90, 90)
        val = np.exp(-(base.astype(np.float64) ** 2) / (2 * radius**2))
    for i in range(n):
        for k, v in zip(base, val):
            out[i, (k + a[i]) % L] = v
    return out


def csl_decode_np(logits, omega=1):
    L = int(180 // omega)
    idx = np.argmax(logits, axis=-1)
    deg = ((idx + 0.5) * omega) % 180 - 45.0
    return deg * (np.pi / 180.0)


# ---------------------------------------------------------------------------
# FCOS rotated targets (roi_heads/fcos_head.py:599-670)
# ---------------------------------------------------------------------------


def regular_theta_np(theta, start=-np.pi / 2, cycle=np.pi):
    return (theta - start) % cycle + start


def mintheta_obb_np(obb):
    """box_ops.py:679-693. obb (5,) -> (5,)."""
    x, y, w, h, theta = obb
    t1 = regular_theta_np(theta)
    t2 = regular_theta_np(theta + np.pi / 2)
    if abs(t1) < abs(t2):
        return np.array([x, y, w, h, t1])
    return np.array([x, y, h, w, t2])


def fcos_target_single_np(points, regress_ranges, strides_pts, gt_bboxes,
                          gt_labels, num_classes, center_sampling=False,
                          center_sample_radius=1.5):
    """FCOSHead._get_target_single. gt_bboxes in the REFERENCE obb
    convention (obb2poly width axis = (cos t, -sin t),
    bbox_transforms.py:610-636). Returns labels (N,) 0-based with
    bg=num_classes, bbox_targets (N, 5) [l, t, r, b, theta]."""
    N = points.shape[0]
    K = gt_bboxes.shape[0]
    labels = np.full((N,), num_classes, np.int64)
    bbox_targets = np.zeros((N, 5), np.float64)
    if K == 0:
        return labels, bbox_targets
    gts = np.stack([mintheta_obb_np(g) for g in gt_bboxes])
    areas_gt = gts[:, 2] * gts[:, 3]
    for p in range(N):
        best_area = INF
        best_k = 0  # argmin over all-INF rows returns index 0
        best_ltrb = None
        for k in range(K):
            cx, cy, w, h, t = gts[k]
            ox, oy = points[p, 0] - cx, points[p, 1] - cy
            # Matrix = [[cos, -sin], [sin, cos]] @ offset
            off_x = np.cos(t) * ox - np.sin(t) * oy
            off_y = np.sin(t) * ox + np.cos(t) * oy
            left = w / 2 + off_x
            right = w / 2 - off_x
            top = h / 2 + off_y
            bottom = h / 2 - off_y
            ltrb = np.array([left, top, right, bottom])
            inside = ltrb.min() > 0
            if center_sampling:
                r = center_sample_radius * strides_pts[p]
                inside = inside and (abs(off_x) < r) and (abs(off_y) < r)
            max_d = ltrb.max()
            in_range = (max_d >= regress_ranges[p, 0]) and (
                max_d <= regress_ranges[p, 1]
            )
            area = areas_gt[k] if (inside and in_range) else INF
            if area < best_area:
                best_area = area
                best_k = k
                best_ltrb = ltrb
        if best_area < INF:
            labels[p] = gt_labels[best_k] - 1
            bbox_targets[p, :4] = best_ltrb
            bbox_targets[p, 4] = gts[best_k, 4]
        else:
            # reference still takes row argmin (=0) for bbox_targets of
            # background points; values are unused (masked by labels)
            pass
    return labels, bbox_targets


def centerness_target_np(pos_ltrb):
    lr = pos_ltrb[:, [0, 2]]
    tb = pos_ltrb[:, [1, 3]]
    return np.sqrt(
        (lr.min(1) / lr.max(1)) * (tb.min(1) / tb.max(1))
    )


# ---------------------------------------------------------------------------
# RoI-Transformer second stage (rbbox_head.py + bbox_transforms.py)
# ---------------------------------------------------------------------------


def hbb2obb_v2_np(boxes):
    """bbox_transforms.py:34-44. Note the reference's legacy +1 pixel
    extents and the (vertical-extent-as-width, angle=-pi/2) encoding."""
    n = boxes.shape[0]
    out = np.zeros((n, 5), np.float64)
    ex_h = boxes[:, 2] - boxes[:, 0] + 1.0  # named "heights" in reference
    ex_w = boxes[:, 3] - boxes[:, 1] + 1.0
    out[:, 0] = boxes[:, 0] + 0.5 * (ex_h - 1.0)
    out[:, 1] = boxes[:, 1] + 0.5 * (ex_w - 1.0)
    out[:, 2] = ex_w
    out[:, 3] = ex_h
    out[:, 4] = -np.pi / 2
    return out


def choose_best_obb_batch_np(gt_obbs):
    """bbox_transforms.py:465-480: canonicalize gt angle near -3pi/4
    side."""
    g = gt_obbs.copy()
    w, h = gt_obbs[:, 2].copy(), gt_obbs[:, 3].copy()
    g[:, 4] = (g[:, 4] - np.pi / 4.0) % np.pi
    idx = g[:, 4] >= np.pi / 2
    g[idx, 2] = h[idx]
    g[idx, 3] = w[idx]
    g[idx, 4] = g[idx, 4] - np.pi / 2.0
    g[:, 4] = g[:, 4] - np.pi * 3.0 / 4.0
    return g


def choose_best_Rroi_batch_np(rroi):
    """bbox_transforms.py:444-463: force w >= h, angle % pi."""
    r = rroi.copy()
    w, h = rroi[:, 2].copy(), rroi[:, 3].copy()
    idx = w < h
    r[idx, 2] = h[idx]
    r[idx, 3] = w[idx]
    r[idx, 4] = r[idx, 4] + np.pi / 2.0
    r[:, 4] = r[:, 4] % np.pi
    return r


def dbbox2delta_v3_np(proposals, gt, means=(0.0,) * 5, stds=(1.0,) * 5):
    """bbox_transforms.py:7-32: dangle is the RAW angle difference."""
    p = proposals.astype(np.float64)
    g = gt.astype(np.float64)
    coord = g[:, 0:2] - p[:, 0:2]
    dx = (np.cos(p[:, 4]) * coord[:, 0] + np.sin(p[:, 4]) * coord[:, 1]) / p[:, 2]
    dy = (-np.sin(p[:, 4]) * coord[:, 0] + np.cos(p[:, 4]) * coord[:, 1]) / p[:, 3]
    dw = np.log(g[:, 2] / p[:, 2])
    dh = np.log(g[:, 3] / p[:, 3])
    dangle = g[:, 4] - p[:, 4]
    deltas = np.stack([dx, dy, dw, dh, dangle], -1)
    return (deltas - np.asarray(means)) / np.asarray(stds)


def delta2dbbox_v3_np(rrois, deltas, means=(0.0,) * 5, stds=(1.0,) * 5,
                      wh_ratio_clip=16 / 1000):
    """bbox_transforms.py:279-321: gangle = dangle + roi angle (raw)."""
    d = deltas * np.asarray(stds) + np.asarray(means)
    dx, dy, dw, dh, dangle = (d[:, i] for i in range(5))
    max_ratio = abs(np.log(wh_ratio_clip))
    dw = np.clip(dw, -max_ratio, max_ratio)
    dh = np.clip(dh, -max_ratio, max_ratio)
    rx, ry, rw, rh, ra = (rrois[:, i] for i in range(5))
    gx = dx * rw * np.cos(ra) - dy * rh * np.sin(ra) + rx
    gy = dx * rw * np.sin(ra) + dy * rh * np.cos(ra) + ry
    gw = rw * np.exp(dw)
    gh = rh * np.exp(dh)
    gangle = dangle + ra
    return np.stack([gx, gy, gw, gh, gangle], -1)


def choose_best_match_batch_np(rrois, gt_rois):
    """bbox_transforms.py:330-366: per roi, pick the gt representation
    (4 right-angle rotations, w/h swapped for the odd ones) whose angle is
    circularly closest to the roi angle; final angle %= 2pi."""
    n = rrois.shape[0]
    out = np.zeros_like(gt_rois)
    for i in range(n):
        ra = rrois[i, 4]
        gx, gy, gw, gh, ga = gt_rois[i]
        exts = [
            (gx, gy, gw, gh, ga),
            (gx, gy, gh, gw, ga + np.pi / 2),
            (gx, gy, gw, gh, ga + np.pi),
            (gx, gy, gh, gw, ga + np.pi * 3 / 2),
        ]
        dists = []
        for e in exts:
            d = (ra - e[4]) % (2 * np.pi)
            dists.append(min(d, 2 * np.pi - d))
        j = int(np.argmin(dists))  # first occurrence on ties
        out[i] = exts[j]
    out[:, 4] = out[:, 4] % (2 * np.pi)
    return out


def dbbox2delta_v2_np(proposals, gt, means=(0.0,) * 5, stds=(1.0,) * 5):
    """bbox_transforms.py:206-237: dangle = signed circular distance
    normalized by pi/2 (sign from sin of the raw difference)."""
    p = proposals.astype(np.float64)
    g = gt.astype(np.float64)
    coord = g[:, 0:2] - p[:, 0:2]
    dx = (np.cos(p[:, 4]) * coord[:, 0] + np.sin(p[:, 4]) * coord[:, 1]) / p[:, 2]
    dy = (-np.sin(p[:, 4]) * coord[:, 0] + np.cos(p[:, 4]) * coord[:, 1]) / p[:, 3]
    dw = np.log(g[:, 2] / p[:, 2])
    dh = np.log(g[:, 3] / p[:, 3])
    dangle = g[:, 4] - p[:, 4]
    dist = dangle % (2 * np.pi)
    dist = np.minimum(dist, 2 * np.pi - dist)
    dist = np.where(np.sin(dangle) < 0, -dist, dist)
    dist = dist / (np.pi / 2.0)
    deltas = np.stack([dx, dy, dw, dh, dist], -1)
    return (deltas - np.asarray(means)) / np.asarray(stds)


def best_match_dbbox2delta_np(rrois, gt, means=(0.0,) * 5, stds=(1.0,) * 5):
    """bbox_transforms.py:268-272."""
    return dbbox2delta_v2_np(
        rrois, choose_best_match_batch_np(rrois, gt), means, stds
    )


def delta2dbbox_v2_np(rrois, deltas, means=(0.0,) * 5, stds=(1.0,) * 5,
                      wh_ratio_clip=16 / 1000):
    """bbox_transforms.py:323-370: gangle = (pi/2) * dangle + roi angle."""
    d = deltas * np.asarray(stds) + np.asarray(means)
    dx, dy, dw, dh, dangle = (d[:, i] for i in range(5))
    max_ratio = abs(np.log(wh_ratio_clip))
    dw = np.clip(dw, -max_ratio, max_ratio)
    dh = np.clip(dh, -max_ratio, max_ratio)
    rx, ry, rw, rh, ra = (rrois[:, i] for i in range(5))
    gx = dx * rw * np.cos(ra) - dy * rh * np.sin(ra) + rx
    gy = dx * rw * np.sin(ra) + dy * rh * np.cos(ra) + ry
    gw = rw * np.exp(dw)
    gh = rh * np.exp(dh)
    gangle = (np.pi / 2.0) * dangle + ra
    return np.stack([gx, gy, gw, gh, gangle], -1)

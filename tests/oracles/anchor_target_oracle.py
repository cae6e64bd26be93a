"""Numpy transcriptions of the reference target pipeline, loop-for-loop.

Sources (all under /root/reference/python/jdet/models/boxes/):
  - MaxIoUAssigner.assign_wrt_overlaps  assigner.py:160-221
  - anchor_target_single (pseudo-sampler path)  anchor_target.py:105-183
  - bbox2delta_rotated + norm_angle  box_ops.py:176-229
  - MidpointOffsetCoder.encode  coder.py:323-377

These are deliberately written in the reference's index-list style (python
loops, boolean slicing, in-place writes) so they pin the reference
SEMANTICS; the repo's batched-masked formulations are asserted equal to
them in tests/test_target_oracles.py.
"""
import numpy as np


def norm_angle_np(angle, lo=-np.pi / 4, rng=np.pi):
    return (angle - lo) % rng + lo


def rbox2delta_np(proposals, gt, means=(0.0,) * 5, stds=(1.0,) * 5):
    """bbox2delta_rotated (box_ops.py:180-229)."""
    pw, ph, pa = proposals[:, 2], proposals[:, 3], proposals[:, 4]
    cosa, sina = np.cos(pa), np.sin(pa)
    ox = gt[:, 0] - proposals[:, 0]
    oy = gt[:, 1] - proposals[:, 1]
    dx = (cosa * ox + sina * oy) / pw
    dy = (-sina * ox + cosa * oy) / ph
    dw = np.log(gt[:, 2] / pw)
    dh = np.log(gt[:, 3] / ph)
    da = norm_angle_np(gt[:, 4] - pa) / np.pi
    deltas = np.stack([dx, dy, dw, dh, da], -1)
    return (deltas - np.asarray(means)) / np.asarray(stds)


def assign_wrt_overlaps_np(
    overlaps,
    gt_labels=None,
    pos_iou_thr=0.5,
    neg_iou_thr=0.4,
    min_pos_iou=0.0,
    gt_max_assign_all=True,
    match_low_quality=True,
):
    """MaxIoUAssigner.assign_wrt_overlaps (assigner.py:160-221).

    overlaps: (k, n) numpy IoU of gts x anchors (real gts only).
    Returns assigned_gt_inds (-1/0/i+1) and labels (0 bg / 1-based cls).
    """
    num_gts, num_bboxes = overlaps.shape
    assigned = np.full((num_bboxes,), -1, np.int64)

    max_overlaps = overlaps.max(axis=0) if num_gts else np.zeros(num_bboxes)
    argmax_overlaps = (
        overlaps.argmax(axis=0) if num_gts else np.zeros(num_bboxes, int)
    )
    gt_max_overlaps = overlaps.max(axis=1) if num_gts else np.zeros(0)
    gt_argmax_overlaps = (
        overlaps.argmax(axis=1) if num_gts else np.zeros(0, int)
    )

    if isinstance(neg_iou_thr, float):
        assigned[(max_overlaps >= 0) & (max_overlaps < neg_iou_thr)] = 0
    else:
        lo, hi = neg_iou_thr
        assigned[(max_overlaps >= lo) & (max_overlaps < hi)] = 0

    pos = max_overlaps >= pos_iou_thr
    assigned[pos] = argmax_overlaps[pos] + 1

    if match_low_quality:
        for i in range(num_gts):
            if gt_max_overlaps[i] >= min_pos_iou:
                if gt_max_assign_all:
                    assigned[overlaps[i, :] == gt_max_overlaps[i]] = i + 1
                else:
                    assigned[gt_argmax_overlaps[i]] = i + 1

    if gt_labels is not None:
        labels = np.zeros((num_bboxes,), np.int64)
        pos_inds = np.nonzero(assigned > 0)[0]
        labels[pos_inds] = gt_labels[assigned[pos_inds] - 1]
    else:
        labels = (assigned > 0).astype(np.int64)
    return assigned, labels, max_overlaps


def anchor_target_single_np(
    anchors,
    valid_flags,
    gt_bboxes,
    gt_labels,
    overlaps_full,
    target_means=(0.0,) * 5,
    target_stds=(1.0,) * 5,
    pos_iou_thr=0.5,
    neg_iou_thr=0.4,
    min_pos_iou=0.0,
    pos_weight=-1,
    reg_decoded_bbox=False,
):
    """anchor_target_single, sampling=False/PseudoSampler
    (anchor_target.py:105-183): slice inside anchors, assign, scatter
    targets, unmap to the full anchor set.

    overlaps_full: (k, n) IoU of real gts x ALL anchors (the oracle
    receives the IoU matrix so only assignment/encode/weight logic is
    under test).
    """
    inside = np.asarray(valid_flags, bool)
    anchors_in = anchors[inside]
    ov = overlaps_full[:, inside]

    assigned, labels_in, _ = assign_wrt_overlaps_np(
        ov, gt_labels, pos_iou_thr, neg_iou_thr, min_pos_iou
    )

    n_in = anchors_in.shape[0]
    bbox_targets = np.zeros((n_in, anchors.shape[1]), np.float64)
    bbox_weights = np.zeros_like(bbox_targets)
    labels = np.zeros(n_in, np.int64)
    label_weights = np.zeros(n_in, np.float64)

    pos_inds = np.nonzero(assigned > 0)[0]
    neg_inds = np.nonzero(assigned == 0)[0]
    if len(pos_inds):
        pos_gts = gt_bboxes[assigned[pos_inds] - 1]
        if reg_decoded_bbox:
            bbox_targets[pos_inds] = pos_gts
        else:
            bbox_targets[pos_inds] = rbox2delta_np(
                anchors_in[pos_inds], pos_gts, target_means, target_stds
            )
        bbox_weights[pos_inds] = 1.0
        labels[pos_inds] = (
            gt_labels[assigned[pos_inds] - 1] if gt_labels is not None else 1
        )
        label_weights[pos_inds] = 1.0 if pos_weight <= 0 else pos_weight
    label_weights[neg_inds] = 1.0

    def unmap(data):
        full_shape = (anchors.shape[0],) + data.shape[1:]
        full = np.zeros(full_shape, data.dtype)
        full[inside] = data
        return full

    return {
        "labels": unmap(labels),
        "label_weights": unmap(label_weights),
        "bbox_targets": unmap(bbox_targets),
        "bbox_weights": unmap(bbox_weights),
        "num_pos": max(len(pos_inds), 1),
        "num_neg": max(len(neg_inds), 1),
    }


def midpoint_offset_encode_np(
    hbb, gt_poly, gt_hbb, means=(0.0,) * 6, stds=(1.0,) * 6
):
    """MidpointOffsetCoder.encode (coder.py:331-377). The poly/hbb of the
    gt obb are passed in (computed by the caller's own conversion so only
    the encode arithmetic is under test)."""
    px = (hbb[:, 0] + hbb[:, 2]) * 0.5
    py = (hbb[:, 1] + hbb[:, 3]) * 0.5
    pw = hbb[:, 2] - hbb[:, 0]
    ph = hbb[:, 3] - hbb[:, 1]
    gx = (gt_hbb[:, 0] + gt_hbb[:, 2]) * 0.5
    gy = (gt_hbb[:, 1] + gt_hbb[:, 3]) * 0.5
    gw = gt_hbb[:, 2] - gt_hbb[:, 0]
    gh = gt_hbb[:, 3] - gt_hbb[:, 1]

    x_coor, y_coor = gt_poly[:, 0::2], gt_poly[:, 1::2]
    y_min = y_coor.min(axis=1, keepdims=True)
    x_max = x_coor.max(axis=1, keepdims=True)

    _x = x_coor.copy()
    _x[np.abs(y_coor - y_min) > 0.1] = -1000
    ga = _x.max(1)
    _y = y_coor.copy()
    _y[np.abs(x_coor - x_max) > 0.1] = -1000
    gb = _y.max(1)

    dx = (gx - px) / pw
    dy = (gy - py) / ph
    dw = np.log(gw / pw)
    dh = np.log(gh / ph)
    da = (ga - gx) / gw
    db = (gb - gy) / gh
    deltas = np.stack([dx, dy, dw, dh, da, db], -1)
    return (deltas - np.asarray(means)) / np.asarray(stds)


def convex_assigner_np(points, gt_polys, pos_num=1, scale=4.0):
    """Loop transcription of ConvexAssigner.assign
    (models/boxes/assigner.py:394-551). points (n, 3) = (x, y, stride);
    gt_polys (k, 8). Returns assigned_gt_inds (n,) 0 = neg, i+1 = gt i.
    Sequential over gts: a later gt steals a point only at strictly
    smaller normalized center distance (assigner.py:525-538)."""
    n = points.shape[0]
    k = gt_polys.shape[0]
    assigned = np.zeros((n,), np.int64)
    assigned_dist = np.full((n,), np.inf)
    pt_lvl = np.log2(points[:, 2]).astype(np.int64)
    lvl_min, lvl_max = pt_lvl.min(), pt_lvl.max()
    for idx in range(k):
        xs, ys = gt_polys[idx, 0::2], gt_polys[idx, 1::2]
        gx = (xs.min() + xs.max()) / 2.0
        gy = (ys.min() + ys.max()) / 2.0
        gw = max(xs.max() - xs.min(), 1e-6)
        gh = max(ys.max() - ys.min(), 1e-6)
        gt_lvl = int((np.log2(gw / scale) + np.log2(gh / scale)) / 2.0)
        gt_lvl = min(max(gt_lvl, lvl_min), lvl_max)
        lvl_idx = np.nonzero(pt_lvl == gt_lvl)[0]
        d = np.sqrt(
            ((points[lvl_idx, 0] - gx) / gw) ** 2
            + ((points[lvl_idx, 1] - gy) / gh) ** 2
        )
        order = np.argsort(d, kind="stable")[:pos_num]
        cand = lvl_idx[order]
        cand_d = d[order]
        steal = cand_d < assigned_dist[cand]
        assigned[cand[steal]] = idx + 1
        assigned_dist[cand[steal]] = cand_d[steal]
    return assigned

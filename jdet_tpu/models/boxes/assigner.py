"""Fixed-shape (masked) assigners — the jit-compatible re-expression of the
reference's dynamic-shape assignment (`python/jdet/models/boxes/assigner.py`).

Instead of gathering positive/negative index lists, every assigner returns
dense per-anchor arrays:

  gt_inds:      (n,) int32 — -1 ignore, 0 negative, i+1 positive for gt i
  max_overlaps: (n,) float
  labels:       (n,) int32 — 0 background, 1-based class for positives

GT boxes arrive padded to a fixed MAX_GT with a validity mask; invalid gt
rows never match (their IoU rows are masked to -inf).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...ops.box_iou_rotated import box_iou_rotated
from ...ops.box_convert import rbox_to_hbox


def hbb_overlaps(boxes1, boxes2, mode="iou"):
    """Pairwise IoU of horizontal x1y1x2y2 boxes, (n, m).

    Mirrors `bbox_overlaps` (models/boxes/iou_calculator.py:235-350).
    """
    area1 = (boxes1[:, 2] - boxes1[:, 0]) * (boxes1[:, 3] - boxes1[:, 1])
    area2 = (boxes2[:, 2] - boxes2[:, 0]) * (boxes2[:, 3] - boxes2[:, 1])
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:4], boxes2[None, :, 2:4])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    if mode == "iou":
        union = area1[:, None] + area2[None, :] - inter
    elif mode == "iof":
        union = area1[:, None] * jnp.ones_like(area2)[None, :]
    else:
        raise ValueError(mode)
    return jnp.where(union > 1e-9, inter / jnp.maximum(union, 1e-9), 0.0)


def assign_wrt_overlaps(
    overlaps,
    gt_mask,
    gt_labels=None,
    pos_iou_thr=0.5,
    neg_iou_thr=0.4,
    min_pos_iou=0.0,
    gt_max_assign_all=True,
    match_low_quality=True,
    ignore_mask=None,
    anchor_mask=None,
):
    """Masked MaxIoU assignment from a (k, n) overlap matrix.

    Mirrors `MaxIoUAssigner.assign_wrt_overlaps` (assigner.py:160-221):
      1. default -1 (ignore)
      2. max_overlap < neg_iou_thr -> 0 (negative)
      3. max_overlap >= pos_iou_thr -> argmax gt + 1
      4. low-quality match: each gt claims its best anchor(s) if
         gt_max >= min_pos_iou (later gts override earlier — loop order).

    Args:
      overlaps: (k, n) IoU of padded gts x anchors.
      gt_mask: (k,) bool — real gt rows.
      ignore_mask: optional (n,) bool — anchors overlapping ignore regions;
        they stay at -1 (reference sets their IoU column to -1).
      anchor_mask: optional (n,) bool — anchors eligible at all (inside
        image); False entries behave as if sliced out pre-assignment
        (anchor_target.py:124-130) and end at -1.
    """
    k, n = overlaps.shape
    ov = jnp.where(gt_mask[:, None], overlaps, -jnp.inf)
    if anchor_mask is not None:
        ov = jnp.where(anchor_mask[None, :], ov, -jnp.inf)
    if ignore_mask is not None:
        ov = jnp.where(ignore_mask[None, :], -1.0, ov)

    max_overlaps = ov.max(axis=0)
    argmax_overlaps = ov.argmax(axis=0)
    any_gt = gt_mask.any()
    # with zero real gts, every anchor is negative
    max_overlaps = jnp.where(any_gt, max_overlaps, 0.0)

    assigned = jnp.full((n,), -1, jnp.int32)
    if isinstance(neg_iou_thr, tuple):
        neg = (max_overlaps >= neg_iou_thr[0]) & (max_overlaps < neg_iou_thr[1])
    else:
        neg = (max_overlaps >= 0) & (max_overlaps < neg_iou_thr)
    assigned = jnp.where(neg, 0, assigned)

    pos = max_overlaps >= pos_iou_thr
    assigned = jnp.where(pos, argmax_overlaps.astype(jnp.int32) + 1, assigned)

    if match_low_quality:
        gt_max = ov.max(axis=1)  # (k,)
        eligible_gt = gt_mask & (gt_max >= min_pos_iou) & jnp.isfinite(gt_max)
        if gt_max_assign_all:
            hits = (ov == gt_max[:, None]) & eligible_gt[:, None]
        else:
            best = ov.argmax(axis=1)
            hits = (
                jax.nn.one_hot(best, n, dtype=bool) & eligible_gt[:, None]
            )
        # reference loops gts in order; later gt overrides -> take the
        # largest gt index claiming each anchor
        claim = jnp.where(
            hits, jnp.arange(k, dtype=jnp.int32)[:, None], -1
        ).max(axis=0)
        assigned = jnp.where(claim >= 0, claim + 1, assigned)

    if ignore_mask is not None:
        assigned = jnp.where(ignore_mask, -1, assigned)
    if anchor_mask is not None:
        assigned = jnp.where(anchor_mask, assigned, -1)

    if gt_labels is not None:
        safe = jnp.clip(assigned - 1, 0, k - 1)
        # one-hot matmul gather (serial TPU gather at ~200k rows is slow)
        oh = jax.nn.one_hot(safe, k, dtype=jnp.float32)
        picked = jnp.round(oh @ gt_labels.astype(jnp.float32)).astype(jnp.int32)
        labels = jnp.where(assigned > 0, picked, 0)
    else:
        labels = jnp.where(assigned > 0, 1, 0).astype(jnp.int32)
    return {
        "gt_inds": assigned,
        "max_overlaps": max_overlaps,
        "labels": labels,
    }


def max_iou_assign_rotated(
    anchors,
    gt_bboxes,
    gt_mask,
    gt_labels=None,
    gt_bboxes_ignore=None,
    gt_ignore_mask=None,
    pos_iou_thr=0.5,
    neg_iou_thr=0.4,
    min_pos_iou=0.0,
    gt_max_assign_all=True,
    match_low_quality=True,
    ignore_iof_thr=-1,
    anchor_mask=None,
    iou_chunk=512,
    iou_calculator="rotated",
):
    """MaxIoUAssignerRbbox (assigner.py:222-277) in masked form.

    anchors (n, 5) rboxes; gt_bboxes (k, 5) padded; gt_mask (k,) bool.

    iou_calculator="fake_rbb" assigns on the minimum circumscribed hbbs of
    both sides (reference FakeBboxOverlaps2D_rotated,
    models/boxes/iou_calculator.py:81-106) — the rotated_retinanet_hbb
    recipe.
    """
    from ...ops.pallas_iou import park_masked_boxes

    if iou_calculator == "fake_rbb":
        overlaps = hbb_overlaps(
            rbox_to_hbox(park_masked_boxes(gt_bboxes, gt_mask)),
            rbox_to_hbox(anchors),
        )
    else:
        overlaps = box_iou_rotated(
            park_masked_boxes(gt_bboxes, gt_mask), anchors, chunk=iou_chunk
        )
    ignore_mask = None
    if (
        ignore_iof_thr > 0
        and gt_bboxes_ignore is not None
        and gt_ignore_mask is not None
    ):
        ig = box_iou_rotated(
            anchors, gt_bboxes_ignore, mode="iof", chunk=iou_chunk
        )
        ig = jnp.where(gt_ignore_mask[None, :], ig, -jnp.inf)
        ignore_mask = ig.max(axis=1) > ignore_iof_thr
    return assign_wrt_overlaps(
        overlaps,
        gt_mask,
        gt_labels,
        pos_iou_thr,
        neg_iou_thr,
        min_pos_iou,
        gt_max_assign_all,
        match_low_quality,
        ignore_mask,
        anchor_mask,
    )


def max_iou_assign_hbb(
    anchors,
    gt_bboxes,
    gt_mask,
    gt_labels=None,
    gt_bboxes_ignore=None,
    gt_ignore_mask=None,
    pos_iou_thr=0.5,
    neg_iou_thr=0.4,
    min_pos_iou=0.0,
    gt_max_assign_all=True,
    match_low_quality=True,
    ignore_iof_thr=-1,
    anchor_mask=None,
):
    """MaxIoUAssigner (assigner.py:68-221) for horizontal boxes."""
    overlaps = hbb_overlaps(gt_bboxes, anchors)
    ignore_mask = None
    if (
        ignore_iof_thr > 0
        and gt_bboxes_ignore is not None
        and gt_ignore_mask is not None
    ):
        ig = hbb_overlaps(anchors, gt_bboxes_ignore, mode="iof")
        ig = jnp.where(gt_ignore_mask[None, :], ig, -jnp.inf)
        ignore_mask = ig.max(axis=1) > ignore_iof_thr
    return assign_wrt_overlaps(
        overlaps,
        gt_mask,
        gt_labels,
        pos_iou_thr,
        neg_iou_thr,
        min_pos_iou,
        gt_max_assign_all,
        match_low_quality,
        ignore_mask,
        anchor_mask,
    )


def atss_assign_rotated(
    anchors,
    gt_bboxes,
    gt_mask,
    gt_labels=None,
    num_level_anchors=None,
    topk=9,
    anchor_mask=None,
    iou_chunk=4096,
):
    """ATSS adaptive assignment for rotated boxes — masked mirror of
    ATSSAssignerRbbox (assigner.py:277-393): per gt, take the `topk`
    center-closest anchors on each level as candidates; threshold =
    mean + std of candidate IoUs; positives additionally need their
    center inside the gt box; anchors claimed by several gts go to the
    max-IoU one.
    """
    from ...ops.box_convert import points_in_rbox

    n = anchors.shape[0]
    k = gt_bboxes.shape[0]
    from ...ops.pallas_iou import park_masked_boxes

    ious = box_iou_rotated(
        park_masked_boxes(gt_bboxes, gt_mask), anchors, chunk=iou_chunk
    )  # (k, n)
    ious = jnp.where(gt_mask[:, None], ious, 0.0)
    if anchor_mask is not None:
        ious = jnp.where(anchor_mask[None, :], ious, 0.0)

    d = anchors[None, :, :2] - gt_bboxes[:, None, :2]
    dist = jnp.sqrt((d**2).sum(-1))  # (k, n)
    if anchor_mask is not None:
        dist = jnp.where(anchor_mask[None, :], dist, jnp.inf)

    if num_level_anchors is None:
        num_level_anchors = [n]
    candidate = jnp.zeros((k, n), bool)
    start = 0
    for n_l in num_level_anchors:
        sl = dist[:, start : start + n_l]
        t = min(topk, n_l)
        rank = jnp.argsort(jnp.argsort(sl, axis=1), axis=1)
        candidate = candidate.at[:, start : start + n_l].set(rank < t)
        start += n_l

    cand_ious = jnp.where(candidate, ious, jnp.nan)
    mean = jnp.nanmean(cand_ious, axis=1)
    std = jnp.sqrt(
        jnp.nanmean((cand_ious - mean[:, None]) ** 2, axis=1)
    )
    thr = mean + std  # (k,)

    inside = points_in_rbox(anchors[:, :2], gt_bboxes).T  # (k, n)
    pos_cand = (
        candidate & (ious >= thr[:, None]) & inside & gt_mask[:, None]
    )
    claimed_iou = jnp.where(pos_cand, ious, -jnp.inf)
    best_gt = claimed_iou.argmax(0).astype(jnp.int32)
    any_pos = pos_cand.any(0)
    assigned = jnp.where(any_pos, best_gt + 1, 0)
    if anchor_mask is not None:
        assigned = jnp.where(anchor_mask, assigned, -1)
    max_overlaps = jnp.where(any_pos, claimed_iou.max(0), ious.max(0))
    if gt_labels is not None:
        safe = jnp.clip(assigned - 1, 0, k - 1)
        # one-hot matmul gather (serial TPU gather at ~200k rows is slow)
        oh = jax.nn.one_hot(safe, k, dtype=jnp.float32)
        picked = jnp.round(oh @ gt_labels.astype(jnp.float32)).astype(jnp.int32)
        labels = jnp.where(assigned > 0, picked, 0)
    else:
        labels = jnp.where(assigned > 0, 1, 0).astype(jnp.int32)
    return {"gt_inds": assigned, "max_overlaps": max_overlaps, "labels": labels}


def convex_assign_init(
    centers, pt_lvls, gt_polys, gt_mask, pos_num=1, scale=4.0
):
    """ConvexAssigner (reference assigner.py:394-551) in masked fixed shape.

    Per gt: pick a pyramid level from the log2 size of its horizontal
    bbox, take the `pos_num` centers on that level nearest the gt center
    (distance normalized by the gt's w/h), and assign each to the gt —
    unless an earlier-processed gt already claims the point at a strictly
    smaller distance (assigner.py:502-538). First-occurrence argmin over
    candidate distances reproduces the sequential strict-< steal rule.

    Args:
      centers: (n, 2) point centers across all levels.
      pt_lvls: (n,) float/int — log2(stride) per point
        (assigner.py:483-485).
      gt_polys: (k, 8) gt quads (padded).
      gt_mask: (k,) bool.

    Returns dict:
      gt_inds (n,) int32 0/1-based, pos_mask (n,) bool,
      cand_idx (k, pos_num) int32 point index of each gt's candidates,
      cand_win (k, pos_num) bool — candidate actually assigned to this gt
      (the fixed positive budget for the init-stage GIoU loss).
    """
    k = gt_polys.shape[0]
    n = centers.shape[0]
    lvl_min = pt_lvls.min()
    lvl_max = pt_lvls.max()

    xs = gt_polys[:, 0::2]
    ys = gt_polys[:, 1::2]
    gx = (xs.min(1) + xs.max(1)) * 0.5
    gy = (ys.min(1) + ys.max(1)) * 0.5
    gw = jnp.clip(xs.max(1) - xs.min(1), 1e-6, None)
    gh = jnp.clip(ys.max(1) - ys.min(1), 1e-6, None)
    # reference `.int()` truncates toward zero (assigner.py:495-497)
    gt_lvl = jnp.trunc(
        (jnp.log2(gw / scale) + jnp.log2(gh / scale)) / 2.0
    )
    gt_lvl = jnp.clip(gt_lvl, lvl_min, lvl_max)

    d = jnp.sqrt(
        ((centers[None, :, 0] - gx[:, None]) / gw[:, None]) ** 2
        + ((centers[None, :, 1] - gy[:, None]) / gh[:, None]) ** 2
    )  # (k, n)
    on_lvl = pt_lvls[None, :] == gt_lvl[:, None]
    d = jnp.where(on_lvl & gt_mask[:, None], d, jnp.inf)

    neg_d, cand_idx = jax.lax.top_k(-d, pos_num)  # (k, pos_num)
    cand_d = -neg_d
    cand_ok = jnp.isfinite(cand_d)
    # sparse candidate-distance matrix; non-candidates stay inf
    sparse = jnp.full((k, n), jnp.inf, d.dtype)
    sparse = sparse.at[
        jnp.arange(k)[:, None], cand_idx
    ].set(jnp.where(cand_ok, cand_d, jnp.inf))
    owner = sparse.argmin(0).astype(jnp.int32)  # earliest gt wins ties
    dmin = sparse.min(0)
    pos_mask = jnp.isfinite(dmin)
    gt_inds = jnp.where(pos_mask, owner + 1, 0)
    cand_win = cand_ok & (owner[cand_idx] == jnp.arange(k)[:, None])
    return {
        "gt_inds": gt_inds,
        "pos_mask": pos_mask,
        "cand_idx": cand_idx.astype(jnp.int32),
        "cand_win": cand_win,
    }


def max_convex_iou_assign(
    pointsets,
    gt_polys,
    gt_mask,
    gt_labels=None,
    pos_iou_thr=0.4,
    neg_iou_thr=0.3,
    min_pos_iou=0.0,
    iou_chunk=512,
):
    """MaxConvexIoUAssigner (reference assigner.py:551-611): standard
    MaxIoU threshold assignment driven by the convex IoU of predicted
    point hulls vs gt quads (ConvexOverlaps, iou_calculator.py:200).

    pointsets (n, 18); gt_polys (k, 8) padded; thresholds default to the
    shipped rotated_reppoints config (configs/...reppoints...py:49-54).
    """
    from ...ops.convex import convex_iou_chunked

    overlaps = convex_iou_chunked(
        jax.lax.stop_gradient(pointsets), gt_polys, chunk=iou_chunk
    ).T  # (k, n)
    return assign_wrt_overlaps(
        overlaps,
        gt_mask,
        gt_labels=gt_labels,
        pos_iou_thr=pos_iou_thr,
        neg_iou_thr=neg_iou_thr,
        min_pos_iou=min_pos_iou,
    )

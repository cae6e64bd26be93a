"""Rotated NMS — fixed-shape, jit-compatible formulation for TPU.

Functional mirror of the reference `ops/nms_rotated.py` (`nms_rotated`,
`ml_nms_rotated`, `multiclass_nms_rotated`) with the dynamic-shape semantics
re-expressed as fixed budgets + validity masks (required under jit/pjit):

  * The reference CUDA kernel builds a 64-bit suppression bitmask matrix then
    does a host-side greedy sweep (ops/nms_rotated.py:450-493). Here we build
    the boolean IoU>thresh matrix in score order and solve the greedy
    recurrence  keep[i] = ~any_{j<i}(over[j,i] & keep[j])  by fixpoint
    iteration (a while_loop of matrix-vector steps, converging in
    chain-depth rounds — O(log-ish) in practice vs N sequential steps).

  * Score filtering returns masks, never gathers to dynamic sizes.

All outputs carry an explicit validity mask; invalid slots hold sentinel
boxes with score 0 and label -1.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .box_iou_rotated import box_iou_rotated


def _greedy_sweep(overlap, valid):
    """Greedy NMS keep-mask from a boolean suppression matrix.

    overlap: (n, n) bool — overlap[j, i] True if box j (higher score)
    suppresses box i. Only the strict upper triangle (j < i) is used.
    valid: (n,) bool — slots eligible for keeping at all.
    """
    n = overlap.shape[0]
    tri = jnp.tril(jnp.ones((n, n), bool), k=-1).T  # strict upper: j < i
    m = overlap & tri & valid[:, None] & valid[None, :]

    def cond(state):
        k, changed = state
        return changed

    def body(state):
        k, _ = state
        suppressed = (m & k[:, None]).any(axis=0)
        k_new = valid & ~suppressed
        return k_new, jnp.any(k_new != k)

    k0 = valid
    k, _ = jax.lax.while_loop(cond, body, (k0, jnp.array(True)))
    return k


def nms_rotated(boxes, scores, iou_threshold, valid=None):
    """Greedy rotated NMS.

    Args:
      boxes: (n, 5) rboxes (cx, cy, w, h, theta).
      scores: (n,) scores.
      iou_threshold: float.
      valid: optional (n,) bool mask of real entries.

    Returns:
      order: (n,) int32 — indices into `boxes` in descending score order.
      keep: (n,) bool — keep mask aligned with `order`.
    Reference API: `nms_rotated(dets, scores, thr)` ops/nms_rotated.py:506.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    s = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-s)
    b = boxes[order]
    v = valid[order]
    iou = box_iou_rotated(b, b)
    keep = _greedy_sweep(iou > iou_threshold, v)
    return order, keep


def ml_nms_rotated(boxes, scores, labels, iou_threshold, valid=None):
    """Label-aware rotated NMS: IoU only counts intra-class.

    Implemented with the coordinate-offset trick (equivalent to the
    reference's 6th-column label compare, ops/nms_rotated.py:515-525):
    shifting each class's boxes to a disjoint region zeroes cross-class IoU.
    """
    if valid is None:
        valid = jnp.ones(boxes.shape[0], bool)
    span = jnp.max(
        jnp.where(valid, jnp.abs(boxes[:, 0]) + boxes[:, 2], 0.0)
    ) + jnp.max(jnp.where(valid, jnp.abs(boxes[:, 1]) + boxes[:, 3], 0.0)) + 1.0
    off = labels.astype(boxes.dtype) * span
    shifted = boxes.at[:, 0].add(off)
    return nms_rotated(shifted, scores, iou_threshold, valid)


def multiclass_nms_rotated(
    multi_bboxes,
    multi_scores,
    score_thr,
    nms_iou_thr,
    max_per_img,
    score_factors=None,
):
    """Score-filter -> class-aware NMS -> top-k, fixed output size.

    Functional mirror of `multiclass_nms_rotated`
    (ops/nms_rotated.py:540-596) with fixed shapes.

    Args:
      multi_bboxes: (n, 5) or (n, C*5) rboxes.
      multi_scores: (n, C) class scores (no background column).
      score_factors: optional (n,) multiplier (e.g. centerness).

    Returns dict with:
      boxes:  (max_per_img, 5)
      scores: (max_per_img,)
      labels: (max_per_img,) int32, -1 for invalid
      valid:  (max_per_img,) bool
    """
    n, num_classes = multi_scores.shape
    if multi_bboxes.shape[-1] == 5:
        boxes = jnp.broadcast_to(
            multi_bboxes[:, None, :], (n, num_classes, 5)
        )
    else:
        boxes = multi_bboxes.reshape(n, num_classes, 5)
    scores = multi_scores
    if score_factors is not None:
        scores = scores * score_factors[:, None]

    boxes = boxes.reshape(-1, 5)
    scores = scores.reshape(-1)
    labels = jnp.tile(jnp.arange(num_classes, dtype=jnp.int32), (n,))

    valid = scores > score_thr
    # Pre-NMS cap: keep the top (n*C capped) candidates to bound the IoU
    # matrix; we take top max(4*max_per_img, 512) by score.
    cap = min(boxes.shape[0], max(4 * max_per_img, 512))
    s = jnp.where(valid, scores, -jnp.inf)
    top_s, top_idx = jax.lax.top_k(s, cap)
    b = boxes[top_idx]
    l = labels[top_idx]
    v = valid[top_idx]

    order, keep = ml_nms_rotated(b, top_s, l, nms_iou_thr, v)
    # `order` is score-sorted, so the first max_per_img kept entries (pulled
    # to the front with a stable sort on the keep mask) are the answer.
    kept_sorted_idx = jnp.argsort(~keep, stable=True)[:max_per_img]
    valid_out = keep[kept_sorted_idx]
    src = top_idx[order[kept_sorted_idx]]
    out_boxes = jnp.where(valid_out[:, None], boxes[src], 0.0)
    out_scores = jnp.where(valid_out, scores[src], 0.0)
    out_labels = jnp.where(valid_out, labels[src], -1)
    return {
        "boxes": out_boxes,
        "scores": out_scores,
        "labels": out_labels,
        "valid": valid_out,
    }

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
    class_cap=None,
):
    """Score-filter -> per-class NMS -> global top-k, fixed output size.

    Functional mirror of `multiclass_nms_rotated`
    (ops/nms_rotated.py:540-596) with fixed shapes.

    Args:
      multi_bboxes: (n, 5) or (n, C*5) rboxes.
      multi_scores: (n, C) class scores (no background column).
      score_factors: optional (n,) multiplier (e.g. centerness).
      class_cap: per-class candidate budget K (default 512); each class
        NMS-es its top-K scoring candidates independently.

    Returns dict with:
      boxes:  (max_per_img, 5)
      scores: (max_per_img,)
      labels: (max_per_img,) int32, -1 for invalid
      valid:  (max_per_img,) bool
    """
    n, num_classes = multi_scores.shape
    scores = multi_scores
    if score_factors is not None:
        scores = scores * score_factors[:, None]

    # Tiered per-class NMS: classes never suppress each other (the
    # reference offsets boxes per class for exactly this reason), so NMS
    # decomposes into C independent K-candidate problems. vs the previous
    # global top-(4*max_per_img) formulation this shrinks the IoU work
    # from (4*max_per_img)^2 pairs (64M at the reference test cfg
    # max_per_img=2000) to C*K^2 (3.9M at K=512) and makes the cost
    # independent of max_per_img.
    if class_cap is None:
        class_cap = 512
    K = min(n, class_cap)

    valid = scores > score_thr  # (n, C)
    sT = jnp.where(valid, scores, -jnp.inf).T  # (C, n)
    top_s, top_i = jax.lax.top_k(sT, K)  # (C, K), sorted desc
    if multi_bboxes.shape[-1] == 5:
        b = multi_bboxes[top_i]  # (C, K, 5)
    else:
        bT = jnp.transpose(
            multi_bboxes.reshape(n, num_classes, 5), (1, 0, 2)
        )
        b = jnp.take_along_axis(bT, top_i[..., None], axis=1)
    v = jnp.isfinite(top_s)  # (C, K)

    def _one_class(bb, vv):
        iou = box_iou_rotated(bb, bb, impl="xla")
        return _greedy_sweep(iou > nms_iou_thr, vv)

    keep = jax.vmap(_one_class)(b, v)  # (C, K)

    flat_s = jnp.where(keep, top_s, -jnp.inf).reshape(-1)
    m = min(max_per_img, flat_s.shape[0])
    sel_s, sel = jax.lax.top_k(flat_s, m)
    valid_out = jnp.isfinite(sel_s)
    out_boxes = jnp.where(valid_out[:, None], b.reshape(-1, 5)[sel], 0.0)
    out_scores = jnp.where(valid_out, sel_s, 0.0)
    out_labels = jnp.where(valid_out, (sel // K).astype(jnp.int32), -1)
    if m < max_per_img:
        pad = max_per_img - m
        out_boxes = jnp.pad(out_boxes, ((0, pad), (0, 0)))
        out_scores = jnp.pad(out_scores, (0, pad))
        out_labels = jnp.pad(out_labels, (0, pad), constant_values=-1)
        valid_out = jnp.pad(valid_out, (0, pad))
    return {
        "boxes": out_boxes,
        "scores": out_scores,
        "labels": out_labels,
        "valid": valid_out,
    }

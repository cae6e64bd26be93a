"""Horizontal-box NMS — fixed-shape greedy sweep (jit-compatible).

Mirror of the reference's thin `jt.nms` wrapper (`python/jdet/ops/nms.py`)
using the same fixpoint suppression formulation as the rotated variant.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .nms_rotated import _greedy_sweep


def hbb_iou_matrix(b1, b2):
    area1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    area2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    lt = jnp.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = jnp.minimum(b1[:, None, 2:4], b2[None, :, 2:4])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(union > 1e-9, inter / jnp.maximum(union, 1e-9), 0.0)


def nms(boxes, scores, iou_threshold, valid=None):
    """Greedy hbb NMS. Returns (order, keep) like nms_rotated."""
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    s = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-s)
    b = boxes[order]
    v = valid[order]
    iou = hbb_iou_matrix(b, b)
    keep = _greedy_sweep(iou > iou_threshold, v)
    return order, keep

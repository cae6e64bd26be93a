"""Differentiable polygon-IoU losses (PolyIoULoss / PolyGIoULoss).

Capability mirror of `python/jdet/models/losses/poly_iou_loss.py:159,202`.
The reference intersects the two quads by pairing every edge with every
edge plus vertex-containment tests, then orders the union of candidate
points with the `convex_sort` CUDA kernel; here both quads are convex so
we clip pred's ring by target's four half-planes (masked fixed-shape
Sutherland-Hodgman from `ops/convex.py`) — same area, same gradients
through the intersection-point coordinates, no sort kernel.

Inputs may be rboxes (n, 5) or polys (n, 8) like the reference's
`bbox2type` dispatch.
"""
from __future__ import annotations

import jax.numpy as jnp

from ...ops.box_convert import rbox_to_poly
from ...ops.convex import (
    _quad_ccw,
    hull_area,
    hull_quad_intersection_area,
)


def _as_poly(b):
    if b.shape[-1] == 5:
        return rbox_to_poly(b)
    assert b.shape[-1] == 8, b.shape
    return b


def _poly_area(p8):
    xs = p8[..., 0::2]
    ys = p8[..., 1::2]
    return 0.5 * jnp.abs(
        (xs * jnp.roll(ys, -1, -1) - jnp.roll(xs, -1, -1) * ys).sum(-1)
    )


def _reduce(loss, weight, reduction, avg_factor):
    if weight is not None:
        if weight.ndim > 1:
            weight = weight.reshape(weight.shape[0], -1).mean(-1)
        loss = loss * weight
    if reduction == "none":
        return loss
    if reduction == "sum":
        return loss.sum()
    if avg_factor is None:
        avg_factor = max(loss.shape[0], 1)
    return loss.sum() / jnp.maximum(avg_factor, 1.0)


def poly_overlap_aligned(pred, target, eps=1e-6):
    """(iou, union, enclose_area) for aligned quad pairs.

    pred/target: (n, 5) rboxes or (n, 8) polys.
    """
    p8 = _as_poly(pred)
    t8 = _as_poly(target)
    n = p8.shape[0]
    pts = p8.reshape(n, 4, 2)
    quad = _quad_ccw(t8.reshape(n, 4, 2))
    inter = hull_quad_intersection_area(pts, quad)
    a_p = _poly_area(p8)
    a_t = _poly_area(t8)
    union = a_p + a_t - inter + eps
    iou = jnp.clip(inter / union, eps, None)
    enclose = hull_area(jnp.concatenate([pts, quad], -2))
    return iou, union, enclose


def poly_iou_loss(pred, target, weight=None, linear=False, eps=1e-6,
                  reduction="mean", avg_factor=None):
    """-log(IoU) (or 1-IoU if linear) over aligned polygon pairs
    (reference poly_iou_loss, poly_iou_loss.py:100-126)."""
    iou, _, _ = poly_overlap_aligned(pred, target, eps)
    loss = (1 - iou) if linear else -jnp.log(iou)
    return _reduce(loss, weight, reduction, avg_factor)


def poly_giou_loss(pred, target, weight=None, eps=1e-6,
                   reduction="mean", avg_factor=None):
    """1 - GIoU over aligned polygon pairs (poly_iou_loss.py:129-157)."""
    iou, union, enclose = poly_overlap_aligned(pred, target, eps)
    giou = iou - (enclose - union) / jnp.maximum(enclose, eps)
    return _reduce(1 - giou, weight, reduction, avg_factor)

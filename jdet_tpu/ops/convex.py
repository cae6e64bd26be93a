"""Convex geometry over small fixed point sets (RepPoints, 9 points).

TPU-native replacements for the reference CUDA kernels:
  - convex hull ordering (`python/jdet/ops/convex_sort.py:67-216`),
  - convex IoU of 9-point hulls vs gt quads
    (`ops/reppoints_convex_iou/convex_iou_kernel.cu`, 307 LoC),
  - convex GIoU with gradient
    (`convex_giou_kernel.cu`, 820 LoC of hand-derived analytic gradient),
  - min-area enclosing rotated rect (rotating calipers,
    `ops/reppoints_min_area_bbox/min_area_bbox.cu`, 461 LoC).

Fixed-shape formulation: points are angle-sorted about their centroid and
concave points removed by a masked Graham sweep (N is tiny — 9 — so the
O(N^2)-per-iteration masked neighbor search is trivia for the VPU);
hull-vs-quad intersection uses masked Sutherland-Hodgman with static
buffers; everything is built from jnp primitives, so `jax.grad` supplies
the GIoU gradient that the reference hand-derived in 820 lines of CUDA.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _prev_next_valid(valid):
    """For each slot in a ring of size n, index of the previous/next valid
    slot (self excluded). valid: (..., n) bool."""
    n = valid.shape[-1]
    idx = jnp.arange(n)
    # distance from i to j going forward (j - i) mod n, 0 -> n (self)
    fwd = (idx[None, :] - idx[:, None]) % n
    fwd = jnp.where(fwd == 0, n, fwd)  # (n, n)
    big = jnp.where(valid[..., None, :], fwd, n + 1)
    nxt = jnp.argmin(big, -1)
    bwd = (idx[:, None] - idx[None, :]) % n
    bwd = jnp.where(bwd == 0, n, bwd)
    big = jnp.where(valid[..., None, :], bwd, n + 1)
    prv = jnp.argmin(big, -1)
    return prv, nxt


def convex_hull_mask(pts, valid=None, iters=None):
    """Mask of points on the convex hull, plus centroid-angle order.

    pts: (..., n, 2). Returns (order, hull_mask_in_sorted_order): `order`
    sorts points by angle about the valid centroid; the mask marks sorted
    slots that survive the concavity sweep (hull vertices, CCW).
    """
    n = pts.shape[-2]
    if valid is None:
        valid = jnp.ones(pts.shape[:-1], bool)
    if iters is None:
        iters = n
    vf = valid[..., None].astype(pts.dtype)
    denom = jnp.maximum(valid.sum(-1), 1)[..., None, None].astype(pts.dtype)
    center = (pts * vf).sum(-2, keepdims=True) / denom
    rel = pts - center
    ang = jnp.arctan2(rel[..., 1], rel[..., 0])
    ang = jnp.where(valid, ang, jnp.inf)
    order = jnp.argsort(ang, axis=-1)
    p = jnp.take_along_axis(pts, order[..., None], -2)
    v = jnp.take_along_axis(valid, order, -1)

    def body(_, keep):
        prv, nxt = _prev_next_valid(keep)
        pp = jnp.take_along_axis(p, prv[..., None], -2)
        pn = jnp.take_along_axis(p, nxt[..., None], -2)
        e1 = p - pp
        e2 = pn - p
        cross = e1[..., 0] * e2[..., 1] - e1[..., 1] * e2[..., 0]
        # CCW ring: keep strictly convex corners (cross > 0)
        new_keep = keep & (cross > 1e-12)
        # never drop below 3 points: if fewer would remain, keep as is
        enough = new_keep.sum(-1, keepdims=True) >= 3
        return jnp.where(enough, new_keep, keep)

    v = jax.lax.fori_loop(0, iters, body, v)
    return order, v, p


def _clip_ring(px, py, pvalid, ax, ay, bx, by):
    """One Sutherland-Hodgman step on a masked ring of max size n,
    emitting into a buffer of size 2n. Interior = left of a->b (CCW)."""
    n = px.shape[-1]
    prv, nxt = _prev_next_valid(pvalid)
    nx_ = jnp.take_along_axis(px, nxt, -1)
    ny_ = jnp.take_along_axis(py, nxt, -1)
    ex = bx - ax
    ey = by - ay
    d1 = ex * (py - ay) - ey * (px - ax)
    d2 = ex * (ny_ - ay) - ey * (nx_ - ax)
    in1 = d1 >= 0
    in2 = d2 >= 0
    denom = jnp.where(jnp.abs(d1 - d2) < 1e-12, 1.0, d1 - d2)
    t = d1 / denom
    ix = px + t * (nx_ - px)
    iy = py + t * (ny_ - py)
    # slot 2i: the vertex itself (if valid & inside); slot 2i+1: the edge
    # intersection (if the edge crosses). Order is preserved.
    emit_v = pvalid & in1
    emit_i = pvalid & (in1 != in2)
    out_x = jnp.stack([px, ix], -1).reshape(*px.shape[:-1], 2 * n)
    out_y = jnp.stack([py, iy], -1).reshape(*py.shape[:-1], 2 * n)
    out_v = jnp.stack([emit_v, emit_i], -1).reshape(*pvalid.shape[:-1], 2 * n)
    return out_x, out_y, out_v


def _ring_area(px, py, pvalid):
    """Shoelace area of a masked CCW ring."""
    prv, nxt = _prev_next_valid(pvalid)
    nx_ = jnp.take_along_axis(px, nxt, -1)
    ny_ = jnp.take_along_axis(py, nxt, -1)
    cross = px * ny_ - nx_ * py
    s = jnp.where(pvalid, cross, 0.0).sum(-1)
    return 0.5 * jnp.abs(s)


def hull_quad_intersection_area(pts, quad, valid=None):
    """area(hull(pts) ∩ quad). pts (..., n, 2); quad (..., 4, 2) CCW."""
    order, hull_v, p = convex_hull_mask(pts, valid)
    px = p[..., 0]
    py = p[..., 1]
    v = hull_v
    for e in range(4):
        ax = quad[..., e, 0]
        ay = quad[..., e, 1]
        bx = quad[..., (e + 1) % 4, 0]
        by = quad[..., (e + 1) % 4, 1]
        # half-plane params broadcast against the ring axis
        px, py, v = _clip_ring(
            px, py, v,
            ax[..., None], ay[..., None], bx[..., None], by[..., None],
        )
    return _ring_area(px, py, v)


def hull_area(pts, valid=None):
    order, hull_v, p = convex_hull_mask(pts, valid)
    return _ring_area(p[..., 0], p[..., 1], hull_v)


def _quad_ccw(quad):
    x = quad[..., 0]
    y = quad[..., 1]
    s = (x * jnp.roll(y, -1, -1) - jnp.roll(x, -1, -1) * y).sum(-1)
    return jnp.where(s[..., None, None] < 0, quad[..., ::-1, :], quad)


def convex_iou(pointsets, gt_polys):
    """Pairwise IoU of 9-point convex hulls vs gt quads.

    pointsets (n, 18); gt_polys (m, 8). Returns (n, m) — API mirror of
    `reppoints_convex_iou` (ops/reppoints_convex_iou/convex_iou.py:29).
    """
    n = pointsets.shape[0]
    m = gt_polys.shape[0]
    pts = pointsets.reshape(n, 1, 9, 2).repeat(m, 1)
    quad = _quad_ccw(gt_polys.reshape(1, m, 4, 2)).repeat(n, 0)
    inter = hull_quad_intersection_area(pts, quad)
    a_p = hull_area(pointsets.reshape(n, 9, 2))[:, None]
    xs = gt_polys[:, 0::2]
    ys = gt_polys[:, 1::2]
    a_g = 0.5 * jnp.abs(
        (xs * jnp.roll(ys, -1, -1) - jnp.roll(xs, -1, -1) * ys).sum(-1)
    )[None, :]
    union = a_p + a_g - inter
    return jnp.where(union > 1e-9, inter / jnp.maximum(union, 1e-9), 0.0)


def convex_iou_chunked(pointsets, gt_polys, chunk=512):
    """`convex_iou` computed in point chunks via `lax.map`.

    Each pair's Sutherland-Hodgman clip expands the 9-point ring to a
    144-slot buffer; at RepPoints assignment scale (~21k points x max_gt)
    the full product would materialize GBs of intermediates. Chunking
    bounds peak memory while keeping one compiled program.
    """
    n = pointsets.shape[0]
    pad = (-n) % chunk
    ps = jnp.pad(pointsets, ((0, pad), (0, 0)))
    ps = ps.reshape(-1, chunk, pointsets.shape[-1])
    out = jax.lax.map(lambda c: convex_iou(c, gt_polys), ps)
    return out.reshape(-1, gt_polys.shape[0])[:n]


def convex_giou(pointsets, gt_polys):
    """Aligned convex GIoU: pointsets (n, 18) vs gt_polys (n, 8).

    Mirror of `reppoints_convex_giou` (convex_giou.py:29); the gradient
    comes from jax.grad instead of the 820-line analytic kernel.
    """
    n = pointsets.shape[0]
    pts = pointsets.reshape(n, 9, 2)
    quad = _quad_ccw(gt_polys.reshape(n, 4, 2))
    inter = hull_quad_intersection_area(pts, quad)
    a_p = hull_area(pts)
    xs = gt_polys[:, 0::2]
    ys = gt_polys[:, 1::2]
    a_g = 0.5 * jnp.abs(
        (xs * jnp.roll(ys, -1, -1) - jnp.roll(xs, -1, -1) * ys).sum(-1)
    )
    union = a_p + a_g - inter
    iou = inter / jnp.maximum(union, 1e-9)
    # enclosing hull of the 13 combined points
    allpts = jnp.concatenate([pts, quad], -2)
    c_area = hull_area(allpts)
    return iou - (c_area - union) / jnp.maximum(c_area, 1e-9)


def convex_giou_loss(pointsets, gt_polys, weight=None, avg_factor=None):
    """1 - GIoU loss (reference ConvexGIoULoss,
    models/losses/convex_giou_loss.py:7-63)."""
    loss = 1.0 - convex_giou(pointsets, gt_polys)
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        avg_factor = max(loss.shape[0], 1)
    return loss.sum() / jnp.maximum(avg_factor, 1.0)


def min_area_rect(pointsets, valid=None):
    """Min-area enclosing rotated rect of each point set (rotating
    calipers over hull edge directions).

    pointsets (..., n, 2) -> rboxes (..., 5). Mirror of
    `reppoints_min_area_bbox` (min_area_bbox.py:22, 461-LoC CUDA).
    """
    order, hull_v, p = convex_hull_mask(pointsets, valid)
    prv, nxt = _prev_next_valid(hull_v)
    pn = jnp.take_along_axis(p, nxt[..., None], -2)
    edge = pn - p  # (..., n, 2) candidate directions (valid slots only)
    theta = jnp.arctan2(edge[..., 1], edge[..., 0])  # (..., n)
    cos = jnp.cos(-theta)[..., None]
    sin = jnp.sin(-theta)[..., None]
    # rotate all points into each candidate frame: (..., cand, pt)
    x = p[..., None, :, 0]
    y = p[..., None, :, 1]
    c = cos
    s = sin
    rx = c * x - s * y
    ry = s * x + c * y
    vmask = hull_v[..., None, :]
    big = 1e18
    min_x = jnp.where(vmask, rx, big).min(-1)
    max_x = jnp.where(vmask, rx, -big).max(-1)
    min_y = jnp.where(vmask, ry, big).min(-1)
    max_y = jnp.where(vmask, ry, -big).max(-1)
    areas = (max_x - min_x) * (max_y - min_y)
    areas = jnp.where(hull_v, areas, big)
    best = areas.argmin(-1)

    def take(a):
        return jnp.take_along_axis(a, best[..., None], -1)[..., 0]

    bx0 = take(min_x)
    bx1 = take(max_x)
    by0 = take(min_y)
    by1 = take(max_y)
    bth = jnp.take_along_axis(theta, best[..., None], -1)[..., 0]
    w = bx1 - bx0
    h = by1 - by0
    cxr = (bx0 + bx1) / 2
    cyr = (by0 + by1) / 2
    # rotate center back to image frame
    cbt = jnp.cos(bth)
    sbt = jnp.sin(bth)
    cx = cbt * cxr - sbt * cyr
    cy = sbt * cxr + cbt * cyr
    from .box_convert import regular_obb

    return regular_obb(jnp.stack([cx, cy, w, h, bth], -1))

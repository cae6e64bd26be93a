"""Rotated-box IoU — exact, sort-free, fully vectorized for TPU.

Computes the same quantity as the reference's Detectron2-derived CUDA kernel
(`python/jdet/ops/box_iou_rotated.py:464-510`; algorithm shared with
`ops/nms_rotated.py:52-258`): the exact intersection area of two rotated
rectangles. The reference enumerates up-to-24 candidate points and runs a
Graham scan per pair — inherently sequential and gather-heavy.

TPU-native formulation (Green's theorem + Liang–Barsky clipping):
the boundary of P∩Q is (∂P clipped to Q) ∪ (∂Q clipped to P), each segment
inheriting its own polygon's orientation. By Green's theorem
  area = 1/2 ∮ x dy − y dx = 1/2 Σ_segments cross(u, v),
summed over directed boundary segments in ANY order. Each rectangle edge's
surviving sub-segment [t_in, t_out] against the other rectangle's four
half-planes comes from Liang–Barsky interval clipping — closed form, no
sorting, no gathers; just unrolled elementwise FMA over the pair-shaped
arrays, which is exactly what the VPU wants. Differentiable everywhere the
area is (max/min kinks only on measure-zero configurations).

Per-candidate work is kept as separate python-level arrays so every XLA op
carries the large pair dimensions in the minor axes (a (..., K, 2) layout
would waste 64x of the 8x128 VPU lanes and blow up Mosaic compile time).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_PAR_EPS = 1e-12


def _corners_xy(boxes):
    """(..., 5) rbox -> four corner x arrays and y arrays.

    Vertex order follows the reference `get_rotated_vertices`
    (ops/nms_rotated.py:52-72); it is positively oriented for the cross
    convention used below, so Green contributions from both boxes add with
    the same sign.
    """
    cx = boxes[..., 0]
    cy = boxes[..., 1]
    w = boxes[..., 2]
    h = boxes[..., 3]
    a = boxes[..., 4]
    cos2 = jnp.cos(a) * 0.5
    sin2 = jnp.sin(a) * 0.5
    x0 = cx - sin2 * h - cos2 * w
    y0 = cy + cos2 * h - sin2 * w
    x1 = cx + sin2 * h - cos2 * w
    y1 = cy - cos2 * h - sin2 * w
    x2 = 2 * cx - x0
    y2 = 2 * cy - y0
    x3 = 2 * cx - x1
    y3 = 2 * cy - y1
    return [x0, x1, x2, x3], [y0, y1, y2, y3]


def _edges_green_contrib(px, py, qx, qy):
    """Sum of cross(u, v) over P's edges clipped to rectangle Q.

    px/py: P's 4 corner arrays; qx/qy: Q's corners. Q's interior is
    {p : cross(q_edge_j, p - q_j) >= 0} for all j (positive orientation).
    """
    qvx = [qx[(j + 1) % 4] - qx[j] for j in range(4)]
    qvy = [qy[(j + 1) % 4] - qy[j] for j in range(4)]

    total = 0.0
    for i in range(4):
        ax, ay = px[i], py[i]
        bx, by = px[(i + 1) % 4], py[(i + 1) % 4]
        dx, dy = bx - ax, by - ay

        t_lo = jnp.zeros_like(ax)
        t_hi = jnp.ones_like(ax)
        alive = jnp.ones_like(ax, dtype=bool)
        on_boundary = jnp.zeros_like(ax, dtype=bool)
        for j in range(4):
            # f(t) = cross(qv_j, p(t) - q_j) = f0 + t * df  must stay >= 0
            rx = ax - qx[j]
            ry = ay - qy[j]
            f0 = qvx[j] * ry - rx * qvy[j]
            df = qvx[j] * dy - dx * qvy[j]
            # scale-aware parallel / collinear tolerances
            qnorm = jnp.abs(qvx[j]) + jnp.abs(qvy[j])
            par = jnp.abs(df) <= 1e-6 * qnorm * (jnp.abs(dx) + jnp.abs(dy)) + _PAR_EPS
            col = par & (
                jnp.abs(f0)
                <= 1e-5 * qnorm * (jnp.abs(rx) + jnp.abs(ry)) + _PAR_EPS
            )
            # an edge collinear with a clip line is shared boundary: both
            # polygons traverse it, so each counts it with weight 1/2 (for
            # coincident directions the halves sum to one; for antiparallel
            # touching edges they cancel to zero — both exact).
            on_boundary = on_boundary | col
            alive = alive & jnp.where(par, col | (f0 >= 0), True)
            tstar = -f0 / jnp.where(par, 1.0, df)
            t_lo = jnp.where(~par & (df > 0), jnp.maximum(t_lo, tstar), t_lo)
            t_hi = jnp.where(~par & (df < 0), jnp.minimum(t_hi, tstar), t_hi)

        keep = alive & (t_lo < t_hi)
        w = jnp.where(on_boundary, 0.5, 1.0)
        ux = ax + t_lo * dx
        uy = ay + t_lo * dy
        vx = ax + t_hi * dx
        vy = ay + t_hi * dy
        total = total + jnp.where(keep, w * (ux * vy - vx * uy), 0.0)
    return total


def _intersection_area(b1, b2):
    """Exact intersection area for broadcast-compatible (..., 5) boxes."""
    # Recenter near the pair midpoint: Green contributions are ~|p|^2, so
    # absolute image coordinates (~1e3) would lose fp32 precision.
    mx = 0.5 * (b1[..., 0] + b2[..., 0])
    my = 0.5 * (b1[..., 1] + b2[..., 1])

    c1x, c1y = _corners_xy(b1)
    c2x, c2y = _corners_xy(b2)
    c1x = [x - mx for x in c1x]
    c1y = [y - my for y in c1y]
    c2x = [x - mx for x in c2x]
    c2y = [y - my for y in c2y]

    s = _edges_green_contrib(c1x, c1y, c2x, c2y) + _edges_green_contrib(
        c2x, c2y, c1x, c1y
    )
    return jnp.maximum(0.5 * s, 0.0)


def rotated_intersection_area(boxes1, boxes2):
    """Elementwise exact intersection areas; boxes broadcast."""
    return _intersection_area(boxes1, boxes2)


def _iou_from_areas(inter, area1, area2, mode="iou"):
    if mode == "iou":
        union = area1 + area2 - inter
    elif mode == "iof":
        union = area1
    else:
        raise ValueError(mode)
    return jnp.where(union > 1e-9, inter / jnp.maximum(union, 1e-9), 0.0)


def box_iou_rotated_aligned(boxes1, boxes2, mode="iou"):
    """Elementwise IoU of two equal-shaped (..., 5) box arrays."""
    inter = _intersection_area(boxes1, boxes2)
    a1 = boxes1[..., 2] * boxes1[..., 3]
    a2 = boxes2[..., 2] * boxes2[..., 3]
    return _iou_from_areas(inter, a1, a2, mode)


def _pairwise_block(boxes1, boxes2, mode):
    inter = _intersection_area(boxes1[:, None, :], boxes2[None, :, :])
    a1 = boxes1[:, 2] * boxes1[:, 3]
    a2 = boxes2[:, 2] * boxes2[:, 3]
    return _iou_from_areas(inter, a1[:, None], a2[None, :], mode)


def box_iou_rotated(boxes1, boxes2, mode="iou", chunk=4096, impl="auto"):
    """Full pairwise IoU matrix (n, m) of rotated boxes.

    API mirror of the reference `box_iou_rotated(b1, b2) -> (n, m)`
    (ops/box_iou_rotated.py:502-510). Row-chunked via lax.map to bound
    live intermediates for very large n.

    On TPU, large pairwise matrices (the anchor-assignment hot path)
    dispatch to the fused Pallas rect-frame kernel (ops/pallas_iou.py) —
    same numbers (parity-tested to ~5e-6), ~1.7x faster and no (n, m)
    HBM intermediates. Forward-only there (assignment takes no IoU
    gradients); pass impl="xla" for a differentiable matrix.
    """
    n = boxes1.shape[0]
    m = boxes2.shape[0]
    if n == 0 or m == 0:
        return jnp.zeros((n, m), boxes1.dtype)
    if (
        impl == "pallas"
        or (
            impl == "auto"
            and mode == "iou"
            and n * m >= (1 << 20)
            and jax.default_backend() == "tpu"
        )
    ):
        from .pallas_iou import box_iou_rotated_pallas

        return jax.lax.stop_gradient(
            box_iou_rotated_pallas(boxes1, boxes2)
        )
    if n <= chunk:
        return _pairwise_block(boxes1, boxes2, mode)
    pad = (-n) % chunk
    b1 = jnp.pad(boxes1, ((0, pad), (0, 0)))
    b1 = b1.reshape(-1, chunk, 5)
    out = jax.lax.map(lambda blk: _pairwise_block(blk, boxes2, mode), b1)
    return out.reshape(-1, boxes2.shape[0])[:n]

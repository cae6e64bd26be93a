"""Pallas TPU kernel for the pairwise rotated-IoU matrix.

The anchor-assignment hot path computes IoU of K gts (small, ~32-512)
against N anchors (~200k) per image. The pure-XLA formulation materializes
~40 (K, N) f32 intermediates in HBM; this kernel keeps the whole
Green's-theorem/Liang-Barsky chain (box_iou_rotated.py) in VMEM.

Layout (the round-1 study kernel was 6x slower because its (K, 5)/(5, B)
blocks put tiny dims in lanes and forced relayouts — this is the
layout-correct rewrite):
  - anchors are pre-expanded in XLA to a PLANAR (16, N) array whose rows
    are the 4 center-relative corner x's, 4 corner y's, center x/y and
    area — so every kernel read is a (1, BLOCK) sublane slice, no
    transposes;
  - gts are pre-expanded to (K, 16) so an (8, 16) block yields (8, 1)
    per-component columns that broadcast against the (1, BLOCK) anchor
    rows on the VPU's native (8, 128) tiles;
  - per-pair midpoint recentering (needed for fp32 precision at image
    coords ~1e3) reduces to corner_rel ± (center_a - center_g)/2, so the
    precomputed relative corners are shared across all pairs.

Forward-only (assignment/NMS take no gradients through IoU); the
differentiable jnp path in box_iou_rotated.py remains for losses.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAR_EPS = 1e-12
BLOCK_N = 1024
BLOCK_K = 8
# center beyond which a box is treated as "parked" padding (see
# pad_boxes_far); blocks of parked gts fail the separation pre-test and
# skip the clip math entirely.
FAR_CENTER = -1e6


def _green_sum(px, py, qx, qy):
    """Directed-boundary Green contributions of P's edges clipped to Q
    (same math as box_iou_rotated._edges_green_contrib)."""
    qvx = [qx[(j + 1) % 4] - qx[j] for j in range(4)]
    qvy = [qy[(j + 1) % 4] - qy[j] for j in range(4)]
    total = 0.0
    for i in range(4):
        ax, ay = px[i], py[i]
        bx, by = px[(i + 1) % 4], py[(i + 1) % 4]
        dx, dy = bx - ax, by - ay
        t_lo = jnp.zeros_like(dx)
        t_hi = jnp.ones_like(dx)
        alive = jnp.ones(dx.shape, jnp.bool_)
        on_b = jnp.zeros(dx.shape, jnp.bool_)
        for j in range(4):
            rx = ax - qx[j]
            ry = ay - qy[j]
            f0 = qvx[j] * ry - rx * qvy[j]
            df = qvx[j] * dy - dx * qvy[j]
            qn = jnp.abs(qvx[j]) + jnp.abs(qvy[j])
            par = jnp.abs(df) <= 1e-6 * qn * (jnp.abs(dx) + jnp.abs(dy)) + _PAR_EPS
            col = par & (
                jnp.abs(f0) <= 1e-5 * qn * (jnp.abs(rx) + jnp.abs(ry)) + _PAR_EPS
            )
            on_b = on_b | col
            alive = alive & ((~par) | col | (f0 >= 0))
            tstar = -f0 / jnp.where(par, 1.0, df)
            t_lo = jnp.where(~par & (df > 0), jnp.maximum(t_lo, tstar), t_lo)
            t_hi = jnp.where(~par & (df < 0), jnp.minimum(t_hi, tstar), t_hi)
        keep = alive & (t_lo < t_hi)
        wgt = jnp.where(on_b, 0.5, 1.0)
        ux = ax + t_lo * dx
        uy = ay + t_lo * dy
        vx = ax + t_hi * dx
        vy = ay + t_hi * dy
        total = total + jnp.where(keep, wgt * (ux * vy - vx * uy), 0.0)
    return total


def _rect_clip_green(px, py, w2, h2, tol_xy):
    """Green contributions of edges (px, py) clipped to the axis-aligned
    rect [-w2, w2] x [-h2, h2] — the slab specialization of the generic
    Liang-Barsky in _green_sum. Shared-boundary (collinear) edges get
    weight 1/2, matching _green_sum's tie handling so identical boxes
    give IoU exactly 1.

    Returns (sum cross(u, v), sum (v-u)_x, sum (v-u)_y): the per-segment
    cross products are origin-dependent, and the two clip directions run
    in different frames (each box's own), so the caller must add the
    closed-loop origin correction cross(O1 - O2, D1) — see
    _iou_kernel_rect.
    """
    total = 0.0
    sum_dx = 0.0
    sum_dy = 0.0
    for i in range(4):
        ax, ay = px[i], py[i]
        bx, by = px[(i + 1) % 4], py[(i + 1) % 4]
        dx, dy = bx - ax, by - ay

        par_x = jnp.abs(dx) <= tol_xy
        par_y = jnp.abs(dy) <= tol_xy
        inv_x = 1.0 / jnp.where(par_x, 1.0, dx)
        inv_y = 1.0 / jnp.where(par_y, 1.0, dy)
        t1 = (-w2 - ax) * inv_x
        t2 = (w2 - ax) * inv_x
        t3 = (-h2 - ay) * inv_y
        t4 = (h2 - ay) * inv_y
        tl_x = jnp.minimum(t1, t2)
        th_x = jnp.maximum(t1, t2)
        tl_y = jnp.minimum(t3, t4)
        th_y = jnp.maximum(t3, t4)
        zero = jnp.zeros_like(tl_x)
        one = jnp.ones_like(th_x)
        t_lo = jnp.maximum(
            jnp.maximum(jnp.where(par_x, zero, tl_x),
                        jnp.where(par_y, zero, tl_y)),
            0.0,
        )
        t_hi = jnp.minimum(
            jnp.minimum(jnp.where(par_x, one, th_x),
                        jnp.where(par_y, one, th_y)),
            1.0,
        )
        # an axis-parallel edge must lie inside that axis' slab
        in_x = (ax >= -w2 - tol_xy) & (ax <= w2 + tol_xy)
        in_y = (ay >= -h2 - tol_xy) & (ay <= h2 + tol_xy)
        alive = ((~par_x) | in_x) & ((~par_y) | in_y)
        # collinear-with-boundary edges are shared boundary: weight 1/2
        col = (par_x & (jnp.abs(jnp.abs(ax) - w2) <= tol_xy)) | (
            par_y & (jnp.abs(jnp.abs(ay) - h2) <= tol_xy)
        )
        keep = alive & (t_lo < t_hi)
        wgt = jnp.where(col, 0.5, 1.0)
        w_span = jnp.where(keep, wgt * (t_hi - t_lo), 0.0)
        ux = ax + t_lo * dx
        uy = ay + t_lo * dy
        vx = ax + t_hi * dx
        vy = ay + t_hi * dy
        total = total + jnp.where(keep, wgt * (ux * vy - vx * uy), 0.0)
        sum_dx = sum_dx + w_span * dx
        sum_dy = sum_dy + w_span * dy
    return total, sum_dx, sum_dy


def _iou_kernel_rect(gt_ref, an_ref, out_ref):
    """Rect-frame slab kernel. gt rows / an rows (planar, see
    _planar_rows_rect): [relx0..3, rely0..3, cx, cy, w/2, h/2, cos, sin,
    area, 0].

    A block-level separation pre-test (sum-of-L1-radii circle bound) skips
    the whole clip chain when no (gt, anchor) pair in the block can
    overlap — which is most blocks: anchors are spatially ordered, gts are
    small, and padded gts are parked at FAR_CENTER (pad_boxes_far)."""
    gt = gt_ref[:]  # (BK, 16)
    an = an_ref[:]  # (16, BN)
    gcx, gcy = gt[:, 8:9], gt[:, 9:10]
    gw2, gh2 = gt[:, 10:11], gt[:, 11:12]
    acx, acy = an[8:9, :], an[9:10, :]
    aw2, ah2 = an[10:11, :], an[11:12, :]

    dx_c = acx - gcx  # (BK, BN)
    dy_c = acy - gcy
    # w2 + h2 >= half-diagonal, so rsum bounds the max overlap distance
    rsum = (gw2 + gh2) + (aw2 + ah2)
    touching = dx_c * dx_c + dy_c * dy_c < rsum * rsum

    @pl.when(jnp.logical_not(jnp.any(touching)))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(jnp.any(touching))
    def _():
        gx = [gt[:, c:c + 1] for c in range(4)]
        gy = [gt[:, 4 + c:5 + c] for c in range(4)]
        gcos, gsin = gt[:, 12:13], gt[:, 13:14]
        g_area = gt[:, 14:15]
        ax = [an[c:c + 1, :] for c in range(4)]
        ay = [an[4 + c:5 + c, :] for c in range(4)]
        acos, asin = an[12:13, :], an[13:14, :]
        a_area = an[14:15, :]

        # anchor corners in the gt frame: R(-tg) @ (a_rel + d)
        pax, pay = [], []
        for c in range(4):
            wx = ax[c] + dx_c
            wy = ay[c] + dy_c
            pax.append(gcos * wx + gsin * wy)
            pay.append(gcos * wy - gsin * wx)
        # gt corners in the anchor frame: R(-ta) @ (g_rel - d)
        pgx, pgy = [], []
        for c in range(4):
            wx = gx[c] - dx_c
            wy = gy[c] - dy_c
            pgx.append(acos * wx + asin * wy)
            pgy.append(acos * wy - asin * wx)

        scale = jnp.maximum(gw2 + gh2, aw2 + ah2)
        tol = 1e-5 * scale + _PAR_EPS
        s1, d1x_l, d1y_l = _rect_clip_green(pax, pay, gw2, gh2, tol)
        s2, _, _ = _rect_clip_green(pgx, pgy, aw2, ah2, tol)
        # origin correction: direction 1 used origin g_c (gt frame),
        # direction 2 origin a_c; for the closed loop the mismatch
        # contributes cross(O1 - O2, D1) with D1 = sum(v - u) of direction
        # 1 in WORLD coordinates (rotate the gt-frame sum back by +tg).
        d1x = gcos * d1x_l - gsin * d1y_l
        d1y = gsin * d1x_l + gcos * d1y_l
        corr = dy_c * d1x - dx_c * d1y  # cross(g_c - a_c, D1)
        s = s1 + s2 + corr
        inter = jnp.maximum(0.5 * s, 0.0)
        union = g_area + a_area - inter
        out_ref[:] = jnp.where(
            touching & (union > 1e-9), inter / jnp.maximum(union, 1e-9), 0.0
        )


def _iou_kernel(gt_ref, an_ref, out_ref):
    gt = gt_ref[:]  # (BLOCK_K, 16): corners-rel x4, y4, cx, cy, area
    an = an_ref[:]  # (16, BLOCK_N): same rows
    gx = [gt[:, c:c + 1] for c in range(4)]          # (K8, 1)
    gy = [gt[:, 4 + c:5 + c] for c in range(4)]
    gcx = gt[:, 8:9]
    gcy = gt[:, 9:10]
    g_area = gt[:, 10:11]
    axr = [an[c:c + 1, :] for c in range(4)]          # (1, BN)
    ayr = [an[4 + c:5 + c, :] for c in range(4)]
    acx = an[8:9, :]
    acy = an[9:10, :]
    a_area = an[10:11, :]

    # pair midframe: anchor corners +d/2, gt corners -d/2, d = a_c - g_c
    hdx = 0.5 * (acx - gcx)  # (K8, BN)
    hdy = 0.5 * (acy - gcy)
    pax = [x + hdx for x in axr]
    pay = [y + hdy for y in ayr]
    pgx = [x - hdx for x in gx]
    pgy = [y - hdy for y in gy]

    s = _green_sum(pax, pay, pgx, pgy) + _green_sum(pgx, pgy, pax, pay)
    inter = jnp.maximum(0.5 * s, 0.0)
    union = g_area + a_area - inter
    out_ref[:] = jnp.where(
        union > 1e-9, inter / jnp.maximum(union, 1e-9), 0.0
    )


def _planar_rows(boxes):
    """(..., M, 5) -> (..., 16, M): rows relx0-3, rely0-3, cx, cy, area."""
    cx = boxes[..., 0]
    cy = boxes[..., 1]
    w = boxes[..., 2]
    h = boxes[..., 3]
    a = boxes[..., 4]
    cos2 = jnp.cos(a) * 0.5
    sin2 = jnp.sin(a) * 0.5
    x0 = -sin2 * h - cos2 * w
    y0 = cos2 * h - sin2 * w
    x1 = sin2 * h - cos2 * w
    y1 = -cos2 * h - sin2 * w
    zeros = jnp.zeros_like(cx)
    rows = [x0, x1, -x0, -x1, y0, y1, -y0, -y1, cx, cy, w * h,
            zeros, zeros, zeros, zeros, zeros]
    return jnp.stack(rows, axis=-2)


def _planar_rows_rect(boxes):
    """(..., M, 5) -> (..., 16, M): rows relx0-3, rely0-3, cx, cy, w/2,
    h/2, cos, sin, area, 0 — the rect-frame kernel's layout."""
    cx = boxes[..., 0]
    cy = boxes[..., 1]
    w = boxes[..., 2]
    h = boxes[..., 3]
    a = boxes[..., 4]
    cos = jnp.cos(a)
    sin = jnp.sin(a)
    cos2 = cos * 0.5
    sin2 = sin * 0.5
    x0 = -sin2 * h - cos2 * w
    y0 = cos2 * h - sin2 * w
    x1 = sin2 * h - cos2 * w
    y1 = -cos2 * h - sin2 * w
    zeros = jnp.zeros_like(cx)
    rows = [x0, x1, -x0, -x1, y0, y1, -y0, -y1, cx, cy, w * 0.5, h * 0.5,
            cos, sin, w * h, zeros]
    return jnp.stack(rows, axis=-2)


def park_masked_boxes(boxes, mask):
    """Move masked (padding) rboxes to FAR_CENTER with zero size.

    Their pairwise IoU is 0 either way; parked far away they also fail
    the kernel's block separation pre-test, so all-padding gt blocks cost
    one vector compare instead of the full clip chain."""
    far = jnp.asarray([FAR_CENTER, FAR_CENTER, 0.0, 0.0, 0.0], boxes.dtype)
    return jnp.where(mask[..., None], boxes, far)


@functools.partial(jax.jit, static_argnames=("interpret", "kernel"))
def _pallas_iou_2d(gt_pl, an_pl, interpret=False, kernel="rect"):
    """gt_pl (Kp, 16); an_pl (16, Np) -> (Kp, Np) f32."""
    Kp = gt_pl.shape[0]
    Np = an_pl.shape[1]
    grid = (Kp // BLOCK_K, Np // BLOCK_N)
    flops_pair = 700 if kernel == "generic" else 300
    return pl.pallas_call(
        _iou_kernel if kernel == "generic" else _iou_kernel_rect,
        out_shape=jax.ShapeDtypeStruct((Kp, Np), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_K, 16), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, BLOCK_N), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK_K, BLOCK_N), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_pair * Kp * Np,
            bytes_accessed=(Kp * 16 + 16 * Np + Kp * Np) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(gt_pl, an_pl)


def box_iou_rotated_pallas(gts, anchors, interpret=False, kernel="rect"):
    """Pairwise rotated IoU (K, N) via the fused Pallas kernel.

    Exact same quantity as `box_iou_rotated(gts, anchors)`; forward-only.
    `kernel="rect"` (default) clips in each box's axis-aligned frame —
    ~3x fewer VPU ops than the generic quad-quad path ("generic").
    """
    K = gts.shape[0]
    N = anchors.shape[0]
    pad_k = (-K) % BLOCK_K
    pad_n = (-N) % BLOCK_N
    planar = _planar_rows if kernel == "generic" else _planar_rows_rect
    gts_p = jnp.pad(gts.astype(jnp.float32), ((0, pad_k), (0, 0)))
    if pad_k:
        # park pad rows far away so all-pad gt blocks skip via the
        # separation pre-test instead of clipping degenerate boxes
        row = jnp.arange(K + pad_k) >= K
        gts_p = jnp.where(
            row[:, None],
            jnp.asarray([FAR_CENTER, FAR_CENTER, 0.0, 0.0, 0.0]),
            gts_p,
        )
    gt_pl = planar(gts_p).T  # (Kp, 16)
    an_pl = planar(
        jnp.pad(anchors.astype(jnp.float32), ((0, pad_n), (0, 0)))
    )  # (16, Np)
    out = _pallas_iou_2d(gt_pl, an_pl, interpret=interpret, kernel=kernel)
    return out[:K, :N]

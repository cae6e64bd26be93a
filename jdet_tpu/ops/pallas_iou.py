"""Pallas TPU kernel for the pairwise rotated-IoU matrix.

The anchor-assignment hot path computes IoU of K gts (small, ~32-128)
against N anchors (~200k) per image. The pure-XLA formulation materializes
~40 (K, N) f32 intermediates in HBM (~50 GB of traffic per train step at
B=8); this kernel keeps the whole Green's-theorem/Liang-Barsky chain
(box_iou_rotated.py) in VMEM: the grid tiles the anchor axis, each program
loads one (5, BLOCK) anchor slab + the full (K, 5) gt table and emits a
(K, BLOCK) IoU tile in a single pass.

Forward-only (assignment/NMS take no gradients through IoU); the
differentiable jnp path remains for losses.

STATUS: numerically exact vs the XLA path (max diff ~4e-6 over 6M pairs)
but currently ~6x SLOWER (300ms vs 52ms for 32x196k on v5e) — the
(K, 5)/(5, BLOCK) block specs put tiny dims in lanes and force relayouts.
XLA's own fusion of box_iou_rotated is already near memory-bound speed, so
this kernel is NOT wired into the hot path; kept as the starting point for
a layout-correct rewrite (anchors as 8 separate planar rows, gts via
scalar prefetch).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAR_EPS = 1e-12
BLOCK = 512


def _corners_kb(cx, cy, w, h, a):
    """Corner lists for (K, B)-shaped box components."""
    cos2 = jnp.cos(a) * 0.5
    sin2 = jnp.sin(a) * 0.5
    x0 = cx - sin2 * h - cos2 * w
    y0 = cy + cos2 * h - sin2 * w
    x1 = cx + sin2 * h - cos2 * w
    y1 = cy - cos2 * h - sin2 * w
    return (
        [x0, x1, 2 * cx - x0, 2 * cx - x1],
        [y0, y1, 2 * cy - y0, 2 * cy - y1],
    )


def _green_sum(px, py, qx, qy):
    qvx = [qx[(j + 1) % 4] - qx[j] for j in range(4)]
    qvy = [qy[(j + 1) % 4] - qy[j] for j in range(4)]
    total = 0.0
    for i in range(4):
        ax, ay = px[i], py[i]
        bx, by = px[(i + 1) % 4], py[(i + 1) % 4]
        dx, dy = bx - ax, by - ay
        t_lo = jnp.zeros_like(ax)
        t_hi = jnp.ones_like(ax)
        alive = jnp.ones_like(ax, dtype=jnp.bool_)
        on_b = jnp.zeros_like(ax, dtype=jnp.bool_)
        for j in range(4):
            rx = ax - qx[j]
            ry = ay - qy[j]
            f0 = qvx[j] * ry - rx * qvy[j]
            df = qvx[j] * dy - dx * qvy[j]
            qn = jnp.abs(qvx[j]) + jnp.abs(qvy[j])
            par = jnp.abs(df) <= 1e-6 * qn * (jnp.abs(dx) + jnp.abs(dy)) + _PAR_EPS
            col = par & (jnp.abs(f0) <= 1e-5 * qn * (jnp.abs(rx) + jnp.abs(ry)) + _PAR_EPS)
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


def _iou_kernel(gt_ref, an_ref, out_ref):
    gts = gt_ref[:]  # (K, 5)
    an = an_ref[:]  # (5, BLOCK)
    K = gts.shape[0]
    # gt components as (K, 1); anchors as (1, BLOCK)
    g = [gts[:, i][:, None] for i in range(5)]
    a = [an[i][None, :] for i in range(5)]
    # recenter each pair at its midpoint for fp32 precision; broadcast
    # everything to (K, BLOCK)
    mx = 0.5 * (g[0] + a[0])
    my = 0.5 * (g[1] + a[1])
    zero = mx * 0
    gx, gy = _corners_kb(g[0] - mx, g[1] - my, g[2] + zero, g[3] + zero, g[4] + zero)
    ax_, ay_ = _corners_kb(a[0] - mx, a[1] - my, a[2] + zero, a[3] + zero, a[4] + zero)
    s = _green_sum(gx, gy, ax_, ay_) + _green_sum(ax_, ay_, gx, gy)
    inter = jnp.maximum(0.5 * s, 0.0)
    area_g = g[2] * g[3]
    area_a = a[2] * a[3]
    union = area_g + area_a - inter
    out_ref[:] = jnp.where(union > 1e-9, inter / jnp.maximum(union, 1e-9), 0.0)


@functools.partial(jax.jit, static_argnames=())
def _pallas_iou_2d(gts, anchors_t):
    """gts (K, 5) f32; anchors_t (5, N) f32 with N % BLOCK == 0 -> (K, N)."""
    K = gts.shape[0]
    N = anchors_t.shape[1]
    grid = (N // BLOCK,)
    return pl.pallas_call(
        _iou_kernel,
        out_shape=jax.ShapeDtypeStruct((K, N), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((K, 5), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((5, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (K, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
    )(gts, anchors_t)


def box_iou_rotated_pallas(gts, anchors):
    """Drop-in pairwise IoU (K, N) on TPU via the fused Pallas kernel.

    Pads N to the block size; K should be modest (<= a few hundred).
    """
    K = gts.shape[0]
    N = anchors.shape[0]
    pad = (-N) % BLOCK
    at = jnp.pad(anchors, ((0, pad), (0, 0))).T.astype(jnp.float32)
    out = _pallas_iou_2d(gts.astype(jnp.float32), at)
    return out[:, :N]

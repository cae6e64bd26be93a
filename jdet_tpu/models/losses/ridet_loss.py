"""RIDet representation-invariant loss.

Mirror of `python/jdet/models/losses/ridet_loss.py:80` (RIDetLoss): a
center metric (smooth-L1 distance normalized by the target diagonal,
scaled by its aspect ratio) plus a geometry metric that Hungarian-matches
the two equivalent obb parameterizations — (w, h, theta) vs
(h, w, theta + pi/2) — and takes the cheaper assignment. Everything is a
branch-free jnp.minimum over the two orderings, so it vectorizes on the
VPU with no matching loop.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def _smooth_l1(diff, beta=1.0):
    ad = jnp.abs(diff)
    return jnp.where(ad < beta, 0.5 * ad * ad / beta, ad - 0.5 * beta)


def _rotation_mapping(inp, tgt, eps=1e-6):
    """ridet_loss.py:17-31: width-ratio folded to <=1, times |cos dtheta|."""
    ratios_w = jnp.abs(inp[:, 0] / (tgt[:, 0] + eps))
    ratios_w = jnp.where(ratios_w > 1, 1 / (ratios_w + eps), ratios_w)
    dtheta = inp[:, 2] - tgt[:, 2]
    return 1 / (1 + eps + ratios_w * jnp.abs(jnp.cos(dtheta))) - 0.5


def _wh_iou(inp, tgt, eps=1e-6):
    """ridet_loss.py:33-38: axis-free (w, h) IoU -> -log(iou) + GIoU gap."""
    inter = jnp.minimum(inp[:, 0], tgt[:, 0]) * jnp.minimum(inp[:, 1], tgt[:, 1])
    union = inp[:, 0] * inp[:, 1] + tgt[:, 0] * tgt[:, 1] - inter
    areac = jnp.maximum(inp[:, 0], tgt[:, 0]) * jnp.maximum(inp[:, 1], tgt[:, 1])
    return -jnp.log(inter / (union + eps) + eps) + (areac - union) / (areac + eps)


def _shape_mapping(inp, tgt):
    return jnp.minimum(
        _wh_iou(inp[:, [1, 0]], tgt[:, :2]), _wh_iou(inp[:, [0, 1]], tgt[:, :2])
    )


def _hungarian_shape(inp, tgt):
    """min over the two equivalent (w,h,theta) orderings
    (ridet_loss.py:40-45)."""
    tgt_plus = jnp.concatenate(
        [tgt[:, [1, 0]], (tgt[:, 2] + math.pi * 0.5)[:, None]], -1
    )
    a = 10 * _rotation_mapping(inp, tgt_plus) + 0.1 * _shape_mapping(inp, tgt_plus)
    b = 10 * _rotation_mapping(inp, tgt) + 0.1 * _shape_mapping(inp, tgt)
    return jnp.minimum(a, b)


def ridet_loss(pred, target, weight=None, beta=1.0, reduction="mean",
               avg_factor=None, eps=1e-6):
    """hungarian_loss_obb (ridet_loss.py:47-78). pred/target: (n, 5) obbs."""
    box_ratio = target[:, 2] / (target[:, 3] + eps)
    box_ratio = jnp.where(box_ratio > 1, box_ratio, 1 / (box_ratio + eps))
    center_dist = _smooth_l1(pred[:, :2] - target[:, :2], beta).sum(-1)
    diagonal = target[:, 2] ** 2 + target[:, 3] ** 2
    center_metric = box_ratio * 0.25 * center_dist / (diagonal + eps)
    geometry_metric = _hungarian_shape(pred[:, 2:], target[:, 2:])
    loss = center_metric + geometry_metric

    if weight is not None:
        if weight.ndim != 1:
            weight = weight.reshape(weight.shape[0], -1).mean(-1)
        loss = loss * weight
    if reduction == "none":
        return loss
    if reduction == "sum":
        return loss.sum()
    if avg_factor is None:
        avg_factor = max(loss.shape[0], 1)
    return loss.sum() / jnp.maximum(avg_factor, 1.0)

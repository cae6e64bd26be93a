"""IoU-based regression losses (rotated).

Mirror of `iou_loss` (python/jdet/models/losses/iou_loss.py:8-39) using the
aligned exact rotated IoU; differentiable end to end.
"""
from __future__ import annotations

import jax.numpy as jnp

from ...ops.box_iou_rotated import box_iou_rotated_aligned


def rotated_iou_loss(
    pred,
    target,
    weight=None,
    mode="log",
    eps=1e-6,
    reduction="mean",
    avg_factor=None,
):
    ious = jnp.clip(box_iou_rotated_aligned(pred, target), eps, None)
    if mode == "linear":
        loss = 1 - ious
    elif mode == "square":
        loss = 1 - ious**2
    elif mode == "log":
        loss = -jnp.log(ious)
    else:
        raise ValueError(mode)
    if weight is not None:
        loss = loss * weight
    if reduction == "none":
        return loss
    if reduction == "sum":
        return loss.sum()
    if avg_factor is None:
        avg_factor = max(loss.shape[0], 1)
    return loss.sum() / jnp.maximum(avg_factor, 1.0)

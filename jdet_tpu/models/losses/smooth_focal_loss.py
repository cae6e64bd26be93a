"""Smooth focal loss for CSL angle classification.

Mirror of `smooth_focal_loss`
(python/jdet/models/losses/smooth_focal_loss.py:7-25): focal-weighted BCE
against *soft* (Gaussian-smoothed) targets produced by the CSL coder.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .basic import _bce_with_logits


def smooth_focal_loss(
    pred,
    target,
    weight=None,
    gamma=2.0,
    alpha=0.25,
    reduction="mean",
    avg_factor=None,
):
    p = jax.nn.sigmoid(pred)
    target = target.astype(pred.dtype)
    pt = (1 - p) * target + p * (1 - target)
    focal_weight = (alpha * target + (1 - alpha) * (1 - target)) * pt**gamma
    loss = _bce_with_logits(pred, target) * focal_weight
    if weight is not None:
        if weight.ndim < loss.ndim:
            weight = weight[..., None]
        loss = loss * weight
    if reduction == "none":
        return loss
    if reduction == "sum":
        return loss.sum()
    denom = loss.size if avg_factor is None else jnp.maximum(avg_factor, 1.0)
    return loss.sum() / denom

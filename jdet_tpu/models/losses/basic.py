"""Core detection losses — weighted, fixed-shape, avg_factor-style.

Functional mirrors of the reference loss modules
(`python/jdet/models/losses/`): sigmoid focal loss (focal_loss.py:5-107),
smooth L1 (smooth_l1_loss.py), L1 (l1_loss.py), CE/BCE
(cross_entropy_loss.py). Labels follow the reference convention:
int32, 0 = background, 1..C = foreground classes; logits have C channels
(sigmoid losses) so class c maps to channel c-1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def weight_reduce_loss(loss, weight=None, reduction="mean", avg_factor=None):
    """Apply elementwise weight then reduce. avg_factor overrides the mean
    denominator (reference pattern used by every loss)."""
    if weight is not None:
        if weight.ndim < loss.ndim:
            weight = weight[..., None]
        loss = loss * weight
    if reduction == "none":
        return loss
    if reduction == "sum":
        return loss.sum()
    if avg_factor is None:
        return loss.mean()
    return loss.sum() / jnp.maximum(avg_factor, 1.0)


def _bce_with_logits(logits, targets):
    """Numerically-stable BCE with logits (focal_loss.py:5-21 semantics)."""
    max_val = jnp.clip(-logits, 0, None)
    return (
        (1 - targets) * logits
        + max_val
        + jnp.log(
            jnp.maximum(jnp.exp(-max_val) + jnp.exp(-logits - max_val), 1e-10)
        )
    )


def sigmoid_focal_loss(
    logits,
    labels,
    weight=None,
    gamma=2.0,
    alpha=0.25,
    avg_factor=None,
    reduction="mean",
):
    """Sigmoid focal loss with 1-based labels.

    Mirrors `sigmoid_focal_loss` (focal_loss.py:37-57): one-hot targets via
    (channel_index + 1 == label); per-anchor `weight` multiplies the BCE
    before focal modulation; mean over avg_factor.

    logits: (..., C); labels: (...,) int with 0 = background.
    """
    c = logits.shape[-1]
    targets = (
        jnp.arange(1, c + 1, dtype=labels.dtype) == labels[..., None]
    ).astype(logits.dtype)
    ce = _bce_with_logits(logits, targets)
    if weight is not None:
        ce = ce * weight[..., None]
    p = jax.nn.sigmoid(logits)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    if reduction == "mean":
        denom = loss.size if avg_factor is None else jnp.maximum(avg_factor, 1.0)
        return loss.sum() / denom
    if reduction == "sum":
        return loss.sum()
    return loss


def smooth_l1_loss(
    pred, target, weight=None, beta=1.0, avg_factor=None, reduction="mean"
):
    """SmoothL1 (smooth_l1_loss.py:5-28)."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def l1_loss(pred, target, weight=None, avg_factor=None, reduction="mean"):
    """L1 (l1_loss.py:6-21)."""
    loss = jnp.abs(pred - target)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def cross_entropy_loss(
    logits,
    labels,
    weight=None,
    avg_factor=None,
    reduction="mean",
    label_offset=0,
):
    """Softmax CE over class logits. labels int; `label_offset` lets callers
    feed 1-based labels against logits that include a background column 0
    (reference CrossEntropyLossForRcnn convention) or 0-based labels.
    Mirrors cross_entropy_loss.py:35-128.
    """
    lbl = labels + label_offset
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.take_along_axis(logp, lbl[..., None], axis=-1)[..., 0]
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def binary_cross_entropy_loss(
    logits, targets, weight=None, avg_factor=None, reduction="mean"
):
    loss = _bce_with_logits(logits, targets.astype(logits.dtype))
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def accuracy(logits, labels):
    return (logits.argmax(-1) == labels).mean()

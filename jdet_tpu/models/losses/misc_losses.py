"""Remaining loss families: RSDet modulated loss, knowledge-distillation
losses, symmetric Gaussian-distance variants.

Mirrors: RSDetLoss (python/jdet/models/losses/rsdet_loss.py:6-90),
KnowledgeDistillationKLDivLoss / IMLoss (losses/kd_loss.py:7-120),
jd / kld_symmax / kld_symmin (losses/gaussian_dist_loss.py:178-280).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .gaussian_dist_loss import kld_loss, _postprocess, _reduce


def rsdet_loss(
    preds,
    targets,
    anchors,
    weight=None,
    sigma=3.0,
    reduction="mean",
    avg_factor=None,
):
    """Modulated 5-parameter loss (rsdet_loss.py:8-49): min of the plain
    smooth-L1 and the representation-swapped variant (w/h exchanged with a
    log-ratio correction, angle off by 90 deg) — removes the loss
    discontinuity at the angle boundary."""
    s2 = sigma**2
    diff = jnp.abs(preds - targets)
    sl1 = jnp.where(diff < 1.0 / s2, 0.5 * s2 * diff**2, diff - 0.5 / s2)
    loss1 = sl1.sum(-1)

    logr = jnp.log(jnp.maximum(anchors[..., 2], 1e-6)) - jnp.log(
        jnp.maximum(anchors[..., 3], 1e-6)
    )
    l2 = jnp.stack(
        [
            preds[..., 0] - targets[..., 0],
            preds[..., 1] - targets[..., 1],
            preds[..., 2] - targets[..., 3] - logr,
            preds[..., 3] - targets[..., 2] + logr,
            jnp.abs(preds[..., 4] - targets[..., 4]) - 0.5,
        ],
        -1,
    )
    loss2 = jnp.abs(l2).sum(-1)
    loss = jnp.minimum(loss1, loss2)
    if weight is not None:
        if weight.ndim > loss.ndim:
            weight = weight.mean(-1)
        loss = loss * weight
    if reduction == "none":
        return loss
    if reduction == "sum":
        return loss.sum()
    if avg_factor is None:
        avg_factor = max(loss.shape[0], 1)
    return loss.sum() / jnp.maximum(avg_factor, 1.0)


def knowledge_distillation_kl_div_loss(pred, soft_label, T=10.0,
                                       weight=None, avg_factor=None,
                                       reduction="mean"):
    """KL(target_softmax || pred_softmax) * T^2 (kd_loss.py:7-40)."""
    target = jax.nn.softmax(soft_label / T, -1)
    logp = jax.nn.log_softmax(pred / T, -1)
    logq = jax.nn.log_softmax(soft_label / T, -1)
    kd = (target * (logq - logp)).sum(-1) * T * T
    if weight is not None:
        kd = kd * weight
    if reduction == "none":
        return kd
    if reduction == "sum":
        return kd.sum()
    denom = kd.size if avg_factor is None else jnp.maximum(avg_factor, 1.0)
    return kd.sum() / denom


def im_loss(x, soft_target, weight=None, avg_factor=None, reduction="mean"):
    """Feature-imitation MSE vs a (stop-gradient) teacher feature
    (kd_loss.py:93-120)."""
    loss = (x - jax.lax.stop_gradient(soft_target)) ** 2
    if weight is not None:
        loss = loss * weight
    if reduction == "none":
        return loss
    if reduction == "sum":
        return loss.sum()
    denom = loss.size if avg_factor is None else jnp.maximum(avg_factor, 1.0)
    return loss.sum() / denom


def jd_loss(pred, target, weight=None, fun="log1p", tau=1.0, alpha=1.0,
            sqrt=True, reduction="mean", avg_factor=None):
    """Symmetrized (Jeffreys) KLD (gaussian_dist_loss.py:178-211)."""
    a = kld_loss(pred, target, fun="none", tau=0.0, alpha=alpha, sqrt=False,
                 reduction="none")
    b = kld_loss(target, pred, fun="none", tau=0.0, alpha=alpha, sqrt=False,
                 reduction="none")
    jd = 0.5 * (a + b)
    if sqrt:
        jd = jnp.sqrt(jnp.clip(jd, 1e-7, None))
    loss = _postprocess(jd, fun, tau)
    return _reduce(loss, weight, reduction, avg_factor)


def kld_symmax_loss(pred, target, weight=None, fun="log1p", tau=1.0,
                    alpha=1.0, sqrt=True, reduction="mean", avg_factor=None):
    """max(KL(p,t), KL(t,p)) (gaussian_dist_loss.py:213-246)."""
    a = kld_loss(pred, target, fun="none", tau=0.0, alpha=alpha, sqrt=sqrt,
                 reduction="none")
    b = kld_loss(target, pred, fun="none", tau=0.0, alpha=alpha, sqrt=sqrt,
                 reduction="none")
    loss = _postprocess(jnp.maximum(a, b), fun, tau)
    return _reduce(loss, weight, reduction, avg_factor)


def kld_symmin_loss(pred, target, weight=None, fun="log1p", tau=1.0,
                    alpha=1.0, sqrt=True, reduction="mean", avg_factor=None):
    """min variant (gaussian_dist_loss.py:248-280)."""
    a = kld_loss(pred, target, fun="none", tau=0.0, alpha=alpha, sqrt=sqrt,
                 reduction="none")
    b = kld_loss(target, pred, fun="none", tau=0.0, alpha=alpha, sqrt=sqrt,
                 reduction="none")
    loss = _postprocess(jnp.minimum(a, b), fun, tau)
    return _reduce(loss, weight, reduction, avg_factor)

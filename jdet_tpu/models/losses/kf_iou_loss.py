"""KFIoU loss — Kalman-filter product-of-Gaussians overlap.

Mirror of `kfiou_loss` (python/jdet/models/losses/kf_iou_loss.py:48-100),
with the 2x2 linalg expanded to closed form: the Kalman fusion
Sigma = Sigma_p - Sigma_p (Sigma_p + Sigma_t)^-1 Sigma_p gives the overlap
Gaussian; volumes V = 4 sqrt(det Sigma) define
KFIoU = V / (V_p + V_t - V + eps). The xy term is a smooth-L1 on the raw
(encoded) centers.
"""
from __future__ import annotations

import jax.numpy as jnp

from .gaussian_dist_loss import xy_wh_r_to_gaussian


def kf_iou_loss(
    pred,
    target,
    pred_decode=None,
    targets_decode=None,
    weight=None,
    fun=None,
    beta=1.0 / 9.0,
    eps=1e-6,
    reduction="mean",
    avg_factor=None,
):
    xy_p = pred[..., :2]
    xy_t = target[..., :2]
    _, (ap, bp, cp) = xy_wh_r_to_gaussian(pred_decode)
    _, (at, bt, ct) = xy_wh_r_to_gaussian(targets_decode)

    diff = jnp.abs(xy_p - xy_t)
    xy_loss = jnp.where(
        diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta
    ).sum(-1)

    det_p = ap * cp - bp * bp
    det_t = at * ct - bt * bt
    vb_p = 4 * jnp.sqrt(jnp.clip(det_p, 0, None))
    vb_t = 4 * jnp.sqrt(jnp.clip(det_t, 0, None))

    # Sigma = Sigma_p - Sigma_p (Sigma_p + Sigma_t)^-1 Sigma_p
    sa = ap + at
    sb = bp + bt
    sc = cp + ct
    det_s = jnp.clip(sa * sc - sb * sb, 1e-12, None)
    # (Sigma_p+Sigma_t)^-1 = [[sc, -sb], [-sb, sa]] / det_s
    # M = Sigma_p * inv(S) * Sigma_p; Sigma = Sigma_p - M
    # Compute K = Sigma_p inv(S):
    k11 = (ap * sc - bp * sb) / det_s
    k12 = (-ap * sb + bp * sa) / det_s
    k21 = (bp * sc - cp * sb) / det_s
    k22 = (-bp * sb + cp * sa) / det_s
    # Sigma = Sigma_p - K Sigma_p
    fa = ap - (k11 * ap + k12 * bp)
    fb = bp - (k11 * bp + k12 * cp)
    fc = cp - (k21 * bp + k22 * cp)
    det_f = fa * fc - fb * fb
    vb = 4 * jnp.sqrt(jnp.clip(det_f, 0, None))
    vb = jnp.nan_to_num(vb)
    kfiou = vb / (vb_p + vb_t - vb + eps)

    if fun == "ln":
        kf = -jnp.log(kfiou + eps)
    elif fun == "exp":
        kf = jnp.exp(1 - kfiou) - 1
    else:
        kf = 1 - kfiou

    loss = jnp.clip(xy_loss + kf, 0, None)
    if weight is not None:
        loss = loss * weight
    if reduction == "none":
        return loss
    if reduction == "sum":
        return loss.sum()
    if avg_factor is None:
        avg_factor = max(loss.shape[0], 1)
    return loss.sum() / jnp.maximum(avg_factor, 1.0)

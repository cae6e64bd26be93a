"""Rotation-invariant RoIAlign (ReDet).

TPU-native equivalent of the reference RiRoIAlign CUDA kernel
(`python/jdet/ops/riroi_align.py:383-492`): rotated-RoI bilinear sampling
(like RoIAlignRotated) PLUS a circular shift of the orientation channels
by the RoI angle, linearly interpolating between the two nearest of the 8
discrete orientations — so an object's features become canonical in its
own frame regardless of its rotation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .roi_align_rotated import roi_align_rotated

N_ORIENT = 8


def _orientation_shift(out, rois, n_orientation):
    """Circular shift of orientation channels by the RoI angle with
    linear interpolation between the two nearest discrete orientations
    (reference riroi_align.py orientation-channel logic)."""
    B, R, P, _, C = out.shape
    f = C // n_orientation
    x = out.reshape(B, R, P, P, f, n_orientation)

    theta = rois[..., 4]  # (B, R)
    t = theta / (2 * jnp.pi / n_orientation)
    i0 = jnp.floor(t)
    frac = t - i0  # (B, R) in [0, 1)

    # There are only n_orientation distinct circular shifts, so instead of
    # per-RoI element gathers on the minor axis (slow on TPU: element-level
    # gather of the whole (B,R,P,P,C) tensor, twice), take a weighted sum
    # of the n rolls. The lo/hi linear interpolation folds into the
    # per-RoI weights (at most 2 of the n are nonzero).
    lo_s = jnp.mod(i0, n_orientation).astype(jnp.int32)
    hi_s = jnp.mod(i0 + 1, n_orientation).astype(jnp.int32)
    s = jnp.arange(n_orientation)
    w = (1 - frac)[..., None] * (s == lo_s[..., None]) + frac[..., None] * (
        s == hi_s[..., None]
    )  # (B, R, n)
    w = w.astype(out.dtype)
    acc = 0.0
    for k in range(n_orientation):
        # shift(k)[..., j] = x[..., (j + k) % n] == roll(x, -k)
        acc = acc + w[:, :, k, None, None, None, None] * jnp.roll(
            x, -k, axis=-1
        )
    return acc.reshape(B, R, P, P, C)


def riroi_align(
    feat,
    rois,
    out_size=7,
    spatial_scale=1.0,
    sampling_ratio=2,
    n_orientation=N_ORIENT,
    valid=None,
):
    """feat (B, H, W, F*n_orientation) with orientation fastest;
    rois (B, R, 5). Returns (B, R, P, P, F*n_orientation)."""
    out = roi_align_rotated(
        feat, rois, out_size, spatial_scale, sampling_ratio, valid
    )  # (B, R, P, P, C)
    return _orientation_shift(out, rois, n_orientation)


def riroi_align_multilevel(
    feats,
    rois,
    lvl,
    strides,
    out_size=7,
    sampling_ratio=2,
    n_orientation=N_ORIENT,
    valid=None,
):
    """Level-routed RiRoIAlign: one flat corner-table gather (see
    roi_align_rotated_multilevel) + the orientation-channel shift."""
    from .roi_align_rotated import roi_align_rotated_multilevel

    out = roi_align_rotated_multilevel(
        feats, rois, lvl, strides, out_size, sampling_ratio, valid
    )
    return _orientation_shift(out, rois, n_orientation)

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
    frac = (t - i0)[..., None, None, None, None]
    base = jnp.arange(n_orientation)

    def shift(k):
        idx = (base[None, None] + k[..., None]).astype(jnp.int32) % n_orientation
        # gather along the orientation axis per (B, R)
        return jnp.take_along_axis(
            x, idx[:, :, None, None, None, :], axis=5
        )

    lo = shift(i0)
    hi = shift(i0 + 1)
    out = (1 - frac) * lo + frac * hi
    return out.reshape(B, R, P, P, C)


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

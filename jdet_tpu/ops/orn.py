"""Oriented Response Networks: Active Rotating Filters + rotation-invariant
pooling/encoding.

TPU-native rebuild of the reference ORN ops (`python/jdet/ops/orn.py`):
the CUDA ARF kernel scatters each weight entry to its rotated positions
via a precomputed LUT (orn.py:17-47, LUT built at orn.py:644-681). Here the
LUT is inverted once in numpy into a static gather permutation, so
`rotate_arf` is a single XLA gather whose autodiff VJP (scatter-add) equals
the reference's ARF backward — no custom gradient needed.

Channel layout matches the reference: expanded weight is
(kh, kw, in*nOrientation, out*nRotation) with rotation fastest in the out
channels, which RotationInvariantPooling's (N, out, nRot) view relies on
(orn.py:595-617).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

# 3x3 spatial rotation index tables (1-based over the 3x3 grid) per 45deg
# step, and the trivial 1x1 table (orn.py:650-668).
_KERNEL_INDICES = {
    1: {a: (1,) for a in (0, 45, 90, 135, 180, 225, 270, 315)},
    3: {
        0: (1, 2, 3, 4, 5, 6, 7, 8, 9),
        45: (2, 3, 6, 1, 5, 9, 4, 7, 8),
        90: (3, 6, 9, 2, 5, 8, 1, 4, 7),
        135: (6, 9, 8, 3, 5, 7, 2, 1, 4),
        180: (9, 8, 7, 6, 5, 4, 3, 2, 1),
        225: (8, 7, 4, 9, 5, 1, 6, 3, 2),
        270: (7, 4, 1, 8, 5, 2, 9, 6, 3),
        315: (4, 1, 2, 7, 5, 3, 8, 9, 6),
    },
}


def arf_gather_indices(n_orientation, n_rotation, kernel_size):
    """Static inverse LUT: src_entry[k_rot, dst_entry] with entries flattened
    as orient*kH*kW + spatial. Built from the reference's forward scatter
    table (orn.py:644-681) by inversion (the map is a permutation)."""
    kh = kw = kernel_size
    n_entry = n_orientation * kh * kw
    delta_orientation = 360 / n_orientation
    delta_rotation = 360 / n_rotation
    src = np.zeros((n_rotation, n_entry), np.int64)
    for i in range(n_orientation):
        for j in range(kh * kw):
            l = i * kh * kw + j
            for k in range(n_rotation):
                angle = int(delta_rotation * k)
                layer = (
                    i + math.floor(angle / delta_orientation)
                ) % n_orientation
                kernel = _KERNEL_INDICES[kw][angle][j]
                dst = layer * kh * kw + (kernel - 1)
                src[k, dst] = l
    return src


def rotate_arf(weight, src_indices):
    """Expand (O, I, nOrient, kh, kw) -> (kh, kw, I*nOrient, O*nRot) HWIO.

    weight entries gathered per rotation; out channel = o * nRot + k,
    in channel = i * nOrient + orient (reference ARF layout,
    orn.py:30-46).
    """
    O, I, nOr, kh, kw = weight.shape
    nRot, n_entry = src_indices.shape
    # gather along the MAJOR axis: entry-major layout turns the expansion
    # into nRot*nEntry (= 576 for C8/3x3) row gathers of (O*I)-wide rows.
    # The minor-axis form flat[:, :, src] gathered every weight ELEMENT
    # as its own transaction — at ReDet's live train-time expansion that
    # was a visible slice of the step (round-5 profile); this form is
    # ~free, and its VJP is an equally cheap 576-row scatter-add.
    ent = weight.reshape(O * I, n_entry).T  # (nEntry, O*I)
    rot = jnp.take(ent, jnp.asarray(src_indices).reshape(-1), axis=0)
    rot = rot.reshape(nRot, nOr, kh, kw, O, I)
    # -> (kh, kw, I, nOr, O, nRot) -> HWIO
    rot = rot.transpose(2, 3, 5, 1, 4, 0)
    return rot.reshape(kh, kw, I * nOr, O * nRot)


class ExpandedWeight(nnx.Variable):
    """Non-Param buffer holding a precomputed weight expansion (ARF /
    steerable). Never touched by optimizers; recomputed from the base
    weight by `models.equivariant.cache_expanded_weights`."""


class ORConv2d(nnx.Module):
    """Oriented-response conv (reference ORConv2d, orn.py:620-698)."""

    def __init__(
        self,
        in_channels,
        out_channels,
        kernel_size=3,
        arf_config=(1, 8),
        stride=1,
        padding=1,
        use_bias=True,
        *,
        rngs: nnx.Rngs,
    ):
        self.n_orientation, self.n_rotation = arf_config
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        # in_channels is the full input channel count (I * nOrient)
        assert in_channels % self.n_orientation == 0
        i_base = in_channels // self.n_orientation
        n = i_base * self.n_orientation * kernel_size * kernel_size
        std = math.sqrt(2.0 / n)
        self.weight = nnx.Param(
            nnx.initializers.normal(std)(
                rngs.params(),
                (out_channels, i_base, self.n_orientation, kernel_size, kernel_size),
            )
        )
        self.bias = (
            nnx.Param(jnp.zeros((out_channels * self.n_rotation,)))
            if use_bias
            else None
        )
        self._src = arf_gather_indices(
            self.n_orientation, self.n_rotation, kernel_size
        )
        # inference-time cache: filled by
        # models.equivariant.cache_expanded_weights so eval jits consume
        # the expanded HWIO weight as a plain input instead of re-running
        # the ARF expansion every forward
        self.wexp = ExpandedWeight(jnp.zeros((0,), jnp.float32))
        self.cache_on = False

    def _expand(self):
        return rotate_arf(self.weight.value, self._src)

    def __call__(self, x):
        w = (self.wexp.value if self.cache_on else self._expand()).astype(
            x.dtype
        )
        out = jax.lax.conv_general_dilated(
            x,
            w,
            (self.stride, self.stride),
            [(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        if self.bias is not None:
            out = out + self.bias.value
        return out


def rotation_invariant_pooling(x, n_orientation=8):
    """Max over the orientation dimension of ARF-expanded channels
    (reference RotationInvariantPooling, orn.py:595-617): channels viewed
    as (out, nRot)."""
    B, H, W, C = x.shape
    return x.reshape(B, H, W, C // n_orientation, n_orientation).max(-1)


def rotation_invariant_encoding(x, n_orientation=8):
    """Align features to their per-sample main direction (reference
    RotationInvariantEncoding, orn.py:557-593): pick argmax-energy
    orientation, circularly shift orientation channels so it comes first.
    x: (B, C) with C = F * nOrientation. Returns (aligned, direction)."""
    B, C = x.shape
    f = C // n_orientation
    xo = x.reshape(B, f, n_orientation)
    energy = jnp.abs(xo).sum(1)
    main = energy.argmax(-1)  # (B,)
    shift = (jnp.arange(n_orientation)[None] + main[:, None]) % n_orientation
    aligned = jnp.take_along_axis(xo, shift[:, None, :], axis=2)
    return aligned.reshape(B, C), main

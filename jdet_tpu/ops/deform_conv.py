"""Deformable convolution v1/v2 — gather-based bilinear im2col + MXU matmul.

TPU-native equivalent of the reference CUDA kernels
(`python/jdet/ops/dcn_v1.py:309-652`, `ops/dcn_v2.py:11-1302`): instead of
hand-written im2col/col2im kernels with atomic-add backward, sampling is
expressed as 4 XLA gathers per kernel tap (bilinear corners) and the
contraction as one (B*H*W, K*K*C) x (K*K*C, Cout) matmul that lands on the
MXU; autodiff of gather produces exactly the scatter-add col2im backward.

Offsets follow the reference channel convention: per kernel tap a (dy, dx)
pair (dcn_v1.py AlignConv stacks [offset_y, offset_x], s2anet_head.py:706).
Out-of-image samples contribute zero (implicit zero padding).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx


def bilinear_sample_nhwc(x, sy, sx):
    """Sample x (B, H, W, C) at float coords sy/sx (B, ...) per batch.

    Returns (B, ..., C); zero outside [0, H-1] x [0, W-1] (matching the
    reference's deformable_im2col border handling).

    Corner-packed: the 2x2 neighborhood of every sample is fetched as ONE
    row of the corner table (`corner_weights_and_rows`) — 4x fewer gather
    rows than per-corner gathers, which is what TPU gather cost tracks.
    """
    from .gather import gather_weighted_rows

    B, H, W, C = x.shape
    pitch = _pitch8(W)
    cw, idx = corner_weights_and_rows(sy, sx, H, W, x.dtype, pitch=pitch)
    T = (H + 1) * pitch
    xqt = _corner_table(x).reshape(B * T, 4 * C)
    boff = jnp.arange(B, dtype=jnp.int32).reshape(
        (B,) + (1,) * (idx.ndim - 1)
    )
    rows = (idx + boff * T).reshape(-1)
    out = gather_weighted_rows(xqt, rows, cw.reshape(-1, 4))
    return out.reshape(*idx.shape, C)


def _pitch8(W):
    """Row pitch of the corner table: W+1 columns rounded up to a multiple
    of 8. With the row count of every (H+1, pitch) table plane a multiple
    of 8, the (B, H+1, pitch, 4C) -> (B*T, 4C) flattens downstream are
    layout-preserving (TPU tiles of 8 sublanes never straddle a plane
    boundary) and XLA lowers them as bitcasts. With the natural W+1 pitch
    (odd for even W) each flatten materialized a physical copy of the
    whole table — 23.5 ms/step of the Oriented R-CNN B=16 profile was one
    such 2.9 GB copy (docs/performance.md round-5 profile)."""
    return (W + 1 + 7) // 8 * 8


def corner_weights_and_rows(sy, sx, H, W, dtype, pitch=None):
    """Bilinear corner weights (..., 4) with border masks folded in, and
    the corner-table row index (...,) for samples sy/sx.

    H/W may be scalars or arrays broadcastable to sy/sx (per-sample
    feature dims — used by the multi-level RoI extractor where each RoI
    lives on its own FPN level). `pitch` is the corner-table row pitch
    (defaults to the unpadded W+1; pass _pitch8(W) when the table is
    built by _corner_table)."""
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = (sy - y0).astype(dtype)
    wx = (sx - x0).astype(dtype)
    valid = ((sy > -1) & (sy < H) & (sx > -1) & (sx < W)).astype(dtype)
    w00 = (1 - wy) * (1 - wx) * valid
    w01 = (1 - wy) * wx * valid
    w10 = wy * (1 - wx) * valid
    w11 = wy * wx * valid
    cw = jnp.stack([w00, w01, w10, w11], -1)
    yq = jnp.clip(y0.astype(jnp.int32) + 1, 0, H)
    xq = jnp.clip(x0.astype(jnp.int32) + 1, 0, W)
    if pitch is None:
        pitch = W + 1
    return cw, yq * pitch + xq


def _corner_table(x):
    """Pack the 2x2 bilinear corner neighborhood into channels.

    Returns xq (B, H+1, _pitch8(W), 4C) over the 1-padded grid: row
    (yq, xq) holds [x[y, x], x[y, x+1], x[y+1, x], x[y+1, x+1]] for the
    unpadded base corner (y, x) = (yq - 1, xq - 1); out-of-image corners
    are zero. Columns beyond W+1 are zero padding for the 8-multiple row
    pitch (see _pitch8) and are never indexed (xq <= W).

    One gathered row then yields all 4 bilinear corners of a sample —
    4x fewer gather rows than per-corner gathers, and TPU gather cost is
    per-row dominated (each row is a contiguous 4C-channel DMA).
    """
    B, H, W, C = x.shape
    pad_r = _pitch8(W) - (W + 1) + 1  # right pad: +1 border, then to pitch
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, pad_r), (0, 0)))
    Wp = xp.shape[2]
    return jnp.concatenate(
        [
            xp[:, : H + 1, : Wp - 1],
            xp[:, : H + 1, 1:],
            xp[:, 1:, : Wp - 1],
            xp[:, 1:, 1:],
        ],
        axis=-1,
    )


def deform_conv2d(
    x,
    offsets,
    weight,
    bias=None,
    stride=1,
    padding=1,
    dilation=1,
    mask=None,
):
    """Deformable conv (v1; v2 when `mask` modulation given).

    Args:
      x: (B, H, W, C) NHWC.
      offsets: (B, Ho, Wo, K*K, 2) (dy, dx) per output pixel per tap.
      weight: (kh, kw, C, Cout) HWIO.
      mask: optional (B, Ho, Wo, K*K) modulation (DCNv2, ops/dcn_v2.py).

    Implementation: corner-packed gather. The 4 bilinear corners of every
    sample live in one row of the corner table (see _corner_table), so the
    im2col step is ONE row gather per (pixel, tap) instead of four, and
    border handling folds into the 4 interpolation weights (no wide
    `where` on (.., K*K, C) tensors). Autodiff of the gather produces the
    reference's atomic-add col2im backward (dcn_v1.py:341-376) as a
    row scatter-add on the corner table.
    """
    B, H, W, C = x.shape
    kh, kw, _, cout = weight.shape
    Ho = (H + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    oy = jnp.arange(Ho) * stride - padding
    ox = jnp.arange(Wo) * stride - padding
    ky = jnp.arange(kh) * dilation
    kx = jnp.arange(kw) * dilation
    # base sampling grid (Ho, Wo, K*K)
    base_y = (oy[:, None, None, None] + ky[None, None, :, None]).reshape(
        Ho, 1, kh, 1
    )
    base_x = (ox[None, :, None, None] + kx[None, None, None, :]).reshape(
        1, Wo, 1, kw
    )
    base_y = jnp.broadcast_to(base_y, (Ho, Wo, kh, kw)).reshape(Ho, Wo, kh * kw)
    base_x = jnp.broadcast_to(base_x, (Ho, Wo, kh, kw)).reshape(Ho, Wo, kh * kw)

    sy = base_y[None] + offsets[..., 0]  # (B, Ho, Wo, kk)
    sx = base_x[None] + offsets[..., 1]

    from .gather import gather_weighted_rows

    pitch = _pitch8(W)
    cw, idx = corner_weights_and_rows(sy, sx, H, W, x.dtype, pitch=pitch)
    # cw (B, Ho, Wo, kk, 4); idx (B, Ho, Wo, kk)
    if mask is not None:
        cw = cw * mask[..., None].astype(cw.dtype)

    T = (H + 1) * pitch
    xqt = _corner_table(x).reshape(B * T, 4 * C)
    rows = (idx + jnp.arange(B, dtype=jnp.int32)[:, None, None, None] * T)
    # fused gather + corner weighting: the (B, S, 4, C) intermediate of
    # the naive form (1.2 GB/step at S2ANet scale) never materializes
    cols = gather_weighted_rows(
        xqt, rows.reshape(-1), cw.reshape(-1, 4)
    ).reshape(B, Ho, Wo, kh * kw * C)
    w2 = weight.reshape(kh * kw * C, cout).astype(cols.dtype)
    out = jax.lax.dot_general(
        cols,
        w2,
        (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias
    return out


class DeformConv(nnx.Module):
    """DCN v1 module (reference `DeformConv`, ops/dcn_v1.py:652): offsets
    come from the caller (AlignConv) or a companion conv."""

    def __init__(
        self,
        in_channels,
        out_channels,
        kernel_size=3,
        stride=1,
        padding=1,
        dilation=1,
        use_bias=False,
        *,
        rngs: nnx.Rngs,
    ):
        k = kernel_size
        init = nnx.initializers.normal(0.01)
        self.weight = nnx.Param(
            init(rngs.params(), (k, k, in_channels, out_channels))
        )
        self.bias = (
            nnx.Param(jnp.zeros((out_channels,))) if use_bias else None
        )
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.kernel_size = k

    def __call__(self, x, offsets):
        return deform_conv2d(
            x,
            offsets,
            self.weight.value,
            None if self.bias is None else self.bias.value,
            self.stride,
            self.padding,
            self.dilation,
        )


class DCNv2(nnx.Module):
    """Modulated deformable conv (reference `DCNv2`/`DCN`,
    ops/dcn_v2.py:1264-1302): a companion conv predicts offsets + mask."""

    def __init__(
        self,
        in_channels,
        out_channels,
        kernel_size=3,
        stride=1,
        padding=1,
        dilation=1,
        *,
        rngs: nnx.Rngs,
    ):
        k = kernel_size
        self.deform = DeformConv(
            in_channels, out_channels, k, stride, padding, dilation,
            use_bias=True, rngs=rngs,
        )
        self.conv_offset = nnx.Conv(
            in_channels,
            3 * k * k,
            (k, k),
            strides=stride,
            padding=[(padding, padding)] * 2,
            kernel_init=nnx.initializers.zeros,
            bias_init=nnx.initializers.zeros,
            rngs=rngs,
        )
        self.k = k

    def __call__(self, x):
        out = self.conv_offset(x)
        k2 = self.k * self.k
        o1, o2, m = jnp.split(out, [k2, 2 * k2], axis=-1)
        offsets = jnp.stack([o1, o2], axis=-1)  # (B, H, W, K*K, 2) (dy, dx)
        mask = jax.nn.sigmoid(m)
        return deform_conv2d(
            x,
            offsets,
            self.deform.weight.value,
            self.deform.bias.value,
            self.deform.stride,
            self.deform.padding,
            self.deform.dilation,
            mask=mask,
        )

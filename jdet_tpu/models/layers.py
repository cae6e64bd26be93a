"""Shared NN building bricks (flax.nnx, NHWC).

TPU-native counterpart of the reference's `ConvModule` and friends
(`python/jdet/models/utils/modules.py`): conv + optional norm + activation.
All convs are NHWC (TPU-preferred layout); weights fp32 with optional bf16
compute dtype.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from . import nn as jnn


def bias_init_with_prob(prior_prob):
    """Focal-loss style classification bias init (reference
    models/utils/weight_init.py)."""
    return float(-math.log((1 - prior_prob) / prior_prob))


def normal_init(std=0.01):
    return nnx.initializers.normal(stddev=std)


class ConvModule(nnx.Module):
    """conv -> norm -> act. norm in {None, 'bn', 'gn'}; act in {None, 'relu'}."""

    def __init__(
        self,
        in_channels,
        out_channels,
        kernel_size,
        *,
        stride=1,
        padding="SAME",
        dilation=1,
        groups=1,
        norm=None,
        num_groups=32,
        act="relu",
        use_bias=None,
        kernel_init=None,
        bias_init=None,
        rngs: nnx.Rngs,
    ):
        if use_bias is None:
            use_bias = norm is None
        kw = {}
        if kernel_init is not None:
            kw["kernel_init"] = kernel_init
        if bias_init is not None:
            kw["bias_init"] = bias_init
        if isinstance(padding, int):
            padding = [(padding, padding), (padding, padding)]
        self.conv = jnn.Conv(
            in_channels,
            out_channels,
            kernel_size if isinstance(kernel_size, (tuple, list)) else (kernel_size, kernel_size),
            strides=stride,
            padding=padding,
            kernel_dilation=dilation,
            feature_group_count=groups,
            use_bias=use_bias,
            rngs=rngs,
            **kw,
        )
        if norm == "bn":
            self.norm = jnn.BatchNorm(out_channels, momentum=0.9, epsilon=1e-5, rngs=rngs)
        elif norm == "gn":
            self.norm = jnn.GroupNorm(out_channels, num_groups=num_groups, rngs=rngs)
        else:
            self.norm = None
        self.act = act

    def __call__(self, x, train: bool = False):
        x = self.conv(x)
        if isinstance(self.norm, nnx.BatchNorm):
            x = self.norm(x, use_running_average=not train)
        elif self.norm is not None:
            x = self.norm(x)
        if self.act == "relu":
            x = jax.nn.relu(x)
        return x


class Scale(nnx.Module):
    """Learnable scalar multiplier (FCOS per-level scale)."""

    def __init__(self, scale=1.0):
        self.scale = nnx.Param(jnp.asarray(float(scale)))

    def __call__(self, x):
        return x * self.scale.value


def max_pool(x, window, stride, padding="SAME"):
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        padding,
    )


def resize_nearest(x, size):
    """Nearest-neighbor resize of NHWC to (H, W) = size (FPN top-down).

    Integer upscales (the FPN/YOLO 2x case) go through broadcast+reshape:
    jax.image.resize lowers nearest as a gather per axis, which on TPU
    pays per-row transaction cost — 15 ms/step of the Oriented R-CNN
    B=16 profile was these top-down upsamples (round-5 profile). The
    broadcast form is a pure layout op XLA fuses into the consumer."""
    B, H, W, C = x.shape
    oh, ow = size
    if oh % H == 0 and ow % W == 0:
        fy, fx = oh // H, ow // W
        if (fy, fx) == (1, 1):
            return x
        x = jnp.broadcast_to(
            x[:, :, None, :, None, :], (B, H, fy, W, fx, C)
        )
        return x.reshape(B, oh, ow, C)
    return jax.image.resize(x, (B, oh, ow, C), method="nearest")


def resize_bilinear(x, size, align_corners=False):
    if align_corners:
        # jax.image.resize 'linear' is half-pixel; align_corners via scale_and_translate
        b, h, w, c = x.shape
        oh, ow = size
        scale = [(oh - 1) / max(h - 1, 1), (ow - 1) / max(w - 1, 1)]
        return jax.image.scale_and_translate(
            x,
            (b, oh, ow, c),
            (1, 2),
            jnp.asarray([scale[0], scale[1]]),
            jnp.asarray([0.0, 0.0]),
            method="linear",
        )
    return jax.image.resize(
        x, (x.shape[0], size[0], size[1], x.shape[3]), method="linear"
    )

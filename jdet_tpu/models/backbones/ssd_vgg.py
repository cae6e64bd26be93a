"""SSD-VGG16 backbone + SSD extra-layer neck + L2Norm.

Capability mirrors of `python/jdet/models/backbones/ssd_vgg.py:20` and
`models/necks/ssd_neck.py:17-110`: VGG16 through conv5 with the fc6/fc7
dilated-conv conversion, outputs at conv4_3 (L2-normalized) and conv7;
the neck's alternating 1x1/3x3-stride-2 extra layers add deeper scales.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from .. import nn as jnn
from ..layers import max_pool
from ...utils.registry import BACKBONES, NECKS

_VGG16 = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))


class L2Norm(nnx.Module):
    """Per-channel L2 normalization with learnable scale (ssd_neck.py:74)."""

    def __init__(self, channels, scale=20.0):
        self.weight = nnx.Param(jnp.full((channels,), float(scale)))

    def __call__(self, x):
        norm = jnp.sqrt((x**2).sum(-1, keepdims=True) + 1e-10)
        return x / norm * self.weight.value


@BACKBONES.register_module()
class SSDVGG(nnx.Module):
    def __init__(self, in_channels=3, *, rngs: nnx.Rngs):
        blocks = []
        ch = in_channels
        for n, c in _VGG16:
            conv_block = []
            for _ in range(n):
                conv_block.append(jnn.Conv(ch, c, (3, 3), rngs=rngs))
                ch = c
            blocks.append(nnx.List(conv_block))
        self.blocks = nnx.List(blocks)
        # fc6/fc7 as dilated convs
        self.fc6 = jnn.Conv(512, 1024, (3, 3), padding=[(6, 6)] * 2,
                            kernel_dilation=6, rngs=rngs)
        self.fc7 = jnn.Conv(1024, 1024, (1, 1), rngs=rngs)
        self.l2norm = L2Norm(512)
        self.out_channels = [512, 1024]

    def __call__(self, x, train=False):
        outs = []
        for i, block in enumerate(self.blocks):
            for conv in block:
                x = jax.nn.relu(conv(x))
            if i == 3:  # conv4_3
                outs.append(self.l2norm(x))
            if i < 4:
                x = max_pool(x, 2, 2, "SAME")
            else:
                x = max_pool(x, 3, 1, "SAME")
        x = jax.nn.relu(self.fc6(x))
        x = jax.nn.relu(self.fc7(x))
        outs.append(x)
        return tuple(outs)


@NECKS.register_module()
class SSDNeck(nnx.Module):
    """Extra feature layers (ssd_neck.py:17): alternating 1x1 reduce +
    3x3 stride-2 expand after conv7."""

    def __init__(self, in_channels=(512, 1024),
                 extra_channels=(512, 256, 256, 256), *, rngs: nnx.Rngs):
        layers = []
        ch = in_channels[-1]
        for i, c in enumerate(extra_channels):
            mid = c // 2
            stride = 2 if i < 2 else 1
            pad = 1 if i < 2 else 0
            layers.append(
                nnx.List([
                    jnn.Conv(ch, mid, (1, 1), rngs=rngs),
                    jnn.Conv(mid, c, (3, 3), strides=stride,
                             padding=[(pad, pad)] * 2 if pad else "VALID",
                             rngs=rngs),
                ])
            )
            ch = c
        self.extra = nnx.List(layers)
        self.out_channels = list(in_channels) + list(extra_channels)

    def __call__(self, inputs, train=False):
        outs = list(inputs)
        x = inputs[-1]
        for pair in self.extra:
            x = jax.nn.relu(pair[0](x))
            x = jax.nn.relu(pair[1](x))
            outs.append(x)
        return tuple(outs)

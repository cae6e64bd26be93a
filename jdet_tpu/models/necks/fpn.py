"""Feature Pyramid Network (flax.nnx, NHWC).

Capability mirror of the reference FPN
(`python/jdet/models/necks/fpn.py:60-201`): lateral 1x1 convs, nearest-
neighbor top-down pathway, 3x3 output convs, and extra levels either via
stride-2 convs on input/lateral/output or max-pool.
"""
from __future__ import annotations

from typing import Sequence

import jax
from flax import nnx

from .. import nn as jnn

from ..layers import max_pool, resize_nearest
from ...utils.registry import NECKS


@NECKS.register_module()
class FPN(nnx.Module):
    def __init__(
        self,
        in_channels: Sequence[int],
        out_channels: int = 256,
        num_outs: int = 5,
        start_level: int = 0,
        end_level: int = -1,
        add_extra_convs=False,
        extra_convs_on_inputs=True,
        relu_before_extra_convs=False,
        *,
        rngs: nnx.Rngs,
    ):
        self.in_channels = list(in_channels)
        self.num_ins = len(in_channels)
        self.num_outs = num_outs
        self.start_level = start_level
        self.end_level = self.num_ins if end_level == -1 else end_level
        self.relu_before_extra_convs = relu_before_extra_convs
        if add_extra_convs is True:
            add_extra_convs = "on_input" if extra_convs_on_inputs else "on_output"
        self.add_extra_convs = add_extra_convs

        self.lateral_convs = nnx.List(
            [
                jnn.Conv(in_channels[i], out_channels, (1, 1), rngs=rngs)
                for i in range(self.start_level, self.end_level)
            ]
        )
        self.fpn_convs = nnx.List(
            [
                jnn.Conv(out_channels, out_channels, (3, 3), rngs=rngs)
                for _ in range(self.start_level, self.end_level)
            ]
        )
        extra_levels = num_outs - (self.end_level - self.start_level)
        extra = []
        if self.add_extra_convs and extra_levels > 0:
            for i in range(extra_levels):
                in_ch = (
                    in_channels[self.end_level - 1]
                    if i == 0 and self.add_extra_convs == "on_input"
                    else out_channels
                )
                extra.append(
                    jnn.Conv(in_ch, out_channels, (3, 3), strides=2, rngs=rngs)
                )
        self.extra_convs = nnx.List(extra)
        self.out_channels = out_channels

    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == self.num_ins
        laterals = [
            conv(inputs[self.start_level + i])
            for i, conv in enumerate(self.lateral_convs)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + resize_nearest(
                laterals[i], laterals[i - 1].shape[1:3]
            )
        outs = [conv(lat) for conv, lat in zip(self.fpn_convs, laterals)]

        if self.num_outs > len(outs):
            if not self.add_extra_convs:
                for _ in range(self.num_outs - len(outs)):
                    outs.append(max_pool(outs[-1], 1, 2, "VALID"))
            else:
                if self.add_extra_convs == "on_input":
                    x = inputs[self.end_level - 1]
                elif self.add_extra_convs == "on_lateral":
                    x = laterals[-1]
                else:
                    x = outs[-1]
                for i, conv in enumerate(self.extra_convs):
                    if i > 0 and self.relu_before_extra_convs:
                        x = jax.nn.relu(x)
                    x = conv(x)
                    outs.append(x)
        return tuple(outs)

"""ReFPN: FPN over C8 regular fields.

Capability mirror of the reference ReFPN (`python/jdet/models/necks/
re_fpn.py:120`): lateral 1x1 + top-down + 3x3 output convs, all C8 group
convolutions so the pyramid stays orientation-equivariant; extra levels
via strided group convs on the last input.
"""
from __future__ import annotations

from typing import Sequence

import jax
from flax import nnx

from ..equivariant.econv import N_ORIENT, REConv2d
from ..layers import max_pool, resize_nearest
from ...utils.registry import NECKS


@NECKS.register_module()
class ReFPN(nnx.Module):
    def __init__(
        self,
        in_channels: Sequence[int],  # total channels (fields * 8)
        out_channels: int = 256,
        num_outs: int = 5,
        start_level: int = 0,
        add_extra_convs="on_input",
        *,
        rngs: nnx.Rngs,
    ):
        assert out_channels % N_ORIENT == 0
        out_f = out_channels // N_ORIENT
        in_fields = [c // N_ORIENT for c in in_channels]
        self.num_ins = len(in_channels)
        self.num_outs = num_outs
        self.start_level = start_level
        self.add_extra_convs = add_extra_convs
        self.lateral_convs = nnx.List(
            [
                REConv2d(in_fields[i], out_f, 1, rngs=rngs)
                for i in range(start_level, self.num_ins)
            ]
        )
        self.fpn_convs = nnx.List(
            [
                REConv2d(out_f, out_f, 3, rngs=rngs)
                for _ in range(start_level, self.num_ins)
            ]
        )
        extra = []
        n_extra = num_outs - (self.num_ins - start_level)
        for i in range(n_extra):
            in_f = in_fields[-1] if (i == 0 and add_extra_convs == "on_input") else out_f
            extra.append(REConv2d(in_f, out_f, 3, stride=2, rngs=rngs))
        self.extra_convs = nnx.List(extra)
        self.out_channels = out_channels

    def __call__(self, inputs, train: bool = False):
        laterals = [
            conv(inputs[self.start_level + i])
            for i, conv in enumerate(self.lateral_convs)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + resize_nearest(
                laterals[i], laterals[i - 1].shape[1:3]
            )
        outs = [conv(lat) for conv, lat in zip(self.fpn_convs, laterals)]
        if self.extra_convs:
            x = inputs[-1] if self.add_extra_convs == "on_input" else outs[-1]
            for i, conv in enumerate(self.extra_convs):
                x = conv(x)
                outs.append(x)
        else:
            while len(outs) < self.num_outs:
                outs.append(max_pool(outs[-1], 1, 2, "VALID"))
        return tuple(outs)

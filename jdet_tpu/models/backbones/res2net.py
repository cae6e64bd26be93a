"""Res2Net backbone — multi-scale Bottle2neck.

Capability mirror of the reference (`python/jdet/models/backbones/
res2net.py:20-250`): the bottleneck's 3x3 stage is split into `scales`
groups processed sequentially with residual accumulation (hierarchical
receptive fields), stype='stage' blocks average-pool the last split.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from .. import nn as jnn

from ..layers import max_pool
from .resnet import Downsample
from ...utils.registry import BACKBONES


class Bottle2neck(nnx.Module):
    expansion = 4

    def __init__(self, in_ch, ch, stride=1, downsample=None, scales=4,
                 base_width=26, *, rngs):
        width = int(ch * base_width / 64.0)
        self.scales = scales
        self.stride = stride
        self.stype = "stage" if downsample is not None else "normal"
        self.conv1 = jnn.Conv(in_ch, width * scales, (1, 1), use_bias=False, rngs=rngs)
        self.bn1 = jnn.BatchNorm(width * scales, momentum=0.9, epsilon=1e-5, rngs=rngs)
        convs, bns = [], []
        for _ in range(scales - 1):
            convs.append(
                jnn.Conv(width, width, (3, 3), strides=stride, use_bias=False, rngs=rngs)
            )
            bns.append(jnn.BatchNorm(width, momentum=0.9, epsilon=1e-5, rngs=rngs))
        self.convs = nnx.List(convs)
        self.bns = nnx.List(bns)
        self.conv3 = jnn.Conv(width * scales, ch * 4, (1, 1), use_bias=False, rngs=rngs)
        self.bn3 = jnn.BatchNorm(ch * 4, momentum=0.9, epsilon=1e-5, rngs=rngs)
        self.downsample = downsample
        self.width = width

    def __call__(self, x, train=False):
        identity = x
        out = jax.nn.relu(self.bn1(self.conv1(x), use_running_average=not train))
        splits = jnp.split(out, self.scales, axis=-1)
        outs = []
        prev = None
        for i in range(self.scales - 1):
            sp = splits[i]
            if i > 0 and self.stype == "normal":
                sp = sp + prev
            sp = jax.nn.relu(
                self.bns[i](self.convs[i](sp), use_running_average=not train)
            )
            prev = sp
            outs.append(sp)
        last = splits[-1]
        if self.stype == "stage" and self.stride != 1:
            last = jax.lax.reduce_window(
                last, 0.0, jax.lax.add,
                (1, self.stride, self.stride, 1),
                (1, self.stride, self.stride, 1), "SAME",
            ) / (self.stride * self.stride)
        outs.append(last)
        out = jnp.concatenate(outs, -1)
        out = self.bn3(self.conv3(out), use_running_average=not train)
        if self.downsample is not None:
            identity = self.downsample(x, train)
        return jax.nn.relu(out + identity)


_ARCH = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


@BACKBONES.register_module()
class Res2Net(nnx.Module):
    def __init__(
        self,
        depth=50,
        scales=4,
        base_width=26,
        in_channels=3,
        return_stages=("layer1", "layer2", "layer3", "layer4"),
        frozen_stages=-1,
        norm_eval=True,
        *,
        rngs: nnx.Rngs,
    ):
        layers = _ARCH[depth]
        self.return_stages = tuple(return_stages)
        self.frozen_stages = frozen_stages
        self.norm_eval = norm_eval
        self.conv1 = jnn.Conv(in_channels, 64, (7, 7), strides=2, use_bias=False, rngs=rngs)
        self.bn1 = jnn.BatchNorm(64, momentum=0.9, epsilon=1e-5, rngs=rngs)
        in_ch = 64
        stages = []
        for i, n in enumerate(layers):
            ch = 64 * 2**i
            stride = 1 if i == 0 else 2
            blocks = []
            for b in range(n):
                s = stride if b == 0 else 1
                ds = None
                if b == 0 and (s != 1 or in_ch != ch * 4):
                    ds = Downsample(in_ch, ch * 4, s, rngs=rngs)
                blocks.append(
                    Bottle2neck(in_ch, ch, s, ds, scales, base_width, rngs=rngs)
                )
                in_ch = ch * 4
            stages.append(nnx.List(blocks))
        self.layer1, self.layer2, self.layer3, self.layer4 = stages
        self.out_channels = [64 * 2**i * 4 for i in range(4)]

    def __call__(self, x, train=False):
        bn_train = train and not self.norm_eval
        x = jax.nn.relu(
            self.bn1(self.conv1(x), use_running_average=not (bn_train and self.frozen_stages < 0))
        )
        x = max_pool(x, 3, 2, "SAME")
        outs = []
        for i, stage in enumerate(
            [self.layer1, self.layer2, self.layer3, self.layer4], start=1
        ):
            stage_train = bn_train and i > self.frozen_stages
            for blk in stage:
                x = blk(x, stage_train)
            if f"layer{i}" in self.return_stages:
                outs.append(x)
        return tuple(outs)

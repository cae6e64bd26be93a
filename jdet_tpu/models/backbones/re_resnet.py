"""ReResNet: rotation-equivariant ResNet over C8 regular fields.

Capability mirror of the reference ReResNet
(`python/jdet/models/backbones/re_resnet.py:7-308`, built from the e2cnn
bricks): a ResNet whose convs are C8 group convolutions, producing
features that carry 8 orientation channels per field. The tensor layout
is (B, H, W, fields*8) with orientation fastest; channel counts match the
reference (e.g. ReResNet50 outputs 256/512/1024/2048 total channels =
32/64/128/256 fields).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ..equivariant.econv import (
    InnerBatchNorm,
    N_ORIENT,
    REConv2d,
    REConv2dLift,
)
from ..layers import max_pool
from ...utils.registry import BACKBONES


class REBottleneck(nnx.Module):
    expansion = 4

    def __init__(self, in_f, f, stride=1, downsample=None, *, rngs):
        self.conv1 = REConv2d(in_f, f, 1, rngs=rngs)
        self.bn1 = InnerBatchNorm(f, rngs=rngs)
        self.conv2 = REConv2d(f, f, 3, stride=stride, rngs=rngs)
        self.bn2 = InnerBatchNorm(f, rngs=rngs)
        self.conv3 = REConv2d(f, f * 4, 1, rngs=rngs)
        self.bn3 = InnerBatchNorm(f * 4, rngs=rngs)
        self.downsample = downsample

    def __call__(self, x, train=False):
        idt = x
        out = jax.nn.relu(self.bn1(self.conv1(x), use_running_average=not train))
        out = jax.nn.relu(self.bn2(self.conv2(out), use_running_average=not train))
        out = self.bn3(self.conv3(out), use_running_average=not train)
        if self.downsample is not None:
            out = out + self.downsample(x, train)
        else:
            out = out + idt
        return jax.nn.relu(out)


class REDownsample(nnx.Module):
    def __init__(self, in_f, out_f, stride, *, rngs):
        self.conv = REConv2d(in_f, out_f, 1, stride=stride, rngs=rngs)
        self.bn = InnerBatchNorm(out_f, rngs=rngs)

    def __call__(self, x, train=False):
        return self.bn(self.conv(x), use_running_average=not train)


_ARCH = {18: (2, 2, 2, 2), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


@BACKBONES.register_module()
class ReResNet(nnx.Module):
    def __init__(
        self,
        depth=50,
        in_channels=3,
        base_fields=8,  # stem fields; 8 fields * 8 orient = 64 channels
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
        self.conv1 = REConv2dLift(in_channels, base_fields, 7, stride=2, rngs=rngs)
        self.bn1 = InnerBatchNorm(base_fields, rngs=rngs)

        in_f = base_fields
        stages = []
        for i, n in enumerate(layers):
            f = base_fields * 2**i
            stride = 1 if i == 0 else 2
            blocks = []
            for b in range(n):
                s = stride if b == 0 else 1
                ds = None
                if b == 0 and (s != 1 or in_f != f * 4):
                    ds = REDownsample(in_f, f * 4, s, rngs=rngs)
                blocks.append(REBottleneck(in_f, f, s, ds, rngs=rngs))
                in_f = f * 4
            stages.append(nnx.List(blocks))
        self.layer1, self.layer2, self.layer3, self.layer4 = stages
        # total channels per stage (fields * 8)
        self.out_channels = [
            base_fields * 2**i * 4 * N_ORIENT for i in range(4)
        ]
        self.out_fields = [base_fields * 2**i * 4 for i in range(4)]

    def __call__(self, x, train=False):
        bn_train = train and not self.norm_eval
        x = jax.nn.relu(
            self.bn1(self.conv1(x),
                     use_running_average=not (bn_train and self.frozen_stages < 0))
        )
        x = max_pool(x, 3, 2, "SAME")
        if train and self.frozen_stages >= 0:
            # same tape cut as ResNet (resnet.py:165-170): without it XLA
            # still synthesizes the full backward — including the 8x ARF
            # weight-expansion grads — through every frozen stage, even
            # though the optimizer masks those params
            x = jax.lax.stop_gradient(x)
        outs = []
        for i, stage in enumerate(
            [self.layer1, self.layer2, self.layer3, self.layer4], start=1
        ):
            st = bn_train and i > self.frozen_stages
            x = self._run_stage(stage, x, st)
            if train and i <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if f"layer{i}" in self.return_stages:
                outs.append(x)
        return tuple(outs)

    @staticmethod
    def _run_stage(stage, x, st):
        """Run one stage. Blocks 1..n-1 are structurally identical
        (stride 1, no downsample), so when batch-norm state is frozen
        (norm_eval — every shipped ReDet config) they run as ONE
        lax.scan body over stacked per-block params instead of n-1
        unrolled copies. This exists for COMPILE time, not run time: the
        ReDet-50 train step carries an 8x ARF weight-expansion subgraph
        per equivariant conv, and unrolling 16 bottlenecks made it a
        ~20-minute XLA compile over the axon tunnel (round-4 bench had
        to budget it out). Scanning dedupes the stage body; identical
        math, identical params/optimizer layout (stacking happens at
        trace time inside the graph)."""
        x = stage[0](x, st)
        rest = list(stage)[1:]
        if st or len(rest) < 2:
            for blk in rest:
                x = blk(x, st)
            return x
        graphdef, state0 = nnx.split(rest[0])
        states = [state0] + [nnx.split(b)[1] for b in rest[1:]]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)

        def body(h, blk_state):
            blk = nnx.merge(graphdef, blk_state)
            return blk(h, False), None

        x, _ = jax.lax.scan(body, x, stacked)
        return x

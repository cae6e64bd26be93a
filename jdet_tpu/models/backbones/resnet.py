"""ResNet / ResNet-v1d backbones (flax.nnx, NHWC, bf16-friendly).

Capability mirror of the reference backbone
(`python/jdet/models/backbones/resnet.py`): torchvision-style ResNet with
`return_stages` selection, `frozen_stages` (params excluded from training +
BN in eval, resnet.py:145-157), `norm_eval`, and the v1d deep-stem variant
(resnet.py:268+). Pretrained weights load from a local torchvision
state_dict via `load_torch_resnet` (the reference streams jittorhub pickles,
resnet.py:192-235; this environment has no egress so loading is file-based).

TPU notes: convs run in NHWC; the stem's 7x7 conv and all blocks map
straight onto the MXU. Freezing is enforced functionally: the optimizer
masks out frozen parameters (see jdet_tpu/optim) and frozen BNs always use
running stats.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from .. import nn as jnn

from ..layers import max_pool
from ...utils.registry import BACKBONES


class BasicBlock(nnx.Module):
    expansion = 1

    def __init__(self, in_ch, ch, stride=1, downsample=None, *, rngs):
        self.conv1 = jnn.Conv(in_ch, ch, (3, 3), strides=stride, use_bias=False, rngs=rngs)
        self.bn1 = jnn.BatchNorm(ch, momentum=0.9, epsilon=1e-5, rngs=rngs)
        self.conv2 = jnn.Conv(ch, ch, (3, 3), use_bias=False, rngs=rngs)
        self.bn2 = jnn.BatchNorm(ch, momentum=0.9, epsilon=1e-5, rngs=rngs)
        self.downsample = downsample

    def __call__(self, x, train=False):
        identity = x
        out = jax.nn.relu(self.bn1(self.conv1(x), use_running_average=not train))
        out = self.bn2(self.conv2(out), use_running_average=not train)
        if self.downsample is not None:
            identity = self.downsample(x, train)
        return jax.nn.relu(out + identity)


class Bottleneck(nnx.Module):
    expansion = 4

    def __init__(self, in_ch, ch, stride=1, downsample=None, *, rngs):
        self.conv1 = jnn.Conv(in_ch, ch, (1, 1), use_bias=False, rngs=rngs)
        self.bn1 = jnn.BatchNorm(ch, momentum=0.9, epsilon=1e-5, rngs=rngs)
        self.conv2 = jnn.Conv(ch, ch, (3, 3), strides=stride, use_bias=False, rngs=rngs)
        self.bn2 = jnn.BatchNorm(ch, momentum=0.9, epsilon=1e-5, rngs=rngs)
        self.conv3 = jnn.Conv(ch, ch * 4, (1, 1), use_bias=False, rngs=rngs)
        self.bn3 = jnn.BatchNorm(ch * 4, momentum=0.9, epsilon=1e-5, rngs=rngs)
        self.downsample = downsample

    def __call__(self, x, train=False):
        identity = x
        out = jax.nn.relu(self.bn1(self.conv1(x), use_running_average=not train))
        out = jax.nn.relu(self.bn2(self.conv2(out), use_running_average=not train))
        out = self.bn3(self.conv3(out), use_running_average=not train)
        if self.downsample is not None:
            identity = self.downsample(x, train)
        return jax.nn.relu(out + identity)


class Downsample(nnx.Module):
    def __init__(self, in_ch, out_ch, stride, avg_pool_first=False, *, rngs):
        # v1d replaces strided 1x1 with avgpool + 1x1 (resnet.py v1d stem)
        self.avg_pool_first = avg_pool_first and stride != 1
        self.stride = stride
        conv_stride = 1 if self.avg_pool_first else stride
        self.conv = jnn.Conv(in_ch, out_ch, (1, 1), strides=conv_stride, use_bias=False, rngs=rngs)
        self.bn = jnn.BatchNorm(out_ch, momentum=0.9, epsilon=1e-5, rngs=rngs)

    def __call__(self, x, train=False):
        if self.avg_pool_first:
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add,
                (1, self.stride, self.stride, 1),
                (1, self.stride, self.stride, 1), "VALID",
            ) / (self.stride * self.stride)
        return self.bn(self.conv(x), use_running_average=not train)


_ARCH = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


@BACKBONES.register_module()
class ResNet(nnx.Module):
    def __init__(
        self,
        depth=50,
        in_channels=3,
        return_stages=("layer1", "layer2", "layer3", "layer4"),
        frozen_stages=-1,
        norm_eval=True,
        deep_stem=False,
        avg_down=False,
        *,
        rngs: nnx.Rngs,
    ):
        block, layers = _ARCH[depth]
        self.depth = depth
        self.return_stages = tuple(return_stages)
        self.frozen_stages = frozen_stages
        self.norm_eval = norm_eval
        self.deep_stem = deep_stem

        if deep_stem:
            self.conv1a = jnn.Conv(in_channels, 32, (3, 3), strides=2, use_bias=False, rngs=rngs)
            self.bn1a = jnn.BatchNorm(32, momentum=0.9, epsilon=1e-5, rngs=rngs)
            self.conv1b = jnn.Conv(32, 32, (3, 3), use_bias=False, rngs=rngs)
            self.bn1b = jnn.BatchNorm(32, momentum=0.9, epsilon=1e-5, rngs=rngs)
            self.conv1c = jnn.Conv(32, 64, (3, 3), use_bias=False, rngs=rngs)
            self.bn1c = jnn.BatchNorm(64, momentum=0.9, epsilon=1e-5, rngs=rngs)
        else:
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
                if b == 0 and (s != 1 or in_ch != ch * block.expansion):
                    ds = Downsample(in_ch, ch * block.expansion, s, avg_pool_first=avg_down, rngs=rngs)
                blocks.append(block(in_ch, ch, s, ds, rngs=rngs))
                in_ch = ch * block.expansion
            stages.append(blocks)
        self.layer1 = nnx.List(stages[0])
        self.layer2 = nnx.List(stages[1])
        self.layer3 = nnx.List(stages[2])
        self.layer4 = nnx.List(stages[3])
        self.out_channels = [64 * 2**i * block.expansion for i in range(4)]

    def _stem(self, x, train):
        if self.deep_stem:
            x = jax.nn.relu(self.bn1a(self.conv1a(x), use_running_average=not train))
            x = jax.nn.relu(self.bn1b(self.conv1b(x), use_running_average=not train))
            x = jax.nn.relu(self.bn1c(self.conv1c(x), use_running_average=not train))
        else:
            x = jax.nn.relu(self.bn1(self.conv1(x), use_running_average=not train))
        return max_pool(x, 3, 2, "SAME")

    def __call__(self, x, train: bool = False):
        # norm_eval: backbone BNs always use running stats (standard for
        # small-batch detection; reference resnet.py:145-157)
        bn_train = train and not self.norm_eval
        x = self._stem(x, bn_train and self.frozen_stages < 0)
        if train and self.frozen_stages >= 0:
            # frozen stages take no gradient (reference stop_grad,
            # resnet.py:145-157). Cutting the tape here also lets XLA drop
            # the whole backward through the stem (~8% of a retina train
            # step was frozen-stem conv/bn/maxpool grads).
            x = jax.lax.stop_gradient(x)
        outs = []
        for i, stage in enumerate(
            [self.layer1, self.layer2, self.layer3, self.layer4], start=1
        ):
            stage_train = bn_train and i > self.frozen_stages
            for blk in stage:
                x = blk(x, stage_train)
            if train and i <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if f"layer{i}" in self.return_stages:
                outs.append(x)
        return tuple(outs)


@BACKBONES.register_module()
class ResNet_v1d(ResNet):
    """Deep-stem + avg-down variant (reference resnet.py:268+)."""

    def __init__(self, **kw):
        kw.setdefault("deep_stem", True)
        kw.setdefault("avg_down", True)
        super().__init__(**kw)


def Resnet18(**kw):
    return ResNet(depth=18, **kw)


def Resnet34(**kw):
    return ResNet(depth=34, **kw)


def Resnet50(**kw):
    return ResNet(depth=50, **kw)


def Resnet101(**kw):
    return ResNet(depth=101, **kw)


def Resnet152(**kw):
    return ResNet(depth=152, **kw)


for _f in (Resnet18, Resnet34, Resnet50, Resnet101, Resnet152):
    BACKBONES.register_module(_f)


def load_torch_resnet(model: ResNet, state_dict):
    """Load a torchvision ResNet state_dict (e.g. torch.load of
    resnet50.pth) into the nnx model. Torch OIHW -> flax HWIO."""
    import numpy as np

    def t2f(w):
        w = np.asarray(w)
        if w.ndim == 4:
            return np.transpose(w, (2, 3, 1, 0))
        return w

    def set_conv(conv, prefix):
        conv.kernel.value = jnp.asarray(t2f(state_dict[prefix + ".weight"]))

    def set_bn(bn, prefix):
        bn.scale.value = jnp.asarray(np.asarray(state_dict[prefix + ".weight"]))
        bn.bias.value = jnp.asarray(np.asarray(state_dict[prefix + ".bias"]))
        bn.mean.value = jnp.asarray(np.asarray(state_dict[prefix + ".running_mean"]))
        bn.var.value = jnp.asarray(np.asarray(state_dict[prefix + ".running_var"]))

    set_conv(model.conv1, "conv1")
    set_bn(model.bn1, "bn1")
    for i, stage in enumerate(
        [model.layer1, model.layer2, model.layer3, model.layer4], start=1
    ):
        for b, blk in enumerate(stage):
            p = f"layer{i}.{b}"
            convs = ["conv1", "conv2", "conv3"] if isinstance(blk, Bottleneck) else ["conv1", "conv2"]
            for c in convs:
                set_conv(getattr(blk, c), f"{p}.{c}")
                set_bn(getattr(blk, c.replace("conv", "bn")), f"{p}.{c.replace('conv', 'bn')}")
            if blk.downsample is not None:
                set_conv(blk.downsample.conv, f"{p}.downsample.0")
                set_bn(blk.downsample.bn, f"{p}.downsample.1")
    return model

"""LSKNet and StripNet backbones (flax.nnx, NHWC).

Capability mirrors of the reference large-kernel attention backbones
(`python/jdet/models/backbones/lsknet.py`, `stripnet.py`):

  - LSKblock (lsknet.py:111-133): 5x5 dw conv + 7x7 dilated-3 dw conv
    produce two spatial contexts; 1x1 compress each to dim/2; a 7x7 conv
    over channel-avg/max statistics gates the two branches; 1x1 expand
    back and multiply onto the input.
  - StripBlock (stripnet.py:99-112): 5x5 dw conv then (k1, k2)/(k2, k1)
    strip dw convs and a 1x1, multiplied onto the input.
  - Both wrap the attention in proj_1/GELU/.../proj_2 with residual, in a
    transformer-ish Block with BatchNorm, layer-scale and DropPath, over
    OverlapPatchEmbed stages (lsknet.py:196-300, stripnet.py:150-240).

Variants: LSKNet-T (dims 32-64-160-256, depths 3-3-5-2) and -S
(64-128-320-512, 2-2-4-2); StripNet-S matches LSKNet-S shapes with
strip kernels (1, 19).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import nnx

from .. import nn as jnn

from ...utils.registry import BACKBONES


def _dwconv(dim, k, rngs, dilation=1, padding=None):
    if padding is None:
        padding = k // 2 if isinstance(k, int) else (k[0] // 2, k[1] // 2)
    if isinstance(k, int):
        k = (k, k)
    if isinstance(padding, int):
        padding = (padding, padding)
    return jnn.Conv(
        dim, dim, k,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        kernel_dilation=dilation, feature_group_count=dim, rngs=rngs,
    )


class DropPath(nnx.Module):
    """Stochastic depth; deterministic (identity) in eval mode."""

    def __init__(self, rate):
        self.rate = rate

    def __call__(self, x, train=False, key=None):
        if not train or self.rate == 0.0 or key is None:
            return x
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(key, keep, (x.shape[0], 1, 1, 1))
        return x * mask / keep


class Mlp(nnx.Module):
    def __init__(self, dim, hidden, *, rngs):
        self.fc1 = jnn.Conv(dim, hidden, (1, 1), rngs=rngs)
        self.dwconv = _dwconv(hidden, 3, rngs)
        self.fc2 = jnn.Conv(hidden, dim, (1, 1), rngs=rngs)

    def __call__(self, x):
        x = jax.nn.gelu(self.dwconv(self.fc1(x)))
        return self.fc2(x)


class LSKblock(nnx.Module):
    def __init__(self, dim, *, rngs):
        self.conv0 = _dwconv(dim, 5, rngs)
        self.conv_spatial = _dwconv(dim, 7, rngs, dilation=3, padding=9)
        self.conv1 = jnn.Conv(dim, dim // 2, (1, 1), rngs=rngs)
        self.conv2 = jnn.Conv(dim, dim // 2, (1, 1), rngs=rngs)
        self.conv_squeeze = jnn.Conv(2, 2, (7, 7), rngs=rngs)
        self.conv = jnn.Conv(dim // 2, dim, (1, 1), rngs=rngs)

    def __call__(self, x):
        attn1 = self.conv0(x)
        attn2 = self.conv_spatial(attn1)
        attn1 = self.conv1(attn1)
        attn2 = self.conv2(attn2)
        attn = jnp.concatenate([attn1, attn2], -1)
        avg_attn = attn.mean(-1, keepdims=True)
        max_attn = attn.max(-1, keepdims=True)
        agg = jnp.concatenate([avg_attn, max_attn], -1)
        sig = jax.nn.sigmoid(self.conv_squeeze(agg))
        attn = attn1 * sig[..., 0:1] + attn2 * sig[..., 1:2]
        return x * self.conv(attn)


class StripBlock(nnx.Module):
    def __init__(self, dim, k1, k2, *, rngs):
        self.conv0 = _dwconv(dim, 5, rngs)
        self.conv_spatial1 = _dwconv(dim, (k1, k2), rngs)
        self.conv_spatial2 = _dwconv(dim, (k2, k1), rngs)
        self.conv1 = jnn.Conv(dim, dim, (1, 1), rngs=rngs)

    def __call__(self, x):
        attn = self.conv0(x)
        attn = self.conv_spatial1(attn)
        attn = self.conv_spatial2(attn)
        attn = self.conv1(attn)
        return x * attn


class SpatialAttention(nnx.Module):
    def __init__(self, dim, gating, *, rngs):
        self.proj_1 = jnn.Conv(dim, dim, (1, 1), rngs=rngs)
        self.gate = gating
        self.proj_2 = jnn.Conv(dim, dim, (1, 1), rngs=rngs)

    def __call__(self, x):
        shortcut = x
        x = jax.nn.gelu(self.proj_1(x))
        x = self.gate(x)
        return self.proj_2(x) + shortcut


class Block(nnx.Module):
    def __init__(self, dim, mlp_ratio, drop_path, gating, *, rngs):
        self.norm1 = jnn.BatchNorm(dim, momentum=0.9, epsilon=1e-5, rngs=rngs)
        self.norm2 = jnn.BatchNorm(dim, momentum=0.9, epsilon=1e-5, rngs=rngs)
        self.attn = SpatialAttention(dim, gating, rngs=rngs)
        self.mlp = Mlp(dim, int(dim * mlp_ratio), rngs=rngs)
        self.drop_path = DropPath(drop_path)
        self.ls1 = nnx.Param(jnp.full((dim,), 1e-2))
        self.ls2 = nnx.Param(jnp.full((dim,), 1e-2))

    def __call__(self, x, train=False):
        bn = lambda n, v: n(v, use_running_average=not train)
        x = x + self.drop_path(
            self.ls1.value * self.attn(bn(self.norm1, x)), train
        )
        x = x + self.drop_path(
            self.ls2.value * self.mlp(bn(self.norm2, x)), train
        )
        return x


class OverlapPatchEmbed(nnx.Module):
    def __init__(self, in_ch, dim, patch_size=7, stride=4, *, rngs):
        p = patch_size // 2
        self.proj = jnn.Conv(
            in_ch, dim, (patch_size, patch_size), strides=stride,
            padding=[(p, p), (p, p)], rngs=rngs,
        )
        self.norm = jnn.BatchNorm(dim, momentum=0.9, epsilon=1e-5, rngs=rngs)

    def __call__(self, x, train=False):
        return self.norm(self.proj(x), use_running_average=not train)


class _LargeKernelNet(nnx.Module):
    def __init__(
        self,
        embed_dims,
        depths,
        mlp_ratios=(8, 8, 4, 4),
        drop_path_rate=0.1,
        out_indices=(0, 1, 2, 3),
        in_channels=3,
        strip_kernels=None,  # None -> LSK gating; (k1, k2) -> strip gating
        norm_eval=True,
        *,
        rngs: nnx.Rngs,
    ):
        self.out_indices = tuple(out_indices)
        self.norm_eval = norm_eval
        dpr = [
            float(x) for x in jnp.linspace(0, drop_path_rate, sum(depths))
        ]
        cur = 0
        self.patch_embeds = nnx.List([])
        self.stages = nnx.List([])
        self.stage_norms = nnx.List([])
        for i, (dim, depth) in enumerate(zip(embed_dims, depths)):
            self.patch_embeds.append(
                OverlapPatchEmbed(
                    in_channels if i == 0 else embed_dims[i - 1],
                    dim,
                    patch_size=7 if i == 0 else 3,
                    stride=4 if i == 0 else 2,
                    rngs=rngs,
                )
            )
            blocks = []
            for j in range(depth):
                if strip_kernels is None:
                    gating = LSKblock(dim, rngs=rngs)
                else:
                    gating = StripBlock(dim, *strip_kernels, rngs=rngs)
                blocks.append(
                    Block(dim, mlp_ratios[i], dpr[cur + j], gating, rngs=rngs)
                )
            cur += depth
            self.stages.append(nnx.List(blocks))
            self.stage_norms.append(jnn.LayerNorm(dim, rngs=rngs))
        self.out_channels = [embed_dims[i] for i in self.out_indices]

    def __call__(self, x, train=False):
        bn_train = train and not self.norm_eval
        outs = []
        for i, (embed, blocks, norm) in enumerate(
            zip(self.patch_embeds, self.stages, self.stage_norms)
        ):
            x = embed(x, bn_train)
            for blk in blocks:
                x = blk(x, bn_train)
            x = norm(x)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


@BACKBONES.register_module()
class LSKNet(_LargeKernelNet):
    def __init__(self, arch="s", **kw):
        cfgs = {
            "t": dict(embed_dims=(32, 64, 160, 256), depths=(3, 3, 5, 2)),
            "s": dict(embed_dims=(64, 128, 320, 512), depths=(2, 2, 4, 2)),
        }
        cfg = cfgs[arch]
        cfg.update(kw)
        super().__init__(strip_kernels=None, **cfg)


@BACKBONES.register_module()
class StripNet(_LargeKernelNet):
    def __init__(self, arch="s", k1=1, k2=19, **kw):
        cfgs = {
            "s": dict(embed_dims=(64, 128, 320, 512), depths=(2, 2, 4, 2)),
        }
        cfg = cfgs[arch]
        cfg.update(kw)
        super().__init__(strip_kernels=(k1, k2), **cfg)

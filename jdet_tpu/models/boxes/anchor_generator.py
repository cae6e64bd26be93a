"""Anchor generation for rotated detectors — iota-built on device, fixed shapes.

Feature-map sizes are static under jit, so anchor grids are compile-time
constants *semantically* — but materializing them as numpy constants bloats
the serialized HLO (an ORCNN train graph carried ~16 MB of anchor tables,
dominating trace/upload/compile time over the device tunnel). Instead,
`grid_anchors` builds the grid inside the trace from two `iota`s plus the
tiny (A, 5) base-anchor constant; XLA folds or streams it as it sees fit
while the program text stays small.

Semantics mirror the reference generators
(`python/jdet/models/boxes/anchor_generator.py`):
  - AnchorGeneratorRotatedRetinaNet (:8): base_size x scales x ratios with
    optional octave scales; anchors are (cx, cy, w, h, theta) with centers at
    0.5*(stride-1)-aligned grid points, theta from `angles` (default [0]).
  - AnchorGeneratorRotatedS2ANet (:113): single anchor per location,
    (cx, cy, stride*scale, stride*scale, 0) form.
"""
from __future__ import annotations

import functools
import math

import numpy as np


class AnchorGeneratorRotated:
    """Rotated anchors: base_size scaled by `scales` x `ratios` x `angles`.

    Mirrors AnchorGeneratorRotatedRetinaNet (anchor_generator.py:8-112):
    w = base*scale/sqrt(ratio), h = base*scale*sqrt(ratio); center at
    0.5*(base-1).
    """

    def __init__(
        self,
        base_size,
        scales=None,
        ratios=(1.0,),
        angles=(0.0,),
        octave_base_scale=None,
        scales_per_octave=None,
        ctr=None,
        mode="retina",
    ):
        self.base_size = base_size
        self.ratios = np.asarray(ratios, np.float32)
        self.angles = np.asarray(angles, np.float32)
        self.ctr = ctr
        self.mode = mode
        if scales is not None:
            self.scales = np.asarray(scales, np.float32)
        elif octave_base_scale is not None and scales_per_octave is not None:
            self.scales = np.asarray(
                [
                    octave_base_scale * 2 ** (i / scales_per_octave)
                    for i in range(scales_per_octave)
                ],
                np.float32,
            )
        else:
            raise ValueError("need scales or octave scales")
        self.base_anchors = self._gen_base_anchors()

    @property
    def num_base_anchors(self):
        return self.base_anchors.shape[0]

    def _gen_base_anchors(self):
        w = h = float(self.base_size)
        if self.ctr is None:
            x_ctr = 0.5 * (w - 1)
            y_ctr = 0.5 * (h - 1)
        else:
            x_ctr, y_ctr = self.ctr
        h_ratios = np.sqrt(self.ratios)
        w_ratios = 1.0 / h_ratios
        ws = (
            w
            * w_ratios[:, None, None]
            * self.scales[None, :, None]
            * np.ones_like(self.angles)[None, None, :]
        ).reshape(-1)
        hs = (
            h
            * h_ratios[:, None, None]
            * self.scales[None, :, None]
            * np.ones_like(self.angles)[None, None, :]
        ).reshape(-1)
        angles = np.tile(self.angles, len(self.scales) * len(self.ratios))
        out = np.stack(
            [
                np.full_like(ws, x_ctr),
                np.full_like(ws, y_ctr),
                ws,
                hs,
                angles,
            ],
            axis=-1,
        ).astype(np.float32)
        return out

    def grid_anchors(self, featmap_size, stride):
        """(H*W*A, 5) jnp anchors for a feature map, built from iotas.

        Not cached: under jit the result is a tracer bound to the active
        trace (caching would leak it); the handful of jnp ops re-trace for
        free. Use `grid_anchors_np` for an eager numpy table.
        """
        import jax.numpy as jnp

        feat_h, feat_w = featmap_size
        sx = jnp.arange(feat_w, dtype=jnp.float32) * stride
        sy = jnp.arange(feat_h, dtype=jnp.float32) * stride
        zeros = jnp.zeros((feat_h, feat_w), jnp.float32)
        shifts = jnp.stack(
            [
                jnp.broadcast_to(sx[None, :], (feat_h, feat_w)),
                jnp.broadcast_to(sy[:, None], (feat_h, feat_w)),
                zeros,
                zeros,
                zeros,
            ],
            axis=-1,
        ).reshape(-1, 1, 5)
        base = jnp.asarray(self.base_anchors)  # (A, 5) tiny constant
        return (shifts + base[None]).reshape(-1, 5)

    @functools.lru_cache(maxsize=64)
    def grid_anchors_np(self, featmap_size, stride):
        """Eager numpy variant of `grid_anchors` (host-side consumers)."""
        feat_h, feat_w = featmap_size
        shift_x = np.arange(feat_w, dtype=np.float32) * stride
        shift_y = np.arange(feat_h, dtype=np.float32) * stride
        sx, sy = np.meshgrid(shift_x, shift_y)
        shifts = np.stack(
            [sx.ravel(), sy.ravel(), *([np.zeros(sx.size, np.float32)] * 3)],
            axis=-1,
        )
        all_anchors = (
            self.base_anchors[None, :, :] + shifts[:, None, :]
        ).reshape(-1, 5)
        return all_anchors.astype(np.float32)

    @functools.lru_cache(maxsize=64)
    def valid_flags(self, featmap_size, valid_size):
        feat_h, feat_w = featmap_size
        valid_h, valid_w = valid_size
        vx = np.zeros(feat_w, bool)
        vy = np.zeros(feat_h, bool)
        vx[:valid_w] = True
        vy[:valid_h] = True
        grid = vx[None, :] & vy[:, None]
        return np.repeat(grid.ravel(), self.num_base_anchors)


class AnchorGeneratorYangXue(AnchorGeneratorRotated):
    """YangXue-convention anchors (reference AnchorGeneratorYangXue,
    anchor_generator.py:756-798): widths are first quantized on a small
    `yx_base_size` grid (round(w_ratio * yx_base_size)), heights derived
    as round(ws * ratio), then both rescaled to the true base size — the
    w/h rounding quirk of the yangxue/rotation-detection repo that the
    legacy RetinaNet project's pretrained weights expect. Centers sit at
    center_offset * (yx_base_size - 1).

    Emits (cx, cy, w, h, theta) like the rest of this framework (the
    reference emits xyxy[+theta]; geometry is identical).
    """

    def __init__(self, base_size, yx_base_size=4.0, center_offset=0.5, **kw):
        self.yx_base_size = float(yx_base_size)
        self.center_offset = center_offset
        super().__init__(base_size, **kw)

    def _gen_base_anchors(self):
        base = float(self.base_size)
        yx = self.yx_base_size
        x_ctr = self.center_offset * (yx - 1)
        y_ctr = self.center_offset * (yx - 1)
        h_ratios = np.sqrt(self.ratios)
        w_ratios = 1.0 / h_ratios
        ws0 = np.round(w_ratios * yx)  # quantized on the yx grid
        hs0 = np.round(ws0 * self.ratios)
        scale = base / yx
        ws = (
            ws0[:, None, None] * scale * self.scales[None, :, None]
            * np.ones_like(self.angles)[None, None, :]
        ).reshape(-1)
        hs = (
            hs0[:, None, None] * scale * self.scales[None, :, None]
            * np.ones_like(self.angles)[None, None, :]
        ).reshape(-1)
        angles = np.tile(self.angles, len(self.scales) * len(self.ratios))
        return np.stack(
            [
                np.full_like(ws, x_ctr),
                np.full_like(ws, y_ctr),
                ws,
                hs,
                angles,
            ],
            axis=-1,
        ).astype(np.float32)


class AnchorGeneratorRotatedS2ANet(AnchorGeneratorRotated):
    """One square zero-angle anchor per location (S2ANet FAM init anchors).

    Mirrors AnchorGeneratorRotatedS2ANet (anchor_generator.py:113-198).
    """

    def __init__(self, base_size, scales, ratios=(1.0,), **kw):
        super().__init__(base_size, scales=scales, ratios=ratios, **kw)

    def _gen_base_anchors(self):
        w = h = float(self.base_size)
        x_ctr = 0.5 * (w - 1)
        y_ctr = 0.5 * (h - 1)
        h_ratios = np.sqrt(self.ratios)
        w_ratios = 1.0 / h_ratios
        ws = (w * self.scales[:, None] * w_ratios[None, :]).reshape(-1)
        hs = (h * self.scales[:, None] * h_ratios[None, :]).reshape(-1)
        return np.stack(
            [
                np.full_like(ws, x_ctr),
                np.full_like(ws, y_ctr),
                ws,
                hs,
                np.zeros_like(ws),
            ],
            axis=-1,
        ).astype(np.float32)


class AnchorGeneratorHBB:
    """mmdet-style horizontal anchors (x1, y1, x2, y2) for RPN/SSD paths.

    Mirrors `AnchorGenerator` (anchor_generator.py:199-599).
    """

    def __init__(
        self,
        strides,
        ratios,
        scales=None,
        base_sizes=None,
        octave_base_scale=None,
        scales_per_octave=None,
        centers=None,
        center_offset=0.0,
    ):
        self.strides = [s if isinstance(s, tuple) else (s, s) for s in strides]
        self.base_sizes = (
            [min(s) for s in self.strides] if base_sizes is None else base_sizes
        )
        if scales is not None:
            self.scales = np.asarray(scales, np.float32)
        else:
            octave_scales = np.array(
                [2 ** (i / scales_per_octave) for i in range(scales_per_octave)]
            )
            self.scales = (octave_scales * octave_base_scale).astype(np.float32)
        self.ratios = np.asarray(ratios, np.float32)
        self.centers = centers
        self.center_offset = center_offset
        self.base_anchors = [
            self._single_base(bs, i) for i, bs in enumerate(self.base_sizes)
        ]

    @property
    def num_base_anchors(self):
        return self.base_anchors[0].shape[0]

    def _single_base(self, base_size, level):
        w = h = float(base_size)
        if self.centers is None:
            x_ctr = self.center_offset * w
            y_ctr = self.center_offset * h
        else:
            x_ctr, y_ctr = self.centers[level]
        h_ratios = np.sqrt(self.ratios)
        w_ratios = 1 / h_ratios
        ws = (w * w_ratios[:, None] * self.scales[None, :]).reshape(-1)
        hs = (h * h_ratios[:, None] * self.scales[None, :]).reshape(-1)
        return np.stack(
            [
                x_ctr - 0.5 * ws,
                y_ctr - 0.5 * hs,
                x_ctr + 0.5 * ws,
                y_ctr + 0.5 * hs,
            ],
            axis=-1,
        ).astype(np.float32)

    def grid_anchors(self, featmap_size, level):
        """(H*W*A, 4) jnp xyxy anchors, iota-built (see rotated variant)."""
        import jax.numpy as jnp

        feat_h, feat_w = featmap_size
        sw, sh = self.strides[level]
        sx = jnp.arange(feat_w, dtype=jnp.float32) * sw
        sy = jnp.arange(feat_h, dtype=jnp.float32) * sh
        sxg = jnp.broadcast_to(sx[None, :], (feat_h, feat_w))
        syg = jnp.broadcast_to(sy[:, None], (feat_h, feat_w))
        shifts = jnp.stack([sxg, syg, sxg, syg], axis=-1).reshape(-1, 1, 4)
        base = jnp.asarray(self.base_anchors[level])
        return (shifts + base[None]).reshape(-1, 4)

    @functools.lru_cache(maxsize=64)
    def grid_anchors_np(self, featmap_size, level):
        """Eager numpy variant of `grid_anchors` (host-side consumers)."""
        feat_h, feat_w = featmap_size
        sw, sh = self.strides[level]
        shift_x = np.arange(feat_w, dtype=np.float32) * sw
        shift_y = np.arange(feat_h, dtype=np.float32) * sh
        sx, sy = np.meshgrid(shift_x, shift_y)
        shifts = np.stack(
            [sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=-1
        )
        return (
            self.base_anchors[level][None, :, :] + shifts[:, None, :]
        ).reshape(-1, 4).astype(np.float32)


def multi_level_grid_anchors(generators, featmap_sizes, strides):
    """Concatenate per-level rotated anchors -> (sum_l Hl*Wl*A, 5) jnp."""
    import jax.numpy as jnp

    outs = [
        gen.grid_anchors(tuple(fs), stride)
        for gen, fs, stride in zip(generators, featmap_sizes, strides)
    ]
    return jnp.concatenate(outs, axis=0)

"""Anchor generation for rotated detectors — trace-time numpy, fixed shapes.

Feature-map sizes are static under jit, so anchor grids are pure constants:
we generate them with numpy at trace time and let XLA fold them into the
compiled graph (no device-side meshgrid work per step).

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

    @functools.lru_cache(maxsize=64)
    def grid_anchors(self, featmap_size, stride):
        """(H*W*A, 5) anchors for a feature map; cached per (size, stride)."""
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

    @functools.lru_cache(maxsize=64)
    def grid_anchors(self, featmap_size, level):
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
    """Concatenate per-level rotated anchors -> (sum_l Hl*Wl*A, 5) numpy."""
    outs = [
        gen.grid_anchors(tuple(fs), stride)
        for gen, fs, stride in zip(generators, featmap_sizes, strides)
    ]
    return np.concatenate(outs, axis=0)

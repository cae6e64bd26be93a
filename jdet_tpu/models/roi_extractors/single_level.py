"""Multi-level RoI feature extraction with FPN level routing.

Capability mirror of the reference extractors
(`python/jdet/models/roi_extractors/single_level.py:8`,
`oriented_single_level.py:22-114`): each RoI is routed to the FPN level
`clamp(floor(log2(sqrt(w*h) / finest_scale)), 0, L-1)` and RoIAligned
there; rotated variants optionally enlarge w/h by `extend_factor`.

TPU fixed-shape redesign: per-level corner tables are concatenated and
each RoI's samples gather from ITS level's rows in one flat gather
(ops/roi_align_rotated.roi_align_rotated_multilevel) — exactly-one-level
cost with static shapes (the earlier align-on-every-level-and-mask
design paid 4x the gather volume; it dominated two-stage step time).
Empty levels need no special-casing (the reference's gradient-keeping
trick, oriented_single_level.py:112): gradients flow through whichever
rows were touched.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.roi_align_rotated import (
    roi_align,
    roi_align_rotated,
    roi_align_rotated_multilevel,
)
from ...utils.registry import ROI_EXTRACTORS


def _map_levels(scale, num_levels, finest_scale=56):
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    return jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)


@ROI_EXTRACTORS.register_module()
class SingleRoIExtractor:
    """Horizontal rois (B, R, 4)."""

    def __init__(
        self,
        out_size=7,
        sampling_ratio=2,
        featmap_strides=(4, 8, 16, 32),
        finest_scale=56,
    ):
        self.out_size = out_size
        self.sampling_ratio = sampling_ratio
        self.featmap_strides = tuple(featmap_strides)
        self.finest_scale = finest_scale

    @property
    def num_inputs(self):
        return len(self.featmap_strides)

    def __call__(self, feats, rois, valid=None):
        num_levels = len(self.featmap_strides)
        w = rois[..., 2] - rois[..., 0]
        h = rois[..., 3] - rois[..., 1]
        lvl = _map_levels(jnp.sqrt(jnp.maximum(w * h, 1e-6)), num_levels,
                          self.finest_scale)
        cx = (rois[..., 0] + rois[..., 2]) * 0.5
        cy = (rois[..., 1] + rois[..., 3]) * 0.5
        rrois = jnp.stack([cx, cy, w, h, jnp.zeros_like(w)], -1)
        return roi_align_rotated_multilevel(
            feats[:num_levels], rrois, lvl, self.featmap_strides,
            self.out_size, self.sampling_ratio, valid,
        )


@ROI_EXTRACTORS.register_module()
class OrientedSingleRoIExtractor:
    """Rotated rois (B, R, 5) with optional w/h enlargement
    (oriented_single_level.py:22-114)."""

    def __init__(
        self,
        out_size=7,
        sampling_ratio=2,
        featmap_strides=(4, 8, 16, 32),
        finest_scale=56,
        extend_factor=(1.0, 1.0),
    ):
        self.out_size = out_size
        self.sampling_ratio = sampling_ratio
        self.featmap_strides = tuple(featmap_strides)
        self.finest_scale = finest_scale
        self.extend_factor = tuple(extend_factor)

    @property
    def num_inputs(self):
        return len(self.featmap_strides)

    def __call__(self, feats, rois, valid=None):
        num_levels = len(self.featmap_strides)
        ew, eh = self.extend_factor
        rois = jnp.concatenate(
            [
                rois[..., :2],
                rois[..., 2:3] * ew,
                rois[..., 3:4] * eh,
                rois[..., 4:5],
            ],
            -1,
        )
        scale = jnp.sqrt(jnp.maximum(rois[..., 2] * rois[..., 3], 1e-6))
        lvl = _map_levels(scale, num_levels, self.finest_scale)
        return roi_align_rotated_multilevel(
            feats[:num_levels], rois, lvl, self.featmap_strides,
            self.out_size, self.sampling_ratio, valid,
        )

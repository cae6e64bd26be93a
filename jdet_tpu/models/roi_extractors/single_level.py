"""Multi-level RoI feature extraction with FPN level routing.

Capability mirror of the reference extractors
(`python/jdet/models/roi_extractors/single_level.py:8`,
`oriented_single_level.py:22-114`): each RoI is routed to the FPN level
`clamp(floor(log2(sqrt(w*h) / finest_scale)), 0, L-1)` and RoIAligned
there; rotated variants optionally enlarge w/h by `extend_factor`.

TPU fixed-shape redesign: instead of gathering per-level RoI subsets
(dynamic), every RoI is aligned on every level and the result combined
with a one-hot level mask — branch-free, and the (small) extra compute
lands on gather/VPU units that are idle anyway. This also preserves the
reference's gradient-keeping trick for empty levels
(oriented_single_level.py:112) by construction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.roi_align_rotated import roi_align, roi_align_rotated
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
        out = 0.0
        for i in range(num_levels):
            sel = (lvl == i).astype(feats[i].dtype)
            if valid is not None:
                sel = sel * valid.astype(feats[i].dtype)
            aligned = roi_align(
                feats[i],
                rois,
                self.out_size,
                1.0 / self.featmap_strides[i],
                self.sampling_ratio,
            )
            out = out + aligned * sel[..., None, None, None]
        return out


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
        out = 0.0
        for i in range(num_levels):
            sel = (lvl == i).astype(feats[i].dtype)
            if valid is not None:
                sel = sel * valid.astype(feats[i].dtype)
            aligned = roi_align_rotated(
                feats[i],
                rois,
                self.out_size,
                1.0 / self.featmap_strides[i],
                self.sampling_ratio,
            )
            out = out + aligned * sel[..., None, None, None]
        return out

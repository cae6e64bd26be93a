"""Position-sensitive RoIAlign, RoI max-pool, and the R3Det feature
refinement sampler.

Mirrors: PSRoIAlign (`python/jdet/ops/psroi_align.py:265-310`),
ROIPool (`ops/roi_pool.py:141-165`), FeatureRefineModule
(`ops/fr.py:234-385`). All gather-based with autodiff backward.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from .deform_conv import bilinear_sample_nhwc
from .roi_align_rotated import roi_align_rotated


def psroi_align(feat, rois, out_size=7, spatial_scale=1.0, sampling_ratio=2,
                valid=None):
    """Position-sensitive RoIAlign: feat channels = C_out * P * P; bin
    (i, j) reads channel group (i*P + j) (psroi_align.py:265-310).

    rois: (B, R, 4) x1y1x2y2. Returns (B, R, P, P, C_out).
    """
    B, H, W, C = feat.shape
    P = out_size
    c_out = C // (P * P)
    aligned = roi_align_rotated(
        feat,
        jnp.concatenate(
            [
                (rois[..., 0:2] + rois[..., 2:4]) / 2,
                rois[..., 2:4] - rois[..., 0:2],
                jnp.zeros_like(rois[..., :1]),
            ],
            -1,
        ),
        P,
        spatial_scale,
        sampling_ratio,
        valid,
    )  # (B, R, P, P, C)
    x = aligned.reshape(B, -1, P, P, c_out, P * P)
    bin_idx = (
        jnp.arange(P)[:, None] * P + jnp.arange(P)[None, :]
    ).reshape(1, 1, P, P, 1, 1)
    return jnp.take_along_axis(x, bin_idx, axis=-1)[..., 0]


def roi_pool(feat, rois, out_size=7, spatial_scale=1.0, valid=None):
    """Max-pool RoI pooling via a dense sampling grid + max
    (roi_pool.py:141-165). rois (B, R, 4)."""
    g = 4  # samples per bin side
    cx = (rois[..., 0] + rois[..., 2]) / 2
    cy = (rois[..., 1] + rois[..., 3]) / 2
    w = rois[..., 2] - rois[..., 0]
    h = rois[..., 3] - rois[..., 1]
    rrois = jnp.stack([cx, cy, w, h, jnp.zeros_like(w)], -1)
    # sample a (P*g, P*g) grid then max-pool gxg windows
    dense = roi_align_rotated(
        feat, rrois, out_size * g, spatial_scale, 1, valid
    )  # (B, R, P*g, P*g, C)
    B, R, S, _, C = dense.shape
    x = dense.reshape(B, R, out_size, g, out_size, g, C)
    return x.max(axis=(3, 5))


class FeatureRefineModule(nnx.Module):
    """R3Det feature refinement (ops/fr.py:255-385): bilinear-sample the
    feature map at refined-box centers (+4 edge midpoints when points=5)
    and add as a residual, after 1x5 + 5x1 and 1x1 conv branches."""

    def __init__(self, in_channels, featmap_strides=(8, 16, 32, 64, 128),
                 points=1, *, rngs):
        from ..models import nn as jnn

        self.points = points
        self.featmap_strides = tuple(featmap_strides)
        self.conv_5_1 = jnn.Conv(
            in_channels, in_channels, (5, 1), padding=[(2, 2), (0, 0)], rngs=rngs
        )
        self.conv_1_5 = jnn.Conv(
            in_channels, in_channels, (1, 5), padding=[(0, 0), (2, 2)], rngs=rngs
        )
        self.conv_1_1 = jnn.Conv(in_channels, in_channels, (1, 1), rngs=rngs)

    def refine_single(self, x, boxes, stride):
        """x (B, H, W, C); boxes (B, H, W, 5) refined boxes in image coords."""
        feat = self.conv_1_5(self.conv_5_1(x)) + self.conv_1_1(x)
        cx = boxes[..., 0] / stride
        cy = boxes[..., 1] / stride
        if self.points == 1:
            sampled = bilinear_sample_nhwc(feat, cy, cx)
        else:  # center + 4 edge midpoints (fr.py forward, points=5)
            w = boxes[..., 2] / stride
            h = boxes[..., 3] / stride
            a = boxes[..., 4]
            cos, sin = jnp.cos(a), jnp.sin(a)
            pts_x = jnp.stack(
                [cx, cx + cos * w / 2, cx - cos * w / 2,
                 cx - sin * h / 2, cx + sin * h / 2], -1
            )
            pts_y = jnp.stack(
                [cy, cy + sin * w / 2, cy - sin * w / 2,
                 cy + cos * h / 2, cy - cos * h / 2], -1
            )
            sampled = bilinear_sample_nhwc(feat, pts_y, pts_x).sum(-2)
        return x + sampled

    def __call__(self, feats, refine_boxes):
        """feats: list of (B, H, W, C); refine_boxes: list of (B, H, W, 5)."""
        return [
            self.refine_single(x, b, s)
            for x, b, s in zip(feats, refine_boxes, self.featmap_strides)
        ]

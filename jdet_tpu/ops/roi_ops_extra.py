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


def _bilinear_gather_batched(feat, bidx, sy, sx):
    """Bilinear-sample feat (B, H, W, C) at (sy, sx) per roi, roi -> batch
    via bidx (R,). sy/sx: (R, ...). Returns (R, ..., C)."""
    B, H, W, C = feat.shape
    flat = feat.reshape(B * H * W, C)
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = (sy - y0)[..., None]
    wx = (sx - x0)[..., None]
    base = (bidx * H * W).reshape(bidx.shape[0], *([1] * (sy.ndim - 1)))

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        return flat[(base + yc * W + xc).reshape(-1)].reshape(*yi.shape, C)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    return (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
            + v10 * wy * (1 - wx) + v11 * wy * wx)


def dcn_v2_pooling(feat, rois, offset=None, spatial_scale=1.0, pooled_size=7,
                   no_trans=False, group_size=1, part_size=None,
                   sample_per_part=4, trans_std=0.0):
    """Deformable (PS)RoI pooling — vectorized mirror of the reference
    CUDA kernel `dcn_v2_pooling_forward` (ops/dcn_v2.py:808-988): each
    P x P bin averages sample_per_part^2 bilinear taps, shifted by
    trans_std * offset * roi size; position-sensitive channel routing when
    group_size > 1.

    feat (B, H, W, C) NHWC; rois (R, 5) [batch_idx, x1, y1, x2, y2];
    offset (R, 2, part, part) or None. Returns (R, P, P, C_out) with
    C_out = C // group_size^2.
    """
    B, H, W, C = feat.shape
    R = rois.shape[0]
    P = pooled_size
    S = sample_per_part
    G = group_size
    part = part_size or P

    bidx = rois[:, 0].astype(jnp.int32)
    x1 = jnp.round(rois[:, 1]) * spatial_scale - 0.5
    y1 = jnp.round(rois[:, 2]) * spatial_scale - 0.5
    x2 = (jnp.round(rois[:, 3]) + 1.0) * spatial_scale - 0.5
    y2 = (jnp.round(rois[:, 4]) + 1.0) * spatial_scale - 0.5
    rw = jnp.maximum(x2 - x1, 0.1)
    rh = jnp.maximum(y2 - y1, 0.1)
    bin_w = (rw / P)[:, None, None]
    bin_h = (rh / P)[:, None, None]

    ph = jnp.arange(P)
    part_h = jnp.clip((ph * part) // P, 0, part - 1)
    if no_trans or offset is None:
        tx = ty = jnp.zeros((R, P, P), feat.dtype)
    else:
        tx = offset[:, 0][:, part_h][:, :, part_h] * trans_std
        ty = offset[:, 1][:, part_h][:, :, part_h] * trans_std
    wstart = ph[None, None, :] * bin_w + x1[:, None, None] + tx * rw[:, None, None]
    hstart = ph[None, :, None] * bin_h + y1[:, None, None] + ty * rh[:, None, None]

    sw = (bin_w / S)[..., None, None]
    sh = (bin_h / S)[..., None, None]
    ii = jnp.arange(S)
    wpos = wstart[..., None, None] + ii[None, None, None, None, :] * sw
    hpos = hstart[..., None, None] + ii[None, None, None, :, None] * sh
    wpos, hpos = jnp.broadcast_arrays(wpos, hpos)  # (R, P, P, S, S)
    valid = ((wpos >= -0.5) & (wpos <= W - 0.5)
             & (hpos >= -0.5) & (hpos <= H - 0.5))
    wc = jnp.clip(wpos, 0.0, W - 1.0)
    hc = jnp.clip(hpos, 0.0, H - 1.0)
    sampled = _bilinear_gather_batched(feat, bidx, hc, wc)  # (R,P,P,S,S,C)
    sampled = jnp.where(valid[..., None], sampled, 0.0)
    count = valid.sum((-1, -2))
    out = sampled.sum((3, 4)) / jnp.maximum(count, 1)[..., None].astype(
        feat.dtype
    )  # (R, P, P, C)
    if G > 1:
        c_out = C // (G * G)
        gh = jnp.clip((ph * G) // P, 0, G - 1)
        # channel layout c = (ctop*G + gh)*G + gw (kernel line `int c =`)
        cidx = ((jnp.arange(c_out)[None, None, :] * G
                 + gh[:, None, None]) * G + gh[None, :, None])
        out = jnp.take_along_axis(
            out, jnp.broadcast_to(cidx[None], (R, P, P, c_out)), axis=-1
        )
    return out


class DCNPooling(nnx.Module):
    """Deformable RoI pooling with learned offsets+mask — mirror of the
    reference DCNPooling (ops/dcn_v2.py:1374-1455): a no-trans pooling
    pass feeds an MLP that predicts per-bin (dx, dy, mask); the second,
    offset-shifted pooling pass is modulated by sigmoid(mask).

    Note: the MLP flattens (P, P, C) in NHWC order (the reference
    flattens NCHW) — functionally equivalent for training from scratch.
    """

    def __init__(self, spatial_scale, pooled_size, output_dim, no_trans,
                 group_size=1, part_size=None, sample_per_part=4,
                 trans_std=0.0, deform_fc_dim=1024, *, rngs):
        from ..models import nn as jnn
        from ..models.layers import normal_init

        self.spatial_scale = spatial_scale
        self.pooled_size = pooled_size
        self.output_dim = output_dim
        self.no_trans = no_trans
        self.group_size = group_size
        self.part_size = part_size or pooled_size
        self.sample_per_part = sample_per_part
        self.trans_std = trans_std
        if not no_trans:
            P = pooled_size
            self.fc1 = jnn.Linear(P * P * output_dim, deform_fc_dim, rngs=rngs)
            self.fc2 = jnn.Linear(deform_fc_dim, deform_fc_dim, rngs=rngs)
            self.fc3 = jnn.Linear(
                deform_fc_dim, P * P * 3,
                kernel_init=jax.nn.initializers.zeros, rngs=rngs,
            )

    def _pool(self, feat, rois, offset, no_trans):
        return dcn_v2_pooling(
            feat, rois, offset,
            spatial_scale=self.spatial_scale, pooled_size=self.pooled_size,
            no_trans=no_trans, group_size=self.group_size,
            part_size=self.part_size, sample_per_part=self.sample_per_part,
            trans_std=self.trans_std,
        )

    def __call__(self, feat, rois):
        if self.no_trans:
            return self._pool(feat, rois, None, True)
        P = self.pooled_size
        n = rois.shape[0]
        roi_feat = self._pool(feat, rois, None, True)
        x = jax.nn.relu(self.fc1(roi_feat.reshape(n, -1)))
        x = jax.nn.relu(self.fc2(x))
        om = self.fc3(x).reshape(n, 3, P, P)
        offset = om[:, :2]
        mask = jax.nn.sigmoid(om[:, 2])  # (n, P, P)
        return self._pool(feat, rois, offset, False) * mask[..., None]


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

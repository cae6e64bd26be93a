"""RoIAlign (horizontal + rotated) — gather-based bilinear sampling.

TPU-native equivalent of the reference CUDA kernels
(`python/jdet/ops/roi_align.py:209-301`,
`ops/roi_align_rotated.py:258-342`, `ops/roi_align_rotated_v1.py:300-385`):
for each RoI bin, `sampling_ratio^2` bilinear samples are averaged; for
rotated RoIs the sampling grid is rotated by theta about the box center.
Expressed as XLA gathers over the batched feature map — autodiff gives the
atomic-add backward for free. Fixed shapes: rois arrive as (B, R, 5|4)
per-image arrays (no batch-index column needed) with a validity mask;
invalid rois produce zeros.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .deform_conv import bilinear_sample_nhwc


def _sample_avg(feat, sy, sx):
    """feat (B, H, W, C); sy/sx (B, R, P, P, G) -> (B, R, P, P, C) mean over G."""
    B = feat.shape[0]
    out = bilinear_sample_nhwc(feat, sy, sx)  # (B, R, P, P, G, C)
    return out.mean(-2)


def roi_align_rotated(
    feat,
    rois,
    out_size=7,
    spatial_scale=1.0,
    sampling_ratio=2,
    valid=None,
):
    """Rotated RoIAlign.

    Args:
      feat: (B, H, W, C).
      rois: (B, R, 5) (cx, cy, w, h, theta) in image coords.
      valid: optional (B, R) mask.

    Returns (B, R, out_size, out_size, C).
    """
    # scale into feature coords first (w/h clamp applies in feature
    # units, reference v1 convention), then shared sample-point geometry
    rois_feat = jnp.concatenate(
        [rois[..., :4] * spatial_scale, rois[..., 4:5]], -1
    )
    sy, sx = _rotated_sample_coords(rois_feat, out_size, sampling_ratio)
    # -0.5 half-pixel alignment (aligned=True convention, roi_align.py v1)
    out = _sample_avg(feat, sy - 0.5, sx - 0.5)
    if valid is not None:
        out = out * valid[..., None, None, None]
    return out


def roi_align(
    feat,
    rois,
    out_size=7,
    spatial_scale=1.0,
    sampling_ratio=2,
    valid=None,
):
    """Horizontal RoIAlign; rois (B, R, 4) x1y1x2y2 (reference
    ops/roi_align.py, aligned/v1 convention)."""
    cx = (rois[..., 0] + rois[..., 2]) * 0.5
    cy = (rois[..., 1] + rois[..., 3]) * 0.5
    w = rois[..., 2] - rois[..., 0]
    h = rois[..., 3] - rois[..., 1]
    rrois = jnp.stack([cx, cy, w, h, jnp.zeros_like(w)], -1)
    return roi_align_rotated(
        feat, rrois, out_size, spatial_scale, sampling_ratio, valid
    )


def _rotated_sample_coords(rois, out_size, sampling_ratio):
    """Per-bin sample points of a rotated RoI in image coords.

    rois (B, R, 5) -> sy, sx (B, R, P, P, G) with G = sampling_ratio^2.
    Shared between the single-level and multi-level aligners.
    """
    P = out_size
    g = sampling_ratio
    cx = rois[..., 0]
    cy = rois[..., 1]
    w = jnp.maximum(rois[..., 2], 1.0)
    h = jnp.maximum(rois[..., 3], 1.0)
    theta = rois[..., 4]

    gy = (jnp.arange(g) + 0.5) / g
    gx = (jnp.arange(g) + 0.5) / g
    fy = (jnp.arange(P)[:, None] + 0.0)[..., None, None]
    fx = (jnp.arange(P)[None, :] + 0.0)[..., None, None]
    sub_y = (fy + gy[None, None, :, None]) / P
    sub_x = (fx + gx[None, None, None, :]) / P
    sub_y = jnp.broadcast_to(sub_y, (P, P, g, g)).reshape(P, P, g * g)
    sub_x = jnp.broadcast_to(sub_x, (P, P, g, g)).reshape(P, P, g * g)

    ly = (sub_y[None, None] - 0.5) * h[..., None, None, None]
    lx = (sub_x[None, None] - 0.5) * w[..., None, None, None]
    cos = jnp.cos(theta)[..., None, None, None]
    sin = jnp.sin(theta)[..., None, None, None]
    sy = cy[..., None, None, None] + sin * lx + cos * ly
    sx = cx[..., None, None, None] + cos * lx - sin * ly
    return sy, sx


def roi_align_rotated_multilevel(
    feats,
    rois,
    lvl,
    strides,
    out_size=7,
    sampling_ratio=2,
    valid=None,
):
    """Level-routed rotated RoIAlign: ONE gather per sample, from a
    concatenated per-level corner table.

    The fixed-shape alternative to aligning every RoI on every level and
    masking (4x the gather volume — the previous extractor design): the
    per-level corner tables (deform_conv._corner_table) are concatenated
    along rows, each RoI's samples are scaled by ITS level's stride and
    offset to that level's rows, and a single flat gather fetches them.
    Matches the reference's dynamic per-level routing
    (roi_extractors/oriented_single_level.py:53-71) with static shapes.

    Args:
      feats: list of (B, H_l, W_l, C) NHWC pyramid levels.
      rois: (B, R, 5) (cx, cy, w, h, theta) in IMAGE coords.
      lvl: (B, R) int32 level index per RoI (see extractor map_levels).
      strides: per-level image-to-feature stride list.
    Returns (B, R, P, P, C).
    """
    from .deform_conv import _corner_table, _pitch8, corner_weights_and_rows

    B, _, _, C = feats[0].shape
    tables, row_offs, hs, ws, pitches = [], [], [], [], []
    off = 0
    for f in feats:
        _, H, W, _ = f.shape
        p = _pitch8(W)
        tables.append(_corner_table(f).reshape(B, (H + 1) * p, 4 * C))
        row_offs.append(off)
        hs.append(H)
        ws.append(W)
        pitches.append(p)
        off += (H + 1) * p
    table = jnp.concatenate(tables, axis=1)  # (B, T, 4C)

    stride = jnp.take(jnp.asarray(strides, jnp.float32), lvl)  # (B, R)
    Hl = jnp.take(jnp.asarray(hs, jnp.int32), lvl)
    Wl = jnp.take(jnp.asarray(ws, jnp.int32), lvl)
    Pl = jnp.take(jnp.asarray(pitches, jnp.int32), lvl)
    base = jnp.take(jnp.asarray(row_offs, jnp.int32), lvl)

    # scale each RoI into ITS level's feature coords first, so the
    # w/h >= 1 clamp applies in feature units — bit-exact with the
    # single-level roi_align_rotated path
    inv = (1.0 / stride)[..., None]
    rois_feat = jnp.concatenate(
        [rois[..., :4] * inv, rois[..., 4:5]], -1
    )
    sy, sx = _rotated_sample_coords(rois_feat, out_size, sampling_ratio)
    sy = sy - 0.5  # aligned=True half-pixel convention
    sx = sx - 0.5
    ex = lambda a: a[..., None, None, None]
    # the helper's row formula yq*pitch+xq broadcasts the per-sample
    # pitch, giving the right stride within each level's table slice
    cw, local_rows = corner_weights_and_rows(
        sy, sx, ex(Hl), ex(Wl), table.dtype, pitch=ex(Pl)
    )
    from .gather import gather_weighted_rows

    idx = ex(base) + local_rows  # (B, R, P, P, G)
    T = table.shape[1]
    flat = table.reshape(B * T, 4 * C)
    boff = jnp.arange(B, dtype=jnp.int32).reshape(
        (B,) + (1,) * (idx.ndim - 1)
    )
    rows = idx + boff * T
    # one weighted gather per subsample, summed — the bin mean folds into
    # the corner weights (cw/G). The joint form (gather all G, reshape to
    # (..., G, C), mean(-2)) materialized the full (S, C) sample tensor
    # AND a tile-padded (..., G=4, C) copy of it (G < the 8-sublane tile),
    # 20 ms/step of the Oriented R-CNN B=16 profile; here each gather
    # fuses with its multiply-add and only the (..., P, P, C) bin output
    # exists.
    G = rows.shape[-1]
    cw_g = cw * (1.0 / G)
    out = gather_weighted_rows(
        flat, rows[..., 0].reshape(-1), cw_g[..., 0, :].reshape(-1, 4)
    )
    for t in range(1, G):
        out = out + gather_weighted_rows(
            flat, rows[..., t].reshape(-1), cw_g[..., t, :].reshape(-1, 4)
        )
    out = out.reshape(*rows.shape[:-1], C)
    if valid is not None:
        out = out * valid[..., None, None, None]
    return out

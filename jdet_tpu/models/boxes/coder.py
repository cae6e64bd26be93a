"""Box coders beyond the plain delta codecs (which live in
jdet_tpu.ops.box_convert): midpoint-offset (Oriented R-CNN), gliding
vertex fix/ratio, and CSL angle coding.

Functional mirrors of the reference coders
(`python/jdet/models/boxes/coder.py`): `MidpointOffsetCoder` (:323)
represents an obb against a horizontal proposal as the hbb deltas plus the
normalized positions of the topmost and rightmost vertices;
`GVFixCoder`/`GVRatioCoder` (:144, :209) encode gliding-vertex edge
offsets and h/obb area ratio; `CSLCoder` (:521) turns angles into
Gaussian-smoothed circular classification labels.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ...ops.box_convert import rbox_to_poly, rbox_to_hbox, poly_to_rbox


def midpoint_offset_encode(
    hbb_proposals, gt_rboxes, means=(0.0,) * 6, stds=(1.0,) * 6
):
    """(n, 4) hbb x (n, 5) obb -> (n, 6) deltas (coder.py:331-377)."""
    px = (hbb_proposals[..., 0] + hbb_proposals[..., 2]) * 0.5
    py = (hbb_proposals[..., 1] + hbb_proposals[..., 3]) * 0.5
    pw = jnp.maximum(hbb_proposals[..., 2] - hbb_proposals[..., 0], 1e-6)
    ph = jnp.maximum(hbb_proposals[..., 3] - hbb_proposals[..., 1], 1e-6)

    poly = rbox_to_poly(gt_rboxes)
    hbb = rbox_to_hbox(gt_rboxes)
    gx = (hbb[..., 0] + hbb[..., 2]) * 0.5
    gy = (hbb[..., 1] + hbb[..., 3]) * 0.5
    gw = jnp.maximum(hbb[..., 2] - hbb[..., 0], 1e-6)
    gh = jnp.maximum(hbb[..., 3] - hbb[..., 1], 1e-6)

    xs = poly[..., 0::2]
    ys = poly[..., 1::2]
    y_min = ys.min(-1, keepdims=True)
    x_max = xs.max(-1, keepdims=True)
    # x of the topmost vertex (max x among ties within 0.1)
    ga = jnp.where(jnp.abs(ys - y_min) > 0.1, -1e9, xs).max(-1)
    # y of the rightmost vertex
    gb = jnp.where(jnp.abs(xs - x_max) > 0.1, -1e9, ys).max(-1)

    dx = (gx - px) / pw
    dy = (gy - py) / ph
    dw = jnp.log(gw / pw)
    dh = jnp.log(gh / ph)
    da = (ga - gx) / gw
    db = (gb - gy) / gh
    deltas = jnp.stack([dx, dy, dw, dh, da, db], -1)
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    return (deltas - means) / stds


def midpoint_offset_decode(
    hbb_proposals,
    deltas,
    means=(0.0,) * 6,
    stds=(1.0,) * 6,
    wh_ratio_clip=16 / 1000,
):
    """Inverse (coder.py:378-439); deltas (..., K*6) -> (..., K*5) obbs."""
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    k = deltas.shape[-1] // 6
    d = deltas.reshape(*deltas.shape[:-1], k, 6) * stds + means
    dx, dy, dw, dh, da, db = (d[..., i] for i in range(6))
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)
    px = ((hbb_proposals[..., 0] + hbb_proposals[..., 2]) * 0.5)[..., None]
    py = ((hbb_proposals[..., 1] + hbb_proposals[..., 3]) * 0.5)[..., None]
    pw = (hbb_proposals[..., 2] - hbb_proposals[..., 0])[..., None]
    ph = (hbb_proposals[..., 3] - hbb_proposals[..., 1])[..., None]
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy
    x1 = gx - gw * 0.5
    y1 = gy - gh * 0.5
    x2 = gx + gw * 0.5
    y2 = gy + gh * 0.5
    da = jnp.clip(da, -0.5, 0.5)
    db = jnp.clip(db, -0.5, 0.5)
    ga = gx + da * gw
    _ga = gx - da * gw
    gb = gy + db * gh
    _gb = gy - db * gh
    # midpoint polygon, then rectify: scale each half-diagonal to the max
    polys = jnp.stack([ga, y1, x2, gb, _ga, y2, x1, _gb], -1)
    center = jnp.stack([gx, gy] * 4, -1)
    cp = polys - center
    diag = jnp.sqrt(cp[..., 0::2] ** 2 + cp[..., 1::2] ** 2 + 1e-12)
    scale = diag.max(-1, keepdims=True) / jnp.maximum(diag, 1e-6)
    cp = cp * jnp.repeat(scale, 2, -1)
    rect = cp + center
    obb = poly_to_rbox(rect)
    out = obb.reshape(*deltas.shape[:-1], k, 5)
    return out.reshape(*deltas.shape[:-1], k * 5) if k > 1 else out[..., 0, :]


# ---------------------------------------------------------------------------
# Gliding vertex
# ---------------------------------------------------------------------------


def gv_fix_encode(hbbs, polys):
    """Edge glide offsets of the obb vertices along the hbb edges
    (GVFixCoder.encode, coder.py:150-186). polys (n, 8) with vertices in
    any cyclic order."""
    xs = polys[..., 0::2]
    ys = polys[..., 1::2]
    x1, y1, x2, y2 = (hbbs[..., i] for i in range(4))
    w = jnp.maximum(x2 - x1, 1e-6)
    h = jnp.maximum(y2 - y1, 1e-6)
    # vertex touching each edge
    t_x = jnp.where(ys == ys.min(-1, keepdims=True), xs, -1e9).max(-1)
    r_y = jnp.where(xs == xs.max(-1, keepdims=True), ys, -1e9).max(-1)
    d_x = jnp.where(ys == ys.max(-1, keepdims=True), xs, 1e9).min(-1)
    l_y = jnp.where(xs == xs.min(-1, keepdims=True), ys, 1e9).min(-1)
    return jnp.stack(
        [(t_x - x1) / w, (r_y - y1) / h, (x2 - d_x) / w, (y2 - l_y) / h], -1
    )


def gv_fix_decode(hbbs, fix_deltas):
    """(GVFixCoder.decode, coder.py:188-207): rebuild the quad from edge
    glide ratios; fix_deltas (..., K*4)."""
    k = fix_deltas.shape[-1] // 4
    d = jnp.clip(fix_deltas.reshape(*fix_deltas.shape[:-1], k, 4), 0, 1)
    x1 = hbbs[..., 0][..., None]
    y1 = hbbs[..., 1][..., None]
    x2 = hbbs[..., 2][..., None]
    y2 = hbbs[..., 3][..., None]
    w = x2 - x1
    h = y2 - y1
    pred_t_x = x1 + w * d[..., 0]
    pred_r_y = y1 + h * d[..., 1]
    pred_d_x = x2 - w * d[..., 2]
    pred_l_y = y2 - h * d[..., 3]
    polys = jnp.concatenate(
        [
            jnp.stack([pred_t_x, jnp.broadcast_to(y1, pred_t_x.shape)], -1),
            jnp.stack([jnp.broadcast_to(x2, pred_r_y.shape), pred_r_y], -1),
            jnp.stack([pred_d_x, jnp.broadcast_to(y2, pred_d_x.shape)], -1),
            jnp.stack([jnp.broadcast_to(x1, pred_l_y.shape), pred_l_y], -1),
        ],
        -1,
    )
    out = polys.reshape(*fix_deltas.shape[:-1], k, 8)
    return out.reshape(*fix_deltas.shape[:-1], k * 8) if k > 1 else out[..., 0, :]


def gv_ratio_encode(hbbs, polys):
    """Area ratio poly/hbb (GVRatioCoder, coder.py:209-233)."""
    x1, y1, x2, y2 = (hbbs[..., i] for i in range(4))
    h_area = jnp.maximum((x2 - x1) * (y2 - y1), 1e-6)
    xs = polys[..., 0::2]
    ys = polys[..., 1::2]
    xs_n = jnp.roll(xs, -1, -1)
    ys_n = jnp.roll(ys, -1, -1)
    p_area = 0.5 * jnp.abs((xs * ys_n - xs_n * ys).sum(-1))
    return (p_area / h_area)[..., None]


# ---------------------------------------------------------------------------
# CSL angle coder
# ---------------------------------------------------------------------------


class CSLCoder:
    """Circular Smooth Label angle coder — exact mirror of the reference
    (coder.py:521-604): input angle (radians, canonical [-pi/4, 3pi/4)
    range, offset 45 deg) -> Gaussian/triangle/pulse-smoothed circular
    labels over `180/omega` bins; decode = (argmax + 0.5) * omega - 45 deg.
    Note the reference head feeds the *encoded delta angle* (da) through
    this coder (csl_rretina_head.py:574-578, 393-395) — we preserve that.
    """

    def __init__(self, omega=1, window="gaussian", radius=6):
        assert window in ("gaussian", "triangle", "rect", "pulse")
        self.angle_range = 180
        self.angle_offset = 45
        self.omega = omega
        self.window = window
        self.radius = radius
        self.coding_len = int(self.angle_range // omega)

    def encode(self, angle):
        """angle (..., ) rad -> (..., coding_len) smooth circular labels."""
        deg = jnp.degrees(angle)
        # reference uses `.long()` = truncation toward zero (coder.py:555);
        # identical to floor on the head's domain (deg+45 >= 0) but kept
        # exact for out-of-range inputs
        center = jnp.trunc((deg + self.angle_offset) / self.omega)
        bins = jnp.arange(self.coding_len, dtype=angle.dtype)
        d = bins[None, :] - center[..., None]
        d = (d + self.coding_len / 2) % self.coding_len - self.coding_len / 2
        if self.window == "gaussian":
            smooth = jnp.exp(-(d**2) / (2 * self.radius**2))
        elif self.window == "triangle":
            smooth = jnp.where(
                jnp.abs(d) < self.radius,
                1.0 - jnp.abs(d) / self.radius, 0.0,
            )
        elif self.window == "rect":
            # reference window support is [-radius, radius): the scatter
            # range is arange(-radius, radius) (coder.py:563-566)
            smooth = ((d >= -self.radius) & (d < self.radius)).astype(
                angle.dtype
            )
        else:  # pulse
            smooth = (jnp.abs(d) < 0.5).astype(angle.dtype)
        return smooth

    def decode(self, logits):
        """(..., coding_len) -> angle (rad)."""
        idx = logits.argmax(-1).astype(logits.dtype)
        deg = ((idx + 0.5) * self.omega) % self.angle_range - self.angle_offset
        return jnp.radians(deg)

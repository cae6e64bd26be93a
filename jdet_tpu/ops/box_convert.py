"""Box-space conversions for oriented (rotated) boxes — TPU-native (pure jnp).

Semantics mirror the reference JDet box toolbox
(`python/jdet/models/boxes/box_ops.py`, `python/jdet/ops/bbox_transforms.py`)
but are re-expressed as fixed-shape, fully vectorized jnp functions that
compose with jit/vmap/pjit. All functions accept arbitrary leading batch
dimensions unless noted.

Conventions:
  - rbox  = (cx, cy, w, h, theta)  with theta in radians,
    canonical range [-pi/4, 3*pi/4) (reference `norm_angle`,
    box_ops.py:176-178).
  - hbox  = (x1, y1, x2, y2).
  - poly  = (x0, y0, x1, y1, x2, y2, x3, y3), clockwise in image coords
    (y-down).
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

PI = math.pi


def norm_angle(angle, start=-PI / 4, rng=PI):
    """Normalize angle into [start, start + rng).

    Reference: box_ops.py:176-178 (`norm_angle`).
    """
    return (angle - start) % rng + start


def regular_theta(theta, mode="180", start=-PI / 2):
    """Normalize theta into [start, start+pi) ('180') or [start, start+2pi).

    Reference: ops/bbox_transforms.py (`regular_theta`).
    """
    cycle = 2 * PI if mode == "360" else PI
    return (theta - start) % cycle + start


def regular_obb(obboxes):
    """Canonicalize obb so that w >= h and theta in [-pi/2, pi/2).

    Reference: ops/bbox_transforms.py (`regular_obb`).
    """
    x, y, w, h, theta = jnp.split(obboxes, 5, axis=-1)
    w_regular = jnp.where(w > h, w, h)
    h_regular = jnp.where(w > h, h, w)
    theta_regular = jnp.where(w > h, theta, theta + PI / 2)
    theta_regular = regular_theta(theta_regular)
    return jnp.concatenate([x, y, w_regular, h_regular, theta_regular], axis=-1)


def mintheta_obb(obboxes):
    """Pick the (w,h,theta) representation with minimal |theta|.

    Reference: box_ops.py:679-693 (`mintheta_obb`).
    """
    x, y, w, h, theta = jnp.split(obboxes, 5, axis=-1)
    theta1 = regular_theta(theta)
    theta2 = regular_theta(theta + PI / 2)
    pick1 = jnp.abs(theta1) < jnp.abs(theta2)
    w_r = jnp.where(pick1, w, h)
    h_r = jnp.where(pick1, h, w)
    t_r = jnp.where(pick1, theta1, theta2)
    return jnp.concatenate([x, y, w_r, h_r, t_r], axis=-1)


def rbox_to_corners(rboxes):
    """(..., 5) rbox -> (..., 4, 2) corner points.

    Vertex order matches the reference CUDA `get_rotated_vertices`
    (ops/nms_rotated.py:52-72): a rectangle traversed cyclically, so edges
    (i -> i+1 mod 4) are the rectangle sides.
    """
    cx, cy, w, h, a = jnp.split(rboxes, 5, axis=-1)
    cos2 = jnp.cos(a) * 0.5
    sin2 = jnp.sin(a) * 0.5
    x0 = cx - sin2 * h - cos2 * w
    y0 = cy + cos2 * h - sin2 * w
    x1 = cx + sin2 * h - cos2 * w
    y1 = cy - cos2 * h - sin2 * w
    x2 = 2 * cx - x0
    y2 = 2 * cy - y0
    x3 = 2 * cx - x1
    y3 = 2 * cy - y1
    pts = jnp.stack(
        [
            jnp.concatenate([x0, y0], axis=-1),
            jnp.concatenate([x1, y1], axis=-1),
            jnp.concatenate([x2, y2], axis=-1),
            jnp.concatenate([x3, y3], axis=-1),
        ],
        axis=-2,
    )
    return pts


def rbox_to_poly(rboxes):
    """(..., 5) rbox -> (..., 8) polygon, reference vertex convention.

    Matches `rotated_box_to_poly` (box_ops.py:592-614): corners are the
    rotation of [(-w/2,-h/2), (w/2,-h/2), (w/2,h/2), (-w/2,h/2)] by theta
    (clockwise in y-down image coords), translated to (cx, cy).
    """
    cx, cy, w, h, a = jnp.split(rboxes, 5, axis=-1)
    c, s = jnp.cos(a), jnp.sin(a)
    dx = jnp.concatenate([-w / 2, w / 2, w / 2, -w / 2], axis=-1)
    dy = jnp.concatenate([-h / 2, -h / 2, h / 2, h / 2], axis=-1)
    xs = cx + c * dx - s * dy
    ys = cy + s * dx + c * dy
    return jnp.stack([xs, ys], axis=-1).reshape(*rboxes.shape[:-1], 8)


def poly_to_rbox(polys):
    """(..., 8) quad -> (..., 5) rbox. Assumes the quad is a (near-)rectangle.

    Matches `poly_to_rotated_box` (box_ops.py:485-515): longer edge becomes w,
    angle from the longer edge direction, normalized to [-pi/4, 3pi/4).
    """
    p = polys.reshape(*polys.shape[:-1], 4, 2)
    pt1, pt2, pt3, pt4 = p[..., 0, :], p[..., 1, :], p[..., 2, :], p[..., 3, :]
    edge1 = jnp.linalg.norm(pt1 - pt2, axis=-1)
    edge2 = jnp.linalg.norm(pt2 - pt3, axis=-1)
    angle1 = jnp.arctan2(pt2[..., 1] - pt1[..., 1], pt2[..., 0] - pt1[..., 0])
    angle2 = jnp.arctan2(pt4[..., 1] - pt1[..., 1], pt4[..., 0] - pt1[..., 0])
    angle = jnp.where(edge1 > edge2, angle1, angle2)
    angle = norm_angle(angle)
    cx = (pt1[..., 0] + pt3[..., 0]) / 2.0
    cy = (pt1[..., 1] + pt3[..., 1]) / 2.0
    w = jnp.maximum(edge1, edge2)
    h = jnp.minimum(edge1, edge2)
    return jnp.stack([cx, cy, w, h, angle], axis=-1)


def poly_to_hbox(polys):
    """(..., 8) -> (..., 4) axis-aligned bounding box."""
    xs = polys[..., 0::2]
    ys = polys[..., 1::2]
    return jnp.stack(
        [xs.min(-1), ys.min(-1), xs.max(-1), ys.max(-1)], axis=-1
    )


def rbox_to_hbox(rboxes):
    """(..., 5) -> (..., 4) enclosing axis-aligned box.

    Reference: `rotated_box_to_bbox` (box_ops.py:616-623).
    """
    return poly_to_hbox(rbox_to_poly(rboxes))


def hbox_to_rbox(hboxes):
    """(..., 4) x1y1x2y2 -> (..., 5) rbox with theta=0.

    Reference: `hbb2obb_v2` semantics (ops/bbox_transforms.py:653+): w>=h
    canonicalization with theta in {0, -pi/2} per norm_angle range.
    """
    x1, y1, x2, y2 = jnp.split(hboxes, 4, axis=-1)
    cx = (x1 + x2) * 0.5
    cy = (y1 + y2) * 0.5
    w = x2 - x1
    h = y2 - y1
    theta = jnp.zeros_like(w)
    rb = jnp.concatenate([cx, cy, w, h, theta], axis=-1)
    # canonicalize w >= h (theta -pi/2 when the box is tall)
    w_r = jnp.where(w >= h, w, h)
    h_r = jnp.where(w >= h, h, w)
    t_r = jnp.where(w >= h, theta, theta + PI / 2)
    t_r = norm_angle(t_r)
    return jnp.concatenate([cx, cy, w_r, h_r, t_r], axis=-1)


def hbox_to_cxcywh(hboxes):
    x1, y1, x2, y2 = jnp.split(hboxes, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1
    )


def cxcywh_to_hbox(boxes):
    cx, cy, w, h = jnp.split(boxes[..., :4], 4, axis=-1)
    rest = boxes[..., 4:]
    out = jnp.concatenate(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
    )
    if rest.shape[-1]:
        out = jnp.concatenate([out, rest], axis=-1)
    return out


def get_best_begin_point(polys):
    """Reorder each quad's vertices so the traversal starts nearest the
    top-left of its AABB (keeps cyclic order).

    Vectorized equivalent of `get_best_begin_point` (box_ops.py:521-566).
    """
    p = polys.reshape(*polys.shape[:-1], 4, 2)
    xmin = p[..., 0].min(-1)
    ymin = p[..., 1].min(-1)
    xmax = p[..., 0].max(-1)
    ymax = p[..., 1].max(-1)
    dst = jnp.stack(
        [
            jnp.stack([xmin, ymin], -1),
            jnp.stack([xmax, ymin], -1),
            jnp.stack([xmax, ymax], -1),
            jnp.stack([xmin, ymax], -1),
        ],
        axis=-2,
    )  # (..., 4, 2)
    # rotations: candidate k uses vertex order (k, k+1, k+2, k+3) mod 4
    idx = (jnp.arange(4)[:, None] + jnp.arange(4)[None, :]) % 4  # (4,4)
    cand = p[..., idx, :]  # (..., 4 rot, 4 vert, 2)
    force = jnp.linalg.norm(cand - dst[..., None, :, :], axis=-1).sum(-1)
    best = jnp.argmin(force, axis=-1)
    out = jnp.take_along_axis(
        cand, best[..., None, None, None], axis=-3
    ).squeeze(-3)
    return out.reshape(*polys.shape[:-1], 8)


# ---------------------------------------------------------------------------
# Delta codecs
# ---------------------------------------------------------------------------


def rbox2delta(proposals, gt, means=(0.0,) * 5, stds=(1.0,) * 5):
    """Rotated-box deltas in the proposal's local frame.

    Reference: `bbox2delta_rotated` (box_ops.py:180-229): dx/dy are the
    center offset rotated into the proposal frame; da is the normalized
    angle difference / pi.
    """
    pw = proposals[..., 2]
    ph = proposals[..., 3]
    pa = proposals[..., 4]
    cosa = jnp.cos(pa)
    sina = jnp.sin(pa)
    ox = gt[..., 0] - proposals[..., 0]
    oy = gt[..., 1] - proposals[..., 1]
    dx = (cosa * ox + sina * oy) / pw
    dy = (-sina * ox + cosa * oy) / ph
    dw = jnp.log(jnp.maximum(gt[..., 2], 1e-6) / jnp.maximum(pw, 1e-6))
    dh = jnp.log(jnp.maximum(gt[..., 3], 1e-6) / jnp.maximum(ph, 1e-6))
    da = norm_angle(gt[..., 4] - pa) / PI
    deltas = jnp.stack([dx, dy, dw, dh, da], axis=-1)
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    return (deltas - means) / stds


def delta2rbox(
    rois,
    deltas,
    means=(0.0,) * 5,
    stds=(1.0,) * 5,
    wh_ratio_clip=16 / 1000,
):
    """Inverse of rbox2delta. Reference: `delta2bbox_rotated`
    (box_ops.py:229-286). Handles (..., 5) or (..., K*5) deltas against
    (..., 5) rois.
    """
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    k = deltas.shape[-1] // 5
    d = deltas.reshape(*deltas.shape[:-1], k, 5) * stds + means
    dx, dy, dw, dh, da = (d[..., i] for i in range(5))
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)
    rx = rois[..., 0:1]
    ry = rois[..., 1:2]
    rw = rois[..., 2:3]
    rh = rois[..., 3:4]
    ra = rois[..., 4:5]
    gx = dx * rw * jnp.cos(ra) - dy * rh * jnp.sin(ra) + rx
    gy = dx * rw * jnp.sin(ra) + dy * rh * jnp.cos(ra) + ry
    gw = rw * jnp.exp(dw)
    gh = rh * jnp.exp(dh)
    ga = norm_angle(PI * da + ra)
    out = jnp.stack([gx, gy, gw, gh, ga], axis=-1)
    return out.reshape(*deltas.shape[:-1], k * 5) if k > 1 else out[..., 0, :]


def hbox2delta(proposals, gt, means=(0.0,) * 4, stds=(1.0,) * 4):
    """Horizontal-box deltas, mmdet-v2 convention (no +1 on sizes).

    Reference: `DeltaXYWHBBoxCoder` (models/boxes/coder.py:9-76).
    """
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0]
    ph = proposals[..., 3] - proposals[..., 1]
    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0]
    gh = gt[..., 3] - gt[..., 1]
    dx = (gx - px) / jnp.maximum(pw, 1e-6)
    dy = (gy - py) / jnp.maximum(ph, 1e-6)
    dw = jnp.log(jnp.maximum(gw, 1e-6) / jnp.maximum(pw, 1e-6))
    dh = jnp.log(jnp.maximum(gh, 1e-6) / jnp.maximum(ph, 1e-6))
    deltas = jnp.stack([dx, dy, dw, dh], axis=-1)
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    return (deltas - means) / stds


def delta2hbox(
    rois,
    deltas,
    means=(0.0,) * 4,
    stds=(1.0,) * 4,
    max_shape=None,
    wh_ratio_clip=16 / 1000,
):
    """Inverse of hbox2delta. Reference: coder.py:9-76 / box_ops.py:343-433.

    Handles (..., 4) or (..., K*4) deltas against (..., 4) rois.
    """
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    k = deltas.shape[-1] // 4
    d = deltas.reshape(*deltas.shape[:-1], k, 4) * stds + means
    dx, dy, dw, dh = (d[..., i] for i in range(4))
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)
    px = ((rois[..., 0] + rois[..., 2]) * 0.5)[..., None]
    py = ((rois[..., 1] + rois[..., 3]) * 0.5)[..., None]
    pw = (rois[..., 2] - rois[..., 0])[..., None]
    ph = (rois[..., 3] - rois[..., 1])[..., None]
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy
    x1 = gx - gw * 0.5
    y1 = gy - gh * 0.5
    x2 = gx + gw * 0.5
    y2 = gy + gh * 0.5
    if max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1] - 1)
        y1 = jnp.clip(y1, 0, max_shape[0] - 1)
        x2 = jnp.clip(x2, 0, max_shape[1] - 1)
        y2 = jnp.clip(y2, 0, max_shape[0] - 1)
    out = jnp.stack([x1, y1, x2, y2], axis=-1)
    return out.reshape(*deltas.shape[:-1], k * 4) if k > 1 else out[..., 0, :]


def distance2hbox(points, distance, max_shape=None):
    """(l, t, r, b) distances from points -> x1y1x2y2 (FCOS-style)."""
    x1 = points[..., 0] - distance[..., 0]
    y1 = points[..., 1] - distance[..., 1]
    x2 = points[..., 0] + distance[..., 2]
    y2 = points[..., 1] + distance[..., 3]
    if max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1])
        y1 = jnp.clip(y1, 0, max_shape[0])
        x2 = jnp.clip(x2, 0, max_shape[1])
        y2 = jnp.clip(y2, 0, max_shape[0])
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def distance2obb(points, distance):
    """FCOS-OBB decode: (l, t, r, b, theta) -> rbox.

    Reference: `distance2obb` (box_ops.py:694-707).
    """
    dist = distance[..., :4]
    theta = distance[..., 4]
    c, s = jnp.cos(theta), jnp.sin(theta)
    w = dist[..., 0] + dist[..., 2]
    h = dist[..., 1] + dist[..., 3]
    ox = (dist[..., 2] - dist[..., 0]) / 2
    oy = (dist[..., 3] - dist[..., 1]) / 2
    cx = points[..., 0] + c * ox - s * oy
    cy = points[..., 1] + s * ox + c * oy
    return regular_obb(jnp.stack([cx, cy, w, h, theta], axis=-1))


def points_in_rbox(points, rboxes):
    """(n, 2) points x (m, 5) rboxes -> (n, m) bool containment.

    Reference: `points_in_rotated_boxes` (box_ops.py:725-741).
    """
    off = points[:, None, :2] - rboxes[None, :, :2]
    ang = jnp.arctan2(off[..., 1], off[..., 0])
    dist = jnp.linalg.norm(off, axis=-1)
    da = ang - rboxes[None, :, 4]
    dw = jnp.abs(dist * jnp.cos(da))
    dh = jnp.abs(dist * jnp.sin(da))
    return (dw < rboxes[None, :, 2] / 2) & (dh < rboxes[None, :, 3] / 2)


def integral(x, n, lo=-2.0, hi=2.0):
    """Distribution-to-scalar expectation (GFL/LD), 4 sides.

    Reference: `integral` (box_ops.py:709-716).
    """
    e = jnp.linspace(lo, hi, n + 1)
    y = x.reshape(-1, n + 1)
    y = jax.nn.softmax(y, axis=1)
    return (y * e).sum(axis=1).reshape(-1, 4)


def integral_angle(x, n, lo=-5.0, hi=2.0):
    """Reference: `integral_angle` (box_ops.py:717-723)."""
    e = jnp.linspace(lo, hi, n + 1)
    y = x.reshape(-1, n + 1)
    y = jax.nn.softmax(y, axis=1)
    return (y * e).sum(axis=1).reshape(-1)

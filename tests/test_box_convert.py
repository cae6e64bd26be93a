import numpy as np
import jax.numpy as jnp
import pytest

from jdet_tpu.ops import (
    norm_angle,
    rbox_to_poly,
    poly_to_rbox,
    rbox_to_hbox,
    hbox_to_rbox,
    get_best_begin_point,
    rbox2delta,
    delta2rbox,
    hbox2delta,
    delta2hbox,
    distance2obb,
    points_in_rbox,
)

rng = np.random.RandomState(0)


def random_rboxes(n, canonical=True):
    cx = rng.uniform(50, 950, n)
    cy = rng.uniform(50, 950, n)
    w = rng.uniform(8, 300, n)
    h = rng.uniform(4, 200, n)
    a = rng.uniform(-np.pi, np.pi, n)
    b = np.stack([cx, cy, np.maximum(w, h), np.minimum(w, h), a], 1)
    if canonical:
        b[:, 4] = np.asarray(norm_angle(b[:, 4]))
    return b.astype(np.float32)


def test_norm_angle_range():
    a = np.linspace(-10, 10, 1001)
    out = np.asarray(norm_angle(jnp.asarray(a)))
    assert (out >= -np.pi / 4 - 1e-6).all()
    assert (out < 3 * np.pi / 4 + 1e-6).all()
    # equivalence mod pi
    assert np.allclose(np.cos(2 * out), np.cos(2 * a), atol=1e-5)


def test_rbox_poly_roundtrip():
    rb = random_rboxes(200)
    polys = np.asarray(rbox_to_poly(jnp.asarray(rb)))
    back = np.asarray(poly_to_rbox(jnp.asarray(polys)))
    # center, size always recoverable
    assert np.allclose(back[:, :2], rb[:, :2], atol=1e-2)
    assert np.allclose(np.sort(back[:, 2:4]), np.sort(rb[:, 2:4]), atol=1e-2)
    # orientation equal mod pi/2 swap handled by w>=h canonical sizes
    poly2 = np.asarray(rbox_to_poly(jnp.asarray(back)))
    # same rectangle: vertex sets must match as sets
    for p1, p2 in zip(polys.reshape(-1, 4, 2), poly2.reshape(-1, 4, 2)):
        d = np.abs(p1[:, None, :] - p2[None, :, :]).sum(-1)
        assert (d.min(1) < 1e-1).all()


def test_poly_matches_reference_formula():
    # reference rotated_box_to_poly_np without begin-point reordering
    rb = random_rboxes(50)
    polys = np.asarray(rbox_to_poly(jnp.asarray(rb)))
    for box, poly in zip(rb, polys):
        cx, cy, w, h, a = box
        rect = np.array(
            [[-w / 2, w / 2, w / 2, -w / 2], [-h / 2, -h / 2, h / 2, h / 2]]
        )
        R = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])
        ref = (R @ rect + np.array([[cx], [cy]])).T.reshape(8)
        assert np.allclose(poly, ref, atol=1e-3)


def test_hbox_roundtrip():
    rb = random_rboxes(100)
    hb = np.asarray(rbox_to_hbox(jnp.asarray(rb)))
    assert (hb[:, 2] > hb[:, 0]).all() and (hb[:, 3] > hb[:, 1]).all()
    rb2 = np.asarray(hbox_to_rbox(jnp.asarray(hb)))
    assert (rb2[:, 2] >= rb2[:, 3] - 1e-4).all()
    hb2 = np.asarray(rbox_to_hbox(jnp.asarray(rb2)))
    assert np.allclose(hb, hb2, atol=1e-2)


def test_rbox_delta_roundtrip():
    props = random_rboxes(300)
    gts = random_rboxes(300)
    means = (0.1, -0.1, 0.0, 0.05, 0.0)
    stds = (0.5, 0.5, 1.0, 1.0, 0.3)
    d = rbox2delta(jnp.asarray(props), jnp.asarray(gts), means, stds)
    dec = np.asarray(delta2rbox(jnp.asarray(props), d, means, stds))
    assert np.allclose(dec[:, :2], gts[:, :2], atol=1e-2)
    assert np.allclose(dec[:, 2:4], gts[:, 2:4], rtol=1e-3, atol=1e-2)
    assert np.allclose(np.cos(2 * dec[:, 4]), np.cos(2 * gts[:, 4]), atol=1e-4)
    assert np.allclose(np.sin(2 * dec[:, 4]), np.sin(2 * gts[:, 4]), atol=1e-4)


def test_hbox_delta_roundtrip():
    def rand_hboxes(n):
        x1 = rng.uniform(0, 400, n)
        y1 = rng.uniform(0, 400, n)
        w = rng.uniform(5, 100, n)
        h = rng.uniform(5, 100, n)
        return np.stack([x1, y1, x1 + w, y1 + h], 1).astype(np.float32)

    props = rand_hboxes(200)
    gts = rand_hboxes(200)
    d = hbox2delta(jnp.asarray(props), jnp.asarray(gts))
    dec = np.asarray(delta2hbox(jnp.asarray(props), d))
    assert np.allclose(dec, gts, atol=1e-2)


def test_multiclass_delta2rbox_shape():
    rois = jnp.asarray(random_rboxes(10))
    deltas = jnp.asarray(rng.randn(10, 15).astype(np.float32) * 0.1)
    out = delta2rbox(rois, deltas)
    assert out.shape == (10, 15)


def test_best_begin_point_axis_aligned():
    # axis-aligned rect: canonical order should start at (xmin, ymin)
    poly = np.array([[10.0, 40.0, 10.0, 10.0, 30.0, 10.0, 30.0, 40.0]])
    out = np.asarray(get_best_begin_point(jnp.asarray(poly)))[0]
    assert np.allclose(out, [10, 10, 30, 10, 30, 40, 10, 40])


def test_points_in_rbox():
    boxes = jnp.asarray([[50.0, 50.0, 20.0, 10.0, 0.0]])
    pts = jnp.asarray([[50.0, 50.0], [59.0, 50.0], [61.0, 50.0], [50.0, 56.0]])
    got = np.asarray(points_in_rbox(pts, boxes))[:, 0]
    assert got.tolist() == [True, True, False, False]
    # rotated 90deg: w/h swap
    boxes = jnp.asarray([[50.0, 50.0, 20.0, 10.0, np.pi / 2]])
    got = np.asarray(points_in_rbox(pts, boxes))[:, 0]
    assert got.tolist() == [True, False, False, True]


def test_distance2obb():
    pts = jnp.asarray([[100.0, 100.0]])
    dist = jnp.asarray([[10.0, 5.0, 10.0, 5.0, 0.0]])
    out = np.asarray(distance2obb(pts, dist))[0]
    assert np.allclose(out, [100, 100, 20, 10, 0], atol=1e-4)

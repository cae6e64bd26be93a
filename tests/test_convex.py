"""Convex-geometry ops: hull, convex IoU/GIoU, min-area rect."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jdet_tpu.ops.convex import (
    convex_hull_mask, hull_area, convex_iou, convex_giou, min_area_rect,
)

rng = np.random.RandomState(23)


def test_hull_of_square_plus_interior():
    pts = np.array([
        [0, 0], [4, 0], [4, 4], [0, 4],          # square corners
        [2, 2], [1, 1], [3, 2], [2, 1], [1, 3],  # interior
    ], np.float32)[None]
    a = float(hull_area(jnp.asarray(pts))[0])
    assert abs(a - 16.0) < 1e-4
    order, v, p = convex_hull_mask(jnp.asarray(pts))
    assert int(np.asarray(v).sum()) == 4


def test_hull_matches_scipy_style_oracle():
    for _ in range(10):
        pts = rng.rand(9, 2).astype(np.float32) * 100
        a = float(hull_area(jnp.asarray(pts[None]))[0])
        # oracle: monotone chain in numpy
        P = sorted(map(tuple, pts.astype(np.float64)))
        def half(P):
            h = []
            for q in P:
                while len(h) >= 2 and (
                    (h[-1][0]-h[-2][0])*(q[1]-h[-2][1])
                    - (h[-1][1]-h[-2][1])*(q[0]-h[-2][0])) <= 0:
                    h.pop()
                h.append(q)
            return h
        hull = half(P)[:-1] + half(P[::-1])[:-1]
        ref = 0.5 * abs(sum(
            hull[i][0]*hull[(i+1) % len(hull)][1]
            - hull[(i+1) % len(hull)][0]*hull[i][1]
            for i in range(len(hull))))
        assert abs(a - ref) < max(1e-3 * ref, 1e-2), (a, ref)


def test_convex_iou_exact_square():
    # 9 points forming a 10x10 square at origin vs identical quad
    pts = np.array([[0, 0], [10, 0], [10, 10], [0, 10],
                    [5, 5], [5, 0], [10, 5], [5, 10], [0, 5]], np.float32)
    quad = np.array([[0, 0, 10, 0, 10, 10, 0, 10]], np.float32)
    iou = np.asarray(convex_iou(jnp.asarray(pts.reshape(1, 18)), jnp.asarray(quad)))
    assert abs(iou[0, 0] - 1.0) < 1e-3
    # shifted quad: expected overlap 50/150
    quad2 = np.array([[5, 0, 15, 0, 15, 10, 5, 10]], np.float32)
    iou2 = np.asarray(convex_iou(jnp.asarray(pts.reshape(1, 18)), jnp.asarray(quad2)))
    assert abs(iou2[0, 0] - 50.0 / 150.0) < 1e-3


def test_convex_giou_and_grad():
    pts = (rng.rand(4, 9, 2) * 40 + 30).astype(np.float32)
    quad = np.array([[30, 30, 70, 30, 70, 70, 30, 70]] * 4, np.float32)
    g = np.asarray(convex_giou(jnp.asarray(pts.reshape(4, 18)), jnp.asarray(quad)))
    assert (g <= 1.0 + 1e-5).all() and (g >= -1.0 - 1e-5).all()
    grad = jax.grad(
        lambda p: (1 - convex_giou(p, jnp.asarray(quad))).sum()
    )(jnp.asarray(pts.reshape(4, 18)))
    arr = np.asarray(grad)
    assert np.isfinite(arr).all()
    assert np.abs(arr).sum() > 0


@pytest.mark.notquick  # 45-450 s on the 1-core CI host; the
# quick tier budget is 10 min (pyproject.toml) and this runs in
# the default tier instead
def test_giou_improves_under_gd():
    """Gradient descent on 1-GIoU should pull a point set onto the gt."""
    quad = jnp.asarray([[20, 20, 60, 20, 60, 50, 20, 50]], jnp.float32)
    pts = jnp.asarray((rng.rand(1, 18) * 20 + 70).astype(np.float32))
    loss_fn = lambda p: (1 - convex_giou(p, quad)).sum()
    l0 = float(loss_fn(pts))
    g = jax.jit(jax.grad(loss_fn))
    for _ in range(150):
        pts = pts - 100.0 * g(pts)
    l1 = float(loss_fn(pts))
    # only hull vertices receive gradient (same as the reference analytic
    # kernel), so convergence is gradual; require clear improvement
    assert l1 < l0 - 0.1, (l0, l1)


def test_min_area_rect():
    # rotated rect corners + center points
    from jdet_tpu.ops.box_convert import rbox_to_poly

    rb = jnp.asarray([[50.0, 40.0, 30.0, 14.0, 0.5]])
    poly = np.asarray(rbox_to_poly(rb)).reshape(4, 2)
    pts = np.concatenate([poly, poly[:4] * 0.5 + poly.mean(0) * 0.5,
                          poly.mean(0, keepdims=True)], 0)[None]
    out = np.asarray(min_area_rect(jnp.asarray(pts.astype(np.float32))))[0]
    assert abs(out[0] - 50) < 0.5 and abs(out[1] - 40) < 0.5
    assert abs(out[2] - 30) < 0.5 and abs(out[3] - 14) < 0.5
    assert abs(np.cos(2 * (out[4] - 0.5)) - 1) < 1e-3


@pytest.mark.notquick  # 45-450 s on the 1-core CI host; the
# quick tier budget is 10 min (pyproject.toml) and this runs in
# the default tier instead
def test_reppoints_head_end_to_end():
    from jdet_tpu.models.builder import build_detector

    m = build_detector(
        dict(
            type="RotatedRepPoints",
            backbone=dict(type="ResNet", depth=18, frozen_stages=-1),
            neck=dict(type="FPN", out_channels=32, num_outs=5, start_level=1,
                      add_extra_convs="on_input"),
            bbox_head=dict(
                type="RotatedRepPointsHead", num_classes=15, in_channels=32,
                feat_channels=32, point_feat_channels=32, stacked_convs=1,
                test_cfg=dict(nms_pre=64, max_per_img=8),
            ),
        ),
        seed=0,
    )
    images = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32))
    gt = np.zeros((1, 6, 5), np.float32)
    gt[0, 0] = [60, 60, 40, 20, 0.4]
    gt[0, 1] = [90, 40, 30, 16, -0.2]
    targets = {
        "gt_bboxes": jnp.asarray(gt),
        "gt_labels": jnp.asarray(np.array([[3, 7, 0, 0, 0, 0]], np.int32)),
        "gt_mask": jnp.asarray(np.array([[True, True] + [False] * 4])),
    }
    losses = m.loss(images, targets)
    assert set(losses) == {"loss_cls", "loss_pts_init", "loss_pts_refine"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    grads = __import__("flax.nnx", fromlist=["nnx"]).grad(
        lambda mm: sum(mm.loss(images, targets).values())
    )(m)
    assert all(
        np.isfinite(np.asarray(l)).all()
        for l in jax.tree_util.tree_leaves(grads)
    )
    det = m.predict(images)
    assert det["polys"].shape == (1, 8, 8)
    assert np.isfinite(np.asarray(det["scores"])).all()

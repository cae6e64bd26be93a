import numpy as np
import jax
import pytest
import jax.numpy as jnp

from jdet_tpu.models.losses import (
    sigmoid_focal_loss,
    smooth_l1_loss,
    l1_loss,
    cross_entropy_loss,
    gwd_loss,
    kld_loss,
    bcd_loss,
    kf_iou_loss,
    rotated_iou_loss,
    smooth_focal_loss,
)

rng = np.random.RandomState(5)


def test_focal_loss_matches_manual():
    # manual: BCE * (1-pt)^gamma * alpha_t with one-hot (label-1)
    logits = rng.randn(6, 3).astype(np.float32)
    labels = np.array([0, 1, 2, 3, 0, 1], np.int32)
    out = float(
        sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(labels), avg_factor=4)
    )
    p = 1 / (1 + np.exp(-logits))
    t = np.zeros_like(logits)
    for i, l in enumerate(labels):
        if l > 0:
            t[i, l - 1] = 1
    ce = -(t * np.log(p + 1e-12) + (1 - t) * np.log(1 - p + 1e-12))
    pt = p * t + (1 - p) * (1 - t)
    alpha_t = 0.25 * t + 0.75 * (1 - t)
    ref = (alpha_t * ce * (1 - pt) ** 2).sum() / 4
    assert np.allclose(out, ref, rtol=1e-4)


def test_focal_loss_weight_zero_masks():
    logits = rng.randn(10, 5).astype(np.float32)
    labels = np.ones(10, np.int32)
    w = np.zeros(10, np.float32)
    w[:3] = 1
    full = float(sigmoid_focal_loss(jnp.asarray(logits[:3]), jnp.asarray(labels[:3]),
                                    avg_factor=3))
    masked = float(sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(labels),
                                      weight=jnp.asarray(w), avg_factor=3))
    assert np.allclose(full, masked, rtol=1e-5)


def test_smooth_l1():
    pred = jnp.asarray([0.0, 1.0, -2.0])
    tgt = jnp.asarray([0.05, 0.0, 0.0])
    beta = 0.5
    out = np.asarray(smooth_l1_loss(pred, tgt, beta=beta, reduction="none"))
    assert np.allclose(out[0], 0.5 * 0.05**2 / beta, atol=1e-6)
    assert np.allclose(out[1], 1 - 0.5 * beta, atol=1e-6)
    assert np.allclose(out[2], 2 - 0.5 * beta, atol=1e-6)


def test_l1_and_avg_factor():
    pred = jnp.ones((4, 5))
    tgt = jnp.zeros((4, 5))
    w = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    out = float(l1_loss(pred, tgt, weight=w, avg_factor=2))
    assert np.allclose(out, 10.0 / 2)


def test_cross_entropy():
    logits = rng.randn(7, 4).astype(np.float32)
    labels = rng.randint(0, 4, 7).astype(np.int32)
    out = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    e = np.exp(logits - logits.max(1, keepdims=True))
    p = e / e.sum(1, keepdims=True)
    ref = -np.log(p[np.arange(7), labels] + 1e-12).mean()
    assert np.allclose(out, ref, rtol=1e-4)


def _boxes(n):
    return np.stack(
        [
            rng.uniform(0, 100, n),
            rng.uniform(0, 100, n),
            rng.uniform(10, 50, n),
            rng.uniform(5, 30, n),
            rng.uniform(-np.pi / 4, 3 * np.pi / 4, n),
        ],
        1,
    ).astype(np.float32)


def test_gaussian_losses_zero_at_identity():
    b = _boxes(20)
    for fn, kw in [(gwd_loss, {}), (kld_loss, {}), (bcd_loss, {})]:
        out = np.asarray(
            fn(jnp.asarray(b), jnp.asarray(b), reduction="none", tau=0.0, **kw)
        )
        assert (out < 2e-2).all(), (fn.__name__, out.max())


def test_gaussian_losses_increase_with_distance():
    b = _boxes(10)
    near = b.copy()
    near[:, 0] += 2
    far = b.copy()
    far[:, 0] += 30
    for fn in (gwd_loss, kld_loss, bcd_loss):
        ln = float(fn(jnp.asarray(near), jnp.asarray(b), tau=0.0))
        lf = float(fn(jnp.asarray(far), jnp.asarray(b), tau=0.0))
        assert lf > ln, fn.__name__


def test_gaussian_losses_angle_periodic():
    # theta and theta+pi are the same box -> identical loss
    b = _boxes(10)
    b2 = b.copy()
    b2[:, 4] += np.pi
    out = np.asarray(gwd_loss(jnp.asarray(b2), jnp.asarray(b), reduction="none", tau=0.0))
    assert (out < 2e-2).all()


def test_gaussian_losses_grad_finite():
    b = _boxes(8)
    t = _boxes(8)
    for fn in (gwd_loss, kld_loss, bcd_loss):
        g = jax.grad(lambda p: fn(p, jnp.asarray(t)))(jnp.asarray(b))
        assert np.isfinite(np.asarray(g)).all(), fn.__name__


def test_kfiou_identity_and_grad():
    b = _boxes(12)
    pred = jnp.asarray(b)
    # identical boxes: KFIoU of identical Gaussians = 1/3 -> loss = 2/3
    out = float(kf_iou_loss(pred, pred, pred_decode=pred, targets_decode=pred,
                            avg_factor=12))
    assert np.allclose(out, 2 / 3, atol=1e-2)
    t = jnp.asarray(_boxes(12))
    g = jax.grad(
        lambda p: kf_iou_loss(p, t, pred_decode=p, targets_decode=t)
    )(pred)
    assert np.isfinite(np.asarray(g)).all()


def test_rotated_iou_loss():
    b = _boxes(6)
    out = np.asarray(
        rotated_iou_loss(jnp.asarray(b), jnp.asarray(b), mode="linear",
                         reduction="none")
    )
    assert (out < 1e-3).all()
    g = jax.grad(lambda p: rotated_iou_loss(p, jnp.asarray(b)))(jnp.asarray(b + 1))
    assert np.isfinite(np.asarray(g)).all()


def test_smooth_focal_loss_soft_targets():
    pred = rng.randn(5, 8).astype(np.float32)
    tgt = rng.uniform(0, 1, (5, 8)).astype(np.float32)
    out = float(smooth_focal_loss(jnp.asarray(pred), jnp.asarray(tgt), avg_factor=5))
    assert np.isfinite(out) and out > 0


def test_kld_compat_ref_matches_reference_quirk():
    """compat_ref=True reproduces the reference's inv(Sigma)/det(Sigma)
    artifact (reference gaussian_dist_loss.py:156-157) exactly; numpy
    transcription of that formula is the oracle."""
    p = _boxes(16)
    t = _boxes(16)

    def np_kld_ref(pred, target):
        def gauss(b):
            xy = b[:, :2]
            w, h, r = b[:, 2] / 2, b[:, 3] / 2, b[:, 4]
            R = np.stack([np.stack([np.cos(r), -np.sin(r)], -1),
                          np.stack([np.sin(r), np.cos(r)], -1)], -2)
            S = np.zeros((len(b), 2, 2))
            S[:, 0, 0] = w
            S[:, 1, 1] = h
            Sigma = R @ (S ** 2) @ np.transpose(R, (0, 2, 1))
            return xy, Sigma

        xy_p, Sp = gauss(pred)
        xy_t, St = gauss(target)
        Sp_inv = np.linalg.inv(Sp)
        Sp_inv = Sp_inv / np.linalg.det(Sp)[:, None, None]  # the quirk
        d = (xy_p - xy_t)[:, :, None]
        xy_d = 0.5 * (np.transpose(d, (0, 2, 1)) @ Sp_inv @ d)[:, 0, 0]
        whr = 0.5 * np.trace(Sp_inv @ St, axis1=1, axis2=2)
        whr = whr + 0.5 * (np.log(np.linalg.det(Sp)) - np.log(np.linalg.det(St)))
        whr = whr - 1
        dist = np.sqrt(np.clip(xy_d + whr, 1e-7, None))
        return np.log1p(dist)

    want = np_kld_ref(p.astype(np.float64), t.astype(np.float64))
    got = np.asarray(
        kld_loss(jnp.asarray(p), jnp.asarray(t), reduction="none", tau=0.0,
                 compat_ref=True)
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    plain = np.asarray(
        kld_loss(jnp.asarray(p), jnp.asarray(t), reduction="none", tau=0.0)
    )
    assert not np.allclose(plain, want, rtol=1e-2)


@pytest.mark.notquick  # ~45 s on the 1-core CI host; the quick tier
# budget is 10 min (pyproject.toml) — runs in the default tier
def test_poly_iou_loss_matches_rotated_iou_oracle():
    """Differentiable quad-clip IoU == exact Green's-theorem rotated IoU
    (reference poly_iou_loss vs box_iou_rotated are two routes to the
    same number)."""
    from jdet_tpu.models.losses import poly_iou_loss, poly_giou_loss
    from jdet_tpu.ops.box_iou_rotated import box_iou_rotated_aligned

    p = _boxes(24)
    t = _boxes(24)
    # mix of overlapping and disjoint pairs
    t[:12, :2] = p[:12, :2] + rng.uniform(-10, 10, (12, 2))
    iou_oracle = np.asarray(
        box_iou_rotated_aligned(jnp.asarray(p), jnp.asarray(t))
    )
    loss = np.asarray(
        poly_iou_loss(jnp.asarray(p), jnp.asarray(t), linear=True,
                      reduction="none")
    )
    np.testing.assert_allclose(1 - loss, iou_oracle, atol=2e-3)

    # identity: iou loss ~ 0, giou loss ~ 0
    li = np.asarray(poly_iou_loss(jnp.asarray(p), jnp.asarray(p),
                                  linear=True, reduction="none"))
    lg = np.asarray(poly_giou_loss(jnp.asarray(p), jnp.asarray(p),
                                   reduction="none"))
    assert (li < 1e-2).all() and (lg < 1e-2).all()

    # gradients flow and are finite
    g = jax.grad(lambda x: poly_giou_loss(x, jnp.asarray(t)))(jnp.asarray(p))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0

    # giou penalizes disjoint pairs more as they separate
    far = p.copy()
    far[:, 0] += 200
    l_far = float(poly_giou_loss(jnp.asarray(far), jnp.asarray(p)))
    near = p.copy()
    near[:, 0] += 60
    l_near = float(poly_giou_loss(jnp.asarray(near), jnp.asarray(p)))
    assert l_far > l_near > 0


def test_poly_iou_loss_accepts_polys():
    from jdet_tpu.models.losses import poly_iou_loss
    from jdet_tpu.data.transforms import rbox_to_poly_np

    p = _boxes(8)
    out5 = np.asarray(poly_iou_loss(jnp.asarray(p), jnp.asarray(p),
                                    linear=True, reduction="none"))
    out8 = np.asarray(
        poly_iou_loss(jnp.asarray(rbox_to_poly_np(p)),
                      jnp.asarray(rbox_to_poly_np(p)),
                      linear=True, reduction="none")
    )
    np.testing.assert_allclose(out5, out8, atol=1e-4)


def test_ridet_loss_representation_invariant():
    """The Hungarian geometry metric must give identical loss for the two
    equivalent obb parameterizations (w,h,theta) and (h,w,theta+pi/2) —
    the whole point of RIDet (reference ridet_loss.py:40-45)."""
    from jdet_tpu.models.losses import ridet_loss

    p = _boxes(16)
    t = _boxes(16)
    base = np.asarray(ridet_loss(jnp.asarray(p), jnp.asarray(t),
                                 reduction="none"))
    t_swap = t[:, [0, 1, 3, 2, 4]].copy()
    t_swap[:, 4] += np.pi / 2
    swapped = np.asarray(ridet_loss(jnp.asarray(p), jnp.asarray(t_swap),
                                    reduction="none"))
    np.testing.assert_allclose(base, swapped, rtol=1e-3, atol=1e-3)

    # identity ~ 0, grows with center distance, finite grads
    ident = np.asarray(ridet_loss(jnp.asarray(p), jnp.asarray(p),
                                  reduction="none"))
    assert (np.abs(ident) < 1e-2).all()
    off = p.copy()
    off[:, 0] += 15
    moved = float(ridet_loss(jnp.asarray(off), jnp.asarray(p)))
    assert moved > float(ridet_loss(jnp.asarray(p), jnp.asarray(p)))
    g = jax.grad(lambda x: ridet_loss(x, jnp.asarray(t)))(jnp.asarray(p))
    assert np.isfinite(np.asarray(g)).all()


def test_losses_registry_parity():
    """Reference SURVEY §2.6: losses are LOSSES-registered and buildable
    via build_from_cfg (reference utils/registry.py builder semantics)."""
    import jax.numpy as jnp

    from jdet_tpu.utils.registry import LOSSES, build_from_cfg

    expected = {
        "FocalLoss", "SmoothL1Loss", "L1Loss", "CrossEntropyLoss",
        "SmoothFocalLoss", "GDLoss", "GDLoss_v1", "KFLoss", "IoULoss",
        "PolyIoULoss", "PolyGIoULoss", "ConvexGIoULoss",
        "KnowledgeDistillationKLDivLoss", "IMLoss", "RSDetLoss",
        "RIDetLoss",
    }
    missing = expected - set(LOSSES._modules)
    assert not missing, missing

    f = build_from_cfg(dict(type="SmoothL1Loss", beta=0.2), LOSSES)
    assert abs(float(f(jnp.ones(4), jnp.zeros(4))) - 0.9) < 1e-5
    g = build_from_cfg(dict(type="GDLoss", loss_type="kld"), LOSSES)
    v = float(g(jnp.asarray([[5.0, 5.0, 4.0, 2.0, 0.1]]),
                jnp.asarray([[5.0, 5.0, 4.0, 2.0, 0.0]])))
    assert 0 < v < 1

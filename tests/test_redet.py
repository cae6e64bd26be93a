"""Equivariant stack (REConv/ReResNet/ReFPN/RiRoIAlign) + ReDet."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from jdet_tpu.models.equivariant import (
    REConv2d, REConv2dLift, InnerBatchNorm, rotation_interp_matrix,
)
from jdet_tpu.ops.riroi_align import riroi_align
from jdet_tpu.models.builder import build_detector

rng = np.random.RandomState(17)


def orient_roll(x, k):
    """Roll the orientation channels (fields-major, orient fastest)."""
    B, H, W, C = x.shape
    return np.roll(x.reshape(B, H, W, C // 8, 8), k, axis=-1).reshape(x.shape)


def test_rotation_matrix_identity_and_90():
    M0 = rotation_interp_matrix(7, 0.0)
    assert np.allclose(M0, np.eye(49), atol=1e-6)
    import math

    M90 = rotation_interp_matrix(3, math.pi / 2)
    w = np.arange(9.0)
    # rotating a 3x3 by 90deg CCW (math convention on the grid)
    rot = (M90 @ w).reshape(3, 3)
    assert np.allclose(sorted(rot.ravel()), sorted(w), atol=1e-5)


def test_reconv_equivariance_90deg():
    """Rotating the input by 90deg must rotate the output spatially and
    roll its orientation channels by 2 (90/45)."""
    conv = REConv2d(2, 3, 3, rngs=nnx.Rngs(0))
    x = rng.rand(1, 12, 12, 16).astype(np.float32)
    xr = np.rot90(x, 1, axes=(1, 2)).copy()
    # a 90deg CCW image rotation rolls the 8 orientation channels by -2
    # (= +6) in this layout's convention
    xr = orient_roll(xr, 6)
    y = np.asarray(conv(jnp.asarray(x)))
    yr = np.asarray(conv(jnp.asarray(xr)))
    expect = orient_roll(np.rot90(y, 1, axes=(1, 2)).copy(), 6)
    a = yr[0, 2:-2, 2:-2]
    b = expect[0, 2:-2, 2:-2]
    assert np.allclose(a, b, atol=1e-3), np.abs(a - b).max()


def test_lifting_equivariance_90deg():
    lift = REConv2dLift(3, 4, 7, stride=1, rngs=nnx.Rngs(1))
    x = rng.rand(1, 16, 16, 3).astype(np.float32)
    xr = np.rot90(x, 1, axes=(1, 2)).copy()
    y = np.asarray(lift(jnp.asarray(x)))
    yr = np.asarray(lift(jnp.asarray(xr)))
    expect = orient_roll(np.rot90(y, 1, axes=(1, 2)).copy(), 6)
    a = yr[0, 4:-4, 4:-4]
    b = expect[0, 4:-4, 4:-4]
    assert np.allclose(a, b, atol=1e-3), np.abs(a - b).max()


def test_inner_bn_shares_orientations():
    bn = InnerBatchNorm(4, rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.rand(2, 4, 4, 32).astype(np.float32))
    out = bn(x, use_running_average=False)
    assert out.shape == x.shape
    # rolling orientations commutes with the norm (shared stats)
    xr = jnp.asarray(orient_roll(np.asarray(x), 3))
    outr = bn(xr, use_running_average=False)
    assert np.allclose(
        np.asarray(outr), orient_roll(np.asarray(out), 3), atol=1e-5
    )


def test_riroi_align_shifts_orientation():
    # constant-per-orientation feature: after riroi with theta=45deg the
    # orientation channels shift by one step
    B, H, W, f = 1, 16, 16, 2
    feat = np.zeros((B, H, W, f * 8), np.float32)
    for o in range(8):
        feat[..., o::8] = o  # orientation o has value o (fields share)
    rois0 = jnp.asarray([[[8.0, 8.0, 8.0, 8.0, 0.0]]])
    rois45 = jnp.asarray([[[8.0, 8.0, 8.0, 8.0, np.pi / 4]]])
    out0 = np.asarray(riroi_align(jnp.asarray(feat), rois0, 3))[0, 0, 1, 1]
    out45 = np.asarray(riroi_align(jnp.asarray(feat), rois45, 3))[0, 0, 1, 1]
    v0 = out0.reshape(f, 8)[0]
    v45 = out45.reshape(f, 8)[0]
    assert np.allclose(v0, np.arange(8), atol=1e-4)
    assert np.allclose(v45, np.roll(np.arange(8), -1), atol=1e-4), v45


def test_redet_end_to_end():
    m = build_detector(
        dict(
            type="ReDet",
            backbone=dict(type="ReResNet", depth=50, base_fields=2),
            neck=dict(type="ReFPN", out_channels=32, num_outs=5),
            rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                          nms_pre=128, nms_post=48),
            bbox_head=dict(
                type="ReDetHead", num_classes=15, in_channels=32,
                fc_out_channels=64,
                train_cfg=dict(sampler=dict(num=32, pos_fraction=0.25)),
                test_cfg=dict(max_per_img=16),
            ),
        ),
        seed=0,
    )
    images = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32))
    gt = np.zeros((1, 8, 5), np.float32)
    gt[0, 0] = [60, 60, 40, 20, 0.4]
    gt[0, 1] = [90, 40, 30, 15, -0.2]
    targets = {
        "gt_bboxes": jnp.asarray(gt),
        "gt_labels": jnp.asarray(np.array([[3, 7] + [0] * 6], np.int32)),
        "gt_mask": jnp.asarray(np.array([[True, True] + [False] * 6])),
    }
    losses = m.loss(images, targets)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    det = m.predict(images)
    assert det["polys"].shape == (1, 16, 8)


def test_cache_expanded_weights_exact():
    """Inference-time expansion cache: cached predict is bit-identical to
    the live expansion path, and disabling restores it."""
    from flax import nnx

    from jdet_tpu.models.equivariant import (
        REConv2d,
        REConv2dLift,
        cache_expanded_weights,
    )
    from jdet_tpu.ops.orn import ORConv2d

    rngs = nnx.Rngs(0)

    class M(nnx.Module):
        def __init__(self):
            self.a = REConv2dLift(3, 4, 7, stride=2, rngs=rngs)
            self.b = REConv2d(4, 8, 3, rngs=rngs)
            self.c = ORConv2d(64, 8, 3, arf_config=(8, 8), rngs=rngs)

        def __call__(self, x):
            return self.c(self.b(self.a(x)))

    m = M()
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    y0 = m(x)
    assert cache_expanded_weights(m) == 3
    gd, st = nnx.split(m)

    @jax.jit
    def pred(st, x):
        return nnx.merge(gd, st)(x)

    np.testing.assert_array_equal(np.asarray(pred(st, x)), np.asarray(y0))
    cache_expanded_weights(m, enable=False)
    np.testing.assert_array_equal(np.asarray(m(x)), np.asarray(y0))
    # disabling must DROP the buffers (stale expansions poison graphs
    # rebuilt later, and checkpoints should not carry them — ADVICE r3)
    assert m.a.wexp.value.size == 0
    assert m.b.wexp.value.size == 0
    assert m.c.wexp.value.size == 0
    # and a train graph built after a cache cycle still differentiates
    # through the BASE weights (the round-3 medium finding: cache_on baked
    # into a rebuilt train graphdef zeroed base-weight grads)
    def lf(mm):
        return jnp.sum(mm(x) ** 2)

    grads = nnx.grad(lf)(m)
    gb = np.asarray(grads["b"]["weight"].value)
    assert np.any(gb != 0.0)

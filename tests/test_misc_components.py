"""RSDet/KD losses, PSRoIAlign/RoIPool/FeatureRefine, H2RBox."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from jdet_tpu.models.losses import (
    rsdet_loss, knowledge_distillation_kl_div_loss, im_loss,
    jd_loss, kld_symmax_loss, kld_symmin_loss,
)
from jdet_tpu.ops import psroi_align, roi_pool, FeatureRefineModule
from jdet_tpu.models.builder import build_detector

rng = np.random.RandomState(2)


def test_rsdet_loss_swap_invariance():
    # a prediction matching the swapped representation should score low
    anchors = jnp.asarray([[50.0, 50, 30, 10, 0]])
    t = jnp.asarray([[0.1, 0.2, 0.3, 0.1, 0.4]])
    p_same = t
    out = float(rsdet_loss(p_same, t, anchors, avg_factor=1))
    assert out < 1e-5
    g = jax.grad(lambda p: rsdet_loss(p, t, anchors))(t + 0.5)
    assert np.isfinite(np.asarray(g)).all()


def test_kd_losses():
    pred = jnp.asarray(rng.randn(6, 10).astype(np.float32))
    soft = jnp.asarray(rng.randn(6, 10).astype(np.float32))
    kd = float(knowledge_distillation_kl_div_loss(pred, soft, avg_factor=6))
    assert np.isfinite(kd) and kd >= 0
    assert float(knowledge_distillation_kl_div_loss(soft, soft, avg_factor=6)) < 1e-5
    im = float(im_loss(pred, soft))
    assert np.isfinite(im) and im > 0


def test_sym_kld_variants():
    b = jnp.asarray(rng.rand(8, 5).astype(np.float32) * 50 + 10)
    t = b.at[:, 0].add(5.0)
    for fn in (jd_loss, kld_symmax_loss, kld_symmin_loss):
        v_same = float(fn(b, b, tau=0.0))
        v_diff = float(fn(t, b, tau=0.0))
        assert v_same < 0.05, fn.__name__
        assert v_diff > v_same, fn.__name__


def test_psroi_align():
    P, c_out = 3, 2
    feat = jnp.asarray(rng.rand(1, 16, 16, c_out * P * P).astype(np.float32))
    rois = jnp.asarray([[[2.0, 2.0, 14.0, 14.0]]])
    out = psroi_align(feat, rois, out_size=P)
    assert out.shape == (1, 1, P, P, c_out)
    assert np.isfinite(np.asarray(out)).all()


def test_roi_pool_is_max():
    feat = np.zeros((1, 8, 8, 1), np.float32)
    feat[0, 3, 3, 0] = 9.0
    rois = jnp.asarray([[[0.0, 0.0, 8.0, 8.0]]])
    out = np.asarray(roi_pool(jnp.asarray(feat), rois, out_size=2))
    assert out.max() == pytest.approx(9.0, abs=1e-4)


def test_feature_refine_module():
    frm = FeatureRefineModule(8, featmap_strides=(8,), rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.rand(1, 16, 16, 8).astype(np.float32))
    boxes = jnp.asarray(
        np.tile(np.array([64, 64, 32, 16, 0.3], np.float32), (1, 16, 16, 1))
    )
    out = frm([x], [boxes])
    assert out[0].shape == x.shape
    assert np.isfinite(np.asarray(out[0])).all()


def test_h2rbox_trains():
    m = build_detector(
        dict(
            type="H2RBox",
            backbone=dict(type="ResNet", depth=18, frozen_stages=-1),
            neck=dict(type="FPN", out_channels=32, num_outs=5, start_level=1,
                      add_extra_convs="on_input"),
            bbox_head=dict(type="FCOSHead", num_classes=15, in_channels=32,
                           feat_channels=32, stacked_convs=1,
                           test_cfg=dict(nms_pre=128, max_per_img=16)),
        ),
        seed=0,
    )
    images = jnp.asarray(rng.rand(2, 128, 128, 3).astype(np.float32))
    gt = np.zeros((2, 8, 5), np.float32)
    gt[:, 0] = [60, 60, 40, 20, 0.4]
    targets = {
        "gt_bboxes": jnp.asarray(gt),
        "gt_labels": jnp.asarray(np.full((2, 8), 1, np.int32)),
        "gt_mask": jnp.asarray(np.array([[True] + [False] * 7] * 2)),
    }
    losses = m.loss(images, targets, key=jax.random.PRNGKey(0))
    assert "loss_ss" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    det = m.predict(images)
    assert det["polys"].shape == (2, 16, 8)


def test_rotate_image_roundtrip():
    from jdet_tpu.models.detectors.h2rbox import rotate_image

    x = jnp.asarray(rng.rand(1, 17, 17, 2).astype(np.float32))
    r = rotate_image(rotate_image(x, jnp.asarray(np.pi / 2)), jnp.asarray(-np.pi / 2))
    # interior should round-trip
    a = np.asarray(r)[0, 5:-5, 5:-5]
    b = np.asarray(x)[0, 5:-5, 5:-5]
    assert np.allclose(a, b, atol=1e-4)


def test_ld_distillation_trains():
    head = dict(num_classes=16, in_channels=32, feat_channels=32,
                stacked_convs=1, test_cfg=dict(nms_pre=128, max_per_img=16))
    m = build_detector(
        dict(
            type="KnowledgeDistillationSingleStageDetector",
            backbone=dict(type="ResNet", depth=18, frozen_stages=-1),
            neck=dict(type="FPN", out_channels=32, num_outs=5, start_level=1,
                      add_extra_convs="on_input"),
            bbox_head=dict(type="LDRotatedRetinaHead", reg_max=4, **head),
            teacher=dict(
                type="RotatedRetinaNet",
                backbone=dict(type="ResNet", depth=18, frozen_stages=-1),
                neck=dict(type="FPN", out_channels=32, num_outs=5,
                          start_level=1, add_extra_convs="on_input"),
                bbox_head=dict(type="RotatedRetinaDistributionHead",
                               reg_max=4, **head),
            ),
        ),
        seed=0,
    )
    images = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32))
    gt = np.zeros((1, 8, 5), np.float32)
    gt[0, 0] = [60, 60, 40, 20, 0.4]
    targets = {
        "gt_bboxes": jnp.asarray(gt),
        "gt_labels": jnp.asarray(np.full((1, 8), 2, np.int32)),
        "gt_mask": jnp.asarray(np.array([[True] + [False] * 7])),
    }
    losses = m.loss(images, targets)
    assert "loss_ld" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    # teacher params must receive zero update multiplier
    from jdet_tpu.optim import build_optimizer, build_lr_schedule

    opt = build_optimizer(
        m, lr_schedule=build_lr_schedule(0.01), frozen_stages=-1,
        weight_decay=0.01,
    )
    det = m.predict(images)
    assert det["polys"].shape == (1, 16, 8)


def test_ssd_end_to_end():
    m = build_detector(
        dict(
            type="SSD",
            backbone=dict(type="SSDVGG"),
            neck=dict(type="SSDNeck"),
            bbox_head=dict(
                type="SSDHead", num_classes=15,
                test_cfg=dict(nms_pre=128, max_per_img=16),
            ),
        ),
        seed=0,
    )
    images = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32))
    gt = np.zeros((1, 6, 5), np.float32)
    gt[0, 0] = [60, 60, 40, 20, 0.0]
    gt[0, 1] = [90, 40, 30, 16, 0.0]
    targets = {
        "gt_bboxes": jnp.asarray(gt),
        "gt_labels": jnp.asarray(np.array([[3, 7, 0, 0, 0, 0]], np.int32)),
        "gt_mask": jnp.asarray(np.array([[True, True] + [False] * 4])),
    }
    losses = m.loss(images, targets)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    det = m.predict(images)
    assert det["polys"].shape == (1, 16, 8)


def test_r3det_end_to_end():
    m = build_detector(
        dict(
            type="R3Det",
            backbone=dict(type="ResNet", depth=18, frozen_stages=-1),
            neck=dict(type="FPN", out_channels=32, num_outs=5, start_level=1,
                      add_extra_convs="on_input"),
            bbox_head=dict(
                type="R3DetHead", num_classes=16, in_channels=32,
                feat_channels=32, stacked_convs=1,
                octave_base_scale=4, scales_per_octave=1,
                anchor_ratios=[1.0],
                test_cfg=dict(nms_pre=64, max_per_img=8),
            ),
        ),
        seed=0,
    )
    images = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32))
    gt = np.zeros((1, 6, 5), np.float32)
    gt[0, 0] = [60, 60, 40, 20, 0.4]
    targets = {
        "gt_bboxes": jnp.asarray(gt),
        "gt_labels": jnp.asarray(np.array([[3, 0, 0, 0, 0, 0]], np.int32)),
        "gt_mask": jnp.asarray(np.array([[True] + [False] * 5])),
    }
    losses = m.loss(images, targets)
    assert set(losses) == {"loss_init_cls", "loss_init_bbox",
                           "loss_refine_cls", "loss_refine_bbox"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    det = m.predict(images)
    assert det["polys"].shape == (1, 8, 8)

"""Loss-variant heads (GWD/KLD/KFIoU), CSL head, ATSS assignment."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from jdet_tpu.models.builder import build_detector
from jdet_tpu.models.boxes.assigner import atss_assign_rotated
from jdet_tpu.models.boxes.coder import CSLCoder

rng = np.random.RandomState(21)


def batch(B=2, size=128, K=8):
    images = jnp.asarray(rng.rand(B, size, size, 3).astype(np.float32))
    gt = np.zeros((B, K, 5), np.float32)
    mask = np.zeros((B, K), bool)
    labels = np.zeros((B, K), np.int32)
    for b in range(B):
        mask[b, :3] = True
        gt[b, :3] = np.stack([
            rng.uniform(30, 100, 3), rng.uniform(30, 100, 3),
            rng.uniform(16, 60, 3), rng.uniform(8, 30, 3),
            rng.uniform(-np.pi / 4, 3 * np.pi / 4, 3)], 1)
        labels[b, :3] = rng.randint(1, 16, 3)
    return images, {
        "gt_bboxes": jnp.asarray(gt),
        "gt_labels": jnp.asarray(labels),
        "gt_mask": jnp.asarray(mask),
    }


def _mini(head_type, **head_kw):
    return build_detector(
        dict(
            type="RotatedRetinaNet",
            backbone=dict(type="ResNet", depth=18, frozen_stages=-1),
            neck=dict(type="FPN", out_channels=32, num_outs=5, start_level=1,
                      add_extra_convs="on_input"),
            bbox_head=dict(
                type=head_type, num_classes=16, in_channels=32,
                feat_channels=32, stacked_convs=1,
                test_cfg=dict(nms_pre=128, max_per_img=16),
                **head_kw,
            ),
        ),
        seed=0,
    )


@pytest.mark.parametrize("head", ["GWDRetinaHead", "KLDRetinaHead",
                                  "KFIoURRetinaHead"])
def test_loss_variant_heads_train(head):
    model = _mini(head)
    images, targets = batch()
    losses = model.loss(images, targets)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (head, k)
    grads = nnx.grad(lambda m: sum(m.loss(images, targets).values()))(model)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_csl_head_loss_and_predict():
    model = _mini("CSLRRetinaHead")
    images, targets = batch()
    losses = model.loss(images, targets)
    assert set(losses) == {"loss_cls", "loss_bbox", "loss_angle"}
    for v in losses.values():
        assert np.isfinite(float(v))
    det = model.predict(images)
    assert det["polys"].shape == (2, 16, 8)


def test_atss_head_loss():
    model = _mini(
        "RotatedATSSHead",
        octave_base_scale=4, scales_per_octave=1, anchor_ratios=[1.0],
    )
    images, targets = batch()
    losses = model.loss(images, targets)
    for v in losses.values():
        assert np.isfinite(float(v))


def test_atss_assigner_basic():
    # anchors on a grid; one gt covering the center
    xs, ys = np.meshgrid(np.arange(8) * 16 + 8, np.arange(8) * 16 + 8)
    anchors = np.stack([
        xs.ravel(), ys.ravel(),
        np.full(64, 16.0), np.full(64, 16.0), np.zeros(64),
    ], 1).astype(np.float32)
    # gt scale-matched to the anchors (ATSS assumes comparable scales);
    # centered on an anchor so that one candidate clearly dominates
    gt = np.zeros((4, 5), np.float32)
    gt[0] = [56, 56, 22, 15, 0.1]
    mask = np.zeros(4, bool)
    mask[0] = True
    labels = np.array([7, 0, 0, 0], np.int32)
    out = atss_assign_rotated(
        jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(mask),
        jnp.asarray(labels), num_level_anchors=[64], topk=9,
    )
    gi = np.asarray(out["gt_inds"])
    assert (gi >= 0).all()  # no ignores without anchor_mask
    assert (gi == 1).sum() >= 1
    # positives must have centers inside the gt
    pos_anchors = anchors[gi == 1]
    assert (np.abs(pos_anchors[:, 0] - 56) < 16).all()
    assert (np.asarray(out["labels"])[gi == 1] == 7).all()


def test_atss_no_gt():
    anchors = np.stack([
        np.arange(16) * 8.0, np.arange(16) * 8.0,
        np.full(16, 8.0), np.full(16, 8.0), np.zeros(16)], 1).astype(np.float32)
    out = atss_assign_rotated(
        jnp.asarray(anchors), jnp.zeros((2, 5)), jnp.zeros(2, bool),
        jnp.zeros(2, jnp.int32), num_level_anchors=[16],
    )
    assert (np.asarray(out["gt_inds"]) == 0).all()


def test_csl_coder_roundtrip():
    coder = CSLCoder(omega=4, radius=3)
    angles = jnp.asarray(np.deg2rad(np.array([-40.0, 0.0, 30.0, 90.0, 130.0])))
    enc = coder.encode(angles)
    assert enc.shape == (5, 45)
    # peak at the right bin
    dec = np.asarray(coder.decode(enc))
    err = np.abs(np.rad2deg(dec) - np.rad2deg(np.asarray(angles)))
    assert (err <= 4.0).all(), err  # within one omega bin


def test_fcos_loss_and_predict():
    model = build_detector(
        dict(
            type="FCOS",
            backbone=dict(type="ResNet", depth=18, frozen_stages=-1),
            neck=dict(type="FPN", out_channels=32, num_outs=5, start_level=1,
                      add_extra_convs="on_input", relu_before_extra_convs=True),
            bbox_head=dict(
                type="FCOSHead", num_classes=15, in_channels=32,
                feat_channels=32, stacked_convs=1,
                test_cfg=dict(nms_pre=128, max_per_img=16),
            ),
        ),
        seed=0,
    )
    images, targets = batch()
    losses = model.loss(images, targets)
    assert set(losses) == {"loss_cls", "loss_bbox", "loss_centerness"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert float(losses["loss_bbox"]) > 0  # positives exist
    det = model.predict(images)
    assert det["polys"].shape == (2, 16, 8)
    grads = nnx.grad(lambda m: sum(m.loss(images, targets).values()))(model)
    assert all(
        np.isfinite(np.asarray(l)).all()
        for l in jax.tree_util.tree_leaves(grads)
    )

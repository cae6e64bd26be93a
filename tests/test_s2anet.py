import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from jdet_tpu.models.builder import build_detector


@pytest.fixture(scope="module")
def model():
    return build_detector(
        dict(
            type="S2ANet",
            backbone=dict(type="ResNet", depth=18, frozen_stages=-1),
            neck=dict(type="FPN", out_channels=64, num_outs=5, start_level=1,
                      add_extra_convs="on_input"),
            bbox_head=dict(
                type="S2ANetHead", num_classes=16, in_channels=64,
                feat_channels=64, stacked_convs=2,
                test_cfg=dict(nms_pre=256, max_per_img=32),
            ),
        ),
        seed=0,
    )


def batch(B=2, size=128, K=8):
    rng = np.random.RandomState(1)
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


def test_s2anet_loss_keys_and_finite(model):
    images, targets = batch()
    losses = model.loss(images, targets)
    assert set(losses) == {
        "loss_fam_cls", "loss_fam_bbox", "loss_odm_cls", "loss_odm_bbox"
    }
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_s2anet_predict_shapes(model):
    images, _ = batch()
    det = model.predict(images)
    assert det["boxes"].shape == (2, 32, 5)
    assert det["polys"].shape == (2, 32, 8)


def test_s2anet_train_step_reduces_loss(model):
    import optax

    images, targets = batch()
    opt = nnx.Optimizer(model, optax.sgd(0.01, momentum=0.9), wrt=nnx.Param)

    @nnx.jit
    def step(model, opt, images, targets):
        def lf(m):
            losses = m.loss(images, targets)
            return sum(losses.values()), losses

        (total, losses), grads = nnx.value_and_grad(lf, has_aux=True)(model)
        opt.update(model, grads)
        return total

    l0 = float(step(model, opt, images, targets))
    for _ in range(4):
        l = float(step(model, opt, images, targets))
    assert np.isfinite(l)
    assert l < l0


def test_align_conv_offsets_zero_for_identity_anchor():
    """An axis-aligned anchor of size k*stride centered on its cell gives
    (near-)zero offsets: the deform grid equals the standard conv grid."""
    from jdet_tpu.models.heads.s2anet_head import AlignConv

    ac = AlignConv(4, 4, 3, rngs=nnx.Rngs(0))
    H = W = 4
    stride = 8
    anchors = np.zeros((1, H, W, 5), np.float32)
    for i in range(H):
        for j in range(W):
            anchors[0, i, j] = [j * stride, i * stride, 3 * stride, 3 * stride, 0.0]
    off = np.asarray(ac.get_offset(jnp.asarray(anchors), stride))
    assert off.shape == (1, H, W, 9, 2)
    assert np.abs(off).max() < 1e-5

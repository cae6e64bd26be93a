import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from jdet_tpu.models.backbones import ResNet
from jdet_tpu.models.necks import FPN
from jdet_tpu.models.heads import RotatedRetinaHead
from jdet_tpu.models.detectors import RotatedRetinaNet


@pytest.fixture(scope="module")
def model():
    rngs = nnx.Rngs(0)
    backbone = ResNet(depth=18, frozen_stages=1, rngs=rngs)
    neck = FPN(backbone.out_channels, 64, num_outs=5, start_level=1,
               add_extra_convs="on_input", rngs=rngs)
    head = RotatedRetinaHead(
        num_classes=16, in_channels=64, feat_channels=64, stacked_convs=2,
        anchor_strides=(8, 16, 32, 64, 128),
        test_cfg=dict(nms_pre=256, max_per_img=50),
        rngs=rngs,
    )
    return RotatedRetinaNet(backbone, neck, head)


def synthetic_batch(B=2, size=128, K=8):
    rng = np.random.RandomState(0)
    images = rng.rand(B, size, size, 3).astype(np.float32)
    gt = np.zeros((B, K, 5), np.float32)
    mask = np.zeros((B, K), bool)
    labels = np.zeros((B, K), np.int32)
    for b in range(B):
        k = 3
        mask[b, :k] = True
        gt[b, :k] = np.stack([
            rng.uniform(30, 100, k), rng.uniform(30, 100, k),
            rng.uniform(16, 60, k), rng.uniform(8, 30, k),
            rng.uniform(-np.pi / 4, 3 * np.pi / 4, k),
        ], 1)
        labels[b, :k] = rng.randint(1, 16, k)
    return (jnp.asarray(images), {
        "gt_bboxes": jnp.asarray(gt),
        "gt_labels": jnp.asarray(labels),
        "gt_mask": jnp.asarray(mask),
    })


def test_train_loss_finite_and_grads_flow(model):
    # one jitted program computes losses AND grads (eagerly these two
    # checks took 150 s of the quick tier's 10-min budget on 1 core)
    images, targets = synthetic_batch()

    @nnx.jit
    def losses_and_grads(m):
        def total(m):
            losses = m.loss(images, targets)
            return losses["loss_cls"] + losses["loss_bbox"], losses

        (_, losses), grads = nnx.value_and_grad(total, has_aux=True)(m)
        return losses, grads

    losses, grads = losses_and_grads(model)
    assert set(losses) == {"loss_cls", "loss_bbox"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["loss_cls"]) > 0
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # head conv grads nonzero
    gsum = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert gsum > 0


def test_predict_shapes(model):
    images, targets = synthetic_batch()
    det = model.predict(images)
    assert det["boxes"].shape == (2, 50, 5)
    assert det["polys"].shape == (2, 50, 8)
    assert det["scores"].shape == (2, 50)
    assert det["labels"].shape == (2, 50)
    assert det["valid"].dtype == bool


def test_train_step_jit_and_improves(model):
    import optax

    images, targets = synthetic_batch()
    opt = nnx.Optimizer(model, optax.sgd(0.01, momentum=0.9), wrt=nnx.Param)

    @nnx.jit
    def step(model, opt, images, targets):
        def lf(m):
            losses = m.loss(images, targets)
            return losses["loss_cls"] + losses["loss_bbox"], losses

        (total, losses), grads = nnx.value_and_grad(lf, has_aux=True)(model)
        opt.update(model, grads)
        return total

    l0 = float(step(model, opt, images, targets))
    l_prev = l0
    for _ in range(4):
        l_prev = float(step(model, opt, images, targets))
    assert np.isfinite(l_prev)
    assert l_prev < l0  # optimizing the same batch must reduce loss

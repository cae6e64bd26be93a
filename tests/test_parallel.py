"""Data-parallel SPMD tests on the virtual 8-device CPU mesh.

Covers the reference's MPI-DP semantics (SURVEY §2.10): the sharded train
step must compute the same loss/updates as a single-device run, and the
per-step PRNG threading must give fresh randomness every iteration
(reference RandomSampler `models/boxes/sampler.py:134`, H2RBox random view
`networks/h2rbox.py:35-75`).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import nnx

from jdet_tpu.parallel.spmd import build_train_step, make_mesh


def _tiny_model(seed=0, feat=32):
    from jdet_tpu.models.backbones import ResNet
    from jdet_tpu.models.necks import FPN
    from jdet_tpu.models.heads import RotatedRetinaHead
    from jdet_tpu.models.detectors import RotatedRetinaNet

    rngs = nnx.Rngs(seed)
    backbone = ResNet(depth=18, frozen_stages=-1, rngs=rngs)
    neck = FPN(backbone.out_channels, feat, num_outs=5, start_level=1,
               add_extra_convs="on_input", rngs=rngs)
    head = RotatedRetinaHead(
        num_classes=16, in_channels=feat, feat_channels=feat,
        stacked_convs=1, test_cfg=dict(nms_pre=64, max_per_img=16),
        rngs=rngs,
    )
    return RotatedRetinaNet(backbone, neck, head)


def _batch(B=8, size=64, K=8, seed=0):
    rng = np.random.RandomState(seed)
    images = jnp.asarray(rng.rand(B, size, size, 3).astype(np.float32))
    gt = np.zeros((B, K, 5), np.float32)
    mask = np.zeros((B, K), bool)
    labels = np.zeros((B, K), np.int32)
    for b in range(B):
        k = 4
        mask[b, :k] = True
        gt[b, :k] = np.stack([
            rng.uniform(16, size - 16, k), rng.uniform(16, size - 16, k),
            rng.uniform(10, 30, k), rng.uniform(6, 16, k),
            rng.uniform(-np.pi / 4, 3 * np.pi / 4, k)], 1)
        labels[b, :k] = rng.randint(1, 16, k)
    targets = {"gt_bboxes": jnp.asarray(gt), "gt_labels": jnp.asarray(labels),
               "gt_mask": jnp.asarray(mask)}
    return images, targets


def _run_steps(mesh, n_steps=2):
    model = _tiny_model(seed=0)
    opt = nnx.Optimizer(model, optax.sgd(0.01, momentum=0.9), wrt=nnx.Param)
    graphdef, state, step = build_train_step(model, opt, mesh)
    images, targets = _batch()
    key = jax.random.PRNGKey(0)
    losses = []
    for it in range(n_steps):
        state, log_vars = step(state, images, targets, key, jnp.int32(it))
        losses.append(float(jax.device_get(log_vars["total_loss"])))
    return losses, state


def test_mesh_sizes():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    assert make_mesh(8).size == 8
    # batch-size divisibility restriction
    assert make_mesh(batch_size=6).size == 6
    assert make_mesh(batch_size=2).size == 2
    assert make_mesh(batch_size=7).size == 7
    assert make_mesh(batch_size=5).size == 5


def test_sharded_train_step_matches_single_device():
    """DP loss/updates over 8 shards == single-device (fp32, 2 steps)."""
    losses8, state8 = _run_steps(make_mesh(8))
    losses1, state1 = _run_steps(make_mesh(1))
    np.testing.assert_allclose(losses8, losses1, rtol=2e-4, atol=1e-5)
    # a couple of updated parameters must match too (grad psum correct)
    f8 = nnx.to_flat_state(state8)
    f1 = nnx.to_flat_state(state1)
    checked = 0
    for (p8, l8), (p1, l1) in zip(f8, f1):
        v8, v1 = np.asarray(l8.value), np.asarray(l1.value)
        if v8.dtype.kind == "f" and v8.size > 10:
            np.testing.assert_allclose(v8, v1, rtol=1e-3, atol=1e-5,
                                       err_msg=str(p8))
            checked += 1
            if checked >= 5:
                break
    assert checked


def test_prefetch_to_device():
    """Ordering, early-close (no leaked blocked thread), and exception
    propagation of the H2D prefetch pipeline."""
    import threading

    from jdet_tpu.parallel.spmd import prefetch_to_device

    def gen(n=5):
        for i in range(n):
            yield ({"images": np.full((2, 4, 4, 3), i, np.uint8),
                    "targets": {"x": np.ones((2, 3), np.float32) * i}},
                   [i, i])

    out = list(prefetch_to_device(gen(), size=2))
    assert len(out) == 5
    assert float(out[3][0][0][0, 0, 0, 0]) == 3
    assert float(out[2][0][1]["x"][0, 0]) == 2
    assert out[4][1] == [4, 4]

    n0 = threading.active_count()
    g = prefetch_to_device(gen(), size=1)
    next(g)
    g.close()
    import time as _t

    _t.sleep(0.5)
    assert threading.active_count() <= n0 + 1  # worker retired

    def bad():
        yield ({"images": np.zeros((1, 2, 2, 3), np.uint8),
                "targets": {}}, [0])
        raise ValueError("boom")

    with pytest.raises(ValueError, match="boom"):
        list(prefetch_to_device(bad(), size=2))


def _tiny_s2anet(seed=0, feat=32):
    from jdet_tpu.models.builder import build_detector

    return build_detector(dict(
        type="S2ANet",
        backbone=dict(type="ResNet", depth=18, frozen_stages=-1),
        neck=dict(type="FPN", out_channels=feat, num_outs=5, start_level=1,
                  add_extra_convs="on_input"),
        bbox_head=dict(type="S2ANetHead", num_classes=16, in_channels=feat,
                       feat_channels=feat, stacked_convs=1,
                       test_cfg=dict(nms_pre=64, max_per_img=16)),
    ), seed=seed)


def test_sharded_s2anet_matches_single_device():
    """The DCN/ORN gather path (batch-offset row ids into the flattened
    (B*T, 4C) corner table, deform_conv.py:149-156) must partition
    correctly under GSPMD: sharded loss == single-device loss."""
    def run(mesh):
        model = _tiny_s2anet(seed=0)
        opt = nnx.Optimizer(model, optax.sgd(0.01, momentum=0.9),
                            wrt=nnx.Param)
        graphdef, state, step = build_train_step(model, opt, mesh)
        images, targets = _batch(size=64)
        key = jax.random.PRNGKey(0)
        losses = []
        for it in range(2):
            state, log_vars = step(state, images, targets, key,
                                   jnp.int32(it))
            losses.append(float(jax.device_get(log_vars["total_loss"])))
        return losses

    np.testing.assert_allclose(run(make_mesh(8)), run(make_mesh(1)),
                               rtol=5e-4, atol=1e-5)


def test_train_step_output_is_replicated():
    mesh = make_mesh(8)
    _, state = _run_steps(mesh, n_steps=1)
    leaves = [x for x in jax.tree.leaves(state) if hasattr(x, "sharding")]
    assert leaves and all(x.sharding.is_fully_replicated for x in leaves)


def test_dryrun_multichip_entry():
    """The driver-scored entry must run under the CPU mesh in-process."""
    import sys
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_roi_sampling_key_changes_draws():
    """Two-stage RoI RandomSampler noise must differ across step keys."""
    from jdet_tpu.models.builder import build_detector

    cfg = dict(
        type="OrientedRCNN",
        backbone=dict(type="ResNet", depth=18, frozen_stages=-1),
        neck=dict(type="FPN", out_channels=32, num_outs=5),
        rpn_head=dict(type="OrientedRPNHead", in_channels=32,
                      feat_channels=32),
        bbox_head=dict(type="OrientedHead", in_channels=32,
                       fc_out_channels=64, num_classes=16),
    )
    model = build_detector(cfg, seed=0)
    images, targets = _batch(B=2, size=64)

    graphdef, state = nnx.split(model)

    @jax.jit
    def loss_with(state, key):
        m = nnx.merge(graphdef, state)
        losses = m.loss(images, targets, key=key)
        return {k: jnp.asarray(v).sum() for k, v in losses.items()}

    l1 = jax.device_get(loss_with(state, jax.random.PRNGKey(1)))
    l2 = jax.device_get(loss_with(state, jax.random.PRNGKey(2)))
    l1b = jax.device_get(loss_with(state, jax.random.PRNGKey(1)))
    # same key => deterministic; different key => different RoI sample draw
    for k in l1:
        np.testing.assert_allclose(l1[k], l1b[k], rtol=1e-6)
    assert any(
        not np.allclose(l1[k], l2[k], rtol=1e-6) for k in l1
    ), f"RoI sampling ignored the PRNG key: {l1} vs {l2}"


def test_h2rbox_theta_varies_with_key():
    from jdet_tpu.models.builder import build_detector

    cfg = dict(
        type="H2RBox",
        backbone=dict(type="ResNet", depth=18, frozen_stages=-1),
        neck=dict(type="FPN", out_channels=32, num_outs=5, start_level=1,
                  add_extra_convs="on_input"),
        bbox_head=dict(type="FCOSHead", num_classes=16, in_channels=32,
                       feat_channels=32, stacked_convs=1),
    )
    model = build_detector(cfg, seed=0)
    images, targets = _batch(B=1, size=64)
    graphdef, state = nnx.split(model)

    @jax.jit
    def ss_loss(state, key):
        m = nnx.merge(graphdef, state)
        return m.loss(images, targets, key=key)["loss_ss"]

    v1 = float(ss_loss(state, jax.random.PRNGKey(1)))
    v2 = float(ss_loss(state, jax.random.PRNGKey(2)))
    assert v1 != v2, "H2RBox rotation angle frozen across keys"


def test_runner_threads_fresh_key_each_iter():
    """The jitted step folds the iter counter into the key: identical
    batches at different iters give different stochastic losses for a
    sampling model."""
    from jdet_tpu.models.builder import build_detector

    cfg = dict(
        type="OrientedRCNN",
        backbone=dict(type="ResNet", depth=18, frozen_stages=-1),
        neck=dict(type="FPN", out_channels=32, num_outs=5),
        rpn_head=dict(type="OrientedRPNHead", in_channels=32,
                      feat_channels=32),
        bbox_head=dict(type="OrientedHead", in_channels=32,
                       fc_out_channels=64, num_classes=16),
    )
    model = build_detector(cfg, seed=0)
    opt = nnx.Optimizer(model, optax.sgd(0.0), wrt=nnx.Param)  # lr=0: pure
    mesh = make_mesh(2)
    graphdef, state, step = build_train_step(model, opt, mesh)
    images, targets = _batch(B=2, size=64)
    key = jax.random.PRNGKey(0)
    state, lv0 = step(state, images, targets, key, jnp.int32(0))
    state, lv1 = step(state, images, targets, key, jnp.int32(1))
    lv0 = {k: float(v) for k, v in lv0.items()}
    lv1 = {k: float(v) for k, v in lv1.items()}
    assert any(lv0[k] != lv1[k] for k in lv0), (
        f"losses identical across iters with lr=0 — key not folded: {lv0}"
    )


def test_sharded_predict_matches_single_device():
    """DP inference (Runner._build_predict sharding layout): predictions
    from the batch-sharded 8-device mesh equal the single-device ones."""
    from functools import partial

    from jdet_tpu.parallel.spmd import batch_sharding, replicated_sharding

    model = _tiny_model(seed=0)
    graphdef, state = nnx.split(model)
    images, _ = _batch(B=8)
    sf = jnp.ones((8,), jnp.float32)

    def make_predict(mesh):
        rep = replicated_sharding(mesh)
        dat = batch_sharding(mesh)

        @partial(jax.jit, in_shardings=(rep, dat, dat), out_shardings=rep)
        def predict(state, images, scale_factor):
            m = nnx.merge(graphdef, state)
            return m.predict(images, {"scale_factor": scale_factor})

        return predict

    det8 = make_predict(make_mesh(8))(state, images, sf)
    det1 = make_predict(make_mesh(1))(state, images, sf)
    for k in det1:
        a = np.asarray(jax.device_get(det1[k]))
        b = np.asarray(jax.device_get(det8[k]))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5, err_msg=k)

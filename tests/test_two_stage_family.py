"""FasterRCNN-OBB / GlidingVertex / RoITransformer end-to-end smoke."""
import numpy as np
import jax.numpy as jnp
import pytest

from jdet_tpu.models.builder import build_detector

rng = np.random.RandomState(4)


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


CASES = [
    ("FasterRCNNOBB", "FasterrcnnHead",
     {"loss_rpn_cls", "loss_rpn_bbox", "loss_cls", "loss_bbox"}),
    ("GlidingVertex", "GlidingHead",
     {"loss_rpn_cls", "loss_rpn_bbox", "loss_cls", "loss_bbox", "loss_fix",
      "loss_ratio"}),
    ("RoITransformer", "RoITransHead",
     {"loss_rpn_cls", "loss_rpn_bbox", "loss_cls_s1", "loss_bbox_s1",
      "loss_cls_s2", "loss_bbox_s2"}),
]


@pytest.mark.parametrize("det_type,head_type,loss_keys", CASES)
def test_two_stage_family(det_type, head_type, loss_keys):
    m = build_detector(
        dict(
            type=det_type,
            backbone=dict(type="ResNet", depth=18, frozen_stages=-1),
            neck=dict(type="FPN", out_channels=64, num_outs=5),
            rpn_head=dict(type="RPNHead", in_channels=64, feat_channels=64,
                          nms_pre=128, nms_post=64),
            bbox_head=dict(
                type=head_type, num_classes=15, in_channels=64,
                fc_out_channels=128,
                train_cfg=dict(sampler=dict(num=48, pos_fraction=0.25)),
                test_cfg=dict(max_per_img=16),
            ),
        ),
        seed=0,
    )
    images, targets = batch()
    losses = m.loss(images, targets)
    assert set(losses) == loss_keys
    assert all(np.isfinite(float(v)) for v in losses.values())
    det = m.predict(images)
    assert det["polys"].shape == (2, 16, 8)
    assert np.isfinite(np.asarray(det["scores"])).all()

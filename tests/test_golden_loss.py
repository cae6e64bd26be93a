"""Golden-loss trajectory regression (reference test strategy tier 3,
SURVEY §4 / docs/add_model_tests.md): run N pinned-seed train steps per
model on synthetic data and compare each step's total loss against a
committed fixture within a relative tolerance. Fixtures are generated on
first run (tests/fixtures/golden_losses.json) and committed; CPU-only so
values are platform-stable.
"""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from flax import nnx

from jdet_tpu.models.builder import build_detector

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "golden_losses.json")
N_STEPS = 11  # reference protocol: 11 pinned iterations
# (docs/add_model_tests.md, projects/s2anet/test_s2anet.py:19-74)
RTOL = 0.05

_FPN = dict(type="FPN", out_channels=32, num_outs=5, start_level=1,
            add_extra_convs="on_input")
_R18 = dict(type="ResNet", depth=18, frozen_stages=-1)
_SMALL = dict(num_classes=16, in_channels=32, feat_channels=32,
              stacked_convs=1, test_cfg=dict(nms_pre=64, max_per_img=8))

MODELS = {
    "rotated_retinanet": dict(
        type="RotatedRetinaNet", backbone=_R18, neck=_FPN,
        bbox_head=dict(type="RotatedRetinaHead", **_SMALL),
    ),
    "s2anet": dict(
        type="S2ANet", backbone=_R18, neck=_FPN,
        bbox_head=dict(type="S2ANetHead", num_classes=16, in_channels=32,
                       feat_channels=32, stacked_convs=1,
                       test_cfg=dict(nms_pre=64, max_per_img=8)),
    ),
    "fcos": dict(
        type="FCOS", backbone=_R18, neck=_FPN,
        bbox_head=dict(type="FCOSHead", num_classes=15, in_channels=32,
                       feat_channels=32, stacked_convs=1,
                       test_cfg=dict(nms_pre=64, max_per_img=8)),
    ),
    "oriented_rcnn": dict(
        type="OrientedRCNN", backbone=_R18, neck=dict(type="FPN",
            out_channels=32, num_outs=5),
        rpn_head=dict(type="OrientedRPNHead", in_channels=32,
                      feat_channels=32, nms_pre=64, nms_post=32),
        bbox_head=dict(type="OrientedHead", num_classes=15, in_channels=32,
                       fc_out_channels=64,
                       train_cfg=dict(sampler=dict(num=32, pos_fraction=0.25)),
                       test_cfg=dict(max_per_img=8)),
    ),
    "gwd": dict(
        type="RotatedRetinaNet", backbone=_R18, neck=_FPN,
        bbox_head=dict(type="GWDRetinaHead", **_SMALL),
    ),
    "kld": dict(
        type="RotatedRetinaNet", backbone=_R18, neck=_FPN,
        bbox_head=dict(type="KLDRetinaHead", **_SMALL),
    ),
    "kfiou": dict(
        type="RotatedRetinaNet", backbone=_R18, neck=_FPN,
        bbox_head=dict(type="KFIoURRetinaHead", **_SMALL),
    ),
    "csl": dict(
        type="RotatedRetinaNet", backbone=_R18, neck=_FPN,
        bbox_head=dict(type="CSLRRetinaHead", **_SMALL),
    ),
    "atss": dict(
        type="RotatedRetinaNet", backbone=_R18, neck=_FPN,
        bbox_head=dict(type="RotatedATSSHead", octave_base_scale=4,
                       scales_per_octave=1, **_SMALL),
    ),
    "rsdet": dict(
        type="RotatedRetinaNet", backbone=_R18, neck=_FPN,
        bbox_head=dict(type="RSDetHead", **_SMALL),
    ),
    "ridet": dict(
        # reference recipe: RIDet rides S2ANet's ODM stage with decoded
        # boxes (configs/s2anet/s2anet_r50_fpn_1x_dota_ridet.py) — on raw
        # retina anchors at lr=5e-3 the loss diverges within 11 steps
        type="S2ANet", backbone=_R18, neck=_FPN,
        bbox_head=dict(
            type="S2ANetHead", num_classes=16, in_channels=32,
            feat_channels=32, stacked_convs=1,
            loss_odm_bbox=dict(type="ridet", beta=1.0, loss_weight=1.0),
            test_cfg=dict(nms_pre=64, max_per_img=8),
        ),
    ),
    "ld": dict(
        type="KnowledgeDistillationSingleStageDetector", backbone=_R18,
        neck=_FPN,
        bbox_head=dict(type="LDRotatedRetinaHead", reg_max=8, **_SMALL),
        teacher=dict(
            type="RotatedRetinaNet", backbone=_R18, neck=_FPN,
            bbox_head=dict(type="RotatedRetinaDistributionHead", reg_max=8,
                           **_SMALL),
        ),
    ),
    "reppoints": dict(
        type="RotatedRepPoints", backbone=_R18, neck=_FPN,
        bbox_head=dict(type="RotatedRepPointsHead", num_classes=15,
                       in_channels=32, feat_channels=32, point_feat_channels=32,
                       test_cfg=dict(nms_pre=64, max_per_img=8)),
    ),
    "h2rbox": dict(
        type="H2RBox", backbone=_R18,
        neck=dict(type="FPN", out_channels=32, num_outs=5, start_level=1,
                  add_extra_convs="on_output", relu_before_extra_convs=True),
        bbox_head=dict(type="H2RBoxHead", num_classes=15, in_channels=32,
                       feat_channels=32, stacked_convs=1,
                       rotation_agnostic_classes=[1],
                       test_cfg=dict(nms_pre=64, max_per_img=8)),
    ),
    "gliding": dict(
        type="GlidingVertex", backbone=_R18, neck=dict(type="FPN",
            out_channels=32, num_outs=5),
        rpn_head=dict(type="GlidingRPNHead", in_channels=32, feat_channels=32,
                      nms_pre=64, nms_post=32),
        bbox_head=dict(type="GlidingHead", num_classes=15, in_channels=32,
                       fc_out_channels=64,
                       test_cfg=dict(max_per_img=8)),
    ),
    "faster_rcnn_obb": dict(
        type="FasterRCNNOBB", backbone=_R18, neck=dict(type="FPN",
            out_channels=32, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                      nms_pre=64, nms_post=32),
        bbox_head=dict(type="FasterrcnnHead", num_classes=15, in_channels=32,
                       fc_out_channels=64,
                       test_cfg=dict(max_per_img=8)),
    ),
    "roi_transformer": dict(
        type="RoITransformer", backbone=_R18, neck=dict(type="FPN",
            out_channels=32, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                      nms_pre=64, nms_post=32),
        bbox_head=dict(type="RoITransHead", num_classes=15, in_channels=32,
                       fc_out_channels=64,
                       test_cfg=dict(max_per_img=8)),
    ),
    "redet": dict(
        type="ReDet",
        backbone=dict(type="ReResNet", depth=18, base_fields=4),
        neck=dict(type="ReFPN", out_channels=32, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                      nms_pre=64, nms_post=32),
        bbox_head=dict(type="ReDetHead", num_classes=15, in_channels=32,
                       fc_out_channels=64,
                       test_cfg=dict(max_per_img=8)),
    ),
    "ssd": dict(
        type="SSD",
        backbone=dict(type="SSDVGG"),
        neck=dict(type="SSDNeck"),
        bbox_head=dict(type="SSDHead", num_classes=15,
                       test_cfg=dict(nms_pre=64, max_per_img=8)),
    ),
    "r3det": dict(
        type="R3Det", backbone=_R18, neck=_FPN,
        bbox_head=dict(type="R3DetHead", **_SMALL),
    ),
    "yolo": dict(type="YOLO", nc=15, imgsz=128),
}


def _batch():
    rng = np.random.RandomState(666)
    images = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32))
    gt = np.zeros((1, 8, 5), np.float32)
    gt[0, 0] = [60, 60, 40, 20, 0.4]
    gt[0, 1] = [90, 40, 30, 16, -0.2]
    gt[0, 2] = [40, 90, 24, 12, 1.1]
    return images, {
        "gt_bboxes": jnp.asarray(gt),
        "gt_labels": jnp.asarray(np.array([[3, 7, 11, 0, 0, 0, 0, 0]],
                                          np.int32)),
        "gt_mask": jnp.asarray(
            np.array([[True, True, True] + [False] * 5])
        ),
    }


def _trajectory(cfg):
    model = build_detector(dict(cfg), seed=666)
    opt = nnx.Optimizer(
        model,
        optax.chain(optax.clip_by_global_norm(35.0),
                    optax.sgd(0.005, momentum=0.9)),
        wrt=nnx.Param,
    )
    images, targets = _batch()
    graphdef, state = nnx.split((model, opt))

    @jax.jit
    def step(state, images, targets):
        m, o = nnx.merge(graphdef, state)

        def lf(m):
            return sum(m.loss(images, targets).values())

        loss, grads = nnx.value_and_grad(lf)(m)
        o.update(m, grads)
        _, ns = nnx.split((m, o))
        return ns, loss

    out = []
    for _ in range(N_STEPS):
        state, loss = step(state, images, targets)
        out.append(float(loss))
    return out


def _load_fixture():
    if os.path.exists(FIXTURE):
        with open(FIXTURE) as f:
            return json.load(f)
    return {}


@pytest.mark.parametrize("name", sorted(MODELS))
def test_golden_loss_trajectory(name):
    fixture = _load_fixture()
    traj = _trajectory(MODELS[name])
    assert all(np.isfinite(v) for v in traj), traj
    if name not in fixture:
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        fixture[name] = traj
        with open(FIXTURE, "w") as f:
            json.dump(fixture, f, indent=1, sort_keys=True)
        pytest.skip(f"generated fixture for {name}: {traj}")
    ref = fixture[name]
    for i, (a, b) in enumerate(zip(traj, ref)):
        assert abs(a - b) <= RTOL * max(abs(b), 1e-3), (
            name, i, traj, ref
        )

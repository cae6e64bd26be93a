"""Overfit-to-mAP closure tests: each flagship family must be able to
drive eval mAP high by overfitting a few synthetic tiles — this closes
the full assign -> loss -> decode -> NMS -> eval loop and catches
sign/convention bugs that short loss-trajectory pins cannot (VERDICT r1
weak #7; stand-in for the reference's DOTA-server mAP parity protocol,
BASELINE.md).

CPU, tiny models (R18/32ch, 128px tiles). Each family trains a few
hundred steps on 4 fixed tiles and must reach eval/0_meanAP >= 0.8 on
those same tiles.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_runner_e2e import make_synthetic_dota  # noqa: E402

from jdet_tpu.config.config import Config  # noqa: E402
from jdet_tpu.runner import Runner  # noqa: E402

_R18 = dict(type="ResNet", depth=18, frozen_stages=-1)
_FPN = dict(type="FPN", out_channels=32, num_outs=5, start_level=1,
            add_extra_convs="on_input")
_TEST = dict(nms_pre=256, max_per_img=32, score_thr=0.05)

FAMILIES = {
    "retinanet": dict(
        type="RotatedRetinaNet", backbone=_R18, neck=_FPN,
        bbox_head=dict(type="RotatedRetinaHead", num_classes=16,
                       in_channels=32, feat_channels=32, stacked_convs=1,
                       test_cfg=_TEST),
    ),
    "s2anet": dict(
        type="S2ANet", backbone=_R18, neck=_FPN,
        bbox_head=dict(type="S2ANetHead", num_classes=16, in_channels=32,
                       feat_channels=32, stacked_convs=1, test_cfg=_TEST),
    ),
    "oriented_rcnn": dict(
        type="OrientedRCNN", backbone=_R18,
        neck=dict(type="FPN", out_channels=32, num_outs=5),
        rpn_head=dict(type="OrientedRPNHead", in_channels=32,
                      feat_channels=32, nms_pre=128, nms_post=64),
        bbox_head=dict(type="OrientedHead", num_classes=15, in_channels=32,
                       fc_out_channels=64, test_cfg=dict(max_per_img=32,
                                                         score_thr=0.05)),
    ),
    "redet": dict(
        type="ReDet",
        backbone=dict(type="ReResNet", depth=18, base_fields=4),
        neck=dict(type="ReFPN", out_channels=32, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                      nms_pre=128, nms_post=64),
        bbox_head=dict(type="ReDetHead", num_classes=15, in_channels=32,
                       fc_out_channels=64, test_cfg=dict(max_per_img=32,
                                                         score_thr=0.05)),
    ),
    "gliding": dict(
        type="GlidingVertex", backbone=_R18,
        neck=dict(type="FPN", out_channels=32, num_outs=5),
        rpn_head=dict(type="GlidingRPNHead", in_channels=32,
                      feat_channels=32, nms_pre=128, nms_post=64),
        bbox_head=dict(type="GlidingHead", num_classes=15, in_channels=32,
                       fc_out_channels=64, test_cfg=dict(max_per_img=32,
                                                         score_thr=0.05)),
    ),
    "roi_transformer": dict(
        type="RoITransformer", backbone=_R18,
        neck=dict(type="FPN", out_channels=32, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                      nms_pre=128, nms_post=64),
        bbox_head=dict(type="RoITransHead", num_classes=15, in_channels=32,
                       fc_out_channels=64, test_cfg=dict(max_per_img=32,
                                                         score_thr=0.05)),
    ),
    "fcos": dict(
        type="FCOS", backbone=_R18,
        neck=dict(type="FPN", out_channels=32, num_outs=5, start_level=1,
                  add_extra_convs="on_output", relu_before_extra_convs=True),
        bbox_head=dict(type="FCOSHead", num_classes=15, in_channels=32,
                       feat_channels=32, stacked_convs=1,
                       # 128px tiles: keep every level's regress range
                       # reachable by the 3 synthetic object scales
                       test_cfg=_TEST),
    ),
    "reppoints": dict(
        type="RotatedRepPoints", backbone=_R18,
        neck=dict(type="FPN", out_channels=32, num_outs=5, start_level=1,
                  add_extra_convs="on_input"),
        bbox_head=dict(type="RotatedRepPointsHead", num_classes=15,
                       in_channels=32, feat_channels=32,
                       point_feat_channels=32, stacked_convs=1,
                       test_cfg=_TEST),
    ),
    # CSL: gaussian-smoothed angle-classification decode
    "csl": dict(
        type="RotatedRetinaNet", backbone=_R18, neck=_FPN,
        bbox_head=dict(type="CSLRRetinaHead", num_classes=16,
                       in_channels=32, feat_channels=32, stacked_convs=1,
                       test_cfg=_TEST),
    ),
    # LD's distribution head (integral decode) on the plain detector —
    # the distillation wrapper adds a teacher, the decode path is here
    "ld_dist": dict(
        type="RotatedRetinaNet", backbone=_R18, neck=_FPN,
        bbox_head=dict(type="RotatedRetinaDistributionHead", reg_max=8,
                       num_classes=16, in_channels=32, feat_channels=32,
                       stacked_convs=1, test_cfg=_TEST),
    ),
    # R3Det: FeatureRefine cascade decode (stage-2 refined anchors)
    "r3det": dict(
        type="R3Det", backbone=_R18, neck=_FPN,
        bbox_head=dict(type="R3DetHead", num_classes=16, in_channels=32,
                       feat_channels=32, stacked_convs=1, test_cfg=_TEST),
    ),
    "faster_rcnn_obb": dict(
        type="FasterRCNNOBB", backbone=_R18,
        neck=dict(type="FPN", out_channels=32, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                      nms_pre=128, nms_post=64),
        bbox_head=dict(type="FasterrcnnHead", num_classes=15, in_channels=32,
                       fc_out_channels=64, test_cfg=dict(max_per_img=32,
                                                         score_thr=0.05)),
    ),
    # loss-variant retina heads: same decode path as retinanet but the
    # regression signal flows through the GWD/KLD/KFIoU/RSDet losses —
    # a sign/normalizer bug there would stall convergence
    "gwd": dict(
        type="RotatedRetinaNet", backbone=_R18, neck=_FPN,
        bbox_head=dict(type="GWDRetinaHead", num_classes=16,
                       in_channels=32, feat_channels=32, stacked_convs=1,
                       test_cfg=_TEST),
    ),
    "kld": dict(
        type="RotatedRetinaNet", backbone=_R18, neck=_FPN,
        bbox_head=dict(type="KLDRetinaHead", num_classes=16,
                       in_channels=32, feat_channels=32, stacked_convs=1,
                       test_cfg=_TEST),
    ),
    "kfiou": dict(
        type="RotatedRetinaNet", backbone=_R18, neck=_FPN,
        bbox_head=dict(type="KFIoURRetinaHead", num_classes=16,
                       in_channels=32, feat_channels=32, stacked_convs=1,
                       test_cfg=_TEST),
    ),
    "rsdet": dict(
        type="RotatedRetinaNet", backbone=_R18, neck=_FPN,
        bbox_head=dict(type="RSDetHead", num_classes=16,
                       in_channels=32, feat_channels=32, stacked_convs=1,
                       test_cfg=_TEST),
    ),
    # ATSS adaptive assignment (mean+std IoU threshold) feeding the
    # retina decode
    "atss": dict(
        type="RotatedRetinaNet", backbone=_R18, neck=_FPN,
        bbox_head=dict(type="RotatedATSSHead", octave_base_scale=4,
                       scales_per_octave=1, num_classes=16,
                       in_channels=32, feat_channels=32, stacked_convs=1,
                       test_cfg=_TEST),
    ),
    # RIDet rides S2ANet's ODM stage (reference recipe,
    # configs/s2anet/s2anet_r50_fpn_1x_dota_ridet.py)
    "ridet": dict(
        type="S2ANet", backbone=_R18, neck=_FPN,
        bbox_head=dict(type="S2ANetHead", num_classes=16, in_channels=32,
                       feat_channels=32, stacked_convs=1,
                       loss_odm_bbox=dict(type="ridet", beta=1.0,
                                          loss_weight=1.0),
                       test_cfg=_TEST),
    ),
}

STEPS = {"retinanet": 400, "s2anet": 400, "oriented_rcnn": 400,
         "redet": 400, "gliding": 500, "roi_transformer": 500,
         "fcos": 500, "reppoints": 600, "csl": 500, "ld_dist": 500,
         "r3det": 500, "faster_rcnn_obb": 500, "gwd": 500, "kld": 500,
         "kfiou": 600, "rsdet": 500, "atss": 500, "ridet": 500}
N_CLASSES = 4  # synthetic tiles only use DOTA classes 1..4


@pytest.fixture(scope="module")
def tiles(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("overfit"))
    # 4 images, 3 well-separated objects each, few classes
    img_dir, ann = make_synthetic_dota(root, n_images=4, size=128, n_obj=3,
                                       n_classes=4)
    return root, img_dir, ann


@pytest.mark.parametrize("name", sorted(FAMILIES))
def test_overfit_reaches_map(tiles, name):
    root, img_dir, ann = tiles
    ds = dict(
        type="DOTADataset", version="1", annotations_file=ann,
        images_dir=img_dir, image_size=(128, 128), max_gt=8,
        transforms=[
            dict(type="RotatedResize", min_size=128, max_size=128),
            dict(type="Normalize", mean=[0, 0, 0], std=[255, 255, 255],
                 to_bgr=False),
        ],
    )
    steps = STEPS[name]
    cfg = Config(
        name=f"overfit_{name}",
        work_dir=os.path.join(root, f"work_{name}"),
        max_iter=steps, max_epoch=0, log_interval=1000,
        checkpoint_interval=10000, eval_interval=None, seed=0,
        model=FAMILIES[name],
        optimizer=dict(type="Adam", lr=1e-3, grad_clip=dict(max_norm=10)),
        scheduler=dict(type="StepLR", warmup="linear", warmup_iters=20,
                       warmup_ratio=0.1, milestones=[10 ** 6]),
        dataset=dict(
            train=dict(**ds, batch_size=4, shuffle=True),
            val=dict(**ds, batch_size=4, filter_empty_gt=False,
                     drop_last=False),
        ),
    )
    runner = Runner(cfg)
    while not runner.finish:
        runner.train_epoch()
    metrics = runner.val()
    # eval/0_meanAP averages ALL 15 DOTA classes (reference data/dota.py:138
    # semantics); the tiles only contain classes 1..N_CLASSES, so score the
    # closure on the present classes.
    present = [v for k, v in metrics.items()
               if k.startswith("eval/") and k.endswith("_AP")
               and 1 <= int(k.split("/")[1].split("_")[0]) <= N_CLASSES]
    m = float(np.mean(present))
    assert m >= 0.8, (name, metrics)


def test_h2rbox_overfit_reaches_map(tiles):
    """H2RBox closure: train from WEAK (horizontal) labels via the
    rotate-consistency loss, evaluate against the true rotated boxes.
    Angle must emerge from self-supervision alone, so the bar is lower
    than the fully-supervised families' 0.8."""
    root, img_dir, ann = tiles
    ds = dict(
        version="1", annotations_file=ann, images_dir=img_dir,
        image_size=(128, 128), max_gt=8,
        transforms=[
            dict(type="RotatedResize", min_size=128, max_size=128),
            dict(type="Normalize", mean=[0, 0, 0], std=[255, 255, 255],
                 to_bgr=False),
        ],
    )
    cfg = Config(
        name="overfit_h2rbox",
        work_dir=os.path.join(root, "work_h2rbox"),
        max_iter=600, max_epoch=0, log_interval=1000,
        checkpoint_interval=10000, eval_interval=None, seed=0,
        model=dict(
            type="H2RBox", backbone=_R18,
            neck=dict(type="FPN", out_channels=32, num_outs=5,
                      start_level=1, add_extra_convs="on_output",
                      relu_before_extra_convs=True),
            bbox_head=dict(type="H2RBoxHead", num_classes=15,
                           in_channels=32, feat_channels=32,
                           stacked_convs=1, test_cfg=_TEST),
        ),
        optimizer=dict(type="Adam", lr=1e-3, grad_clip=dict(max_norm=10)),
        scheduler=dict(type="StepLR", warmup="linear", warmup_iters=20,
                       warmup_ratio=0.1, milestones=[10 ** 6]),
        dataset=dict(
            train=dict(type="DOTAWSOODDataset", **ds, batch_size=4,
                       shuffle=True),
            val=dict(type="DOTADataset", **ds, batch_size=4,
                     filter_empty_gt=False, drop_last=False),
        ),
    )
    runner = Runner(cfg)
    while not runner.finish:
        runner.train_epoch()
    metrics = runner.val()
    present = [v for k, v in metrics.items()
               if k.startswith("eval/") and k.endswith("_AP")
               and 1 <= int(k.split("/")[1].split("_")[0]) <= N_CLASSES]
    m = float(np.mean(present))
    assert m >= 0.4, metrics


def test_ssd_overfit_reaches_map(tmp_path_factory):
    """SSD closure: horizontal-box multibox decode (hard-negative-mined CE
    + hbb deltas -> angle-0 rbox predict). Tiles are axis-aligned — SSD's
    representation cannot reach IoU>=0.5 against rotated gt."""
    root = str(tmp_path_factory.mktemp("overfit_ssd"))
    img_dir, ann = make_synthetic_dota(root, n_images=4, size=128, n_obj=3,
                                       n_classes=4, axis_aligned=True)
    ds = dict(
        type="DOTADataset", version="1", annotations_file=ann,
        images_dir=img_dir, image_size=(128, 128), max_gt=8,
        transforms=[
            dict(type="RotatedResize", min_size=128, max_size=128),
            dict(type="Normalize", mean=[0, 0, 0], std=[255, 255, 255],
                 to_bgr=False),
        ],
    )
    cfg = Config(
        name="overfit_ssd",
        work_dir=os.path.join(root, "work_ssd"),
        max_iter=500, max_epoch=0, log_interval=1000,
        checkpoint_interval=10000, eval_interval=None, seed=0,
        model=dict(
            type="SSD",
            backbone=dict(type="SSDVGG"),
            neck=dict(type="SSDNeck"),
            bbox_head=dict(type="SSDHead", num_classes=15,
                           test_cfg=dict(nms_pre=256, max_per_img=32,
                                         score_thr=0.05)),
        ),
        optimizer=dict(type="Adam", lr=1e-3, grad_clip=dict(max_norm=10)),
        scheduler=dict(type="StepLR", warmup="linear", warmup_iters=20,
                       warmup_ratio=0.1, milestones=[10 ** 6]),
        dataset=dict(
            train=dict(**ds, batch_size=4, shuffle=True),
            val=dict(**ds, batch_size=4, filter_empty_gt=False,
                     drop_last=False),
        ),
    )
    runner = Runner(cfg)
    while not runner.finish:
        runner.train_epoch()
    metrics = runner.val()
    present = [v for k, v in metrics.items()
               if k.startswith("eval/") and k.endswith("_AP")
               and 1 <= int(k.split("/")[1].split("_")[0]) <= N_CLASSES]
    m = float(np.mean(present))
    assert m >= 0.8, metrics


def test_yolo_overfit_reaches_map(tmp_path):
    """YOLO closure: train on 2 deterministic tiles, score via the
    dataset's COCO-protocol evaluate (train -> decode -> NMS -> eval)."""
    import cv2
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from jdet_tpu.data.yolo import YoloDataset
    from jdet_tpu.models.builder import build_detector

    root = str(tmp_path)
    os.makedirs(f"{root}/images", exist_ok=True)
    os.makedirs(f"{root}/labels", exist_ok=True)
    S = 128
    boxes = {  # per image: (cls0, x1, y1, x2, y2) in pixels
        0: [(0, 20, 20, 60, 56), (1, 70, 70, 120, 100)],
        1: [(2, 30, 60, 90, 100), (0, 80, 10, 120, 40)],
    }
    colors = {0: (230, 50, 50), 1: (50, 230, 50), 2: (50, 50, 230)}
    for i, bl in boxes.items():
        img = np.full((S, S, 3), 40, np.uint8)
        lines = []
        for c, x1, y1, x2, y2 in bl:
            img[y1:y2, x1:x2] = colors[c]
            lines.append(
                f"{c} {(x1 + x2) / 2 / S} {(y1 + y2) / 2 / S} "
                f"{(x2 - x1) / S} {(y2 - y1) / S}"
            )
        cv2.imwrite(f"{root}/images/im{i}.jpg", img)
        with open(f"{root}/labels/im{i}.txt", "w") as f:
            f.write("\n".join(lines))

    ds = YoloDataset(images_dir=f"{root}/images",
                     labels_dir=f"{root}/labels", img_size=S, batch_size=2,
                     augment=False, mosaic=False, max_gt=8, drop_last=False,
                     shuffle=False, classes=["a", "b", "c"])
    model = build_detector(dict(type="YOLO", nc=3, imgsz=S), seed=0)
    opt = nnx.Optimizer(model, optax.adam(1e-3), wrt=nnx.Param)
    graphdef, state = nnx.split((model, opt))
    batch, metas = next(ds.batches())
    images = jnp.asarray(batch["images"])
    targets = {k: jnp.asarray(v) for k, v in batch["targets"].items()}

    import jax

    @jax.jit
    def step(state):
        mm, oo = nnx.merge(graphdef, state)

        def lf(mm):
            losses = mm.loss(images, targets)
            return sum(losses.values())

        loss, grads = nnx.value_and_grad(lf)(mm)
        oo.update(mm, grads)
        _, new_state = nnx.split((mm, oo))
        return new_state, loss

    for _ in range(400):
        state, loss = step(state)
    assert np.isfinite(float(loss))
    nnx.update((model, opt), state)

    det = model.predict(images)
    results = []
    for b, meta in enumerate(metas):
        results.append((
            {k: np.asarray(v[b]) for k, v in det.items()}, meta
        ))
    metrics = ds.evaluate(results)
    assert metrics["eval/coco_mAP50"] >= 0.8, metrics

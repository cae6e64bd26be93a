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
}

STEPS = {"retinanet": 400, "s2anet": 400, "oriented_rcnn": 400,
         "redet": 400}
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

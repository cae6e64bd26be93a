"""End-to-end Runner test on a synthetic mini-DOTA dataset (CPU)."""
import os
import pickle

import numpy as np
import pytest

from jdet_tpu.config.config import Config
from jdet_tpu.data.transforms import rbox_to_poly_np


def make_synthetic_dota(root, n_images=6, size=128, n_obj=4, n_classes=15,
                        axis_aligned=False):
    """Images with bright rotated rectangles on dark background + labels.pkl.

    axis_aligned=True emits angle-0 boxes — for closing the decode loop of
    horizontal-box detectors (SSD) whose representation cannot reach
    IoU>=0.5 against arbitrarily rotated gt."""
    import cv2

    rng = np.random.RandomState(0)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    infos = []
    for i in range(n_images):
        img = (rng.rand(size, size, 3) * 40).astype(np.uint8)
        rboxes, labels = [], []
        for _ in range(n_obj):
            rb = [
                rng.uniform(30, size - 30), rng.uniform(30, size - 30),
                rng.uniform(20, 50), rng.uniform(10, 25),
                0.0 if axis_aligned
                else rng.uniform(-np.pi / 4, 3 * np.pi / 4),
            ]
            poly = rbox_to_poly_np(np.asarray([rb], np.float32))[0]
            cv2.fillPoly(
                img, [poly.reshape(4, 2).astype(np.int32)],
                tuple(int(x) for x in rng.randint(150, 255, 3)),
            )
            rboxes.append(rb)
            labels.append(int(rng.randint(1, n_classes + 1)))
        name = f"img_{i:03d}.png"
        cv2.imwrite(os.path.join(img_dir, name), img)
        infos.append(
            {
                "filename": name,
                "width": size,
                "height": size,
                "ann": {
                    "bboxes": np.asarray(rboxes, np.float32),
                    "labels": np.asarray(labels, np.int32),
                    "bboxes_ignore": np.zeros((0, 5), np.float32),
                },
            }
        )
    with open(os.path.join(root, "labels.pkl"), "wb") as f:
        pickle.dump(infos, f)
    return img_dir, os.path.join(root, "labels.pkl")


@pytest.fixture(scope="module")
def mini_cfg(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mini_dota"))
    img_dir, ann = make_synthetic_dota(root)
    work_dir = os.path.join(root, "work")
    ds_common = dict(
        type="DOTADataset",
        annotations_file=ann,
        images_dir=img_dir,
        image_size=(128, 128),
        max_gt=16,
        transforms=[
            dict(type="RotatedResize", min_size=128, max_size=128),
            dict(type="Normalize", mean=[0, 0, 0], std=[255, 255, 255],
                 to_bgr=False),
        ],
    )
    return Config(
        name="mini",
        work_dir=work_dir,
        max_epoch=2,
        log_interval=2,
        checkpoint_interval=1,
        eval_interval=None,
        seed=0,
        model=dict(
            type="RotatedRetinaNet",
            backbone=dict(type="ResNet", depth=18, frozen_stages=-1),
            neck=dict(type="FPN", out_channels=64, num_outs=5, start_level=1,
                      add_extra_convs="on_input"),
            bbox_head=dict(
                type="RotatedRetinaHead", num_classes=16, in_channels=64,
                feat_channels=64, stacked_convs=1,
                test_cfg=dict(nms_pre=256, max_per_img=32, score_thr=0.01),
            ),
        ),
        optimizer=dict(type="SGD", lr=0.005, momentum=0.9,
                       grad_clip=dict(max_norm=10)),
        scheduler=dict(type="StepLR", warmup="linear", warmup_iters=5,
                       milestones=[8]),
        dataset=dict(
            train=dict(**ds_common, batch_size=2, shuffle=True),
            val=dict(**ds_common, batch_size=2, filter_empty_gt=False,
                     shuffle=False, drop_last=False),
        ),
    )


def test_runner_trains_and_evaluates(mini_cfg):
    from jdet_tpu.runner import Runner

    runner = Runner(mini_cfg)
    losses = []

    orig_log = runner.logger.log if runner.logger else None
    seen = []
    if runner.logger:
        runner.logger.log = lambda d: (seen.append(d), orig_log(d))

    runner.train_epoch()
    assert runner.iter == 3
    assert seen, "expected training logs"
    assert "total_loss" in seen[-1]
    first_loss = seen[0]["total_loss"]
    runner.train_epoch()
    last_loss = seen[-1]["total_loss"]
    assert np.isfinite(last_loss)
    assert last_loss < first_loss * 1.5  # training is stable

    # checkpoint
    path = runner.save()
    assert os.path.exists(path)

    # val produces the mAP metric dict
    metrics = runner.val()
    assert "eval/0_meanAP" in metrics
    assert 0.0 <= metrics["eval/0_meanAP"] <= 1.0

    # resume restores epoch/iter
    from jdet_tpu.runner import Runner as R2

    cfg2 = Config(mini_cfg.dump())
    cfg2["resume"] = True
    runner2 = R2(cfg2)
    assert runner2.epoch == 2
    assert runner2.iter == 6


def test_checkpoint_roundtrip(mini_cfg, tmp_path):
    from flax import nnx
    from jdet_tpu.models.builder import build_detector
    from jdet_tpu.runner.checkpoint import save_checkpoint, load_checkpoint

    m1 = build_detector(mini_cfg.model.dump(), seed=1)
    m2 = build_detector(mini_cfg.model.dump(), seed=2)
    p = str(tmp_path / "ck.pkl")
    save_checkpoint(p, m1, meta={"epoch": 3})
    meta = load_checkpoint(p, m2)
    assert meta["epoch"] == 3
    s1 = nnx.to_flat_state(nnx.state(m1))
    s2 = nnx.to_flat_state(nnx.state(m2))
    for (p1, l1), (p2, l2) in zip(s1, s2):
        assert np.allclose(np.asarray(l1.value), np.asarray(l2.value)), p1


def test_frozen_equivariant_train_cache(tmp_path):
    """Frozen ReResNet stages train with the PRECOMPUTED expansion cache
    (loop-invariant — runner.py:_build_train_step), unfrozen equivariant
    convs with the live expansion; frozen weights stay fixed, the rest
    train; a val() in between must not disturb any of it."""
    from flax import nnx

    from jdet_tpu.config.config import Config
    from jdet_tpu.models.equivariant import REConv2d, REConv2dLift
    from jdet_tpu.runner import Runner

    root = str(tmp_path)
    img_dir, ann = make_synthetic_dota(root, n_images=2, size=128, n_obj=3,
                                       n_classes=4)
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
        name="frozen_cache", work_dir=os.path.join(root, "work"),
        max_iter=2, max_epoch=0, log_interval=1000,
        checkpoint_interval=10000, eval_interval=None, seed=0,
        model=dict(
            type="ReDet",
            backbone=dict(type="ReResNet", depth=18, base_fields=4,
                          frozen_stages=1),
            neck=dict(type="ReFPN", out_channels=32, num_outs=5),
            rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                          nms_pre=64, nms_post=32),
            bbox_head=dict(type="ReDetHead", num_classes=15, in_channels=32,
                           fc_out_channels=64,
                           test_cfg=dict(max_per_img=8, score_thr=0.01)),
        ),
        optimizer=dict(type="SGD", lr=0.01, momentum=0.9),
        scheduler=dict(type="StepLR", milestones=[10 ** 6]),
        dataset=dict(train=dict(**ds, batch_size=2, shuffle=False),
                     val=dict(**ds, batch_size=2, filter_empty_gt=False,
                              drop_last=False)),
    )
    runner = Runner(cfg)

    def econvs(m):
        frozen, live = {}, {}
        for path, mod in nnx.iter_graph(m):
            if isinstance(mod, (REConv2d, REConv2dLift)):
                p = "/".join(map(str, path))
                seg = p.split("/")
                is_frozen = seg[0] == "backbone" and (
                    seg[1] in ("conv1", "layer1"))
                (frozen if is_frozen else live)[p] = mod
        return frozen, live

    runner.train_epoch()
    frozen, live = econvs(runner.model)
    assert frozen and live
    for p, mod in frozen.items():
        assert mod.cache_on and mod.wexp.value.size, p
    for p, mod in live.items():
        assert not mod.cache_on and mod.wexp.value.size == 0, p
    w_frozen0 = {p: np.asarray(m.weight.value).copy()
                 for p, m in frozen.items()}
    w_live0 = {p: np.asarray(m.weight.value).copy()
               for p, m in live.items()}

    runner.val()  # eval fills/drops caches; training must survive it
    cfg["max_iter"] = 4
    runner.max_iter = 4
    runner.train_epoch()
    frozen, live = econvs(runner.model)
    for p, mod in frozen.items():
        np.testing.assert_array_equal(
            np.asarray(mod.weight.value), w_frozen0[p]), p
    assert any(
        not np.array_equal(np.asarray(m.weight.value), w_live0[p])
        for p, m in live.items()
    ), "no unfrozen equivariant weight updated after val()+train"


def test_runner_device_normalize_uint8(tmp_path):
    """cfg.device_normalize + dataset image_dtype=uint8: the Runner must
    train and evaluate while shipping raw uint8 batches and normalizing
    on device (jdet_tpu.parallel.spmd.make_device_normalizer)."""
    from jdet_tpu.runner import Runner

    root = str(tmp_path)
    img_dir, ann = make_synthetic_dota(root, n_images=4, size=128)
    ds = dict(
        type="DOTADataset", annotations_file=ann, images_dir=img_dir,
        image_size=(128, 128), max_gt=16, image_dtype="uint8",
        transforms=[dict(type="RotatedResize", min_size=128, max_size=128)],
    )
    cfg = Config(
        name="u8", work_dir=os.path.join(root, "work"),
        max_epoch=1, log_interval=2, checkpoint_interval=100,
        eval_interval=None, seed=0,
        device_normalize=dict(mean=[0, 0, 0], std=[255, 255, 255]),
        model=dict(
            type="RotatedRetinaNet",
            backbone=dict(type="ResNet", depth=18, frozen_stages=-1),
            neck=dict(type="FPN", out_channels=32, num_outs=5, start_level=1,
                      add_extra_convs="on_input"),
            bbox_head=dict(
                type="RotatedRetinaHead", num_classes=16, in_channels=32,
                feat_channels=32, stacked_convs=1,
                test_cfg=dict(nms_pre=64, max_per_img=8, score_thr=0.01),
            ),
        ),
        optimizer=dict(type="SGD", lr=0.005, momentum=0.9),
        scheduler=dict(type="StepLR", milestones=[100]),
        dataset=dict(
            train=dict(**ds, batch_size=2, shuffle=True),
            val=dict(**ds, batch_size=2, filter_empty_gt=False,
                     drop_last=False),
        ),
    )
    runner = Runner(cfg)
    runner.train_epoch()
    assert runner.iter == 2
    metrics = runner.val()
    assert "eval/0_meanAP" in metrics

"""YOLO stack: yaml-parsed model, fixed-shape v5 loss, mosaic/letterbox
dataset, ModelEMA (reference networks/yolo.py + data/yolo.py)."""
import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

from jdet_tpu.models.builder import build_detector

rng = np.random.RandomState(7)


def _model(nc=15, imgsz=128):
    return build_detector(dict(type="YOLO", nc=nc, imgsz=imgsz), seed=0)


def _targets(B=2, K=8):
    hb = np.zeros((B, K, 4), np.float32)
    hb[:, 0] = [30, 30, 80, 70]
    hb[:, 1] = [10, 60, 50, 100]
    mask = np.zeros((B, K), bool)
    mask[:, :2] = True
    return {
        "gt_hboxes": jnp.asarray(hb),
        "gt_labels": jnp.asarray(np.full((B, K), 3, np.int32)),
        "gt_mask": jnp.asarray(mask),
    }


def test_yolov5s_structure():
    m = _model()
    assert m.detect.stride == [8, 16, 32]
    assert m.detect.na == 3 and m.detect.nl == 3
    # width multiple 0.5: first conv out = 32
    assert m.layers[0].conv.conv.kernel.value.shape[-1] == 32


def test_yolo_loss_and_grads():
    m = _model()
    images = jnp.asarray(rng.rand(2, 128, 128, 3).astype(np.float32))
    targets = _targets()
    graphdef, state = nnx.split(m)

    @jax.jit
    def lf(state):
        mm = nnx.merge(graphdef, state)
        losses = mm.loss(images, targets)
        return losses["box_loss"] + losses["obj_loss"] + losses["cls_loss"], losses

    (total, losses), grads = jax.value_and_grad(lf, has_aux=True)(state)
    assert np.isfinite(float(total))
    for k in ("box_loss", "obj_loss", "cls_loss"):
        v = float(losses[k])
        assert np.isfinite(v) and v >= 0, (k, v)
    gleaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in gleaves)
    assert sum(float(jnp.abs(g).sum()) for g in gleaves) > 0


def test_yolo_overfits_two_boxes():
    """A few hundred SGD steps on one image must drive box loss down and
    produce detections near the gts — catches decode/target sign bugs."""
    import optax

    m = _model()
    r = np.random.RandomState(0)  # local: keep the image order-independent
    img = (r.rand(128, 128, 3) * 0.2).astype(np.float32)
    img[20:56, 20:60] = [0.9, 0.2, 0.2]
    img[70:100, 70:120] = [0.2, 0.9, 0.2]
    images = jnp.asarray(img[None])
    hb = np.zeros((1, 4, 4), np.float32)
    hb[0, 0] = [20, 20, 60, 56]
    hb[0, 1] = [70, 70, 120, 100]
    targets = {
        "gt_hboxes": jnp.asarray(hb),
        "gt_labels": jnp.asarray(np.array([[2, 5, 0, 0]], np.int32)),
        "gt_mask": jnp.asarray(np.array([[True, True, False, False]])),
    }
    opt = nnx.Optimizer(m, optax.adam(1e-3), wrt=nnx.Param)
    graphdef, state = nnx.split((m, opt))

    @jax.jit
    def step(state):
        mm, oo = nnx.merge(graphdef, state)

        def lf(mm):
            losses = mm.loss(images, targets)
            return (losses["box_loss"] + losses["obj_loss"]
                    + losses["cls_loss"]), losses

        (tot, losses), grads = nnx.value_and_grad(lf, has_aux=True)(mm)
        oo.update(mm, grads)
        _, new_state = nnx.split((mm, oo))
        return new_state, losses

    first = None
    for i in range(350):
        state, losses = step(state)
        if first is None:
            first = float(losses["box_loss"])
    last = float(losses["box_loss"])
    assert last < first * 0.7, (first, last)

    nnx.update((m, opt), state)
    det = m.predict(images)
    s = np.asarray(det["scores"][0])
    b = np.asarray(det["boxes"][0])
    top = b[np.argsort(-s)[:2]]
    gt_centers = (hb[0, :2, :2] + hb[0, :2, 2:]) / 2
    pred_centers = (top[:, :2] + top[:, 2:]) / 2
    d = np.abs(pred_centers[:, None] - gt_centers[None]).sum(-1).min(0)
    assert (d < 30).all(), (pred_centers, gt_centers)


def _write_yolo_dataset(root, n=5, size=96):
    import cv2

    os.makedirs(f"{root}/images", exist_ok=True)
    os.makedirs(f"{root}/labels", exist_ok=True)
    r = np.random.RandomState(0)
    for i in range(n):
        img = (r.rand(size, size, 3) * 255).astype(np.uint8)
        cv2.imwrite(f"{root}/images/im{i}.jpg", img)
        with open(f"{root}/labels/im{i}.txt", "w") as f:
            f.write(f"{i % 3} 0.5 0.5 0.4 0.3\n0 0.25 0.25 0.2 0.2\n")
    return root


def test_yolo_dataset_mosaic_and_letterbox(tmp_path):
    from jdet_tpu.data.yolo import YoloDataset, letterbox

    root = _write_yolo_dataset(str(tmp_path))
    ds = YoloDataset(images_dir=f"{root}/images", labels_dir=f"{root}/labels",
                     img_size=128, batch_size=2, augment=True, mosaic=True,
                     max_gt=32, shuffle=True)
    assert len(ds) == 5
    batch, metas = next(ds.batches(seed=0))
    assert batch["images"].shape == (2, 128, 128, 3)
    assert batch["images"].max() <= 1.0 + 1e-6
    t = batch["targets"]
    assert t["gt_hboxes"].shape == (2, 32, 4)
    k = t["gt_mask"].sum()
    assert k > 0
    hb = t["gt_hboxes"][t["gt_mask"]]
    assert (hb[:, 2] > hb[:, 0]).all() and (hb[:, 3] > hb[:, 1]).all()
    assert hb.min() >= -1 and hb.max() <= 129
    # 1-based labels
    assert t["gt_labels"][t["gt_mask"]].min() >= 1

    # eval path: letterbox geometry
    img = np.zeros((60, 120, 3), np.float32)
    out, s, (dx, dy) = letterbox(img, 128)
    assert out.shape[:2] == (128, 128)
    assert abs(s - 128 / 120) < 1e-6
    ds_eval = YoloDataset(images_dir=f"{root}/images",
                          labels_dir=f"{root}/labels", img_size=128,
                          batch_size=2, augment=False, mosaic=False,
                          max_gt=32, drop_last=False)
    batch2, _ = next(ds_eval.batches())
    assert batch2["targets"]["gt_mask"].sum() == 4  # 2 boxes x 2 imgs


def test_model_ema_ramp_and_blend():
    from jdet_tpu.utils.ema import ModelEMA

    m = _model(nc=3)
    _, state = nnx.split(m)
    ema = ModelEMA(state, decay=0.9)
    zeroed = jax.tree.map(
        lambda x: jnp.zeros_like(x) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, state,
    )
    leaf0 = jax.tree.leaves(state)[0]
    ema.update(zeroed)
    d1 = ema.ramped_decay()
    assert 0 < d1 < 0.001  # heavy ramp at updates=1
    blended = jax.tree.leaves(ema.ema)[0]
    want = np.asarray(leaf0) * d1
    np.testing.assert_allclose(np.asarray(blended), want, rtol=1e-4,
                               atol=1e-6)


def test_yolo_dataset_evaluate_coco_map(tmp_path):
    """YoloDataset.evaluate closes the val loop with COCO-protocol mAP;
    perfect detections on the gt boxes must score mAP50 == 1."""
    from jdet_tpu.data.yolo import YoloDataset

    root = _write_yolo_dataset(str(tmp_path), n=3)
    ds = YoloDataset(images_dir=f"{root}/images", labels_dir=f"{root}/labels",
                     img_size=96, batch_size=1, augment=False, mosaic=False,
                     max_gt=8, drop_last=False, classes=["a", "b", "c"])
    results = []
    for batch, metas in ds.batches():
        for meta in metas:
            hb = np.asarray(meta["hboxes"], np.float32)
            lab = np.asarray(meta["labels"], np.int64)
            det = {
                "boxes": hb,
                "scores": np.full(len(hb), 0.9, np.float32),
                "labels": lab - 1,  # predictions are 0-based
                "valid": np.ones(len(hb), bool),
            }
            results.append((det, meta))
    metrics = ds.evaluate(results)
    assert metrics["eval/coco_mAP50"] == 1.0
    assert metrics["eval/coco_mAP"] > 0.99


def test_ema_checkpoint_roundtrip(tmp_path):
    """EMA shadow weights + ramp counter must survive save/load
    (eval reports EMA metrics; a resume that reset the EMA would ship a
    different model than the one validated)."""
    import jax

    from jdet_tpu.runner.checkpoint import load_checkpoint, save_checkpoint
    from jdet_tpu.utils.ema import ModelEMA

    m = _model(nc=3)
    _, state = nnx.split(m)
    ema = ModelEMA(state, decay=0.9)
    zeroed = jax.tree.map(
        lambda x: jnp.zeros_like(x) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, state,
    )
    for _ in range(3):
        ema.update(zeroed)

    path = str(tmp_path / "ck" / "ckpt.pkl")
    save_checkpoint(path, m, meta={"epoch": 1}, ema=ema)

    m2 = _model(nc=3)
    meta = load_checkpoint(path, m2)
    p = meta.pop("_ema_payload")
    ema2 = ModelEMA(p["state"], decay=p["decay"], updates=p["updates"])
    assert ema2.updates == 3
    assert abs(ema2.decay - 0.9) < 1e-9
    a = jax.tree.leaves(ema.ema)[0]
    b = jax.tree.leaves(ema2.ema)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # restored EMA keeps updating with the ramped counter
    ema2.update(zeroed)
    assert ema2.updates == 4

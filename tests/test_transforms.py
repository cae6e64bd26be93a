"""Transform pipeline unit tests (SSD train augs + flip/rotate invariants).

Reference behaviors: MinIoURandomCrop / Expand / PhotoMetricDistortion at
python/jdet/data/transforms.py:155,228,255.
"""
import numpy as np

from jdet_tpu.data.transforms import (
    Expand,
    MinIoURandomCrop,
    PhotoMetricDistortion,
    RotatedRandomFlip,
    rbox_to_poly_np,
    poly_to_rbox_np,
)


def _sample(seed=0, n=6, size=200):
    rng = np.random.default_rng(seed)
    image = rng.uniform(0, 255, (size, size, 3)).astype(np.float32)
    cx = rng.uniform(40, size - 40, n)
    cy = rng.uniform(40, size - 40, n)
    w = rng.uniform(10, 40, n)
    h = rng.uniform(10, 40, n)
    hboxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1)
    ang = rng.uniform(-np.pi / 4, 3 * np.pi / 4, n)
    rboxes = np.stack([cx, cy, w, h, ang], 1).astype(np.float32)
    target = {
        "hboxes": hboxes.astype(np.float32),
        "rboxes": rboxes,
        "polys": rbox_to_poly_np(rboxes),
        "labels": np.arange(1, n + 1, dtype=np.int64),
        "img_size": (size, size),
    }
    return image, target


def test_min_iou_random_crop_filters_and_translates():
    image, target = _sample()
    t = MinIoURandomCrop(min_ious=(0.3,), min_crop_size=0.5)
    rng = np.random.default_rng(3)
    for _ in range(10):
        img2, tgt2 = t(image.copy(), {k: (v.copy() if hasattr(v, "copy") else v)
                                      for k, v in target.items()}, rng=rng)
        h2, w2 = img2.shape[:2]
        n = len(tgt2["hboxes"])
        assert len(tgt2["labels"]) == n == len(tgt2["rboxes"])
        if n:
            c = (tgt2["hboxes"][:, :2] + tgt2["hboxes"][:, 2:4]) / 2
            assert (c >= -1).all() and (c[:, 0] <= w2 + 1).all() and (
                c[:, 1] <= h2 + 1
            ).all()
            # clipped to crop bounds
            assert tgt2["hboxes"][:, 0::2].min() >= -1e-4
            assert tgt2["hboxes"][:, 0::2].max() <= w2 + 1e-4
        if (w2, h2) != (200, 200):
            return  # at least one real crop exercised
    raise AssertionError("crop never triggered in 10 tries")


def test_min_iou_crop_keeps_labels_aligned():
    image, target = _sample(seed=1)
    labels0 = target["labels"].copy()
    cx0 = target["rboxes"][:, 0].copy()
    t = MinIoURandomCrop(min_ious=(0.1,), min_crop_size=0.4)
    rng = np.random.default_rng(11)
    for _ in range(20):
        tgt = {k: (v.copy() if hasattr(v, "copy") else v)
               for k, v in target.items()}
        img2, tgt2 = t(image.copy(), tgt, rng=rng)
        if img2.shape[:2] != image.shape[:2] and len(tgt2["labels"]):
            # each surviving label's rbox is the original translated
            for lab, cx in zip(tgt2["labels"], tgt2["rboxes"][:, 0]):
                i = int(lab) - 1
                assert labels0[i] == lab
                # translated by integer patch left offset
                assert abs((cx0[i] - cx) - round(cx0[i] - cx)) < 1e-3
            return
    raise AssertionError("no filtering crop found")


def test_expand_translates_and_fills():
    image, target = _sample(seed=2)
    t = Expand(mean=(10, 20, 30), ratio_range=(2, 2), prob=1.0)
    rng = np.random.default_rng(0)
    img2, tgt2 = t(image.copy(),
                   {k: (v.copy() if hasattr(v, "copy") else v)
                    for k, v in target.items()}, rng=rng)
    assert img2.shape == (400, 400, 3)
    dx = tgt2["rboxes"][0, 0] - target["rboxes"][0, 0]
    dy = tgt2["rboxes"][0, 1] - target["rboxes"][0, 1]
    left, top = int(round(dx)), int(round(dy))
    np.testing.assert_allclose(
        img2[top:top + 200, left:left + 200], image, atol=1e-5
    )
    # hbb and poly shifted consistently
    np.testing.assert_allclose(
        tgt2["hboxes"][:, 0] - target["hboxes"][:, 0], dx, atol=1e-5
    )
    np.testing.assert_allclose(
        tgt2["polys"][:, 1] - target["polys"][:, 1], dy, atol=1e-5
    )
    # corner pixel is fill mean
    np.testing.assert_allclose(img2[0, 0], [10, 20, 30], atol=1e-5)


def test_photometric_distortion_bounds_and_variety():
    image, target = _sample(seed=3)
    t = PhotoMetricDistortion()
    outs = []
    for s in range(4):
        img2, _ = t(image.copy(), dict(target), rng=np.random.default_rng(s))
        assert img2.shape == image.shape
        assert img2.min() >= 0 and img2.max() <= 255
        outs.append(img2)
    diffs = [np.abs(outs[i] - outs[j]).max() for i in range(4) for j in range(i)]
    assert max(diffs) > 1.0  # distortion actually does something


def test_flip_poly_rbox_consistent():
    image, target = _sample(seed=4)
    t = RotatedRandomFlip(prob=1.0, direction="horizontal")
    _, tgt2 = t(image.copy(),
                {k: (v.copy() if hasattr(v, "copy") else v)
                 for k, v in target.items()}, rng=np.random.default_rng(0))
    # flipped rboxes and flipped polys describe the same rectangles
    from_poly = poly_to_rbox_np(tgt2["polys"])
    np.testing.assert_allclose(from_poly[:, :2], tgt2["rboxes"][:, :2], atol=1e-3)
    np.testing.assert_allclose(
        np.sort(from_poly[:, 2:4]), np.sort(tgt2["rboxes"][:, 2:4]), atol=1e-3
    )

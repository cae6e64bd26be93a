"""Input pipeline: multi-worker process pool determinism + host sharding
(reference jittor.dataset worker pool, data/custom.py:34-35)."""
import os
import pickle

import numpy as np
import pytest

from jdet_tpu.data.dota import DOTADataset


@pytest.fixture(scope="module")
def tiny_ds_root(tmp_path_factory):
    import cv2

    root = str(tmp_path_factory.mktemp("loader"))
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir)
    rng = np.random.RandomState(0)
    infos = []
    for i in range(7):
        img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        name = f"i{i}.png"
        cv2.imwrite(os.path.join(img_dir, name), img)
        rb = np.asarray([[32, 32, 20, 10, 0.3]], np.float32)
        infos.append({"filename": name, "width": 64, "height": 64,
                      "ann": {"bboxes": rb,
                              "labels": np.asarray([1 + i % 3], np.int32),
                              "bboxes_ignore": np.zeros((0, 5), np.float32)}})
    ann = os.path.join(root, "labels.pkl")
    with open(ann, "wb") as f:
        pickle.dump(infos, f)
    return img_dir, ann


def _make(img_dir, ann, **kw):
    return DOTADataset(
        version="1", annotations_file=ann, images_dir=img_dir,
        transforms=[
            dict(type="RotatedResize", min_size=64, max_size=64),
            dict(type="RotatedRandomFlip", prob=0.5),
            dict(type="Normalize", mean=[0, 0, 0], std=[255, 255, 255],
                 to_bgr=False),
        ],
        image_size=(64, 64), max_gt=4, batch_size=2, shuffle=True, **kw,
    )


def test_pool_matches_thread_loader(tiny_ds_root):
    img_dir, ann = tiny_ds_root
    ds1 = _make(img_dir, ann, num_workers=1)
    ds3 = _make(img_dir, ann, num_workers=3)
    b1 = [b for b, _ in ds1.batches(epoch=2, seed=5)]
    b3 = [b for b, _ in ds3.batches(epoch=2, seed=5)]
    assert len(b1) == len(b3) == 3
    for x, y in zip(b1, b3):
        np.testing.assert_array_equal(x["images"], y["images"])
        np.testing.assert_array_equal(
            x["targets"]["gt_bboxes"], y["targets"]["gt_bboxes"]
        )
        np.testing.assert_array_equal(
            x["targets"]["gt_labels"], y["targets"]["gt_labels"]
        )


def test_epochs_differ_and_are_reproducible(tiny_ds_root):
    img_dir, ann = tiny_ds_root
    ds = _make(img_dir, ann, num_workers=1)
    e0a = [b for b, _ in ds.batches(epoch=0, seed=5)]
    e0b = [b for b, _ in ds.batches(epoch=0, seed=5)]
    e1 = [b for b, _ in ds.batches(epoch=1, seed=5)]
    np.testing.assert_array_equal(e0a[0]["images"], e0b[0]["images"])
    assert not np.array_equal(e0a[0]["images"], e1[0]["images"])


def test_shard_by_process_partitions(tiny_ds_root):
    img_dir, ann = tiny_ds_root
    ds = _make(img_dir, ann, num_workers=1, shard_by_process=True,
               drop_last=False)
    # single-process jax: sharding must be the identity
    plain = _make(img_dir, ann, num_workers=1, drop_last=False)
    a = ds._plan_batches(0, 5)
    b = plain._plan_batches(0, 5)
    assert [list(x) for x in a] == [list(x) for x in b]


def test_uint8_device_normalize_matches_host_normalize(tiny_ds_root):
    """image_dtype="uint8" + Runner device_normalize must reproduce the
    host Normalize pipeline's losses exactly (same math, moved on-device;
    batches ship 4x smaller)."""
    import jax.numpy as jnp

    from jdet_tpu.parallel.spmd import make_device_normalizer

    img_dir, ann = tiny_ds_root
    mean = [123.675, 116.28, 103.53]
    std = [58.395, 57.12, 57.375]
    base = dict(
        version="1", annotations_file=ann, images_dir=img_dir,
        image_size=(64, 64), max_gt=4, batch_size=2, shuffle=False,
        num_workers=0,
    )
    ds_host = DOTADataset(
        **base,
        transforms=[dict(type="Normalize", mean=mean, std=std,
                         to_bgr=False)],
    )
    ds_u8 = DOTADataset(**base, transforms=[], image_dtype="uint8")

    bh, _ = next(ds_host.batches(seed=0))
    bu, _ = next(ds_u8.batches(seed=0))
    assert bu["images"].dtype == np.uint8
    norm = make_device_normalizer(mean, std)
    on_device = np.asarray(norm(jnp.asarray(bu["images"])))
    np.testing.assert_allclose(on_device, bh["images"], atol=1e-5)


def test_image_cache_roundtrip(tmp_path):
    """Pre-decoded tile cache: epoch 0 decodes + fills the memmap, later
    reads come from it byte-identically (custom.py image_cache)."""
    import cv2
    import pickle
    from jdet_tpu.data.custom import CustomDataset

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    infos = []
    for i in range(3):
        img = rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
        cv2.imwrite(str(img_dir / f"t{i}.png"), img)
        infos.append({"filename": f"t{i}.png", "width": 64, "height": 64,
                      "ann": {"bboxes": np.array([[32, 32, 10, 6, 0.2]],
                                                 np.float32),
                              "labels": np.array([1], np.int32)}})
    ann = str(tmp_path / "labels.pkl")
    with open(ann, "wb") as f:
        pickle.dump(infos, f)
    ds = CustomDataset(annotations_file=ann, images_dir=str(img_dir),
                       image_size=(64, 64), batch_size=1, num_workers=0,
                       image_cache="auto")
    first = [ds.load_sample(i)[0].copy() for i in range(3)]
    assert ds._cache_valid.sum() == 3
    # poison the files: reads must now come from the cache
    for i in range(3):
        (img_dir / f"t{i}.png").unlink()
    again = [ds.load_sample(i)[0] for i in range(3)]
    for a, b in zip(first, again):
        np.testing.assert_array_equal(a, b)

"""Device-side augmentation: equivalence with the host transforms.

make_device_augmenter must reproduce RotatedRandomFlip / RandomRotateAug
(data/transforms.py) image and rbox math exactly — the augmentation moved
into the jitted step, not a different augmentation.
"""
import numpy as np
import jax
import jax.numpy as jnp

from jdet_tpu.data.transforms import RandomRotateAug, RotatedRandomFlip
from jdet_tpu.parallel.spmd import make_device_augmenter


def _batch(B=4, S=64, K=6, seed=3):
    rng = np.random.RandomState(seed)
    images = rng.randint(0, 255, (B, S, S, 3), dtype=np.uint8)
    gb = np.stack([
        rng.uniform(10, S - 10, (B, K)), rng.uniform(10, S - 10, (B, K)),
        rng.uniform(4, 20, (B, K)), rng.uniform(4, 12, (B, K)),
        rng.uniform(-np.pi / 4, 3 * np.pi / 4, (B, K)),
    ], -1).astype(np.float32)
    mask = np.ones((B, K), bool)
    return images, {"gt_bboxes": jnp.asarray(gb),
                    "gt_mask": jnp.asarray(mask)}


def test_flip_h_matches_host_transform():
    images, targets = _batch()
    aug = make_device_augmenter(flip_h=1.0)
    out_img, out_t = aug(jnp.asarray(images), targets, jax.random.PRNGKey(0))
    host = RotatedRandomFlip(prob=1.0, direction="horizontal")
    for b in range(images.shape[0]):
        h_img, h_t = host(
            images[b], {"rboxes": np.asarray(targets["gt_bboxes"][b])},
            rng=np.random.default_rng(0),
        )
        np.testing.assert_array_equal(
            np.asarray(out_img[b], np.uint8), h_img
        )
        np.testing.assert_allclose(
            np.asarray(out_t["gt_bboxes"][b]), h_t["rboxes"], atol=1e-4
        )


def test_flip_v_matches_host_transform():
    images, targets = _batch(seed=5)
    aug = make_device_augmenter(flip_v=1.0)
    out_img, out_t = aug(jnp.asarray(images), targets, jax.random.PRNGKey(1))
    host = RotatedRandomFlip(prob=1.0, direction="vertical")
    for b in range(images.shape[0]):
        h_img, h_t = host(
            images[b], {"rboxes": np.asarray(targets["gt_bboxes"][b])},
            rng=np.random.default_rng(0),
        )
        np.testing.assert_array_equal(
            np.asarray(out_img[b], np.uint8), h_img
        )
        np.testing.assert_allclose(
            np.asarray(out_t["gt_bboxes"][b]), h_t["rboxes"], atol=1e-4
        )


def test_rot90_matches_host_transform():
    images, targets = _batch(B=8, seed=7)
    aug = make_device_augmenter(rot90=1.0)
    out_img, out_t = aug(jnp.asarray(images), targets, jax.random.PRNGKey(2))
    out_img = np.asarray(out_img, np.uint8)
    matched_ks = set()
    for b in range(images.shape[0]):
        # identify this sample's k from the image, then check the boxes
        # against the host transform's math for that k
        for k in range(4):
            if np.array_equal(out_img[b], np.rot90(images[b], k)):
                break
        else:
            raise AssertionError("device rot90 image matches no host k")
        matched_ks.add(k)
        if k == 0:
            continue
        host = RandomRotateAug(rotate_ratio=1.0)

        class _R:
            def random(self):
                return 0.0

            def integers(self, lo, hi):
                return k

        h_img, h_t = host(
            images[b], {"rboxes": np.asarray(targets["gt_bboxes"][b])},
            rng=_R(),
        )
        np.testing.assert_array_equal(out_img[b], h_img)
        np.testing.assert_allclose(
            np.asarray(out_t["gt_bboxes"][b]), h_t["rboxes"], atol=1e-3
        )
    assert len(matched_ks) > 1  # the key actually varies k across samples


def test_jit_compiles_with_uint8():
    images, targets = _batch()
    aug = make_device_augmenter(flip_h=0.5, flip_v=0.5, rot90=0.5)

    @jax.jit
    def f(img, t, key):
        return aug(img, t, key)

    out_img, out_t = f(jnp.asarray(images), targets, jax.random.PRNGKey(3))
    assert out_img.dtype == jnp.float32
    assert np.isfinite(np.asarray(out_t["gt_bboxes"])).all()

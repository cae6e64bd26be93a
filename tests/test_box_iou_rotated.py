import numpy as np
import jax.numpy as jnp
import pytest

from jdet_tpu.ops import box_iou_rotated, box_iou_rotated_aligned
from oracles.rotated_geometry import box_iou_rotated_np, single_box_iou_rotated

rng = np.random.RandomState(42)


def random_rboxes(n, spread=100.0):
    cx = rng.uniform(0, spread, n)
    cy = rng.uniform(0, spread, n)
    w = rng.uniform(5, 60, n)
    h = rng.uniform(5, 60, n)
    a = rng.uniform(-np.pi, np.pi, n)
    return np.stack([cx, cy, w, h, a], 1).astype(np.float32)


def test_identical_boxes():
    b = random_rboxes(20)
    iou = np.asarray(box_iou_rotated_aligned(jnp.asarray(b), jnp.asarray(b)))
    assert np.allclose(iou, 1.0, atol=1e-4)


def test_disjoint_boxes():
    b1 = np.array([[0.0, 0.0, 10.0, 10.0, 0.3]], np.float32)
    b2 = np.array([[100.0, 100.0, 10.0, 10.0, -0.7]], np.float32)
    iou = np.asarray(box_iou_rotated(jnp.asarray(b1), jnp.asarray(b2)))
    assert iou[0, 0] == 0.0


def test_axis_aligned_matches_hbb():
    b1 = np.array([[10.0, 10.0, 20.0, 10.0, 0.0]], np.float32)
    b2 = np.array([[15.0, 10.0, 20.0, 10.0, 0.0]], np.float32)
    # overlap: x in [5,20] w=15, y h=10 -> inter=150, union=400-150=250
    iou = np.asarray(box_iou_rotated(jnp.asarray(b1), jnp.asarray(b2)))
    assert np.allclose(iou[0, 0], 150.0 / 250.0, atol=1e-5)


def test_45deg_cross():
    # two unit squares rotated 45deg sharing center: intersection is a
    # regular octagon with area 2*(sqrt(2)-1)
    b1 = np.array([[0.0, 0.0, 1.0, 1.0, 0.0]], np.float32)
    b2 = np.array([[0.0, 0.0, 1.0, 1.0, np.pi / 4]], np.float32)
    inter_ref = 2 * (np.sqrt(2) - 1)
    iou_ref = inter_ref / (2 - inter_ref)
    iou = np.asarray(box_iou_rotated(jnp.asarray(b1), jnp.asarray(b2)))
    assert np.allclose(iou[0, 0], iou_ref, atol=1e-5)


def test_contained_box():
    b1 = np.array([[0.0, 0.0, 100.0, 100.0, 0.2]], np.float32)
    b2 = np.array([[0.0, 0.0, 10.0, 10.0, 1.0]], np.float32)
    iou = np.asarray(box_iou_rotated(jnp.asarray(b1), jnp.asarray(b2)))
    assert np.allclose(iou[0, 0], 100.0 / 10000.0, atol=1e-6)


def test_against_oracle_random():
    b1 = random_rboxes(40)
    b2 = random_rboxes(50)
    ref = box_iou_rotated_np(b1.astype(np.float64), b2.astype(np.float64))
    got = np.asarray(box_iou_rotated(jnp.asarray(b1), jnp.asarray(b2)))
    assert got.shape == (40, 50)
    assert np.abs(got - ref).max() < 2e-3


def test_against_oracle_clustered():
    # heavy-overlap regime (NMS-like)
    base = random_rboxes(30, spread=20.0)
    b1 = base + rng.randn(30, 5).astype(np.float32) * np.array(
        [2, 2, 3, 3, 0.1], np.float32
    )
    b1[:, 2:4] = np.abs(b1[:, 2:4]) + 2
    ref = box_iou_rotated_np(b1.astype(np.float64), base.astype(np.float64))
    got = np.asarray(box_iou_rotated(jnp.asarray(b1), jnp.asarray(base)))
    assert np.abs(got - ref).max() < 2e-3


def test_iof_mode():
    b1 = np.array([[0.0, 0.0, 10.0, 10.0, 0.0]], np.float32)
    b2 = np.array([[5.0, 0.0, 10.0, 10.0, 0.0]], np.float32)
    iof = np.asarray(box_iou_rotated(jnp.asarray(b1), jnp.asarray(b2), mode="iof"))
    assert np.allclose(iof[0, 0], 50.0 / 100.0, atol=1e-5)


def test_chunked_matches_unchunked():
    b1 = random_rboxes(700)
    b2 = random_rboxes(13)
    full = np.asarray(box_iou_rotated(jnp.asarray(b1), jnp.asarray(b2), chunk=512))
    small = np.asarray(box_iou_rotated(jnp.asarray(b1), jnp.asarray(b2), chunk=4096))
    assert np.allclose(full, small, atol=1e-6)


def test_degenerate_zero_size():
    b1 = np.array([[10.0, 10.0, 0.0, 0.0, 0.0]], np.float32)
    b2 = np.array([[10.0, 10.0, 5.0, 5.0, 0.5]], np.float32)
    iou = np.asarray(box_iou_rotated(jnp.asarray(b1), jnp.asarray(b2)))
    assert np.isfinite(iou).all()


def test_gradient_flows():
    import jax

    b1 = jnp.asarray([[0.0, 0.0, 10.0, 8.0, 0.1]])
    b2 = jnp.asarray([[2.0, 1.0, 9.0, 7.0, 0.4]])

    def f(b):
        return box_iou_rotated_aligned(b, b2).sum()

    g = jax.grad(f)(b1)
    assert np.isfinite(np.asarray(g)).all()
    # numerical check on cx
    eps = 1e-3
    f0 = f(b1)
    f1 = f(b1.at[0, 0].add(eps))
    assert np.allclose((f1 - f0) / eps, g[0, 0], atol=1e-2)


def test_pallas_rect_kernel_parity_interpret():
    """The Pallas rect-frame kernel (ops/pallas_iou.py) must reproduce the
    XLA Green's-theorem path bit-close, including identical boxes
    (IoU exactly 1 via the shared-boundary 1/2 weights), crossed boxes,
    touching boxes, and batched (vmapped) use."""
    from jdet_tpu.ops.pallas_iou import box_iou_rotated_pallas
    import jax

    rng2 = np.random.RandomState(3)
    K, N = 10, 300
    gts = np.stack([rng2.uniform(0, 500, K), rng2.uniform(0, 500, K),
                    rng2.uniform(8, 200, K), rng2.uniform(8, 120, K),
                    rng2.uniform(-np.pi, np.pi, K)], 1).astype(np.float32)
    an = np.stack([rng2.uniform(0, 500, N), rng2.uniform(0, 500, N),
                   rng2.uniform(8, 200, N), rng2.uniform(8, 120, N),
                   rng2.uniform(-np.pi, np.pi, N)], 1).astype(np.float32)
    an[:K] = gts                                    # identical
    an[K:2 * K] = gts
    an[K:2 * K, 4] += np.pi / 2                     # crossed
    an[2 * K:3 * K] = gts
    an[2 * K:3 * K, 0] += gts[:, 2]                 # touching

    want = np.asarray(box_iou_rotated(jnp.asarray(gts), jnp.asarray(an),
                                      impl="xla"))
    got = np.asarray(
        box_iou_rotated_pallas(jnp.asarray(gts), jnp.asarray(an),
                               interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=2e-4)
    np.testing.assert_allclose(got[np.arange(K), np.arange(K)], 1.0,
                               atol=1e-5)

    # vmapped over a batch axis (the anchor_target_batch shape)
    B = 2
    gts_b = np.stack([gts, gts[::-1]]).astype(np.float32)
    got_b = np.asarray(
        jax.vmap(lambda g: box_iou_rotated_pallas(g, jnp.asarray(an),
                                                  interpret=True))(
            jnp.asarray(gts_b)
        )
    )
    assert got_b.shape == (B, K, N)
    np.testing.assert_allclose(got_b[0], want, atol=2e-4)

import numpy as np
import jax.numpy as jnp

from jdet_tpu.ops import nms_rotated, ml_nms_rotated, multiclass_nms_rotated
from oracles.rotated_geometry import nms_rotated_np

rng = np.random.RandomState(7)


def random_cluster(n, centers=4, spread=200.0):
    base = rng.uniform(0, spread, (centers, 2))
    pick = rng.randint(0, centers, n)
    cxy = base[pick] + rng.randn(n, 2) * 6
    w = rng.uniform(15, 50, n)
    h = rng.uniform(10, 40, n)
    a = rng.uniform(-np.pi, np.pi, n)
    boxes = np.concatenate([cxy, w[:, None], h[:, None], a[:, None]], 1)
    scores = rng.uniform(0.05, 1.0, n)
    return boxes.astype(np.float32), scores.astype(np.float32)


def kept_indices(order, keep):
    order = np.asarray(order)
    keep = np.asarray(keep)
    return order[keep]


def test_nms_matches_oracle():
    for trial in range(3):
        boxes, scores = random_cluster(60)
        # avoid exact score/IoU-threshold ties by construction (random floats)
        ref = nms_rotated_np(boxes.astype(np.float64), scores, 0.3)
        order, keep = nms_rotated(jnp.asarray(boxes), jnp.asarray(scores), 0.3)
        got = kept_indices(order, keep)
        assert sorted(got.tolist()) == sorted(ref.tolist()), (
            trial,
            sorted(got.tolist()),
            sorted(ref.tolist()),
        )


def test_nms_no_overlap_keeps_all():
    boxes = np.array(
        [[i * 100.0, 0.0, 10.0, 10.0, 0.1 * i] for i in range(10)], np.float32
    )
    scores = rng.uniform(0, 1, 10).astype(np.float32)
    order, keep = nms_rotated(jnp.asarray(boxes), jnp.asarray(scores), 0.1)
    assert np.asarray(keep).sum() == 10


def test_nms_identical_keeps_best():
    boxes = np.tile(np.array([[50, 50, 20, 10, 0.3]], np.float32), (5, 1))
    scores = np.array([0.9, 0.8, 0.7, 0.6, 0.5], np.float32)
    order, keep = nms_rotated(jnp.asarray(boxes), jnp.asarray(scores), 0.5)
    got = kept_indices(order, keep)
    assert got.tolist() == [0]


def test_nms_respects_valid_mask():
    boxes = np.tile(np.array([[50, 50, 20, 10, 0.3]], np.float32), (3, 1))
    boxes[2] = [500, 500, 20, 10, 0.0]
    scores = np.array([0.5, 0.9, 0.1], np.float32)
    valid = jnp.asarray([True, False, True])
    order, keep = nms_rotated(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, valid=valid
    )
    got = kept_indices(order, keep)
    assert sorted(got.tolist()) == [0, 2]


def test_ml_nms_separates_classes():
    boxes = np.tile(np.array([[50, 50, 20, 10, 0.3]], np.float32), (2, 1))
    scores = np.array([0.9, 0.8], np.float32)
    labels = jnp.asarray([0, 1], dtype=jnp.int32)
    order, keep = ml_nms_rotated(
        jnp.asarray(boxes), jnp.asarray(scores), labels, 0.5
    )
    assert np.asarray(keep).sum() == 2  # different classes: both kept
    labels = jnp.asarray([1, 1], dtype=jnp.int32)
    order, keep = ml_nms_rotated(
        jnp.asarray(boxes), jnp.asarray(scores), labels, 0.5
    )
    assert np.asarray(keep).sum() == 1


def test_multiclass_nms_shapes_and_content():
    n, C = 100, 5
    boxes, scores1 = random_cluster(n)
    cls_scores = rng.uniform(0, 0.4, (n, C)).astype(np.float32)
    cls_scores[3, 2] = 0.95
    cls_scores[17, 0] = 0.9
    out = multiclass_nms_rotated(
        jnp.asarray(boxes),
        jnp.asarray(cls_scores),
        score_thr=0.05,
        nms_iou_thr=0.1,
        max_per_img=50,
    )
    assert out["boxes"].shape == (50, 5)
    assert out["scores"].shape == (50,)
    assert out["labels"].shape == (50,)
    v = np.asarray(out["valid"])
    s = np.asarray(out["scores"])
    l = np.asarray(out["labels"])
    assert v.any()
    # top detection is the highest scoring one
    assert np.allclose(s[0], 0.95, atol=1e-6)
    assert l[0] == 2
    # scores descending over valid entries
    sv = s[v]
    assert (np.diff(sv) <= 1e-6).all()
    # invalid slots zeroed / -1
    assert (l[~v] == -1).all()
    assert (s[~v] == 0).all()


def test_multiclass_nms_score_thr_filters():
    n, C = 30, 3
    boxes, _ = random_cluster(n)
    cls_scores = np.full((n, C), 0.01, np.float32)
    out = multiclass_nms_rotated(
        jnp.asarray(boxes),
        jnp.asarray(cls_scores),
        score_thr=0.05,
        nms_iou_thr=0.5,
        max_per_img=10,
    )
    assert not np.asarray(out["valid"]).any()


def test_nms_jit_compiles():
    import jax

    boxes, scores = random_cluster(64)
    f = jax.jit(lambda b, s: nms_rotated(b, s, 0.3))
    o1, k1 = f(jnp.asarray(boxes), jnp.asarray(scores))
    o2, k2 = nms_rotated(jnp.asarray(boxes), jnp.asarray(scores), 0.3)
    assert (np.asarray(k1) == np.asarray(k2)).all()

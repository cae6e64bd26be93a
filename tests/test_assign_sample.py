import numpy as np
import jax
import jax.numpy as jnp

from jdet_tpu.models.boxes import (
    assign_wrt_overlaps,
    max_iou_assign_rotated,
    hbb_overlaps,
    pseudo_sample,
    random_sample,
    anchor_target_single,
    AnchorGeneratorRotated,
)

rng = np.random.RandomState(11)


def assign_oracle(overlaps, pos_thr, neg_thr, min_pos_iou=0.0,
                  gt_max_assign_all=True, match_low_quality=True):
    """Sequential transcription of MaxIoUAssigner.assign_wrt_overlaps
    (reference assigner.py:160-221)."""
    k, n = overlaps.shape
    assigned = np.full(n, -1, np.int64)
    max_overlaps = overlaps.max(0)
    argmax = overlaps.argmax(0)
    assigned[(max_overlaps >= 0) & (max_overlaps < neg_thr)] = 0
    pos = max_overlaps >= pos_thr
    assigned[pos] = argmax[pos] + 1
    if match_low_quality:
        gt_max = overlaps.max(1)
        for i in range(k):
            if gt_max[i] >= min_pos_iou:
                if gt_max_assign_all:
                    assigned[overlaps[i] == gt_max[i]] = i + 1
                else:
                    assigned[overlaps[i].argmax()] = i + 1
    return assigned


def test_assign_matches_oracle():
    for trial in range(5):
        k, n = 8, 200
        overlaps = rng.uniform(0, 1, (k, n)).astype(np.float32)
        ref = assign_oracle(overlaps.astype(np.float64), 0.5, 0.4)
        got = assign_wrt_overlaps(
            jnp.asarray(overlaps), jnp.ones(k, bool),
            pos_iou_thr=0.5, neg_iou_thr=0.4,
        )
        assert (np.asarray(got["gt_inds"]) == ref).all(), trial


def test_assign_gt_padding_ignored():
    k, n = 6, 50
    overlaps = rng.uniform(0, 1, (k, n)).astype(np.float32)
    mask = np.array([True, True, True, False, False, False])
    ref = assign_oracle(overlaps[:3].astype(np.float64), 0.5, 0.4)
    got = assign_wrt_overlaps(
        jnp.asarray(overlaps), jnp.asarray(mask),
        pos_iou_thr=0.5, neg_iou_thr=0.4,
    )
    assert (np.asarray(got["gt_inds"]) == ref).all()


def test_assign_no_gt_all_negative():
    overlaps = rng.uniform(0, 1, (4, 30)).astype(np.float32)
    got = assign_wrt_overlaps(
        jnp.asarray(overlaps), jnp.zeros(4, bool),
        pos_iou_thr=0.5, neg_iou_thr=0.4,
    )
    assert (np.asarray(got["gt_inds"]) == 0).all()
    assert (np.asarray(got["labels"]) == 0).all()


def test_assign_labels():
    overlaps = np.zeros((2, 5), np.float32)
    overlaps[0, 1] = 0.9
    overlaps[1, 3] = 0.7
    labels = jnp.asarray([4, 7], dtype=jnp.int32)
    got = assign_wrt_overlaps(
        jnp.asarray(overlaps), jnp.ones(2, bool), labels,
        pos_iou_thr=0.5, neg_iou_thr=0.4,
    )
    out = np.asarray(got["labels"])
    assert out[1] == 4 and out[3] == 7
    assert out[0] == 0


def test_assign_anchor_mask_excludes():
    overlaps = np.zeros((1, 4), np.float32)
    overlaps[0] = [0.9, 0.8, 0.3, 0.1]
    am = jnp.asarray([False, True, True, True])
    got = assign_wrt_overlaps(
        jnp.asarray(overlaps), jnp.ones(1, bool),
        pos_iou_thr=0.5, neg_iou_thr=0.4, anchor_mask=am,
    )
    out = np.asarray(got["gt_inds"])
    # anchor 0 excluded -> ignore; gt claims anchor 1 (its best inside)
    assert out[0] == -1 and out[1] == 1 and out[2] == 0 and out[3] == 0


def test_rotated_assign_end_to_end():
    gen = AnchorGeneratorRotated(32, octave_base_scale=4, scales_per_octave=3,
                                 ratios=[1.0, 0.5, 2.0])
    anchors = jnp.asarray(gen.grid_anchors((8, 8), 32))
    gt = np.zeros((4, 5), np.float32)
    gt[0] = [100, 100, 120, 60, 0.3]
    gt[1] = [40, 200, 80, 40, -0.5]
    mask = np.array([True, True, False, False])
    labels = np.array([2, 5, 0, 0], np.int32)
    got = max_iou_assign_rotated(
        anchors, jnp.asarray(gt), jnp.asarray(mask), jnp.asarray(labels),
        pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0,
    )
    gi = np.asarray(got["gt_inds"])
    lb = np.asarray(got["labels"])
    # each real gt claims at least one anchor (low-quality match)
    assert (gi == 1).sum() >= 1 and (gi == 2).sum() >= 1
    assert (gi <= 2).all()
    assert set(np.unique(lb)) <= {0, 2, 5}


def test_hbb_overlaps():
    b1 = jnp.asarray([[0.0, 0, 10, 10]])
    b2 = jnp.asarray([[5.0, 0, 15, 10], [20.0, 20, 30, 30]])
    iou = np.asarray(hbb_overlaps(b1, b2))
    assert np.allclose(iou, [[50 / 150, 0.0]], atol=1e-6)


def test_random_sampler_budgets():
    gt_inds = np.zeros(1000, np.int32)
    gt_inds[:300] = 1  # 300 positives
    assign = {"gt_inds": jnp.asarray(gt_inds)}
    out = random_sample(assign, jax.random.PRNGKey(0), num=256, pos_fraction=0.5)
    pos = np.asarray(out["pos_mask"])
    neg = np.asarray(out["neg_mask"])
    assert pos.sum() == 128  # capped at num*pos_fraction
    assert neg.sum() == 128
    assert not (pos & neg).any()
    assert (gt_inds[pos] > 0).all() and (gt_inds[neg] == 0).all()


def test_random_sampler_few_pos():
    gt_inds = np.zeros(100, np.int32)
    gt_inds[:5] = 1
    assign = {"gt_inds": jnp.asarray(gt_inds)}
    out = random_sample(assign, jax.random.PRNGKey(1), num=64, pos_fraction=0.25)
    assert np.asarray(out["pos_mask"]).sum() == 5
    assert np.asarray(out["neg_mask"]).sum() == 59


def test_anchor_target_single_shapes_and_encoding():
    gen = AnchorGeneratorRotated(16, scales=[4], ratios=[1.0])
    anchors = jnp.asarray(gen.grid_anchors((16, 16), 16))
    n = anchors.shape[0]
    gt = np.zeros((8, 5), np.float32)
    gt[0] = [128, 128, 100, 50, 0.2]
    mask = np.zeros(8, bool)
    mask[0] = True
    labels = np.zeros(8, np.int32)
    labels[0] = 3
    out = anchor_target_single(
        anchors, jnp.ones(n, bool), jnp.asarray(gt), jnp.asarray(mask),
        jnp.asarray(labels),
        assigner_cfg=dict(pos_iou_thr=0.5, neg_iou_thr=0.4),
    )
    assert out["labels"].shape == (n,)
    assert out["bbox_targets"].shape == (n, 5)
    pos = np.asarray(out["pos_mask"])
    assert pos.sum() >= 1
    assert (np.asarray(out["labels"])[pos] == 3).all()
    # encoded targets nonzero only at positives
    bt = np.asarray(out["bbox_targets"])
    assert (np.abs(bt[~pos]) < 1e-9).all()
    assert np.abs(bt[pos]).sum() > 0
    # weights
    lw = np.asarray(out["label_weights"])
    assert ((lw == 1) | (lw == 0)).all()
    assert (lw[pos] == 1).all()


def test_anchor_target_jits_and_vmaps():
    from jdet_tpu.models.boxes import anchor_target_batch

    gen = AnchorGeneratorRotated(16, scales=[4], ratios=[1.0])
    anchors = jnp.asarray(gen.grid_anchors((8, 8), 16))
    n = anchors.shape[0]
    B, K = 2, 8
    gt = np.zeros((B, K, 5), np.float32)
    gt[0, 0] = [64, 64, 60, 30, 0.1]
    gt[1, 0] = [32, 32, 40, 20, -0.2]
    gt[1, 1] = [90, 90, 50, 25, 0.8]
    mask = np.zeros((B, K), bool)
    mask[0, 0] = mask[1, 0] = mask[1, 1] = True
    labels = np.ones((B, K), np.int32)

    f = jax.jit(
        lambda a, vf, g, m, l: anchor_target_batch(
            a, vf, g, m, l,
            assigner_cfg=dict(pos_iou_thr=0.5, neg_iou_thr=0.4),
        )
    )
    out, npos, nneg = f(
        anchors, jnp.ones(n, bool), jnp.asarray(gt), jnp.asarray(mask),
        jnp.asarray(labels),
    )
    assert out["labels"].shape == (B, n)
    assert int(npos) >= 3  # at least one anchor per real gt
    assert int(npos) + int(nneg) <= B * n

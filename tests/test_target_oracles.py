"""Reference-lockstep oracle tests for the target pipeline.

The numpy oracles (tests/oracles/anchor_target_oracle.py) are loop-level
transcriptions of the reference's MaxIoUAssigner + anchor_target_single +
bbox2delta_rotated + MidpointOffsetCoder.encode. These tests assert the
repo's batched-masked formulations produce identical labels / weights /
targets on random inputs — any off-by-one, sign, or convention drift in
assignment order, tie handling, or encode frames fails here.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jdet_tpu.models.boxes.anchor_target import (
    anchor_target_batch,
    anchor_target_single,
)
from jdet_tpu.models.boxes.coder import midpoint_offset_encode
from jdet_tpu.ops.box_convert import rbox_to_hbox, rbox_to_poly
from jdet_tpu.ops.box_iou_rotated import box_iou_rotated

from oracles.anchor_target_oracle import (
    anchor_target_single_np,
    assign_wrt_overlaps_np,
    midpoint_offset_encode_np,
)

RNG = np.random.RandomState(20)


def _random_anchors(n, span=256.0):
    a = np.zeros((n, 5), np.float32)
    a[:, 0] = RNG.rand(n) * span
    a[:, 1] = RNG.rand(n) * span
    a[:, 2] = 8 + RNG.rand(n) * 48
    a[:, 3] = 8 + RNG.rand(n) * 48
    a[:, 4] = (RNG.rand(n) - 0.5) * np.pi
    return a


def _random_gts(k, span=256.0):
    g = _random_anchors(k, span)
    g[:, 2:4] *= 1.5
    return g


@pytest.mark.parametrize("cfg", [
    dict(pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0),
    dict(pos_iou_thr=0.6, neg_iou_thr=0.3, min_pos_iou=0.1),
    dict(pos_iou_thr=0.5, neg_iou_thr=(0.2, 0.45), min_pos_iou=0.0),
])
def test_assign_matches_reference(cfg):
    from jdet_tpu.models.boxes.assigner import assign_wrt_overlaps

    anchors = _random_anchors(600)
    gts = _random_gts(6)
    ov = np.asarray(box_iou_rotated(jnp.asarray(gts), jnp.asarray(anchors)))

    ref_assigned, ref_labels, _ = assign_wrt_overlaps_np(
        ov.astype(np.float64), gt_labels=np.arange(1, 7), **cfg
    )
    got = assign_wrt_overlaps(
        jnp.asarray(ov), jnp.ones(6, bool),
        gt_labels=jnp.arange(1, 7, dtype=jnp.int32), **cfg
    )
    np.testing.assert_array_equal(np.asarray(got["gt_inds"]), ref_assigned)
    np.testing.assert_array_equal(np.asarray(got["labels"]), ref_labels)


def test_anchor_target_matches_reference():
    n, k = 800, 5
    anchors = _random_anchors(n)
    gts = _random_gts(k)
    gt_labels = RNG.randint(1, 16, size=k)
    valid = RNG.rand(n) > 0.15  # some anchors outside

    ov = np.asarray(
        box_iou_rotated(jnp.asarray(gts), jnp.asarray(anchors))
    ).astype(np.float64)
    ref = anchor_target_single_np(
        anchors.astype(np.float64), valid, gts.astype(np.float64),
        gt_labels, ov,
    )

    got = anchor_target_single(
        jnp.asarray(anchors), jnp.asarray(valid),
        jnp.asarray(gts), jnp.ones(k, bool),
        jnp.asarray(gt_labels, dtype=jnp.int32),
        assigner_cfg=dict(pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0),
        rotated=True,
    )
    np.testing.assert_array_equal(np.asarray(got["labels"]), ref["labels"])
    np.testing.assert_allclose(
        np.asarray(got["label_weights"]), ref["label_weights"], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got["bbox_weights"]), ref["bbox_weights"], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got["bbox_targets"]), ref["bbox_targets"],
        atol=2e-3,  # f32 batched vs f64 loop encode
    )


def test_anchor_target_batch_counts_match_reference():
    """num_total_pos/neg use the reference's max(count, 1) per image
    (anchor_target.py:79-80) — including an image with zero positives."""
    n, k, B = 400, 4, 3
    anchors = _random_anchors(n)
    gts = np.stack([_random_gts(k) for _ in range(B)])
    gts[2, :, :2] += 10000.0  # image 2: no anchor overlaps -> 0 positives
    labels = RNG.randint(1, 16, size=(B, k))
    mask = np.ones((B, k), bool)
    valid = np.ones(n, bool)

    out, num_pos, num_neg = anchor_target_batch(
        jnp.asarray(anchors), jnp.asarray(valid), jnp.asarray(gts),
        jnp.asarray(mask), jnp.asarray(labels, dtype=jnp.int32),
        assigner_cfg=dict(pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0),
        rotated=True,
    )
    ref_pos = ref_neg = 0
    for b in range(B):
        ov = np.asarray(
            box_iou_rotated(jnp.asarray(gts[b]), jnp.asarray(anchors))
        ).astype(np.float64)
        r = anchor_target_single_np(
            anchors.astype(np.float64), valid, gts[b].astype(np.float64),
            labels[b], ov,
        )
        ref_pos += r["num_pos"]
        ref_neg += r["num_neg"]
    assert int(num_pos) == ref_pos
    assert int(num_neg) == ref_neg


def test_odm_style_per_image_anchors_match_reference():
    """S2ANet's ODM stage assigns against per-image refined anchors
    ((B, n, 5), s2anet_head.py loss) — the vmapped per-image-anchor path
    must match the oracle image by image."""
    n, k, B = 300, 4, 2
    anchors = np.stack([_random_anchors(n) for _ in range(B)])
    gts = np.stack([_random_gts(k) for _ in range(B)])
    labels = RNG.randint(1, 16, size=(B, k))

    out, _, _ = anchor_target_batch(
        jnp.asarray(anchors), jnp.ones(n, bool), jnp.asarray(gts),
        jnp.ones((B, k), bool), jnp.asarray(labels, dtype=jnp.int32),
        assigner_cfg=dict(pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0),
        rotated=True,
    )
    for b in range(B):
        ov = np.asarray(
            box_iou_rotated(jnp.asarray(gts[b]), jnp.asarray(anchors[b]))
        ).astype(np.float64)
        ref = anchor_target_single_np(
            anchors[b].astype(np.float64), np.ones(n, bool),
            gts[b].astype(np.float64), labels[b], ov,
        )
        np.testing.assert_array_equal(
            np.asarray(out["labels"][b]), ref["labels"]
        )
        np.testing.assert_allclose(
            np.asarray(out["bbox_targets"][b]), ref["bbox_targets"],
            atol=2e-3,
        )


def test_midpoint_encode_matches_reference():
    """Oriented RPN's midpoint-offset encode (coder.py:323-377)."""
    k = 64
    gts = _random_gts(k)
    hbb = np.asarray(rbox_to_hbox(jnp.asarray(gts)))
    # jitter proposals off the gt hboxes
    prop = hbb + RNG.randn(k, 4).astype(np.float32) * 2.0
    prop[:, 2:] = np.maximum(prop[:, 2:], prop[:, :2] + 4.0)

    got = np.asarray(
        midpoint_offset_encode(jnp.asarray(prop), jnp.asarray(gts))
    )
    poly = np.asarray(rbox_to_poly(jnp.asarray(gts))).astype(np.float64)
    ref = midpoint_offset_encode_np(
        prop.astype(np.float64), poly, hbb.astype(np.float64)
    )
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_alignconv_offsets_match_reference():
    """AlignConv offset field vs a numpy transcription of the reference's
    per-anchor loop (s2anet_head.py:677-713): sampling-grid rotation,
    stride normalization, (dy, dx) stacking order."""
    from jdet_tpu.models.heads.s2anet_head import AlignConv
    from flax import nnx

    def oracle_np(anchors, feat_h, feat_w, stride, k=3):
        # anchors (N, 5) for one image, N = feat_h * feat_w
        pad = (k - 1) // 2
        idx = np.arange(-pad, pad + 1, dtype=np.float32)
        yy, xx = np.meshgrid(idx, idx, indexing="ij")
        xx = xx.reshape(-1)
        yy = yy.reshape(-1)
        xc = np.arange(feat_w, dtype=np.float32)
        yc = np.arange(feat_h, dtype=np.float32)
        yc, xc = np.meshgrid(yc, xc, indexing="ij")
        xc = xc.reshape(-1)
        yc = yc.reshape(-1)
        x_conv = xc[:, None] + xx
        y_conv = yc[:, None] + yy
        x_ctr, y_ctr, w, h, a = [anchors[:, i] for i in range(5)]
        x_ctr, y_ctr, w, h = (x_ctr / stride, y_ctr / stride,
                              w / stride, h / stride)
        cos, sin = np.cos(a), np.sin(a)
        dw, dh = w / k, h / k
        x = dw[:, None] * xx
        y = dh[:, None] * yy
        xr = cos[:, None] * x - sin[:, None] * y
        yr = sin[:, None] * x + cos[:, None] * y
        x_anchor = xr + x_ctr[:, None]
        y_anchor = yr + y_ctr[:, None]
        off = np.stack([y_anchor - y_conv, x_anchor - x_conv], -1)
        return off.reshape(feat_h, feat_w, k * k, 2)

    H, W, stride = 5, 7, 8
    B = 2
    anchors = np.zeros((B, H, W, 5), np.float32)
    anchors[..., 0] = RNG.rand(B, H, W) * W * stride
    anchors[..., 1] = RNG.rand(B, H, W) * H * stride
    anchors[..., 2] = 8 + RNG.rand(B, H, W) * 64
    anchors[..., 3] = 8 + RNG.rand(B, H, W) * 64
    anchors[..., 4] = (RNG.rand(B, H, W) - 0.5) * np.pi

    ac = AlignConv(4, 4, 3, rngs=nnx.Rngs(0))
    got = np.asarray(ac.get_offset(jnp.asarray(anchors), stride))
    want = np.stack([
        oracle_np(anchors[b].reshape(-1, 5), H, W, stride) for b in range(B)
    ])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_convex_assign_init_matches_reference():
    """ConvexAssigner lockstep (VERDICT r4 missing #2): the fixed-shape
    convex_assign_init reproduces the reference's sequential
    nearest-center-per-level assignment including the strict-< steal
    rule, for pos_num 1 and 3."""
    from jdet_tpu.models.boxes.assigner import convex_assign_init
    from jdet_tpu.ops.box_convert import rbox_to_poly
    from oracles.anchor_target_oracle import convex_assigner_np

    # multi-level point grid (strides 8..128 over a 256 canvas)
    pts = []
    for s in (8, 16, 32, 64, 128):
        n = 256 // s
        ys, xs = np.mgrid[:n, :n].astype(np.float64)
        p = np.stack([xs.ravel() * s + s / 2, ys.ravel() * s + s / 2,
                      np.full(n * n, float(s))], -1)
        pts.append(p)
    points = np.concatenate(pts, 0)

    k = 12
    gts = _random_gts(k, span=256.0)
    gts[:, 2:4] = 8 + RNG.rand(k, 2) * 120  # spread across levels
    polys = np.asarray(rbox_to_poly(jnp.asarray(gts))).astype(np.float64)

    for pos_num in (1, 3):
        ref = convex_assigner_np(points, polys, pos_num=pos_num, scale=4.0)
        got = convex_assign_init(
            jnp.asarray(points[:, :2], jnp.float32),
            jnp.log2(jnp.asarray(points[:, 2], jnp.float32)),
            jnp.asarray(polys, jnp.float32),
            jnp.ones(k, bool),
            pos_num=pos_num,
        )
        np.testing.assert_array_equal(
            np.asarray(got["gt_inds"]), ref, err_msg=f"pos_num={pos_num}"
        )
        # the (k, pos_num) win set equals the dense positive set
        win_pts = np.asarray(got["cand_idx"])[np.asarray(got["cand_win"])]
        np.testing.assert_array_equal(
            np.sort(win_pts), np.sort(np.nonzero(ref > 0)[0])
        )
        assert (ref > 0).sum() >= k  # layout must produce real positives


def test_max_convex_iou_assign_matches_reference():
    """MaxConvexIoUAssigner = assign_wrt_overlaps over convex overlaps
    (assigner.py:551-611): the wiring (transpose, thresholds, labels)
    locksteps against the oracle fed the same overlap matrix."""
    from jdet_tpu.models.boxes.assigner import max_convex_iou_assign
    from jdet_tpu.ops.convex import convex_iou_chunked
    from jdet_tpu.ops.box_convert import rbox_to_poly

    n, k = 300, 7
    base = _random_gts(k, span=200.0)
    polys = np.asarray(rbox_to_poly(jnp.asarray(base)))
    # pointsets scattered around the gts so IoUs span the thresholds
    centers = base[RNG.randint(0, k, n), :2] + RNG.randn(n, 2) * 40
    pts = centers[:, None, :] + RNG.randn(n, 9, 2) * 18
    pointsets = jnp.asarray(pts.reshape(n, 18), jnp.float32)
    gt_labels = RNG.randint(1, 16, size=k)

    ov = np.asarray(
        convex_iou_chunked(pointsets, jnp.asarray(polys), chunk=128)
    ).T.astype(np.float64)
    ref_assigned, ref_labels, _ = assign_wrt_overlaps_np(
        ov, gt_labels=gt_labels, pos_iou_thr=0.4, neg_iou_thr=0.3,
        min_pos_iou=0.0,
    )
    got = max_convex_iou_assign(
        pointsets, jnp.asarray(polys), jnp.ones(k, bool),
        jnp.asarray(gt_labels, jnp.int32),
        pos_iou_thr=0.4, neg_iou_thr=0.3, min_pos_iou=0.0, iou_chunk=128,
    )
    np.testing.assert_array_equal(np.asarray(got["gt_inds"]), ref_assigned)
    np.testing.assert_array_equal(np.asarray(got["labels"]), ref_labels)
    assert (ref_assigned > 0).any()

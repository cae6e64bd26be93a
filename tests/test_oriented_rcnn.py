import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from jdet_tpu.models.builder import build_detector
from jdet_tpu.models.boxes.coder import (
    midpoint_offset_encode,
    midpoint_offset_decode,
    gv_fix_encode,
    gv_fix_decode,
)
from jdet_tpu.ops import roi_align_rotated, roi_align
from jdet_tpu.ops.box_convert import rbox_to_poly, rbox_to_hbox

rng = np.random.RandomState(9)


def rand_rboxes(n, lo=30, hi=100):
    return np.stack([
        rng.uniform(lo, hi, n), rng.uniform(lo, hi, n),
        rng.uniform(16, 60, n), rng.uniform(8, 30, n),
        rng.uniform(-np.pi / 4, 3 * np.pi / 4, n),
    ], 1).astype(np.float32)


# -------------------------------------------------------------- coders
def test_midpoint_offset_roundtrip():
    gts = rand_rboxes(50)
    # the midpoint encoding is unstable within ~0.01 rad of axis-aligned
    # (vertex-tie threshold, same as the reference coder.py:352-361);
    # keep angles clear of 0 and pi/2
    theta = gts[:, 4]
    bad = (np.abs(np.sin(2 * theta)) < 0.05)
    gts[bad, 4] += 0.05
    hbb = np.asarray(rbox_to_hbox(jnp.asarray(gts)))
    deltas = midpoint_offset_encode(jnp.asarray(hbb), jnp.asarray(gts))
    dec = np.asarray(midpoint_offset_decode(jnp.asarray(hbb), deltas))
    # recovered obb must describe the same rectangle: compare polys as sets
    p_ref = np.asarray(rbox_to_poly(jnp.asarray(gts))).reshape(-1, 4, 2)
    p_dec = np.asarray(rbox_to_poly(jnp.asarray(dec))).reshape(-1, 4, 2)
    for a, b in zip(p_ref, p_dec):
        d = np.abs(a[:, None] - b[None]).sum(-1).min(1).max()
        assert d < 1.0, d  # sub-pixel-ish agreement


def test_gv_fix_roundtrip_axis_aligned():
    hbb = jnp.asarray([[10.0, 10.0, 50.0, 30.0]])
    # a diamond inscribed in the hbb
    poly = jnp.asarray([[30.0, 10.0, 50.0, 20.0, 30.0, 30.0, 10.0, 20.0]])
    d = gv_fix_encode(hbb, poly)
    assert np.allclose(np.asarray(d), [[0.5, 0.5, 0.5, 0.5]], atol=1e-5)
    back = np.asarray(gv_fix_decode(hbb, d))
    assert np.allclose(back, np.asarray(poly), atol=1e-4)


# -------------------------------------------------------------- roi align
def test_roi_align_constant_field():
    feat = jnp.ones((1, 16, 16, 3)) * 5.0
    rois = jnp.asarray([[[32.0, 32.0, 24.0, 16.0, 0.7]]])  # image coords
    out = roi_align_rotated(feat, rois, out_size=7, spatial_scale=0.25)
    assert out.shape == (1, 1, 7, 7, 3)
    assert np.allclose(np.asarray(out), 5.0, atol=1e-5)


def test_roi_align_rotated_90deg_transposes():
    rng2 = np.random.RandomState(0)
    feat = jnp.asarray(rng2.rand(1, 32, 32, 1).astype(np.float32))
    # square roi centered at (16, 16), size 12
    r0 = jnp.asarray([[[16.0, 16.0, 12.0, 12.0, 0.0]]])
    r90 = jnp.asarray([[[16.0, 16.0, 12.0, 12.0, np.pi / 2]]])
    o0 = np.asarray(roi_align_rotated(feat, r0, 7, 1.0, 2))[0, 0, ..., 0]
    o90 = np.asarray(roi_align_rotated(feat, r90, 7, 1.0, 2))[0, 0, ..., 0]
    # rotating the sampling grid by 90deg = rotating the crop
    assert np.allclose(o90, np.rot90(o0, 1), atol=1e-4), np.abs(
        o90 - np.rot90(o0, 1)
    ).max()


def test_roi_align_horizontal_matches_crop():
    feat = jnp.asarray(np.arange(64, dtype=np.float32).reshape(1, 8, 8, 1))
    rois = jnp.asarray([[[2.0, 2.0, 6.0, 6.0]]])
    out = roi_align(feat, rois, out_size=4, spatial_scale=1.0, sampling_ratio=1)
    assert out.shape == (1, 1, 4, 4, 1)
    # center of bin (0,0) samples at (2.5, 2.5) - 0.5 = (2, 2) -> value 2*8+2
    assert abs(float(out[0, 0, 0, 0, 0]) - 18.0) < 1e-4


def test_roi_align_valid_mask_zeroes():
    feat = jnp.ones((1, 8, 8, 2))
    rois = jnp.asarray([[[8.0, 8.0, 4.0, 4.0, 0.0], [8.0, 8.0, 4.0, 4.0, 0.0]]])
    valid = jnp.asarray([[True, False]])
    out = np.asarray(roi_align_rotated(feat, rois, 3, 1.0, 2, valid))
    assert out[0, 0].sum() > 0
    assert out[0, 1].sum() == 0


# -------------------------------------------------------------- detector
@pytest.fixture(scope="module")
def model():
    return build_detector(
        dict(
            type="OrientedRCNN",
            backbone=dict(type="ResNet", depth=18, frozen_stages=-1),
            neck=dict(type="FPN", out_channels=64, num_outs=5),
            rpn_head=dict(
                type="OrientedRPNHead", in_channels=64, feat_channels=64,
                anchor_strides=(4, 8, 16, 32, 64),
                nms_pre=128, nms_post=64,
            ),
            bbox_head=dict(
                type="OrientedHead", num_classes=15, in_channels=64,
                fc_out_channels=128, featmap_strides=(4, 8, 16, 32),
                train_cfg=dict(sampler=dict(num=48, pos_fraction=0.25)),
                test_cfg=dict(max_per_img=16, score_thr=0.01),
            ),
        ),
        seed=0,
    )


def batch(B=2, size=128, K=8):
    images = jnp.asarray(rng.rand(B, size, size, 3).astype(np.float32))
    gt = np.zeros((B, K, 5), np.float32)
    mask = np.zeros((B, K), bool)
    labels = np.zeros((B, K), np.int32)
    for b in range(B):
        mask[b, :3] = True
        gt[b, :3] = rand_rboxes(3)
        labels[b, :3] = rng.randint(1, 16, 3)
    return images, {
        "gt_bboxes": jnp.asarray(gt),
        "gt_labels": jnp.asarray(labels),
        "gt_mask": jnp.asarray(mask),
    }


def test_oriented_rcnn_loss(model):
    images, targets = batch()
    losses = model.loss(images, targets)
    assert set(losses) == {
        "loss_rpn_cls", "loss_rpn_bbox", "loss_cls", "loss_bbox"
    }
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    # stage-2 cls loss should start near ln(C+1) for uniform logits
    assert 0.5 < float(losses["loss_cls"]) < 5.0


def test_oriented_rcnn_predict(model):
    images, _ = batch()
    det = model.predict(images)
    assert det["boxes"].shape == (2, 16, 5)
    assert det["polys"].shape == (2, 16, 8)
    assert np.isfinite(np.asarray(det["scores"])).all()


def test_oriented_rcnn_train_step(model):
    import optax

    images, targets = batch()
    opt = nnx.Optimizer(model, optax.sgd(0.005, momentum=0.9), wrt=nnx.Param)

    @nnx.jit
    def step(model, opt, images, targets):
        def lf(m):
            losses = m.loss(images, targets)
            return sum(losses.values()), losses

        (total, losses), grads = nnx.value_and_grad(lf, has_aux=True)(model)
        opt.update(model, grads)
        return total

    l0 = float(step(model, opt, images, targets))
    for _ in range(3):
        l = float(step(model, opt, images, targets))
    assert np.isfinite(l)
    assert l < l0 * 1.5


# ------------------------------------------------- per-level proposal NMS


def test_per_level_proposal_nms_matches_offset_trick():
    """get_proposals decomposes NMS per pyramid level (levels never
    suppress each other). Must match the offset-trick formulation — one
    global NMS on boxes diagonally shifted per level — bit for bit."""
    from jdet_tpu.models.heads.rpn_heads import OrientedRPNHead
    from jdet_tpu.ops.nms import nms

    head = OrientedRPNHead(in_channels=8, feat_channels=8,
                           nms_pre=64, nms_post=48, rngs=nnx.Rngs(0))
    r = np.random.RandomState(3)
    B = 2
    outs = []
    for hw in (16, 8, 4):
        cls = r.randn(B, hw, hw, 3).astype(np.float32)
        reg = r.randn(B, hw, hw, 3 * 6).astype(np.float32) * 0.3
        outs.append((jnp.asarray(cls), jnp.asarray(reg)))
    got = jax.jit(head.get_proposals)(outs)

    # --- oracle: the offset-trick global NMS over the same candidates
    featmap_sizes = [o[0].shape[1:3] for o in outs]
    anchors_per_level = head._level_anchors(featmap_sizes)
    cand_b, cand_s, cand_l = [], [], []
    for lvl, (cls, reg) in enumerate(outs):
        scores = jax.nn.sigmoid(cls.reshape(B, -1))
        deltas = reg.reshape(B, -1, head.reg_dim)
        anchors = anchors_per_level[lvl]
        n_lvl = anchors.shape[0]
        if head.nms_pre > 0 and n_lvl > head.nms_pre:
            scores, topk = jax.lax.top_k(scores, head.nms_pre)
            deltas = jnp.take_along_axis(deltas, topk[..., None], 1)
            anchors_b = anchors[topk]
        else:
            anchors_b = jnp.broadcast_to(anchors, (B, n_lvl, 4))
        cand_b.append(head._decode(anchors_b, deltas))
        cand_s.append(scores)
        cand_l.append(jnp.full(scores.shape, lvl, jnp.float32))
    boxes = jnp.concatenate(cand_b, 1)
    scores = jnp.concatenate(cand_s, 1)
    levels = jnp.concatenate(cand_l, 1)

    def _one(boxes, scores, levels):
        hbb = head._proposal_hbb(boxes)
        w, h = boxes[:, 2], boxes[:, 3]
        size_ok = (w > head.min_bbox_size) & (h > head.min_bbox_size)
        span = hbb.max() - hbb.min() + 1.0
        hbb_off = hbb + (levels * span)[:, None]
        order, keep = nms(hbb_off, scores, head.nms_thresh, valid=size_ok)
        sel = jnp.argsort(~keep, stable=True)[: head.nms_post]
        idx = order[sel]
        v = keep[sel]
        return (jnp.where(v[:, None], boxes[idx], 0.0),
                jnp.where(v, scores[idx], 0.0), v)

    eb, es, ev = jax.vmap(_one)(boxes, scores, levels)
    np.testing.assert_array_equal(np.asarray(got["valid"]), np.asarray(ev))
    np.testing.assert_array_equal(np.asarray(got["scores"]),
                                  np.asarray(es))
    # same kept set/order; box values only differ by jit-vs-eager fusion
    # rounding in the decode (the oracle decodes outside the jit)
    np.testing.assert_allclose(np.asarray(got["boxes"]),
                               np.asarray(eb), rtol=1e-5, atol=2e-5)

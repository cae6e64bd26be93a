"""Reference-lockstep oracle tests for the four encode/target families
that previously rested on self-generated fixtures alone (VERDICT r4
"What's missing" #1): Gliding fix/ratio, CSL angle labels, FCOS rotated
ltrb targets, and the RoI-Transformer second-stage codec path.

The numpy oracles (tests/oracles/coder_oracles.py) are loop-level
transcriptions of the reference routines; these tests assert the repo's
vectorized jax formulations agree — any sign, truncation-direction,
window-boundary, or tie-break drift fails here.

Convention notes baked into the tests:
  - The reference FCOS family measures angles in the bbox_transforms
    `obb2poly` convention (width axis = (cos t, -sin t)); the repo uses
    (cos t, sin t) everywhere, so lockstep feeds the oracle -theta and
    expects a negated theta target back.
  - The reference second stage normalizes the angle delta by pi/2 after
    best-match canonicalization (dbbox2delta_v2); the repo normalizes the
    norm_angle-wrapped delta by pi (rbox2delta). On the shared domain
    (|angle diff| < pi/4, which best-match guarantees) both encode the
    same raw difference, asserted exactly below; decode geometry is
    asserted equal everywhere via corner comparison.
  - hbb2obb_v2 keeps the legacy +1-pixel extents
    (bbox_transforms.py:34-44); the repo's hbox_to_rbox does not, so the
    geometric-equality test grows the repo's input hbb by 0.5 per side.
"""
from types import SimpleNamespace

import numpy as np
import jax.numpy as jnp
import pytest

from jdet_tpu.models.boxes.coder import (
    CSLCoder,
    gv_fix_decode,
    gv_fix_encode,
    gv_ratio_encode,
)
from jdet_tpu.models.heads.fcos_head import FCOSHead
from jdet_tpu.ops.box_convert import (
    delta2rbox,
    hbox_to_rbox,
    poly_to_hbox,
    rbox2delta,
    rbox_to_poly,
)

from oracles import coder_oracles as O

RNG = np.random.RandomState(7)


def _random_rboxes(n, span=256.0, wmin=8.0, wmax=64.0):
    b = np.zeros((n, 5), np.float32)
    b[:, 0] = RNG.rand(n) * span
    b[:, 1] = RNG.rand(n) * span
    b[:, 2] = wmin + RNG.rand(n) * (wmax - wmin)
    b[:, 3] = wmin + RNG.rand(n) * (wmax - wmin)
    b[:, 4] = (RNG.rand(n) - 0.25) * np.pi  # [-pi/4, 3pi/4)
    return b


def _sorted_corners(poly8):
    """(n, 8) -> (n, 4, 2) corners sorted per box for set comparison."""
    p = np.asarray(poly8, np.float64).reshape(-1, 4, 2)
    order = np.lexsort((p[..., 1], p[..., 0]), axis=-1)
    return np.take_along_axis(p, order[..., None], axis=1)


def _ref_corners(obbs):
    """Reference bbox_transforms.obb2poly (width axis (cos, -sin))."""
    x, y, w, h, t = (obbs[:, i] for i in range(5))
    c, s = np.cos(t), np.sin(t)
    v1 = np.stack([w / 2 * c, -w / 2 * s], -1)
    v2 = np.stack([-h / 2 * s, -h / 2 * c], -1)
    ctr = np.stack([x, y], -1)
    return np.concatenate(
        [ctr + v1 + v2, ctr + v1 - v2, ctr - v1 - v2, ctr - v1 + v2], -1
    )


# ---------------------------------------------------------------------------
# Gliding vertex
# ---------------------------------------------------------------------------


def test_gv_fix_encode_matches_reference():
    # rotated boxes: every poly extreme is attained by a unique vertex, so
    # the reference's first-occurrence picks and the repo's masked
    # max/min picks coincide
    polys = np.asarray(rbox_to_poly(jnp.asarray(_random_rboxes(300))))
    hbbs = np.asarray(poly_to_hbox(jnp.asarray(polys)))
    got = np.asarray(gv_fix_encode(jnp.asarray(hbbs), jnp.asarray(polys)))
    ref = O.gv_fix_encode_np(polys.astype(np.float64))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_gv_fix_encode_axis_aligned_hmask():
    # the reference overrides axis-aligned boxes to all-ones fix deltas
    # (h_mask, coder.py:178-183); the repo's tie-break yields the same
    hbbs = np.array([[10.0, 20.0, 60.0, 50.0], [0.0, 0.0, 32.0, 32.0]],
                    np.float32)
    x1, y1, x2, y2 = hbbs.T
    polys = np.stack([x1, y1, x2, y1, x2, y2, x1, y2], -1)
    got = np.asarray(gv_fix_encode(jnp.asarray(hbbs), jnp.asarray(polys)))
    ref = O.gv_fix_encode_np(polys.astype(np.float64))
    np.testing.assert_allclose(ref, 1.0)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_gv_fix_decode_matches_reference():
    n = 200
    hbbs = np.zeros((n, 4), np.float32)
    hbbs[:, 0] = RNG.rand(n) * 200
    hbbs[:, 1] = RNG.rand(n) * 200
    hbbs[:, 2] = hbbs[:, 0] + 8 + RNG.rand(n) * 64
    hbbs[:, 3] = hbbs[:, 1] + 8 + RNG.rand(n) * 64
    deltas = RNG.rand(n, 4).astype(np.float32)
    got = np.asarray(gv_fix_decode(jnp.asarray(hbbs), jnp.asarray(deltas)))
    ref = O.gv_fix_decode_np(hbbs.astype(np.float64),
                             deltas.astype(np.float64))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-3)


def test_gv_ratio_encode_matches_reference():
    polys = np.asarray(rbox_to_poly(jnp.asarray(_random_rboxes(300))))
    hbbs = np.asarray(poly_to_hbox(jnp.asarray(polys)))
    got = np.asarray(gv_ratio_encode(jnp.asarray(hbbs), jnp.asarray(polys)))
    ref = O.gv_ratio_encode_np(polys.astype(np.float64))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# CSL
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("window,radius", [
    ("gaussian", 6), ("gaussian", 2), ("triangle", 6), ("rect", 6),
    ("pulse", 6),
])
def test_csl_encode_matches_reference(window, radius):
    angles = ((RNG.rand(400) - 0.25) * np.pi).astype(np.float32)
    coder = CSLCoder(omega=1, window=window, radius=radius)
    got = np.asarray(coder.encode(jnp.asarray(angles)))
    ref = O.csl_encode_np(angles.astype(np.float64), omega=1,
                          window=window, radius=radius)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


def test_csl_decode_matches_reference():
    logits = RNG.rand(128, 180).astype(np.float32)
    coder = CSLCoder(omega=1)
    got = np.asarray(coder.decode(jnp.asarray(logits)))
    ref = O.csl_decode_np(logits.astype(np.float64), omega=1)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_csl_roundtrip_bin_center():
    # decode(encode(a)) lands on the containing bin's center
    angles = ((RNG.rand(64) - 0.25) * np.pi).astype(np.float32)
    coder = CSLCoder(omega=1, window="gaussian", radius=6)
    dec = np.asarray(coder.decode(coder.encode(jnp.asarray(angles))))
    err_deg = np.abs(np.degrees(dec) - np.degrees(angles))
    assert err_deg.max() <= 0.5 + 1e-3


# ---------------------------------------------------------------------------
# FCOS rotated ltrb targets
# ---------------------------------------------------------------------------


def _fcos_points():
    pts, rr, strides = [], [], []
    for (h, w), s, r in [((16, 16), 8, (-1, 64)), ((8, 8), 16, (64, 1e8))]:
        ys, xs = np.mgrid[:h, :w].astype(np.float64)
        p = np.stack([xs.ravel() * s + s / 2, ys.ravel() * s + s / 2], -1)
        pts.append(p)
        rr.append(np.tile(np.asarray(r, np.float64), (len(p), 1)))
        strides.append(np.full(len(p), s, np.float64))
    return (np.concatenate(pts), np.concatenate(rr), np.concatenate(strides))


@pytest.mark.parametrize("center_sampling", [False, True])
def test_fcos_target_matches_reference(center_sampling):
    points, rr, strides = _fcos_points()
    K, num_classes = 6, 15
    gts = _random_rboxes(K, span=128.0, wmin=12.0, wmax=80.0)
    gt_labels = RNG.randint(1, num_classes + 1, size=K)

    ns = SimpleNamespace(center_sampling=center_sampling,
                         center_sample_radius=1.5, num_classes=num_classes)
    labels, bbox_targets, pos = FCOSHead._target_single(
        ns, jnp.asarray(points, jnp.float32), jnp.asarray(rr, jnp.float32),
        jnp.asarray(strides, jnp.float32), jnp.asarray(gts),
        jnp.ones(K, bool), jnp.asarray(gt_labels, jnp.int32),
    )

    # reference convention: negated angle (see module docstring)
    gts_ref = gts.astype(np.float64).copy()
    gts_ref[:, 4] = -gts_ref[:, 4]
    ref_labels, ref_targets = O.fcos_target_single_np(
        points, rr, strides, gts_ref, gt_labels.astype(np.int64),
        num_classes, center_sampling=center_sampling,
        center_sample_radius=1.5,
    )

    np.testing.assert_array_equal(np.asarray(labels), ref_labels)
    fg = ref_labels < num_classes
    assert fg.any()  # the random layout must exercise positives
    np.testing.assert_array_equal(np.asarray(pos), fg)
    got_t = np.asarray(bbox_targets)
    np.testing.assert_allclose(
        got_t[fg, :4], ref_targets[fg, :4], rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        got_t[fg, 4], -ref_targets[fg, 4], rtol=1e-5, atol=1e-6
    )


def test_fcos_centerness_matches_reference():
    ltrb = (RNG.rand(64, 4) * 32 + 0.5).astype(np.float64)
    ref = O.centerness_target_np(ltrb)
    lr = ltrb[:, [0, 2]]
    tb = ltrb[:, [1, 3]]
    got = np.sqrt(
        (lr.min(1) / lr.max(1)) * (tb.min(1) / tb.max(1))
    )  # formula used in FCOSHead.loss
    np.testing.assert_allclose(got, ref, rtol=1e-6)


# ---------------------------------------------------------------------------
# Second-stage RoI codec path
# ---------------------------------------------------------------------------


def test_stage2_encode_matches_reference_on_shared_domain():
    """On the best-match domain (|angle diff| < pi/4) the reference's
    dbbox2delta_v2-after-best-match and the repo's rbox2delta encode the
    identical raw quantities; only the angle normalizer differs (pi/2 vs
    pi), asserted exactly."""
    n = 256
    rrois = _random_rboxes(n).astype(np.float64)
    rrois[:, 4] = RNG.rand(n) * np.pi  # reference rroi convention [0, pi)
    # force w >= h as choose_best_Rroi_batch guarantees
    rrois = O.choose_best_Rroi_batch_np(rrois)
    gt = rrois.copy()
    gt[:, 0:2] += (RNG.rand(n, 2) - 0.5) * 16
    gt[:, 2:4] *= np.exp((RNG.rand(n, 2) - 0.5) * 0.6)
    gt[:, 4] += (RNG.rand(n) - 0.5) * (np.pi / 2 - 1e-3)  # diff in (-pi/4, pi/4)

    ref = O.best_match_dbbox2delta_np(rrois, gt)
    got = np.asarray(
        rbox2delta(jnp.asarray(rrois, jnp.float32), jnp.asarray(gt, jnp.float32))
    )
    np.testing.assert_allclose(got[:, :4], ref[:, :4], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        got[:, 4] * np.pi, ref[:, 4] * np.pi / 2, rtol=1e-4, atol=1e-5
    )


def test_stage2_refine_geometry_matches_reference():
    """encode->decode through both stacks reproduces the same rectangle:
    the reference pipeline (best_match_dbbox2delta -> delta2dbbox_v2,
    rbbox_head get_target_rbbox/refine semantics) and the repo pipeline
    (rbox2delta -> delta2rbox) agree corner-for-corner with the gt and
    with each other — a sign or frame error in either decode fails here."""
    n = 256
    rrois = O.choose_best_Rroi_batch_np(_random_rboxes(n).astype(np.float64))
    gt = _random_rboxes(n).astype(np.float64)
    gt[:, 0:2] = rrois[:, 0:2] + (RNG.rand(n, 2) - 0.5) * 20

    ref_dec = O.delta2dbbox_v2_np(rrois, O.best_match_dbbox2delta_np(rrois, gt))
    # oracle self-consistency: reference decode reproduces the gt rectangle
    # (in the reference's own corner convention)
    np.testing.assert_allclose(
        _sorted_corners(_ref_corners(ref_dec)),
        _sorted_corners(_ref_corners(gt)), rtol=1e-6, atol=1e-6,
    )

    enc = rbox2delta(jnp.asarray(rrois, jnp.float32), jnp.asarray(gt, jnp.float32))
    got_dec = np.asarray(delta2rbox(jnp.asarray(rrois, jnp.float32), enc))
    # repo roundtrip reproduces the gt rectangle (repo corner convention)
    np.testing.assert_allclose(
        _sorted_corners(np.asarray(rbox_to_poly(jnp.asarray(got_dec)))),
        _sorted_corners(np.asarray(rbox_to_poly(jnp.asarray(gt, jnp.float32)))),
        rtol=1e-3, atol=5e-2,
    )


def test_stage2_v3_codec_oracle_roundtrip():
    """dbbox2delta_v3 / delta2dbbox_v3 (the reference's raw-angle variant
    used by the oriented branch) invert each other — validates the
    transcription the repo's unified codec is compared against."""
    n = 128
    rrois = O.choose_best_Rroi_batch_np(_random_rboxes(n).astype(np.float64))
    gt = _random_rboxes(n).astype(np.float64)
    dec = O.delta2dbbox_v3_np(rrois, O.dbbox2delta_v3_np(rrois, gt))
    np.testing.assert_allclose(dec, gt, rtol=1e-6, atol=1e-8)


def test_hbb2obb_matches_reference_geometry():
    """hbox_to_rbox denotes the same rectangle as the reference's
    hbb2obb_v2 once the legacy +1-pixel extents are accounted for
    (the repo input is grown by 0.5 per side)."""
    n = 128
    hbbs = np.zeros((n, 4), np.float64)
    hbbs[:, 0] = RNG.rand(n) * 200
    hbbs[:, 1] = RNG.rand(n) * 200
    hbbs[:, 2] = hbbs[:, 0] + 4 + RNG.rand(n) * 64
    hbbs[:, 3] = hbbs[:, 1] + 4 + RNG.rand(n) * 64

    ref = O.hbb2obb_v2_np(hbbs)
    grown = hbbs + np.array([-0.5, -0.5, 0.5, 0.5])
    got = np.asarray(hbox_to_rbox(jnp.asarray(grown, jnp.float32)))
    np.testing.assert_allclose(
        _sorted_corners(_ref_corners(ref)),
        _sorted_corners(np.asarray(rbox_to_poly(jnp.asarray(got)))),
        rtol=1e-4, atol=1e-3,
    )

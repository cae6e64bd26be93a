import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from jdet_tpu.ops import deform_conv2d, DCNv2, rotate_arf, ORConv2d
from jdet_tpu.ops.orn import arf_gather_indices, rotation_invariant_pooling

rng = np.random.RandomState(3)


def test_deform_conv_zero_offsets_equals_conv():
    B, H, W, C, Co = 2, 8, 8, 4, 6
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, C, Co).astype(np.float32) * 0.1)
    offsets = jnp.zeros((B, H, W, 9, 2))
    out = deform_conv2d(x, offsets, w, stride=1, padding=1)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_deform_conv_integer_shift():
    # offset of exactly (0, +1) for all taps shifts the sampled window right
    B, H, W, C, Co = 1, 6, 6, 2, 3
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, C, Co).astype(np.float32) * 0.1)
    off = jnp.zeros((B, H, W, 9, 2)).at[..., 1].set(1.0)
    out = deform_conv2d(x, off, w, padding=1)
    ref = deform_conv2d(
        jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:],
        jnp.zeros((B, H, W, 9, 2)), w, padding=1,
    )
    # interior columns must agree (border effects at the first/last column:
    # the shifted-image reference zero-pads where the offset path still
    # sees real pixels)
    assert np.allclose(
        np.asarray(out)[:, :, 1:-1], np.asarray(ref)[:, :, 1:-1], atol=1e-4
    )


def test_deform_conv_grad_flows():
    B, H, W, C, Co = 1, 6, 6, 3, 4
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, C, Co).astype(np.float32) * 0.1)
    off = jnp.asarray(rng.randn(B, H, W, 9, 2).astype(np.float32) * 0.5)

    gx, gw, go = jax.grad(
        lambda x, w, o: deform_conv2d(x, o, w, padding=1).sum(), argnums=(0, 1, 2)
    )(x, w, off)
    for g in (gx, gw, go):
        assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(go).sum()) > 0  # offsets get gradient (v1 semantics)


def test_dcnv2_runs():
    m = DCNv2(8, 16, rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32))
    out = m(x)
    assert out.shape == (2, 8, 8, 16)
    # zero-init offsets -> equals plain conv with the deform weight
    ref = jax.lax.conv_general_dilated(
        x, m.deform.weight.value, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + m.deform.bias.value
    assert np.allclose(np.asarray(out), np.asarray(ref) * 0.5, atol=1e-4)
    # (sigmoid(0) = 0.5 modulation)


def test_arf_indices_are_permutations():
    for nOr, nRot in ((1, 8), (8, 8)):
        src = arf_gather_indices(nOr, nRot, 3)
        n_entry = nOr * 9
        assert src.shape == (nRot, n_entry)
        for k in range(nRot):
            assert sorted(src[k]) == list(range(n_entry))
        # rotation 0 is identity
        assert (src[0] == np.arange(n_entry)).all()


def test_rotate_arf_180_is_spatial_flip():
    # for nOrientation=1, the 180deg rotation reverses the 3x3 taps
    w = jnp.asarray(rng.randn(2, 3, 1, 3, 3).astype(np.float32))
    src = arf_gather_indices(1, 8, 3)
    out = rotate_arf(w, src)  # (3, 3, 3, 16): out channel o*8+k
    w0 = np.asarray(out[..., 0 * 8 + 0])  # identity rotation, o=0
    w180 = np.asarray(out[..., 0 * 8 + 4])  # 180 deg
    assert np.allclose(w180, w0[::-1, ::-1], atol=1e-6)


def test_orconv_and_pooling_shapes():
    m = ORConv2d(16, 4, kernel_size=3, arf_config=(1, 8), rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    out = m(x)
    assert out.shape == (2, 8, 8, 32)  # 4 out * 8 rotations
    pooled = rotation_invariant_pooling(out, 8)
    assert pooled.shape == (2, 8, 8, 4)
    # pooling is max over each 8-rotation group
    ref = np.asarray(out).reshape(2, 8, 8, 4, 8).max(-1)
    assert np.allclose(np.asarray(pooled), ref)


def test_orconv_rotation_equivariance():
    """Rotating the input by 90deg permutes ORConv rotation channels."""
    m = ORConv2d(4, 2, kernel_size=3, arf_config=(1, 8), use_bias=False,
                 rngs=nnx.Rngs(1))
    x = jnp.asarray(rng.randn(1, 9, 9, 4).astype(np.float32))
    out = np.asarray(m(x))[0]
    xr = jnp.asarray(np.ascontiguousarray(np.rot90(np.asarray(x)[0], 1))[None])
    outr = np.asarray(m(xr))[0]
    # out channel (o, k) on rotated input == rot90 of channel (o, k+2)
    # (90 deg = 2 steps of 45); compare interior to avoid border effects
    for o in range(2):
        for k in range(8):
            a = np.rot90(out[..., o * 8 + (k + 2) % 8], 1)[2:-2, 2:-2]
            b = outr[2:-2, 2:-2, o * 8 + k]
            assert np.allclose(a, b, atol=1e-4), (o, k, np.abs(a - b).max())


def _np_dcn_v2_pooling(feat_nhwc, rois, offset, spatial_scale, P, no_trans,
                       group_size, part, S, trans_std):
    """numpy transcription of the reference DeformablePSROIPoolForwardKernel
    (ops/dcn_v2.py:856-930), used only as a test oracle."""
    B, H, W, C = feat_nhwc.shape
    G = group_size
    c_out = C // (G * G)
    R = rois.shape[0]
    out = np.zeros((R, P, P, c_out), np.float64)
    for n in range(R):
        b = int(rois[n, 0])
        rsw = round(rois[n, 1]) * spatial_scale - 0.5
        rsh = round(rois[n, 2]) * spatial_scale - 0.5
        rew = (round(rois[n, 3]) + 1.0) * spatial_scale - 0.5
        reh = (round(rois[n, 4]) + 1.0) * spatial_scale - 0.5
        rw = max(rew - rsw, 0.1)
        rh = max(reh - rsh, 0.1)
        bw, bh = rw / P, rh / P
        sw, sh = bw / S, bh / S
        for ph in range(P):
            for pw in range(P):
                part_h = int(np.floor(ph / P * part))
                part_w = int(np.floor(pw / P * part))
                if no_trans:
                    tx = ty = 0.0
                else:
                    tx = offset[n, 0, part_h, part_w] * trans_std
                    ty = offset[n, 1, part_h, part_w] * trans_std
                wst = pw * bw + rsw + tx * rw
                hst = ph * bh + rsh + ty * rh
                gw = min(max(int(pw * G // P), 0), G - 1)
                gh = min(max(int(ph * G // P), 0), G - 1)
                for ctop in range(c_out):
                    c = (ctop * G + gh) * G + gw
                    s, cnt = 0.0, 0
                    for ih in range(S):
                        for iw in range(S):
                            w = wst + iw * sw
                            h = hst + ih * sh
                            if w < -0.5 or w > W - 0.5 or h < -0.5 or h > H - 0.5:
                                continue
                            w = min(max(w, 0.0), W - 1.0)
                            h = min(max(h, 0.0), H - 1.0)
                            x1, x2 = int(np.floor(w)), int(np.ceil(w))
                            y1, y2 = int(np.floor(h)), int(np.ceil(h))
                            dx, dy = w - x1, h - y1
                            v = (feat_nhwc[b, y1, x1, c] * (1 - dx) * (1 - dy)
                                 + feat_nhwc[b, y2, x1, c] * (1 - dx) * dy
                                 + feat_nhwc[b, y1, x2, c] * dx * (1 - dy)
                                 + feat_nhwc[b, y2, x2, c] * dx * dy)
                            s += v
                            cnt += 1
                    out[n, ph, pw, ctop] = 0.0 if cnt == 0 else s / cnt
    return out


def test_dcn_v2_pooling_matches_cuda_oracle():
    from jdet_tpu.ops import dcn_v2_pooling

    rs = np.random.RandomState(7)
    B, H, W = 2, 24, 24
    P, S, trans_std = 7, 4, 0.1
    for G in (1, 2):
        C = 8 * G * G
        feat = rs.randn(B, H, W, C).astype(np.float32)
        rois = np.stack([
            rs.randint(0, B, 6).astype(np.float32),
            rs.uniform(0, W * 2, 6), rs.uniform(0, H * 2, 6),
            rs.uniform(W * 2, W * 4, 6), rs.uniform(H * 2, H * 4, 6),
        ], 1).astype(np.float32)
        offset = rs.randn(6, 2, P, P).astype(np.float32)
        for no_trans in (True, False):
            got = np.asarray(dcn_v2_pooling(
                jnp.asarray(feat), jnp.asarray(rois), jnp.asarray(offset),
                spatial_scale=0.25, pooled_size=P, no_trans=no_trans,
                group_size=G, sample_per_part=S, trans_std=trans_std,
            ))
            want = _np_dcn_v2_pooling(
                feat.astype(np.float64), rois, offset, 0.25, P, no_trans,
                G, P, S, trans_std,
            )
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_dcn_pooling_module_trains():
    from flax import nnx
    from jdet_tpu.ops import DCNPooling

    rs = np.random.RandomState(3)
    feat = jnp.asarray(rs.randn(1, 16, 16, 32).astype(np.float32))
    rois = jnp.asarray(
        np.array([[0, 8, 8, 40, 40], [0, 0, 0, 60, 60]], np.float32)
    )
    m = DCNPooling(spatial_scale=0.25, pooled_size=7, output_dim=32,
                   no_trans=False, trans_std=0.1, rngs=nnx.Rngs(0))
    out = m(feat, rois)
    assert out.shape == (2, 7, 7, 32)
    assert np.isfinite(np.asarray(out)).all()

    def lf(mm):
        return (mm(feat, rois) ** 2).mean()

    grads = nnx.grad(lf)(m)
    leaves = jax.tree.leaves(grads)
    assert leaves and all(np.isfinite(np.asarray(g)).all() for g in leaves)

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

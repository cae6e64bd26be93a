"""Basis-coefficient ReResNet import (always-on; the reference-gated
exactness proof of the basis itself is tests/test_c8_basis_oracle.py).

A reference checkpoint saved in TRAIN mode has no materialized R2Conv
`filter` buffers — only the flat steerable-basis coefficient vectors
`<conv>.weights` (e2conv.py:258). These tests build such a synthetic
basis-only state dict for our ReResNet-18 and check it imports to
exactly the same parameters as the equivalent filter-bearing dict.
"""
import numpy as np
import pytest

from jdet_tpu.models.equivariant.c8_basis import (
    c8_sampled_basis,
    expand_filter,
    grid_coords,
    regular_change_of_basis,
)


def test_change_of_basis_orthonormal():
    Q = regular_change_of_basis()
    np.testing.assert_allclose(Q @ Q.T, np.eye(8), atol=1e-12)


@pytest.mark.parametrize("k,in_kind,dim", [
    # dims fixed by the construction; a drift here means the coefficient
    # layout changed and old checkpoints would import garbage
    # (verified against the reference machinery by the gated oracle)
    (1, "regular", 8),
    (3, "regular", 64),
    (7, "trivial", 40),
    (7, "regular", 320),
])
def test_basis_dims_stable(k, in_kind, dim):
    b = c8_sampled_basis(k, in_kind=in_kind)
    assert b.shape[0] == dim, b.shape
    assert b.shape[1] == 8
    assert b.shape[3] == k * k


def test_basis_elements_unit_normalized():
    b = c8_sampled_basis(3, in_kind="regular")
    # normalize_basis divides by sqrt(sum^2/size); surviving elements
    # therefore have energy == their original out-irrep size (1 or 2)
    energy = (b ** 2).sum(axis=(1, 2, 3))
    assert np.all(energy > 1e-2)
    assert np.all(
        np.isclose(energy, 1.0, atol=1e-6) |
        np.isclose(energy, 2.0, atol=1e-6))


def test_expanded_filter_is_equivariant_on_grid():
    """For 1x1 kernels the grid is a single point, so the C8 constraint
    kappa(gx) = rho(g) kappa(x) rho(g)^-1 is exactly testable: the
    expanded filter must commute with the regular permutation."""
    rng = np.random.RandomState(0)
    b = c8_sampled_basis(1, in_kind="regular")
    w = rng.randn(b.shape[0])
    f = np.einsum("b,bois->ois", w, b)[..., 0]  # (8, 8)
    perm = np.zeros((8, 8))
    for g in range(8):
        perm[(g + 1) % 8, g] = 1  # regular rep of the generator
    np.testing.assert_allclose(perm @ f @ perm.T, f, atol=1e-10)


def test_grid_layout_raster():
    pts = grid_coords(3)
    # raster order: first point is the top-left cell -> x=-1, y=+1
    np.testing.assert_allclose(pts[:, 0], [-1.0, 1.0])
    np.testing.assert_allclose(pts[:, 4], [0.0, 0.0])
    np.testing.assert_allclose(pts[:, 8], [1.0, -1.0])


def _reference_style_sd(backbone, rng):
    """Build (basis_only_sd, filter_sd) pairs for every R2Conv of the
    model, using the reference's key naming (downsample Sequential
    index 0, `.weights` coefficients / `.filter` buffers)."""
    from jdet_tpu.models.pretrained import flat_paths

    _, params = flat_paths(backbone)
    basis_sd, filter_sd = {}, {}
    for path, var in params.items():
        if not path.endswith(".weight"):
            continue
        shape = tuple(np.shape(var.get_value()))
        base = path[: -len(".weight")].replace(
            ".downsample.conv", ".downsample.0")
        if len(shape) == 5:  # regular conv (O, I, 8, k, k)
            of, infl, _, k, _ = shape
            in_kind = "regular"
        elif len(shape) == 4:  # lifting stem (O, in_ch, k, k)
            of, infl, k, _ = shape
            in_kind = "trivial"
        else:
            continue
        bdim = c8_sampled_basis(k, in_kind=in_kind).shape[0]
        w = rng.randn(of * infl * bdim)
        basis_sd[f"{base}.weights"] = w
        filter_sd[f"{base}.filter"] = expand_filter(
            w, k, out_fields=of, in_fields=infl, in_kind=in_kind)
    return basis_sd, filter_sd


def test_basis_only_checkpoint_imports_like_filter_checkpoint():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from flax import nnx

    from jdet_tpu.models.backbones.re_resnet import ReResNet
    from jdet_tpu.models.pretrained import backbone_to_flat

    bb = ReResNet(depth=18, base_fields=2, rngs=nnx.Rngs(0))
    rng = np.random.RandomState(1)
    basis_sd, filter_sd = _reference_style_sd(bb, rng)
    assert basis_sd, "no R2Conv params found"

    got = backbone_to_flat(bb, basis_sd)
    want = backbone_to_flat(bb, filter_sd)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-6, atol=1e-8,
                                   err_msg=k)


def test_basis_only_without_shapes_raises():
    from jdet_tpu.models.pretrained import reresnet_to_flat

    with pytest.raises(ValueError, match="basis coefficients"):
        reresnet_to_flat({"conv1.weights": np.zeros(17 * 4 * 3)})

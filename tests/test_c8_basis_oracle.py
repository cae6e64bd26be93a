"""Lockstep oracle: our C8 steerable basis vs the reference's own numpy
basis machinery.

The reference's kernel-basis construction (`jdet/utils/equivalent/
kernels/*.py`, `representation.py`, `cyclic_group.py`) is pure
numpy/scipy — no jittor — so when the reference tree is present we can
import those modules directly and compare our from-scratch
transcription (`jdet_tpu/models/equivariant/c8_basis.py`) element for
element: same basis dimension, same element order, same sampled values
after the normalization and pruning of
`models/equivalent_modules/block_basis.py:58`.

Skipped automatically when /root/reference is absent; the
self-consistency tests in test_c8_import.py run everywhere.
"""
import importlib
import math
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/python"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "jdet/utils/equivalent")),
    reason="reference tree not available",
)


def _load_reference_equivalent():
    """Import the reference's numpy basis modules without executing the
    jittor-importing package __init__ files: register stub packages for
    `jdet`, `jdet.utils`, `jdet.utils.equivalent` (+ .kernels) whose
    __path__ points into the reference tree, then import the leaf
    modules normally (relative imports resolve through the stubs)."""
    if "jdet.utils.equivalent.kernels.kernels" in sys.modules:
        return sys.modules["jdet.utils.equivalent.kernels.kernels"]
    for name, path in [
        ("jdet", f"{REF}/jdet"),
        ("jdet.utils", f"{REF}/jdet/utils"),
        ("jdet.utils.equivalent", f"{REF}/jdet/utils/equivalent"),
        ("jdet.utils.equivalent.kernels",
         f"{REF}/jdet/utils/equivalent/kernels"),
    ]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = [path]
            sys.modules[name] = mod
    for leaf in ("math_utils", "group", "representation", "cyclic_group",
                 "kernels.basis", "kernels.irreps_basis",
                 "kernels.steerable_basis", "kernels.kernels"):
        importlib.import_module(f"jdet.utils.equivalent.{leaf}")
    return sys.modules["jdet.utils.equivalent.kernels.kernels"]


def _reference_sampled_basis(k, in_kind, out_kind):
    """The reference pipeline end-to-end: compute_basis_params (with
    ReResNet's fco = 3r, e2conv.py:471), kernels_CN_act_R2, sampling on
    the grid, bandlimit mask, normalization, pruning — transcribing only
    the thin glue of e2conv.py/block_basis.py around the imported
    reference numpy machinery."""
    kk = _load_reference_equivalent()
    cyclic = sys.modules["jdet.utils.equivalent.cyclic_group"]
    group = cyclic.cyclic_group(8)
    reprs = {"regular": group.regular_representation,
             "trivial": group.trivial_representation}

    # compute_basis_params with frequencies_cutoff = 3r
    n_rings = math.ceil(k / 2)
    rings = (np.linspace(0, (k - 1) // 2, n_rings)).tolist()
    sigma = [0.6] * (len(rings) - 1) + [0.4]
    for i, r in enumerate(rings):
        if r == 0.0:
            sigma[i] = 0.005
    fco = lambda r: 3.0 * r  # noqa: E731
    max_freq = int(max(fco(r) for r in rings))

    basis = kk.kernels_CN_act_R2(reprs[in_kind], reprs[out_kind],
                                 radii=rings, sigma=sigma,
                                 max_frequency=max_freq)

    # grid (e2conv.py:390)
    origin = k / 2 - 0.5
    pts = np.array([(x - origin, -y + origin)
                    for y in range(k) for x in range(k)]).T

    mask = np.array([abs(attr["frequency"]) <= fco(attr["radius"])
                     for attr in basis], dtype=bool)
    sizes = np.array([attr["shape"][0]
                      for attr, m in zip(basis, mask) if m], float)
    sampled = basis.sample_masked(pts, mask=mask)  # (out, in, B, P)
    sampled = np.transpose(sampled, (2, 0, 1, 3)).astype(np.float64)

    # normalize_basis (block_basis.py:12)
    sq = (sampled ** 2).sum(axis=(1, 2, 3))
    norms = np.where(sq / sizes < 1e-15, 0.0, sq / sizes)
    norms = np.sqrt(norms)
    norms = np.where(norms < 1e-6, 1.0, norms)
    sampled = sampled / norms[:, None, None, None]
    keep = (sampled ** 2).reshape(sampled.shape[0], -1).sum(1) > 1e-2
    return sampled[keep]


@pytest.mark.parametrize("k,in_kind", [
    (1, "regular"), (3, "regular"), (7, "regular"), (7, "trivial"),
    (5, "regular"),
])
def test_sampled_basis_lockstep(k, in_kind):
    from jdet_tpu.models.equivariant.c8_basis import c8_sampled_basis

    ref = _reference_sampled_basis(k, in_kind, "regular")
    ours = c8_sampled_basis(k, in_kind=in_kind, out_kind="regular")
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-12)


def test_expand_matches_reference_expansion():
    """Filter expansion (coefficients -> (out, in, k, k)) against a
    transcription of block_basis.py:419 _expand_block applied to the
    reference basis tensor."""
    from jdet_tpu.models.equivariant.c8_basis import expand_filter

    k, OF, IF = 3, 3, 2
    ref_basis = _reference_sampled_basis(k, "regular", "regular")
    B = ref_basis.shape[0]
    rng = np.random.RandomState(0)
    w = rng.randn(OF * IF * B)

    coeff = w.reshape(OF * IF, B)
    filt = np.einsum("cb,bois->cois", coeff, ref_basis)
    filt = filt.reshape(OF, IF, 8, 8, k * k).transpose(0, 2, 1, 3, 4)
    expected = filt.reshape(OF * 8, IF * 8, k, k)

    got = expand_filter(w, k, out_fields=OF, in_fields=IF,
                        in_kind="regular")
    np.testing.assert_allclose(got, expected, rtol=1e-10, atol=1e-12)

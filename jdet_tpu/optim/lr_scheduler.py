"""LR schedules — warmup wrapper + step/cosine/exp/poly/inv decays.

Functional mirror of the reference schedulers
(`python/jdet/optims/lr_scheduler.py`): a warmup prefix (constant /
linear / exp over `warmup_iters`, lr_scheduler.py:30-37) wrapping a decay
driven by training progress. The reference steps on (iters, epochs); here a
schedule is a pure fn step -> lr scale factor, composed with optax.

All decays are expressed in steps; epoch-milestone configs are converted
with `steps_per_epoch`.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import optax


def _warmup_factor(step, warmup, warmup_iters, warmup_ratio):
    if warmup is None:
        return 1.0
    alpha = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
    if warmup == "constant":
        f = warmup_ratio
    elif warmup == "linear":
        f = warmup_ratio + (1 - warmup_ratio) * alpha
    elif warmup == "exp":
        f = warmup_ratio ** (1 - alpha)
    else:
        raise ValueError(warmup)
    return jnp.where(step < warmup_iters, f, 1.0)


def build_lr_schedule(
    base_lr,
    *,
    scheduler_type="StepLR",
    milestones=(),
    gamma=0.1,
    steps_per_epoch=1,
    max_steps=None,
    warmup=None,
    warmup_iters=500,
    warmup_ratio=1.0 / 3,
    min_lr=0.0,
    power=1.0,
    **_unused,
):
    """Return fn(step) -> lr.

    scheduler_type in {StepLR, CosineAnnealingLR, ExpLR, PolyLR, InvLR}
    mirroring lr_scheduler.py:73,197,258,277,287. `milestones` are epochs.
    The *Group variants (lr_scheduler.py:73,257) share the same decay
    math — group-specific warmups ride build_group_lr_schedules.
    """
    scheduler_type = scheduler_type.replace("Group", "")
    if scheduler_type == "WarmUpLR":
        scheduler_type = "StepLR"  # warmup-only: no decay
    ms_steps = [int(m * steps_per_epoch) for m in milestones]

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if scheduler_type == "StepLR":
            k = sum((step >= m).astype(jnp.float32) for m in ms_steps) if ms_steps else 0.0
            decay = gamma**k
        elif scheduler_type == "CosineAnnealingLR":
            t = jnp.clip(step / max(max_steps or 1, 1), 0.0, 1.0)
            decay = (min_lr / base_lr) + (1 - min_lr / base_lr) * 0.5 * (
                1 + jnp.cos(math.pi * t)
            )
        elif scheduler_type == "ExpLR":
            decay = gamma ** (step / steps_per_epoch)
        elif scheduler_type == "PolyLR":
            t = jnp.clip(step / max(max_steps or 1, 1), 0.0, 1.0)
            decay = (1 - t) ** power + min_lr / base_lr
        elif scheduler_type == "InvLR":
            decay = (1 + gamma * step) ** (-power)
        else:
            raise ValueError(scheduler_type)
        return base_lr * decay * _warmup_factor(
            step, warmup, warmup_iters, warmup_ratio
        )

    return schedule


def build_group_lr_schedules(base_lr, groups, **common):
    """Per-parameter-group schedules (`WarmUpLRGroup` /
    `CosineAnnealingLRGroup`, reference lr_scheduler.py:73-130, 257-274).

    The reference parameterizes warmup type/ratio per optimizer param
    group (warmup_pg / warmup_ratio_pg / warmup_init_lr_pg); here each
    group is a dict of overrides over the base schedule kwargs plus an
    optional `lr_mult`, and carries a `pattern` glob that
    build_optimizer matches against parameter paths.

    Returns [(pattern, fn(step)->lr), ...].
    """
    out = []
    for g in groups:
        g = dict(g)
        pattern = g.pop("pattern", "*")
        lr_mult = g.pop("lr_mult", 1.0)
        if "warmup_init_lr" in g:
            # warmup_init_lr_pg: absolute warmup start lr -> ratio
            g["warmup_ratio"] = g.pop("warmup_init_lr") / (
                base_lr * lr_mult
            )
        kw = {**common, **g}
        out.append((pattern, build_lr_schedule(base_lr * lr_mult, **kw)))
    return out

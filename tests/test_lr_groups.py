"""Per-group LR schedules (WarmUpLRGroup / CosineAnnealingLRGroup
capability, reference optims/lr_scheduler.py:73-130, 257-274)."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from jdet_tpu.optim.lr_scheduler import (
    build_group_lr_schedules,
    build_lr_schedule,
)
from jdet_tpu.optim.optimizer import build_optimizer


def _ref_cosine(base_lr, step, max_steps, min_lr_ratio):
    target = base_lr * min_lr_ratio
    cos_out = math.cos(math.pi * step / max_steps) + 1
    return target + 0.5 * (base_lr - target) * cos_out


def test_cosine_group_schedule_math():
    base = 0.01
    scheds = build_group_lr_schedules(
        base,
        groups=[
            dict(pattern="backbone.*", warmup_ratio=0.1, lr_mult=0.5),
            dict(pattern="*", warmup_ratio=1.0 / 3),
        ],
        scheduler_type="CosineAnnealingLRGroup",
        max_steps=1000,
        min_lr=0.0005,
        warmup="linear",
        warmup_iters=100,
    )
    (p0, s0), (p1, s1) = scheds
    assert p0 == "backbone.*" and p1 == "*"
    # after warmup: pure cosine on base*mult (min_lr is absolute)
    got = float(s0(500))
    ref = _ref_cosine(base * 0.5, 500, 1000, 0.0005 / (base * 0.5))
    np.testing.assert_allclose(got, ref, rtol=1e-5)
    # at step 0: linear warmup start = warmup_ratio * group base lr
    np.testing.assert_allclose(float(s0(0)), 0.1 * base * 0.5 *
                               (math.cos(0) + 1) / 2, rtol=1e-5)
    np.testing.assert_allclose(float(s1(0)), (1.0 / 3) * base, rtol=1e-5)


def test_group_schedule_applies_per_parameter():
    """backbone params follow their group schedule, others the base."""

    class M(nnx.Module):
        def __init__(self, rngs):
            self.backbone = nnx.Linear(2, 2, use_bias=False, rngs=rngs)
            self.head = nnx.Linear(2, 2, use_bias=False, rngs=rngs)

        def __call__(self, x):
            return self.head(self.backbone(x))

    base_lr = 0.1
    common = dict(scheduler_type="WarmUpLRGroup", warmup="linear",
                  warmup_iters=10, warmup_ratio=0.5)
    base_sched = build_lr_schedule(base_lr, **{**common,
                                               "scheduler_type": "WarmUpLR"})
    groups = build_group_lr_schedules(
        base_lr, [dict(pattern="backbone.*", lr_mult=0.1, warmup=None)],
        **common,
    )
    model = M(nnx.Rngs(0))
    opt = build_optimizer(
        model, opt_type="SGD", lr_schedule=base_sched, momentum=0.0,
        weight_decay=0.0, group_schedules=groups,
    )
    graphdef, state = nnx.split((model, opt))

    @jax.jit
    def step(state):
        m, o = nnx.merge(graphdef, state)

        def lf(m):
            return (m(jnp.ones((1, 2))) ** 2).sum()

        loss, grads = nnx.value_and_grad(lf)(m)
        g_back = grads["backbone"]["kernel"].value
        g_head = grads["head"]["kernel"].value
        before = (m.backbone.kernel.value.copy(), m.head.kernel.value.copy())
        o.update(m, grads)
        _, ns = nnx.split((m, o))
        return ns, g_back, g_head, before

    state, g_back, g_head, (b0, h0) = step(state)
    model2, _ = nnx.merge(graphdef, state)
    # step 0: base schedule lr = 0.5*base (linear warmup); backbone group
    # has warmup=None + lr_mult=0.1 -> flat 0.1*base
    head_lr = 0.5 * base_lr
    back_lr = 0.1 * base_lr
    np.testing.assert_allclose(
        np.asarray(model2.head.kernel.value),
        np.asarray(h0 - head_lr * g_head), rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(model2.backbone.kernel.value),
        np.asarray(b0 - back_lr * g_back), rtol=1e-5,
    )

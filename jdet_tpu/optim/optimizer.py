"""Optimizer construction — optax chains mirroring the reference optimizers
(`python/jdet/optims/optimizer.py`): SGD(+momentum, weight_decay), Adam,
AdamW, optional global grad-norm clipping (optimizer.py pre_step), frozen
backbone-stage masking, and per-parameter-group lr/decay multipliers (the
`GradMutilpySGD` / parameter_groups_generator capability,
optimizer.py:44-77, models/param_generators/parameter_group_generator.py).
"""
from __future__ import annotations

import fnmatch
import math
from typing import Callable, Optional

import jax
import optax
from flax import nnx


def _path_str(path):
    parts = []
    for p in path:
        key = getattr(p, "key", getattr(p, "idx", None))
        if key is None:
            key = str(p)
        parts.append(str(key))
    return ".".join(parts)


def make_param_mask(state, predicate):
    """Boolean pytree over `state` from predicate(path_str, leaf)."""
    flat = nnx.to_flat_state(state)
    return nnx.from_flat_state(
        [(path, predicate(_path_str(path), leaf)) for path, leaf in flat]
    )


def frozen_stages_predicate(frozen_stages):
    """True = trainable. Mirrors ResNet._freeze_stages semantics
    (backbones/resnet.py:145-157): stem + layer1..layer{frozen_stages}
    are excluded from updates."""
    frozen_names = ["conv1", "bn1", "conv1a", "conv1b", "conv1c",
                    "bn1a", "bn1b", "bn1c"]
    frozen_layers = [f"layer{i}" for i in range(1, frozen_stages + 1)]

    def pred(path, leaf):
        parts = path.split(".")
        if "backbone" in parts:
            i = parts.index("backbone")
            nxt = parts[i + 1] if len(parts) > i + 1 else ""
            if frozen_stages >= 0 and nxt in frozen_names:
                return False
            if nxt in frozen_layers:
                return False
        return True

    return pred


def build_optimizer(
    model,
    *,
    opt_type="SGD",
    lr_schedule,
    momentum=0.9,
    weight_decay=0.0001,
    betas=(0.9, 0.999),
    eps=1e-8,
    grad_clip=None,
    frozen_stages=None,
    param_groups=None,
    group_schedules=None,
):
    """Build an nnx.Optimizer with the configured optax chain.

    param_groups: list of dicts {"pattern": glob, "lr_mult": float,
    "decay_mult": float} applied by parameter path (capability mirror of
    cfg.parameter_groups_generator, runner/runner.py:38-41).
    """
    txs = []
    if grad_clip is not None:
        max_norm = grad_clip.get("max_norm", 10.0) if isinstance(grad_clip, dict) else grad_clip
        txs.append(optax.clip_by_global_norm(max_norm))

    if opt_type.upper() == "SGD":
        txs.append(optax.sgd(lr_schedule, momentum=momentum))
        if weight_decay:
            # decoupled-from-schedule wd matching torch SGD (wd folded into grad)
            txs.insert(-1, optax.add_decayed_weights(weight_decay))
    elif opt_type.lower() == "adam":
        txs.append(optax.adam(lr_schedule, b1=betas[0], b2=betas[1], eps=eps))
    elif opt_type.lower() == "adamw":
        txs.append(
            optax.adamw(
                lr_schedule,
                b1=betas[0],
                b2=betas[1],
                eps=eps,
                weight_decay=weight_decay,
            )
        )
    else:
        raise ValueError(opt_type)
    tx = optax.chain(*txs)

    mult_fns = []
    if param_groups:
        def group_mult(path, leaf):
            mult = 1.0
            for g in param_groups:
                if fnmatch.fnmatch(path, g.get("pattern", "*")):
                    mult *= g.get("lr_mult", 1.0)
            return mult

        mult_fns.append(group_mult)

    if frozen_stages is not None and frozen_stages >= 0:
        pred = frozen_stages_predicate(frozen_stages)
        mult_fns.append(lambda path, leaf: 1.0 if pred(path, leaf) else 0.0)

    # distillation teachers are always frozen (KD single-stage detector)
    mult_fns.append(
        lambda path, leaf: 0.0 if "teacher" in path.split(".") else 1.0
    )

    if mult_fns:
        params = nnx.state(model, nnx.Param)
        mults = make_param_mask(
            params,
            lambda path, leaf: float(math.prod(f(path, leaf) for f in mult_fns)),
        )
        tx = optax.chain(tx, _scale_by_tree(mults))

    if group_schedules:
        # per-group time-dependent lr (WarmUpLRGroup capability,
        # reference lr_scheduler.py:73-130): the inner optimizer applies
        # the base schedule; this transform rescales each parameter's
        # update by group_lr(step)/base_lr(step), first matching pattern
        # wins, unmatched params keep the base schedule.
        params = nnx.state(model, nnx.Param)

        def group_idx(path, leaf):
            for i, (pattern, _) in enumerate(group_schedules):
                if fnmatch.fnmatch(path, pattern):
                    return i
            return len(group_schedules)  # base

        idx_tree = make_param_mask(params, group_idx)
        fns = [s for _, s in group_schedules]

        def ratio_fn(step):
            base = jax.numpy.maximum(lr_schedule(step), 1e-12)
            rs = [s(step) / base for s in fns] + [jax.numpy.asarray(1.0)]
            return jax.numpy.stack(
                [jax.numpy.asarray(r, jax.numpy.float32) for r in rs]
            )

        tx = optax.chain(tx, _scale_by_group_schedule(idx_tree, ratio_fn))

    return nnx.Optimizer(model, tx, wrt=nnx.Param)


def _scale_by_group_schedule(idx_tree, ratio_fn):
    """Time-dependent per-group update scaling (own step counter)."""

    def init(params):
        return {"count": jax.numpy.zeros((), jax.numpy.int32)}

    def update(updates, state, params=None, **extra):
        r = ratio_fn(state["count"])
        scaled = jax.tree.map(lambda u, g: u * r[g], updates, idx_tree)
        return scaled, {"count": state["count"] + 1}

    return optax.GradientTransformationExtraArgs(init, update)


def _scale_by_tree(mults):
    """optax transform multiplying each update by its path multiplier."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None, **extra):
        scaled = jax.tree.map(lambda u, m: u * m, updates, mults)
        return scaled, state

    return optax.GradientTransformationExtraArgs(init, update)

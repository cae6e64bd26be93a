"""SPMD utilities: device mesh, batch sharding, data-parallel train step.

TPU-native replacement for the reference's Jittor-MPI data parallelism
(SURVEY §2.10; touchpoints at `python/jdet/runner/runner.py:44,112,130,149`
and `python/jdet/utils/general.py:40-41`): instead of MPI all-reduce hooks,
we lay a 1-D `data` mesh over the chips, shard the batch along it, keep
parameters replicated, and let XLA/GSPMD insert the gradient psum over ICI.

`build_train_step` is the single source of truth for the sharded train
step: the Runner and `__graft_entry__.dryrun_multichip` both use it, so the
dryrun exercises the exact production sharding.

Host-side gating that the reference does with `jt.rank == 0` maps to
`jax.process_index() == 0`.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices=None, devices=None, batch_size=None):
    """1-D data-parallel mesh.

    If `batch_size` is given, the mesh is restricted to the largest device
    count that evenly divides it, so the batch dim can always be sharded
    (mirror of the reference's `drop_last=jt.in_mpi` divisibility care,
    runner/runner.py:44).
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    if batch_size:
        n = len(devices)
        while n > 1 and batch_size % n != 0:
            n -= 1
        devices = devices[:n]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh):
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh):
    """Place a host batch with the leading dim sharded over the data axis."""
    ns = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, ns), batch)


def replicate(tree, mesh):
    ns = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, ns), tree)


def is_main_process():
    """rank-0 gating (reference `@jt.single_process_scope`)."""
    return jax.process_index() == 0


def make_device_normalizer(mean, std, to_bgr=False):
    """Device-side image normalization: ship uint8 batches (4x less
    host->device transfer than f32) and do (x - mean) / std on device,
    where it fuses into the first conv's input pipeline. Pair with the
    dataset's `image_dtype="uint8"` and drop the host Normalize
    transform (reference normalizes in loader workers,
    data/transforms.py:468)."""
    mean = jnp.asarray(mean, jnp.float32)
    inv_std = 1.0 / jnp.asarray(std, jnp.float32)

    def normalize(images):
        x = images.astype(jnp.float32)
        if to_bgr:
            x = x[..., ::-1]
        return (x - mean) * inv_std

    return normalize


def build_train_step(model, optimizer, mesh, with_key=True,
                     preprocess=None):
    """Build the jit-compiled data-parallel train step.

    Sharding layout (reference DP semantics, Jittor-MPI grad all-reduce):
    params/opt state replicated (P()), batch sharded on the leading dim
    over DATA_AXIS; XLA/GSPMD inserts the gradient all-reduce over ICI.

    Returns (graphdef, state, step) where
    ``step(state, images, targets, root_key, it) -> (new_state, log_vars)``.
    The per-step RNG is ``fold_in(root_key, it)`` so every stochastic
    component (RoI RandomSampler, H2RBox view rotation) draws fresh noise
    each iteration (reference `models/boxes/sampler.py:134`,
    `networks/h2rbox.py:35-75`).
    """
    from flax import nnx

    from ..utils.general import parse_losses

    graphdef, state = nnx.split((model, optimizer))
    rep = replicated_sharding(mesh)
    dat = batch_sharding(mesh)
    state = replicate(state, mesh)

    @partial(
        jax.jit,
        in_shardings=(rep, dat, dat, rep, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )
    def step(state, images, targets, root_key, it):
        m, opt = nnx.merge(graphdef, state)
        key = jax.random.fold_in(root_key, it)
        if preprocess is not None:
            images = preprocess(images)

        def loss_fn(m):
            losses = m.loss(images, targets, key=key) if with_key else m.loss(
                images, targets
            )
            return parse_losses(losses)

        (total, log_vars), grads = nnx.value_and_grad(
            loss_fn, has_aux=True
        )(m)
        opt.update(m, grads)
        _, new_state = nnx.split((m, opt))
        return new_state, log_vars

    return graphdef, state, step


def psum_scalar_metrics(metrics, mesh=None):
    """Mean each scalar metric across all processes — the mirror of the
    reference's `sync()` MPI all-reduce (utils/general.py:30-48).

    Values produced inside the jitted step from a sharded batch are already
    global (GSPMD semantics); this handles explicitly per-process host
    values in multi-controller runs.
    """
    del mesh

    def _host(x):
        return float(np.asarray(jax.device_get(x)).mean()) if hasattr(
            x, "shape"
        ) or isinstance(x, (int, float, np.floating)) else x

    metrics = jax.tree.map(_host, metrics)
    if jax.process_count() == 1:
        return metrics
    from jax.experimental import multihost_utils

    return jax.tree.map(
        lambda x: float(
            multihost_utils.process_allgather(np.asarray(x)).mean()
        )
        if isinstance(x, (int, float, np.floating))
        else x,
        metrics,
    )

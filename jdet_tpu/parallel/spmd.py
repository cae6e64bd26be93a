"""SPMD utilities: device mesh, batch sharding, data-parallel train step.

TPU-native replacement for the reference's Jittor-MPI data parallelism
(SURVEY §2.10; touchpoints at `python/jdet/runner/runner.py:44,112,130,149`
and `python/jdet/utils/general.py:40-41`): instead of MPI all-reduce hooks,
we lay a 1-D `data` mesh over the chips, shard the batch along it, keep
parameters replicated, and let XLA/GSPMD insert the gradient psum over ICI.

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


def make_mesh(n_devices=None, devices=None):
    """1-D data-parallel mesh. For multi-host, devices default to all."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
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


def psum_scalar_metrics(metrics, mesh=None):
    """All-reduce scalar metrics across data shards — mirror of `sync`
    (utils/general.py:30-48). Under jit+GSPMD scalars are already global;
    this is for explicitly per-host values."""
    return jax.tree.map(
        lambda x: jax.device_get(x).mean() if hasattr(x, "shape") else x,
        metrics,
    )

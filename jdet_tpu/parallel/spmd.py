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


def make_device_augmenter(
    flip_h=0.0,
    flip_v=0.0,
    rot90=0.0,
    normalize=None,
):
    """Device-side geometric augmentation on uint8 batches.

    The reference runs flip/rot90 per-sample in loader workers
    (data/transforms.py:32-77, 390-441); on a 1-core host that starves
    the chip. Flips and k*90 rotations are pure index ops — moved inside
    the jitted train step they are HBM-bandwidth noise, and the matching
    gt-rbox updates are (B, K, 5) elementwise math. Host keeps only
    decode+resize.

    Returns aug(images, targets, key) -> (images_f32, targets). The box
    math mirrors RotatedRandomFlip/RandomRotateAug exactly (same
    norm_angle convention), assuming the static square canvas.
    """
    from ..ops.box_convert import norm_angle

    def aug(images, targets, key):
        B, H, W, _ = images.shape
        gb = targets["gt_bboxes"]
        kh, kv, kr = jax.random.split(key, 3)

        if flip_h:
            do = jax.random.uniform(kh, (B,)) < flip_h
            images = jnp.where(do[:, None, None, None],
                               images[:, :, ::-1], images)
            fb = jnp.stack([
                W - gb[..., 0] - 1, gb[..., 1], gb[..., 2], gb[..., 3],
                norm_angle(jnp.pi - gb[..., 4]),
            ], -1)
            gb = jnp.where(do[:, None, None], fb, gb)
        if flip_v:
            do = jax.random.uniform(kv, (B,)) < flip_v
            images = jnp.where(do[:, None, None, None],
                               images[:, ::-1], images)
            fb = jnp.stack([
                gb[..., 0], H - gb[..., 1] - 1, gb[..., 2], gb[..., 3],
                norm_angle(-gb[..., 4]),
            ], -1)
            gb = jnp.where(do[:, None, None], fb, gb)
        if rot90:
            assert H == W, "rot90 device augment needs a square canvas"
            u = jax.random.uniform(kr, (B,))
            k_rot = jnp.where(
                u < rot90,
                jax.random.randint(jax.random.fold_in(kr, 1), (B,), 0, 4),
                0,
            )
            # all 4 rotations (index ops), per-sample select
            r1 = jnp.rot90(images, 1, (1, 2))
            r2 = jnp.rot90(images, 2, (1, 2))
            r3 = jnp.rot90(images, 3, (1, 2))
            sel = k_rot[:, None, None, None]
            images = jnp.where(
                sel == 1, r1, jnp.where(sel == 2, r2,
                                        jnp.where(sel == 3, r3, images))
            )
            # boxes: rotate centers by -k*90deg about the canvas center
            # (rot90 is CCW in array space = CW in y-down image coords,
            # transforms.py RandomRotateAug)
            theta = -k_rot.astype(jnp.float32) * (jnp.pi / 2)
            c = jnp.cos(theta)[:, None]
            s = jnp.sin(theta)[:, None]
            cx0 = (W - 1) / 2.0
            cy0 = (H - 1) / 2.0
            x = gb[..., 0] - cx0
            y = gb[..., 1] - cy0
            rb = jnp.stack([
                c * x - s * y + cx0,
                s * x + c * y + cy0,
                gb[..., 2], gb[..., 3],
                norm_angle(gb[..., 4] + theta[:, None]),
            ], -1)
            gb = jnp.where((k_rot > 0)[:, None, None], rb, gb)

        targets = dict(targets)
        targets["gt_bboxes"] = gb
        x = images.astype(jnp.float32) if images.dtype != jnp.float32 \
            else images
        if normalize is not None:
            x = normalize(x)
        return x, targets

    return aug


def build_train_step(model, optimizer, mesh, with_key=True,
                     preprocess=None, augment=None):
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
        if augment is not None:
            images, targets = augment(
                images, targets, jax.random.fold_in(key, 7)
            )
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


def prefetch_to_device(batches, size=2):
    """Overlap host batch prep + host->device transfer with device compute.

    Wraps a `(batch, metas)` iterator (jdet_tpu.data CustomDataset.batches)
    and yields `((images, targets), metas)` with the arrays already
    converted on a worker thread, `size` batches ahead. On a tunneled or
    PCIe-attached chip the H2D copy is tens of ms per 1024px uint8 batch;
    serialized after each step it caps throughput (round-3
    retinanet_loader_fed: 9.9 tiles/s vs 90 device-side) — pipelined it
    rides under the previous step's compute. The TPU-native equivalent of
    the reference's worker-process collate handoff
    (jittor.dataset, data/custom.py:34-35).
    """
    import queue
    import threading

    q = queue.Queue(maxsize=max(1, int(size)))
    _END = object()
    stop = threading.Event()

    def _put(item):
        # bounded put that gives up if the consumer stopped early (a
        # mid-epoch `break` must not leave a thread blocked forever)
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                pass
        return False

    def worker():
        try:
            for batch, metas in batches:
                if stop.is_set():
                    return
                images = jnp.asarray(batch["images"])
                targets = {
                    k: jnp.asarray(v) for k, v in batch["targets"].items()
                }
                if not _put(((images, targets), metas)):
                    return
        except BaseException as e:  # surface in the consumer
            _put(e)
            return
        _put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()

"""Benchmark: training throughput of Rotated RetinaNet R50-FPN on 1024^2
DOTA-sized tiles, real TPU. Prints ONE JSON line.

Metric: 1024^2 tiles/sec/chip for a full train step (fwd+bwd+update),
mirroring the reference's local FPS measurement protocol
(`python/jdet/runner/runner.py:91-115`: warmup then timed steps). The
reference publishes no throughput numbers (BASELINE.md), so vs_baseline
is reported as 0.0 (no baseline available).
"""
import json
import time

import numpy as np


def main():
    import jax
    import optax
    from flax import nnx
    from __graft_entry__ import _build_model, _synth_batch

    B = 8
    SIZE = 1024
    model = _build_model(depth=50, size=SIZE)
    opt = nnx.Optimizer(model, optax.sgd(0.01, momentum=0.9), wrt=nnx.Param)
    graphdef, state = nnx.split((model, opt))
    images, targets = _synth_batch(B=B, size=SIZE)

    @jax.jit
    def step(state, images, targets):
        m, o = nnx.merge(graphdef, state)

        def lf(m):
            losses = m.loss(images, targets)
            return losses["loss_cls"] + losses["loss_bbox"]

        loss, grads = nnx.value_and_grad(lf)(m)
        o.update(m, grads)
        _, new_state = nnx.split((m, o))
        return loss, new_state

    # warmup/compile (device_get forces real completion; on the axon
    # backend block_until_ready can return before execution finishes)
    loss, state = step(state, images, targets)
    jax.device_get(loss)
    for _ in range(3):
        loss, state = step(state, images, targets)
    jax.device_get(loss)

    n_steps = 30
    t0 = time.perf_counter()
    for _ in range(n_steps):
        loss, state = step(state, images, targets)
    jax.device_get(loss)
    dt = time.perf_counter() - t0

    tiles_per_sec = B * n_steps / dt
    print(
        json.dumps(
            {
                "metric": "retinanet_obb_r50_train_tiles_per_sec_per_chip",
                "value": round(tiles_per_sec, 3),
                "unit": "1024px_tiles/s/chip",
                "vs_baseline": 0.0,
            }
        )
    )


if __name__ == "__main__":
    main()

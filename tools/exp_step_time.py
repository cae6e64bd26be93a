"""Train-step timing experiment: one bench row at a chosen batch size and
DCN/RoI scatter mode, on the real TPU.

    python tools/exp_step_time.py <row> <B> [plain|sorted|bf16|sorted_bf16] [n]

Prints ms/step, tiles/s and MFU so batch-size / scatter-mode candidates
for the bench matrix can be compared without editing bench.py.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    row = sys.argv[1]
    B = int(sys.argv[2])
    mode = sys.argv[3] if len(sys.argv) > 3 else "plain"
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 12

    import jax
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from bench import build_specs, _train_fn, _aot_compile, _timeit_train, V5E_BF16_PEAK
    from jdet_tpu.models.builder import build_detector
    from jdet_tpu.models.nn import set_compute_dtype
    from jdet_tpu.ops.gather import set_scatter_mode
    from __graft_entry__ import _synth_batch

    set_compute_dtype(jnp.bfloat16)
    set_scatter_mode(mode)
    cfg = {nm: c for nm, c, _ in build_specs()}[row]
    model = build_detector(dict(cfg), seed=0)
    opt = nnx.Optimizer(model, optax.sgd(0.01, momentum=0.9), wrt=nnx.Param)
    graphdef, state = nnx.split((model, opt))
    images, targets = _synth_batch(B=B, size=1024)
    step = _train_fn(model, opt, graphdef)
    t0 = time.perf_counter()
    step, flops = _aot_compile(step, state, images, targets)
    print(f"compile: {time.perf_counter() - t0:.1f} s, flops/step {flops/1e12:.2f} TF")
    dt, state = _timeit_train(step, state, images, targets, n)
    loss, _ = step(state, images, targets)
    print(
        f"{row} B={B} scatter={mode}: {dt*1e3:.1f} ms/step, "
        f"{B/dt:.2f} tiles/s, MFU {flops/dt/V5E_BF16_PEAK:.3f}, "
        f"loss {float(jax.device_get(loss)):.4f}"
    )


if __name__ == "__main__":
    main()

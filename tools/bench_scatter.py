"""Micro-bench: DCN backward d_table scatter strategies on TPU.

The AlignConv (DCN) backward's row scatter-add is the single largest op
of the S2ANet train step. This times `gather_weighted_rows` forward+
backward at S2ANet level-0 scale for each `set_scatter_mode` strategy so
the winner can be flipped on with one line.

Run on the real chip:  python tools/bench_scatter.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from jdet_tpu.ops.gather import gather_weighted_rows, set_scatter_mode


def bench_mode(mode, B=8, H=128, W=128, C=256, KK=9, n=10, dtype=jnp.bfloat16):
    set_scatter_mode(mode)
    T = B * (H + 1) * (W + 1)
    S = B * H * W * KK
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(T, 4 * C), dtype)
    idx = jnp.asarray(rng.randint(0, T, S).astype(np.int32))
    w = jnp.asarray(rng.rand(S, 4).astype(np.float32), dtype)

    @jax.jit
    def fwdbwd(t):
        # w stop-gradient, like AlignConv: d_w branch is DCE'd
        out = gather_weighted_rows(t, idx, jax.lax.stop_gradient(w))
        return (out * out).sum()

    g = jax.grad(fwdbwd)
    r = g(table)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = g(table)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    print(f"{mode:12s} S={S} T={T} 4C={4*C} {dtype.__name__}: "
          f"{dt*1e3:8.2f} ms/step  ({S/dt/1e6:.1f} Mrow/s)")
    return dt


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    # bf16 table = the real training path (set_compute_dtype(bf16) makes
    # the corner table bf16, so even "plain" already scatters bf16);
    # f32 rows isolate the bandwidth effect
    for dtype in (jnp.bfloat16, jnp.float32):
        for mode in ("plain", "sorted"):
            try:
                bench_mode(mode, dtype=dtype)
            except Exception as e:
                print(f"{mode}/{dtype.__name__}: FAILED {e}")
    set_scatter_mode("plain")

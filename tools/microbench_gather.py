"""Microbench gather_weighted_rows scatter modes at production shapes
(real TPU). Shape = the S2ANet AlignConv P3 level of the bench row
(B=8, 128x128, C=256, 9 taps), the single largest gather/scatter in the
framework. The round-5 run of this script (which then still included the
since-deleted Pallas forward kernel) is recorded in docs/performance.md.

    python tools/microbench_gather.py [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from jdet_tpu.ops import gather as pg

    B, H, W, C, KK = 8, 128, 128, 256, 9
    T = B * (H + 1) * (W + 1)
    S = B * H * W * KK
    D = 4 * C
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(T, D), jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, T, S), jnp.int32)
    w = jnp.asarray(rng.rand(S, 4), jnp.bfloat16)
    gb = S * D * 2 / 1e9
    print(f"shape: table ({T}, {D}) bf16, S={S} rows ({gb:.2f} GB gathered)")

    # --- forward
    f_xla = jax.jit(pg._xla_gather_weighted)
    t = timeit(f_xla, table, idx, w, reps=reps)
    print(f"fwd xla            : {t:8.2f} ms  ({gb / t * 1e3:6.1f} GB/s)")

    # --- forward+backward (grad wrt table), by scatter mode
    def make_fb(mode):
        def f(tbl, i, ww):
            pg._SCATTER_MODE[0] = mode
            if mode == "plain":
                g = lambda tb: pg._xla_gather_weighted(tb, i, ww).sum()
            else:
                g = lambda tb: pg._xla_gwr_custom(tb, i, ww).sum()
            return jax.grad(g)(tbl)
        return jax.jit(f)

    ref = None
    for mode in ("plain", "sorted", "bf16", "sorted_bf16"):
        try:
            fb = make_fb(mode)
            t = timeit(fb, table, idx, w, reps=reps)
            out = np.asarray(fb(table, idx, w), np.float32)
            if ref is None:
                ref = out
                err = 0.0
            else:
                err = float(np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9))
            print(f"fwd+bwd {mode:12s}: {t:8.2f} ms  (rel err vs plain {err:.2e})")
        except Exception as e:  # noqa: BLE001
            print(f"fwd+bwd {mode:12s}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()

"""Row-transaction microbench: gather / scatter-add cost on the real TPU.

Methodology notes (each defeated a silent measurement failure):
  1. Repeated IDENTICAL dispatches are short-circuited somewhere in the
     axon tunnel (the round-5 first cut measured an impossible 6.5 TB/s
     forward gather). Every repetition here is a distinct dispatch whose
     input is the previous repetition's output (state threading, like
     bench._timeit_train).
  2. The timed body must depend on EVERY gathered row: reducing
     out[0, :1] lets XLA rewrite slice(gather) -> gather(slice) and skip
     the work. We fold out.sum() back into the carry.
  3. Large tensors must be jit ARGUMENTS, not closures: captured
     constants are embedded in the executable and re-uploaded over the
     tunnel per program (2.4 GB at ~13 MB/s = minutes per compile).
  4. Data is generated on-device (host randn of (S, D) float64 is ~10 GB
     and the tunnel moves incompressible bytes at ~13 MB/s).

Measures, at the production S2ANet AlignConv P3 shape (B=8, 128x128,
C=256, 9 taps, corner-packed 1024-channel rows):

  gather  : out[s] = table[idx[s]]            (S rows read)
  fwd     : fused gather + corner weighting   (the forward op)
  scatter : zeros.at[idx].add(rows)           (the backward col2im)
  fwd+bwd : grad of fused gather wrt table

for uniform-random and realistic (raster + anchor-offset) indices, plus
a row-width sweep for the scatter to calibrate the per-row cost model.
Usage:  python tools/microbench_rowops.py [reps] [core]
  "core" skips the dense-add calibration, the fused-forward variant,
  the realistic fwd+bwd, and the width sweep (each compile costs 1-3
  min over the tunnel; the core set answers the roofline question).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(body, carry0, args, reps):
    """Time `reps` chained dispatches of jit(body)(carry, *args) where
    each carry is the previous output; compile+warmup excluded. Each
    carry is the previous output, fenced ONCE at the end by
    jax.device_get of a checksum scalar the last body computed FROM its
    big output. Two backend quirks force this design: (a)
    block_until_ready resolves without a device round-trip (a 4096^3
    matmul "finished" in 0.04 ms under it) — only materializing a
    dependent value to the host is a trustworthy fence; (b) that
    device_get costs ~30 ms over the tunnel, so it must be amortized
    over the whole chain and its measured ready-value latency
    subtracted. Bodies return (big_out, scale, checksum)."""
    fn = jax.jit(body)
    c = fn(carry0, *args)
    jax.device_get(c[2])
    # fence floor: device_get of an already-computed scalar
    t0 = time.perf_counter()
    jax.device_get(c[2])
    fence = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        c = fn(c, *args)
    jax.device_get(c[2])
    return max(time.perf_counter() - t0 - fence, 1e-9) / reps


def realistic_idx(B, H, W, KK, rng):
    """AlignConv-like destinations: raster position + anchor-scaled tap
    offset (gaussian, clipped to +-6 feature px) on the (H+1)x(W+1)
    corner-table grid."""
    T1 = (H + 1) * (W + 1)
    y, x = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    y = np.broadcast_to(y[None, :, :, None], (B, H, W, KK))
    x = np.broadcast_to(x[None, :, :, None], (B, H, W, KK))
    dy = np.clip(rng.randn(B, H, W, KK) * 2, -6, 6).astype(np.int64)
    dx = np.clip(rng.randn(B, H, W, KK) * 2, -6, 6).astype(np.int64)
    yq = np.clip(y + dy + 1, 0, H)
    xq = np.clip(x + dx + 1, 0, W)
    b = np.arange(B, dtype=np.int64).reshape(B, 1, 1, 1)
    return (b * T1 + yq * (W + 1) + xq).reshape(-1).astype(np.int32)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    core = len(sys.argv) > 2 and sys.argv[2] == "core"
    from jdet_tpu.ops.gather import _xla_gather_weighted

    B, H, W, C, KK = 8, 128, 128, 256, 9
    T = B * (H + 1) * (W + 1)
    S = B * H * W * KK
    D = 4 * C
    rng = np.random.RandomState(0)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    table = jax.random.normal(k1, (T, D), jnp.bfloat16)
    w = jax.random.uniform(k2, (S, 4), jnp.bfloat16)
    rows = jax.random.normal(k3, (S, D), jnp.bfloat16)
    gb_in = S * D * 2 / 1e9
    print(f"table ({T}, {D}) bf16 = {T*D*2/1e9:.2f} GB; "
          f"S = {S} rows ({gb_in:.2f} GB row-traffic); reps={reps}")

    idx_sets = {
        "uniform": jnp.asarray(rng.randint(0, T, S), jnp.int32),
        "realistic": jnp.asarray(realistic_idx(B, H, W, KK, rng)),
    }

    # Every body threads a REAL f32 scale (x1.01 per call) through the
    # computation so consecutive dispatches differ bitwise — a +1e-9
    # perturbation of a bf16 tensor rounds to a no-op and the identical
    # dispatches get short-circuited (measured "0.07 ms" for 2.4 GB).
    # Big tensors are ARGS (closure constants re-upload per executable
    # over the tunnel); each body threads a REAL f32 scale (x1.01 per
    # call) through the computation so consecutive dispatches differ
    # bitwise — a +1e-9 perturbation of a bf16 tensor rounds to a no-op
    # and the identical dispatches get short-circuited (measured
    # "0.07 ms" for 2.4 GB).
    def g_body(carry, tbl, idx):
        scale = carry[1]
        out = jnp.take(tbl, idx, axis=0) + scale.astype(tbl.dtype)
        return out, scale * 1.01, out[0, :8].astype(jnp.float32).sum()

    def f_body(carry, tbl, idx, w):
        scale = carry[1]
        out = _xla_gather_weighted(tbl, idx, w * scale.astype(w.dtype))
        return out, scale * 1.01, out[0, :8].astype(jnp.float32).sum()

    def s_body(carry, idx, rows):
        scale = carry[1]
        acc = jnp.zeros((T, D), jnp.bfloat16).at[idx].add(
            rows * scale.astype(rows.dtype))
        return acc, scale * 1.01, acc[0, :8].astype(jnp.float32).sum()

    def fb_body(carry, tbl, idx, w):
        scale = carry[1]
        g = jax.grad(
            lambda tb: _xla_gather_weighted(
                tb, idx, w * scale.astype(w.dtype)).sum().astype(jnp.float32)
        )(tbl)
        return g, scale * 1.01, g[0, :8].astype(jnp.float32).sum()

    one = jnp.float32(1.0)
    z_s = jnp.zeros((S, D), jnp.bfloat16)
    z_c = jnp.zeros((S, C), jnp.bfloat16)
    z_t = jnp.zeros((T, D), jnp.bfloat16)

    # calibration: dense ops with known light-speed costs, same harness.
    # If these read wrong the harness is broken; if only the row ops read
    # wrong the backend is eliding them.
    def add_body(carry, x):
        scale = carry[1]
        out = x + scale.astype(x.dtype)
        return out, scale * 1.01, out[0, :8].astype(jnp.float32).sum()

    if not core:
        t = timed(add_body, (z_s, one, one), (rows,), reps)
        print(f"[calib] dense add 2.4 GB (r+w 4.8 GB): {t*1e3:8.2f} ms "
              f"({2*gb_in/t:6.0f} GB/s vs ~819 GB/s HBM)", flush=True)

    mm_a = jax.random.normal(k1, (4096, 4096), jnp.bfloat16)

    def mm_body(carry, a):
        scale = carry[1]
        out = (a * scale.astype(a.dtype)) @ a
        return out, scale * 1.01, out[0, :8].astype(jnp.float32).sum()

    t = timed(mm_body, (mm_a, one, one), (mm_a,), reps)
    fl = 2 * 4096**3
    print(f"[calib] matmul 4096^3 bf16           : {t*1e3:8.2f} ms "
          f"({fl/t/1e12:6.1f} TF/s vs ~197 peak)", flush=True)

    for name, idx in idx_sets.items():
        t = timed(g_body, (z_s, one, one), (table, idx), reps)
        print(f"[{name}] gather  (S x {D*2}B rows): {t*1e3:8.2f} ms  "
              f"({S/t/1e6:6.1f} M rows/s, {gb_in/t:6.1f} GB/s)", flush=True)
        if not core:
            t = timed(f_body, (z_c, one, one), (table, idx, w), reps)
            print(f"[{name}] fwd fused gather+weight    : {t*1e3:8.2f} ms",
                  flush=True)
        t = timed(s_body, (z_t, one, one), (idx, rows), reps)
        print(f"[{name}] scatter-add (S x {D*2}B rows): {t*1e3:8.2f} ms  "
              f"({S/t/1e6:6.1f} M rows/s)", flush=True)
        if not core or name == "uniform":
            t = timed(fb_body, (z_t, one, one), (table, idx, w), reps)
            print(f"[{name}] fwd+bwd                    : {t*1e3:8.2f} ms",
                  flush=True)

    if core:
        return
    print("\nscatter row-width sweep (constant 2.4 GB row-traffic):")
    for D2 in (256, 1024, 4096):
        S2 = S * D // D2
        T2 = max(T * D // D2, 1)
        idx2 = jnp.asarray(rng.randint(0, T2, S2), jnp.int32)
        rows2 = jax.random.normal(jax.random.PRNGKey(D2), (S2, D2),
                                  jnp.bfloat16)

        def s2_body(carry, idx2, rows2, T2=T2, D2=D2):
            scale = carry[1]
            acc = jnp.zeros((T2, D2), jnp.bfloat16).at[idx2].add(
                rows2 * scale.astype(rows2.dtype))
            return acc, scale * 1.01, acc[0, :8].astype(jnp.float32).sum()

        z = jnp.zeros((T2, D2), jnp.bfloat16)
        t = timed(s2_body, (z, jnp.float32(1.0), jnp.float32(1.0)), (idx2, rows2), reps)
        print(f"  rows {D2*2:5d} B x {S2:8d}: {t*1e3:8.2f} ms  "
              f"({S2/t/1e6:6.1f} M rows/s)", flush=True)


if __name__ == "__main__":
    main()

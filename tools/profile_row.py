"""Per-source-line device-time profile of a bench-matrix row.

Usage (real TPU, must be the only TPU process):

    python tools/profile_row.py <row> [train|infer] [n_steps]

where <row> is a bench.py spec name (retinanet_obb_r50, s2anet_r50,
oriented_rcnn_r50, redet_re50). Captures a jax.profiler trace of the
jitted step and prints device ms aggregated by source line (verify-skill
recipe: sum `args.device_duration_ps` by `args.source` from
plugins/profile/*/`*.trace.json.gz`).
"""
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def aggregate_trace(out_dir, top=40):
    paths = glob.glob(os.path.join(out_dir, "plugins/profile/*/*.trace.json.gz"))
    assert paths, f"no trace under {out_dir}"
    by_src = defaultdict(float)
    total = 0.0
    for p in paths:
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            args = ev.get("args") or {}
            dur = args.get("device_duration_ps")
            if dur is None:
                continue
            src = args.get("source") or "?"
            name = ev.get("name", "?")
            if src == "?":
                # gather/scatter custom fusions carry no source; key by name
                src = f"<{name.split('.')[0]}>"
            by_src[src] += float(dur)
            total += float(dur)
    rows = sorted(by_src.items(), key=lambda kv: -kv[1])
    print(f"\ntotal device time: {total/1e9:.2f} ms (all traced steps)")
    for src, ps in rows[:top]:
        print(f"{ps/1e9:9.2f} ms  {100*ps/total:5.1f}%  {src}")
    return rows, total


def main():
    row = sys.argv[1] if len(sys.argv) > 1 else "s2anet_r50"
    mode = sys.argv[2] if len(sys.argv) > 2 else "train"
    n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    import jax
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from bench import build_specs, _train_fn
    from jdet_tpu.models.builder import build_detector
    from jdet_tpu.models.nn import set_compute_dtype
    from __graft_entry__ import _synth_batch

    set_compute_dtype(jnp.bfloat16)
    spec = {n: (cfg, B) for n, cfg, B in build_specs()}[row]
    model_cfg, B = spec
    model = build_detector(dict(model_cfg), seed=0)
    images, targets = _synth_batch(B=B, size=1024)
    out_dir = os.path.join(tempfile.gettempdir(), f"profile_{row}_{mode}")

    if mode == "train":
        opt = nnx.Optimizer(model, optax.sgd(0.01, momentum=0.9), wrt=nnx.Param)
        graphdef, state = nnx.split((model, opt))
        step = _train_fn(model, opt, graphdef)
        loss, state = step(state, images, targets)
        jax.device_get(loss)
        with jax.profiler.trace(out_dir):
            for _ in range(n_steps):
                loss, state = step(state, images, targets)
            jax.device_get(loss)
    else:
        from jdet_tpu.models.equivariant import cache_expanded_weights

        cache_expanded_weights(model)
        graphdef, state = nnx.split(model)

        @jax.jit
        def predict(state, images):
            m = nnx.merge(graphdef, state)
            return m.predict(images)

        r = predict(state, images)
        jax.device_get(jax.tree.leaves(r)[0])
        with jax.profiler.trace(out_dir):
            for _ in range(n_steps):
                r = predict(state, images)
            jax.device_get(jax.tree.leaves(r)[0])

    aggregate_trace(out_dir)


if __name__ == "__main__":
    main()

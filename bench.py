"""Benchmark matrix: train + inference throughput of the flagship
detectors on 1024^2 DOTA-sized tiles, real TPU. Prints ONE JSON line.

Primary metric (the scored scalar): Rotated RetinaNet R50-FPN train
tiles/s/chip, mirroring the reference's local FPS protocol
(`python/jdet/runner/runner.py:91-115`: warmup then timed steps). The
reference publishes no throughput numbers (BASELINE.md), so vs_baseline
is the gain over our own round-1 number (52.8 tiles/s).

The `matrix` field carries the wider sweep: train and inference
tiles/s/chip for {retinanet, s2anet, oriented_rcnn, redet}, an MFU
estimate per train row (XLA cost-analysis FLOPs / step time / 197 TFLOP/s
bf16 peak on v5e), and one loader-fed row where the real input pipeline
(disk decode + transforms + collate on this host) feeds the retinanet
step, exposing host-side bottlenecks.
"""
import json
import os
import time

import numpy as np

R1_BASELINE = 52.8  # round-1 scored value, tiles/s/chip
V5E_BF16_PEAK = 197e12


def _timeit(fn, args, n):
    import jax

    r = fn(*args)
    jax.device_get(jax.tree.leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.device_get(jax.tree.leaves(r)[0])
    return (time.perf_counter() - t0) / n


def _timeit_train(step, state, images, targets, n):
    """Train-step timing with state threading (the step donates its input
    state, so each call must consume the previous call's output)."""
    import jax

    loss, state = step(state, images, targets)
    jax.device_get(loss)
    t0 = time.perf_counter()
    for _ in range(n):
        loss, state = step(state, images, targets)
    jax.device_get(loss)
    return (time.perf_counter() - t0) / n, state


def _aot_compile(step, *args):
    """Compile once ahead-of-time; the same executable serves both the
    FLOPs estimate and the timed loop (a second trace+compile through the
    jit cache costs minutes over the axon tunnel)."""
    compiled = step.lower(*args).compile()
    flops = 0.0
    try:
        c = compiled.cost_analysis()
        if isinstance(c, list):
            c = c[0]
        flops = float(c.get("flops", 0.0))
    except Exception:
        pass
    return compiled, flops


def _train_fn(model, opt, graphdef, preprocess=None, augment=None):
    import jax
    from flax import nnx
    from functools import partial

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, images, targets):
        m, o = nnx.merge(graphdef, state)
        if augment is not None:
            images, targets = augment(
                images, targets, jax.random.PRNGKey(0)
            )
        if preprocess is not None:
            images = preprocess(images)

        def lf(m):
            losses = m.loss(images, targets)
            return sum(losses.values())

        loss, grads = nnx.value_and_grad(lf)(m)
        o.update(m, grads)
        _, new_state = nnx.split((m, o))
        return loss, new_state

    return step

def bench_model(name, model_cfg, B, n_steps=12):
    import jax
    import optax
    from flax import nnx
    from jdet_tpu.models.builder import build_detector
    from __graft_entry__ import _synth_batch

    model = build_detector(dict(model_cfg), seed=0)
    opt = nnx.Optimizer(model, optax.sgd(0.01, momentum=0.9), wrt=nnx.Param)
    graphdef, state = nnx.split((model, opt))
    images, targets = _synth_batch(B=B, size=1024)
    step = _train_fn(model, opt, graphdef)
    step, flops = _aot_compile(step, state, images, targets)
    dt, state = _timeit_train(step, state, images, targets, n_steps)
    mfu = flops / dt / V5E_BF16_PEAK if flops else None

    # the train step donated the original buffers; push the threaded
    # state back into the module before building the predict graph
    nnx.update((model, opt), state)
    from jdet_tpu.models.equivariant import cache_expanded_weights

    cache_expanded_weights(model)
    pgraph, pstate = nnx.split(model)

    @jax.jit
    def predict(state, images):
        m = nnx.merge(pgraph, state)
        return m.predict(images)

    dti = _timeit(predict, (pstate, images), n_steps)
    row = {
        "train_tiles_per_s": round(B / dt, 2),
        "infer_tiles_per_s": round(B / dti, 2),
        "batch": B,
    }
    if mfu:
        row["train_mfu"] = round(mfu, 3)
    return row


def bench_loader_fed(n_tiles=96, B=32):
    """Real input pipeline (disk -> decode -> transforms -> collate)
    feeding the retinanet train step.

    B matches the device-only retinanet row so tiles/s are directly
    comparable (rounds 2-3 ran B=4, where the number measured small-batch
    device underutilization — ~620 ms/step at B=4 vs 357 ms at B=32 —
    rather than the host pipeline)."""
    import cv2
    import jax
    import jax.numpy as jnp
    import optax
    from flax import nnx
    from __graft_entry__ import _build_model
    from jdet_tpu.data.dota import DOTADataset

    # Structured synthetic tiles (smooth background + the GT objects drawn
    # as filled rotated rectangles), NOT uniform noise. The axon tunnel
    # compresses transfers: H2D of a 100 MB uint8 batch measured 0.15 s
    # for image-like tiles vs 7.5 s for incompressible noise (round-5
    # probe, docs/performance.md "Host input pipeline") — noise tiles
    # benchmark the tunnel's worst case rather than the input pipeline,
    # and real DOTA imagery is jpeg-compressible like these.
    root = f"/tmp/bench_loader_tiles_v2_{n_tiles}"
    img_dir = os.path.join(root, "images")
    ann = os.path.join(root, "labels.pkl")
    if not os.path.exists(ann):
        import pickle

        os.makedirs(img_dir, exist_ok=True)
        rng = np.random.RandomState(0)
        infos = []
        for i in range(n_tiles):
            base = np.full((1024, 1024, 3), rng.randint(60, 180, 3), np.uint8)
            coarse = rng.randn(128, 128, 3).repeat(8, 0).repeat(8, 1) * 10
            img = cv2.GaussianBlur(
                np.clip(base + coarse, 0, 255).astype(np.uint8), (0, 0), 3
            )
            k = 8
            rb = np.stack([
                rng.uniform(100, 900, k), rng.uniform(100, 900, k),
                rng.uniform(20, 200, k), rng.uniform(10, 100, k),
                rng.uniform(-np.pi / 4, 3 * np.pi / 4, k)], 1).astype(np.float32)
            for cx, cy, w, h, a in rb:
                quad = cv2.boxPoints(
                    ((float(cx), float(cy)), (float(w), float(h)),
                     float(np.degrees(a)))
                ).astype(np.int32)
                cv2.fillPoly(img, [quad],
                             tuple(int(c) for c in rng.randint(0, 255, 3)))
            name = f"t{i:03d}.jpg"
            cv2.imwrite(os.path.join(img_dir, name), img)
            infos.append({"filename": name, "width": 1024, "height": 1024,
                          "ann": {"bboxes": rb,
                                  "labels": rng.randint(1, 16, k).astype(np.int32),
                                  "bboxes_ignore": np.zeros((0, 5), np.float32)}})
        with open(ann, "wb") as f:
            pickle.dump(infos, f)

    ds = DOTADataset(
        version="1", annotations_file=ann, images_dir=img_dir,
        transforms=[
            dict(type="RotatedResize", min_size=1024, max_size=1024),
            # flip runs device-side (make_device_augmenter below)
        ],
        image_size=(1024, 1024), max_gt=32, batch_size=B, shuffle=True,
        # uint8 batches + device-side normalize: 4x less host->device
        # transfer (jdet_tpu.parallel.spmd.make_device_normalizer)
        image_dtype="uint8",
        # pre-decoded tile cache: epoch 0 decodes, epoch 1+ reads memmap
        image_cache="auto",
        # thread prefetch: spawn-pool startup (~20s of worker re-imports)
        # would dominate this short benchmark on a 1-core host; real
        # multi-core training hosts set num_workers>1
        num_workers=0,
    )
    from jdet_tpu.parallel.spmd import (
        make_device_augmenter,
        make_device_normalizer,
    )

    normalize = make_device_normalizer([123.675, 116.28, 103.53],
                                       [58.395, 57.12, 57.375])
    augment = make_device_augmenter(flip_h=0.5)
    model = _build_model(depth=50, size=1024)
    opt = nnx.Optimizer(model, optax.sgd(0.01, momentum=0.9), wrt=nnx.Param)
    graphdef, state = nnx.split((model, opt))
    step = _train_fn(model, opt, graphdef, preprocess=normalize,
                     augment=augment)
    # warmup: compile on the first batch only. The first timed epoch
    # below still decodes from disk (cold; comparable with rounds 1-2),
    # the second reads the pre-decoded memmap cache (steady-state) —
    # both are reported so round-over-round numbers stay comparable
    # (ADVICE r3).
    batch, _ = next(ds.batches(seed=0))
    images = jnp.asarray(batch["images"])
    targets = {k: jnp.asarray(v) for k, v in batch["targets"].items()}
    loss, state = step(state, images, targets)
    jax.device_get(loss)

    from jdet_tpu.parallel.spmd import prefetch_to_device

    rates = []
    for epoch in range(2):
        n_img = 0
        t0 = time.perf_counter()
        for (images, targets), _ in prefetch_to_device(
            ds.batches(epoch=epoch, seed=1), size=2
        ):
            loss, state = step(state, images, targets)
            n_img += images.shape[0]
        jax.device_get(loss)
        rates.append(n_img / (time.perf_counter() - t0))
    return {"train_tiles_per_s": round(rates[-1], 2),
            "cold_tiles_per_s": round(rates[0], 2), "batch": B,
            "pipeline": "disk+transforms"}


SPECS = None  # filled below; (name, cfg, batch) rows for bench_model


def build_specs():
    """(name, model_cfg, batch) rows of the bench matrix. Module-level so
    tools (profile_row.py) can rebuild the exact benched models."""
    return [
        ("retinanet_obb_r50", dict(
            type="RotatedRetinaNet",
            backbone=dict(type="ResNet", depth=50, frozen_stages=1),
            neck=dict(type="FPN", out_channels=256, num_outs=5, start_level=1,
                      add_extra_convs="on_input"),
            bbox_head=dict(type="RotatedRetinaHead", num_classes=16,
                           in_channels=256),
        ), 32),
        ("s2anet_r50", dict(
            type="S2ANet",
            backbone=dict(type="ResNet", depth=50, frozen_stages=1),
            neck=dict(type="FPN", out_channels=256, num_outs=5, start_level=1,
                      add_extra_convs="on_input"),
            bbox_head=dict(type="S2ANetHead", num_classes=16, in_channels=256,
                           feat_channels=256, stacked_convs=2),
        ), 8),
        ("oriented_rcnn_r50", dict(
            type="OrientedRCNN",
            backbone=dict(type="ResNet", depth=50, frozen_stages=1),
            neck=dict(type="FPN", out_channels=256, num_outs=5),
            rpn_head=dict(type="OrientedRPNHead", in_channels=256,
                          feat_channels=256),
            bbox_head=dict(type="OrientedHead", num_classes=15,
                           in_channels=256),
            # B=16 (round 5): 21 -> 28.6 train tiles/s vs the round-4 B=4
            # row (fixed per-image RoI/NMS/target work amortizes; B=32
            # OOMs on the RoI-head activations)
        ), 16),
        ("redet_re50", dict(
            type="ReDet",
            backbone=dict(type="ReResNet", depth=50, base_fields=8,
                          frozen_stages=1),  # reference config parity
            neck=dict(type="ReFPN", out_channels=256, num_outs=5),
            rpn_head=dict(type="RPNHead", in_channels=256, feat_channels=256),
            bbox_head=dict(type="ReDetHead", num_classes=15, in_channels=256),
            # B=4 (round 5): 15.4 vs 14.8 tiles/s at B=2; compile is no
            # longer the constraint (scan-over-blocks: 20 min -> 100 s)
        ), 4),
    ]


def _probe_tpu(timeout_s=240):
    """Initialize the accelerator backend in a SUBPROCESS with a hard
    timeout. The axon tunnel can die in a way that makes jax.devices()
    hang forever (observed round 3: bench rc=124, nothing recorded) —
    a hung probe child can be killed; a hung in-process init cannot."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); print(d[0].platform)"],
            timeout=timeout_s, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        return None
    if r.returncode != 0:
        return None
    out = r.stdout.strip().splitlines()
    return out[-1] if out else None


def _run_row(name, timeout_s):
    """Run one bench row in a subprocess; returns its row dict. A tunnel
    death mid-row then costs that row, not the whole matrix."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--row", name],
            timeout=timeout_s, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        return {"error": f"row timed out after {timeout_s}s"}
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
    return {"error": _exc_line(r.stderr)}


def _exc_line(stderr):
    """Pull the actual exception line out of a child's stderr. A blind
    tail slice returns JAX's traceback-filtering footer instead of the
    error (lost the real oriented_rcnn failure in a round-5 run)."""
    import re

    lines = [l.strip() for l in (stderr or "").splitlines() if l.strip()]
    if not lines:
        return "no output"
    pat = re.compile(r"^[\w.]*(Error|Exception|EXHAUSTED|INTERNAL|ABORTED)\b"
                     r"|RESOURCE_EXHAUSTED|Out of memory")
    hits = [l for l in lines if pat.search(l)]
    return (hits[-1] if hits else lines[-1])[:400]


def _row_main(name):
    """Child-process entry: run one row, print its JSON dict."""
    import jax
    import jax.numpy as jnp
    from jdet_tpu.models.nn import set_compute_dtype

    try:
        # persistent compile cache: best-effort only — on the axon backend
        # neither this local cache nor the service caches across processes
        # (compiles are remote; see BENCH_LOCAL_r04.json note), but it is
        # harmless and pays off on backends that do honor it (cpu/tpu-vm)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    set_compute_dtype(jnp.bfloat16)
    if name == "retinanet_loader_fed":
        row = bench_loader_fed()
    else:
        spec = {n: (cfg, B) for n, cfg, B in SPECS}[name]
        row = bench_model(name, spec[0], spec[1])
    print(json.dumps(row))


def _emit(matrix):
    """Print the (possibly partial) scored JSON line."""
    primary = matrix.get("retinanet_obb_r50", {}).get("train_tiles_per_s", 0.0)
    print(
        json.dumps(
            {
                "metric": "retinanet_obb_r50_train_tiles_per_sec_per_chip",
                "value": primary,
                "unit": "1024px_tiles/s/chip",
                "vs_baseline": round(primary / R1_BASELINE - 1.0, 3)
                if primary else 0.0,
                "matrix": matrix,
            }
        ),
        flush=True,
    )


def main():
    # Global wall-clock budget: round 3's bench was killed by the driver
    # (rc=124) before printing anything. Whatever the driver's timeout is,
    # we must finish first — rows that don't fit the budget are skipped
    # and recorded as such, and the JSON line always prints.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "4500"))
    t_start = time.perf_counter()
    matrix = {}
    specs = build_specs()
    global SPECS
    SPECS = specs

    import sys

    if len(sys.argv) >= 3 and sys.argv[1] == "--row":
        _row_main(sys.argv[2])
        return

    platform = _probe_tpu()
    if platform is None:
        # tunnel down: emit a parseable line fast instead of hanging
        # into the driver's timeout (round-3 failure mode)
        print(json.dumps({
            "metric": "retinanet_obb_r50_train_tiles_per_sec_per_chip",
            "value": 0.0, "unit": "1024px_tiles/s/chip",
            "vs_baseline": -1.0,
            "error": "accelerator backend init hung/failed (tunnel down)",
        }))
        return

    # Last line of defense: if the driver's timeout fires anyway, `timeout`
    # sends SIGTERM first — emit whatever is measured so far before dying,
    # so the tail always carries a parseable line.
    import signal

    def _on_term(signum, frame):
        matrix["interrupted"] = "SIGTERM (driver timeout)"
        matrix["platform"] = platform
        matrix["budget_s"] = budget_s
        _emit(matrix)
        os._exit(0)

    signal.signal(signal.SIGTERM, _on_term)

    # Per-row cost is dominated by REMOTE compile over the device tunnel
    # (~3 min per jit program; measured round 4: retinanet row 7 min,
    # s2anet 6, oriented_rcnn 7, loader_fed ~8, redet ~20 — local CPU
    # <25 s in every case, and neither the local persistent cache nor the
    # service caches across processes). Rows run in priority order
    # (primary metric first, redet last — it alone exceeds most budgets)
    # and are skipped once the global budget would be exceeded; a driver
    # SIGTERM still emits the partial matrix.
    # (name, rough wall-clock cost estimate in s — round-4 measurements
    # above). A row whose estimate exceeds the remaining per-row timeout is
    # skipped up front instead of launched into a guaranteed timeout that
    # burns the budget of the rows after it (ADVICE r4).
    # round-5 re-measured (tunnel compiles slowed ~2x vs round 4, and the
    # oriented_rcnn/redet rows moved to B=16/B=4): per-row wall includes
    # model init + train/predict compiles + transfers.
    row_costs = [
        ("retinanet_obb_r50", 900),
        ("s2anet_r50", 900),
        ("oriented_rcnn_r50", 1100),
        ("retinanet_loader_fed", 700),
        ("redet_re50", 900),
    ]
    for name, est_s in row_costs:
        remaining = budget_s - (time.perf_counter() - t_start)
        row_timeout = min(1400, remaining - 30)
        if remaining < 90 or est_s > row_timeout:
            matrix[name] = {
                "skipped": f"est ~{est_s}s exceeds remaining budget "
                           f"({remaining:.0f}s left)"
            }
            continue
        t_row = time.perf_counter()
        matrix[name] = _run_row(name, timeout_s=row_timeout)
        if isinstance(matrix[name], dict):
            matrix[name]["wall_s"] = round(time.perf_counter() - t_row, 1)
    matrix["platform"] = platform
    matrix["budget_s"] = budget_s
    _emit(matrix)


if __name__ == "__main__":
    from flax import nnx  # noqa: F401  (import order: flax before first jit)

    main()

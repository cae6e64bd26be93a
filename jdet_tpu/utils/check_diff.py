"""Numerical-parity debugging helpers.

Capability mirror of the reference debug tooling
(`python/jdet/utils/check_diff.py:6-45`): compare model weights /
gradients / activations against pickled dumps from another framework run
(e.g. a torch or Jittor reference), reporting max absolute differences
per parameter path.
"""
from __future__ import annotations

import pickle

import numpy as np
from flax import nnx


def dump_state(model, path):
    from ..runner.checkpoint import state_to_numpy

    with open(path, "wb") as f:
        pickle.dump(state_to_numpy(nnx.state(model)), f)
    return path


def check_diff(model, ref_path, atol=1e-5, top=20):
    """Compare model parameters with a pickled {path: array} dump."""
    from ..runner.checkpoint import state_to_numpy

    with open(ref_path, "rb") as f:
        ref = pickle.load(f)
    cur = state_to_numpy(nnx.state(model))
    rows = []
    for k, v in cur.items():
        if k not in ref:
            rows.append((k, None, "missing in reference"))
            continue
        r = np.asarray(ref[k])
        if r.shape != v.shape:
            rows.append((k, None, f"shape {v.shape} vs {r.shape}"))
            continue
        rows.append((k, float(np.abs(v - r).max()), ""))
    rows.sort(key=lambda x: -(x[1] or np.inf))
    bad = [(k, d, note) for k, d, note in rows if note or (d or 0) > atol]
    for k, d, note in rows[:top]:
        print(f"{k}: max|diff|={d} {note}")
    return bad


def compare_data(a, b, atol=1e-5, prefix=""):
    """Recursive array/dict/list comparison with max-diff printout
    (check_diff.py:45)."""
    import jax

    if isinstance(a, dict):
        return {k: compare_data(a[k], b[k], atol, f"{prefix}.{k}") for k in a}
    if isinstance(a, (list, tuple)):
        return [
            compare_data(x, y, atol, f"{prefix}[{i}]")
            for i, (x, y) in enumerate(zip(a, b))
        ]
    d = float(np.abs(np.asarray(a) - np.asarray(b)).max())
    if d > atol:
        print(f"{prefix}: max|diff| = {d}")
    return d

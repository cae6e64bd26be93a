"""Checkpoint save/load: {meta, model, optimizer} with the reference's
payload shape (`python/jdet/runner/runner.py:224-261`): meta carries
{version, epoch, iter, max_epoch, max_iter, save_time, config}; `load`
also accepts raw model-state checkpoints (model_only).

States are nnx flat-states converted to numpy and pickled; this keeps
checkpoints framework-local and dependency-free. For async multi-host
writes, `save_checkpoint_orbax` uses orbax when available (SURVEY §5:
"optional orbax async ckpt").
"""
from __future__ import annotations

import os
import pickle
import time

import numpy as np
from flax import nnx


def state_to_numpy(state):
    return {
        "/".join(map(str, path)): np.asarray(leaf.value if hasattr(leaf, "value") else leaf)
        for path, leaf in nnx.to_flat_state(state)
    }


def numpy_to_state(model_or_state, flat_numpy, strict=True):
    """Write numpy dict into an existing nnx state (by path string)."""
    state = (
        nnx.state(model_or_state)
        if isinstance(model_or_state, nnx.Module)
        else model_or_state
    )
    flat = nnx.to_flat_state(state)
    missing = []
    out = []
    for path, leaf in flat:
        key = "/".join(map(str, path))
        has_val = hasattr(leaf, "value")  # Variable leaf vs plain array
        cur = leaf.value if has_val else leaf
        if key in flat_numpy:
            arr = np.asarray(flat_numpy[key]).reshape(np.shape(cur))
            if has_val:
                leaf.value = arr
                out.append((path, leaf))
            else:
                out.append((path, arr))
        else:
            missing.append(key)
            out.append((path, leaf))
    if strict and missing:
        raise KeyError(f"missing {len(missing)} keys, e.g. {missing[:5]}")
    return nnx.from_flat_state(out)


def save_checkpoint(path, model, optimizer=None, meta=None, ema=None):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {
        "meta": {
            "jdet_tpu_version": "0.1.0",
            "save_time": time.strftime("%Y-%m-%d %H:%M:%S"),
            **(meta or {}),
        },
        "model": state_to_numpy(nnx.state(model)),
    }
    if optimizer is not None:
        payload["optimizer"] = state_to_numpy(nnx.state(optimizer))
    if ema is not None:
        # EMA shadow weights + update counter: eval metrics are reported
        # on the EMA model, so resume must restore it (reference ModelEMA
        # state travels in the yolo checkpoint, networks/yolo.py)
        import jax

        payload["ema"] = {
            "state": jax.tree.map(lambda x: np.asarray(x), ema.ema),
            "updates": int(ema.updates),
            "decay": float(ema.decay),
        }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=4)
    os.replace(tmp, path)
    return path


def _is_reference_payload(payload):
    """Reference (jittor JDet) checkpoints carry torch-style names
    (`.running_mean`, `conv.weight`) and a `jdet_version` meta
    (reference runner.py:224-261); ours write `jdet_tpu_version` and
    nnx paths (`.kernel`, `.scale`)."""
    meta = payload.get("meta", {})
    if "jdet_tpu_version" in meta:
        return False
    if "jdet_version" in meta:
        return True
    sd = payload.get("model", {})
    return any(
        k.endswith((".running_mean", ".running_var")) for k in sd
    )


def load_checkpoint(path, model, optimizer=None, model_only=False):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if "model" not in payload:  # raw state_dict checkpoint
        key = "state_dict" if "state_dict" in payload else None
        payload = {"model": payload[key] if key else payload, "meta": {}}
    if _is_reference_payload(payload):
        from ..models.pretrained import import_jdet_checkpoint

        import_jdet_checkpoint(model, payload)
        return dict(payload.get("meta", {}))
    nnx.update(model, numpy_to_state(model, payload["model"], strict=False))
    if optimizer is not None and not model_only and "optimizer" in payload:
        nnx.update(
            optimizer,
            numpy_to_state(nnx.state(optimizer), payload["optimizer"], strict=False),
        )
    meta = dict(payload.get("meta", {}))
    if not model_only and "ema" in payload:
        meta["_ema_payload"] = payload["ema"]
    return meta


def save_checkpoint_orbax(path, model, optimizer=None, meta=None):
    """Async checkpoint via orbax (multi-host safe); falls back to the
    pickle writer when orbax is unavailable."""
    try:
        import orbax.checkpoint as ocp
    except Exception:
        return save_checkpoint(path, model, optimizer, meta)
    payload = {"model": state_to_numpy(nnx.state(model))}
    if optimizer is not None:
        payload["optimizer"] = state_to_numpy(nnx.state(optimizer))
    if meta:
        payload["meta"] = {k: v for k, v in meta.items()
                           if isinstance(v, (int, float, str))}
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), payload, force=True)
    ckptr.wait_until_finished()
    return path

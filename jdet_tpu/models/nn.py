"""Layer factories with a global compute dtype (mixed precision).

TPU mixed-precision policy: parameters stay float32; layer computation
(conv/linear/norm) runs in the configured compute dtype (bfloat16 by
default for benchmarks/training entry points), with MXU accumulation in
float32 via preferred_element_type inside flax. Loss/geometry paths cast
back to float32 at the head boundaries.

Call `set_compute_dtype(jnp.bfloat16)` BEFORE building a model.
"""
from __future__ import annotations

import contextlib

from flax import nnx

_COMPUTE_DTYPE = None  # None -> flax default promotion (float32)


def set_compute_dtype(dtype):
    """Set the global compute dtype; returns the previous value.

    The return value lets callers restore the prior policy
    (`prev = set_compute_dtype(bf16); ...; set_compute_dtype(prev)`);
    use `compute_dtype_scope` for the exception-safe form.
    """
    global _COMPUTE_DTYPE
    prev = _COMPUTE_DTYPE
    _COMPUTE_DTYPE = dtype
    return prev


def compute_dtype():
    return _COMPUTE_DTYPE


@contextlib.contextmanager
def compute_dtype_scope(dtype):
    """Temporarily set the compute dtype; restores the prior value on exit.

    Model layers bind the dtype at construction time, so the scope only
    needs to cover model building — an already-built model keeps its
    policy after the scope exits.
    """
    prev = set_compute_dtype(dtype)
    try:
        yield
    finally:
        set_compute_dtype(prev)


def Conv(*args, **kw):
    kw.setdefault("dtype", _COMPUTE_DTYPE)
    return nnx.Conv(*args, **kw)


def Linear(*args, **kw):
    kw.setdefault("dtype", _COMPUTE_DTYPE)
    return nnx.Linear(*args, **kw)


def BatchNorm(*args, **kw):
    kw.setdefault("dtype", _COMPUTE_DTYPE)
    return nnx.BatchNorm(*args, **kw)


def GroupNorm(*args, **kw):
    kw.setdefault("dtype", _COMPUTE_DTYPE)
    return nnx.GroupNorm(*args, **kw)


def LayerNorm(*args, **kw):
    kw.setdefault("dtype", _COMPUTE_DTYPE)
    return nnx.LayerNorm(*args, **kw)

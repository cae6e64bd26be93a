"""Model EMA — functional mirror of the reference ModelEMA
(`python/jdet/models/networks/yolo.py:21-56`): exponential moving average
of every float leaf of the model state (params and BN stats), with the
warmup-ramped decay d = decay * (1 - exp(-updates / 2000)).

The reference wraps the model object; here the EMA is a pytree of the
nnx model State updated by one jitted tree-map per step, and swapped in
with nnx.update for evaluation.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _is_float(x):
    return hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)


class ModelEMA:
    def __init__(self, state, decay=0.9999, updates=0):
        self.ema = jax.tree.map(
            lambda x: jnp.array(x) if _is_float(x) else x, state
        )
        self.decay = decay
        self.updates = updates

        @jax.jit
        def _upd(ema, cur, d):
            return jax.tree.map(
                lambda e, c: e * d + (1.0 - d) * c if _is_float(e) else c,
                ema, cur,
            )

        self._upd = _upd

    def ramped_decay(self):
        return self.decay * (1 - math.exp(-self.updates / 2000))

    def update(self, state):
        """Blend the current model state into the EMA (yolo.py:40-51)."""
        self.updates += 1
        self.ema = self._upd(self.ema, state, self.ramped_decay())
        return self.ema

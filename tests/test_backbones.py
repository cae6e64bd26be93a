"""LSKNet / StripNet / Res2Net backbone smoke (tiny shapes)."""
import numpy as np
import jax.numpy as jnp
import pytest
from flax import nnx

from jdet_tpu.models.backbones import LSKNet, StripNet, Res2Net


@pytest.mark.parametrize("ctor,kw,dims", [
    (LSKNet, dict(arch="t"), (32, 64, 160, 256)),
    (StripNet, dict(arch="s"), (64, 128, 320, 512)),
    (Res2Net, dict(depth=50), (256, 512, 1024, 2048)),
])
def test_backbone_shapes(ctor, kw, dims):
    bb = ctor(rngs=nnx.Rngs(0), **kw)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32))
    outs = bb(x)
    assert len(outs) == 4
    for o, d, s in zip(outs, dims, (4, 8, 16, 32)):
        assert o.shape == (1, 64 // s, 64 // s, d)
        assert np.isfinite(np.asarray(o)).all()

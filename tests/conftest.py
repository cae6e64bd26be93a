import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (the driver separately dry-runs the
# multichip path). XLA_FLAGS must be set before the CPU client initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize registers the axon TPU plugin and forces
# jax_platforms to it; override at the config level (env vars are ignored
# once the plugin hook has run). JDET_TPU_TESTS=1 keeps the real chip so
# the @pytest.mark.tpu hardware-parity tests can run:
#   JDET_TPU_TESTS=1 python -m pytest tests -m tpu
if not os.environ.get("JDET_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402

# Hot-loop tier: `pytest -m quick` runs the ops oracles plus one e2e in
# <10 min so regressions are caught early; the full matrix (golden
# trajectories, overfit-to-mAP, all families) stays in the default run.
_QUICK_MODULES = {
    "test_box_iou_rotated",
    "test_box_convert",
    "test_nms_rotated",
    "test_convex",
    "test_dcn_orn",
    "test_assign_sample",
    "test_losses",
    "test_transforms",
    "test_converters",
    "test_devkits",
    "test_retinanet_e2e",
}
_SLOW_MODULES = {"test_golden_loss", "test_overfit_map"}


@pytest.fixture(autouse=True)
def _isolate_compute_dtype():
    """Snapshot/restore the process-global mixed-precision policy.

    Any test that builds a model under `set_compute_dtype(bf16)` (e.g. the
    dryrun entry test) must not leak the policy into later-imported tests —
    bit-exactness asserts elsewhere assume the float32 default.
    """
    from jdet_tpu.models import nn as _nn

    prev = _nn.compute_dtype()
    yield
    _nn.set_compute_dtype(prev)


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _QUICK_MODULES and item.get_closest_marker(
                "notquick") is None:
            item.add_marker(pytest.mark.quick)
        if mod in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)

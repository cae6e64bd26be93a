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
# once the plugin hook has run).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import os

# Tests run on CPU with a virtual 8-device mesh so multi-chip sharding paths
# compile and execute without TPU hardware. NOTE: the axon TPU plugin force-
# registers itself and rewrites jax_platforms, so an env var alone is not
# enough -- we must update the config after import.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

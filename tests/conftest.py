import os

# Tests run on CPU with a virtual 8-device mesh so multi-chip sharding paths
# compile and execute without TPU hardware. NOTE: the axon TPU plugin force-
# registers itself and rewrites jax_platforms, so an env var alone is not
# enough -- we must update the config after import.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# An EXPLICIT `JAX_PLATFORMS=''` (set-but-empty, i.e. "auto") opts out of
# the CPU forcing -- that is how the TPU-hardware tests run on a real
# chip (tests/test_pallas_tpu.py docstring); unset or "cpu" forces CPU.
_EXPLICIT_AUTO = os.environ.get("JAX_PLATFORMS") == ""
if not _EXPLICIT_AUTO:
    os.environ["JAX_PLATFORMS"] = "cpu"
# Disable the persistent compile cache for CPU runs: XLA:CPU AOT
# executable (de)serialization intermittently segfaults (observed in both
# compilation_cache.get_executable_and_time and put_executable_and_time),
# and CPU compiles are cheap locally anyway -- the cache exists for the
# TPU remote-compile relay. The env var gates
# pywfa_tpu.__init__._enable_compile_cache, which runs at package import
# (a jax.config.update here would be overridden by it). TPU runs
# (explicit JAX_PLATFORMS='') keep the cache -- relay compiles cost
# minutes cold.
if not _EXPLICIT_AUTO:
    os.environ["PYWFA_TPU_CACHE"] = ""

# The full suite compiles hundreds of XLA:CPU executables in ONE process;
# LLVM JIT section mmaps exhaust the default vm.max_map_count (65530) near
# the end of the run, failing with "Cannot allocate memory" /
# "Unable to allocate section memory" or a segfault inside
# backend_compile_and_load. Raise the limit when permitted (root).
try:
    with open("/proc/sys/vm/max_map_count", "r+") as _fh:
        if int(_fh.read()) < 1048576:
            _fh.seek(0)
            _fh.write("1048576")
except (OSError, ValueError):
    pass

import jax  # noqa: E402

if not _EXPLICIT_AUTO:
    jax.config.update("jax_platforms", "cpu")

"""Test configuration: force an 8-device virtual CPU mesh before jax import.

Multi-chip sharding logic is exercised on virtual CPU devices
(xla_force_host_platform_device_count), the same mechanism the driver's
dryrun_multichip uses; real-TPU runs happen via bench.py / the CLI.
"""

import os

# HARD-set, not setdefault: the host shell exports JAX_PLATFORMS=axon, and
# in-process CLI runs (utils/cli.py) sync the ENV value back into the jax
# config — a setdefault would leave 'axon' in place and the first
# jax.process_index() would try to initialize the tunneled TPU backend
# inside the CPU-only test suite (hangs when the tunnel is half-up).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# The axon sitecustomize registers the TPU backend programmatically, which
# beats the env var — force CPU via config (env vars above are belt+braces).
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: repeated test runs skip XLA recompiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_blanczos")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)

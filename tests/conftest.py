"""Test harness: force CPU with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (SURVEY.md §4 test strategy).

The image's sitecustomize pre-imports jax with JAX_PLATFORMS=axon (a remote
TPU relay); we override the platform via jax.config before any computation so
tests are deterministic fp32 CPU and never block on the tunnel.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# persistent compile cache, keyed by host CPU features: the container can
# land on different physical hosts across sessions, and XLA:CPU AOT
# artifacts from a host with different vector extensions SIGABRT on load
import hashlib


def _cpu_key() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "generic"


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", f"/tmp/jax_cache_{_cpu_key()}")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

# sitecustomize may have imported jax already (env var then has no effect);
# the config flag wins as long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

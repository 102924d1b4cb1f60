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
    flags += " --xla_force_host_platform_device_count=8"
if "xla_cpu_max_isa" not in flags:
    # the container migrates across hosts mid-session; on some hosts the
    # XLA:CPU AVX-512 codegen aborts compiling large programs ("Fatal
    # Python error: Aborted" in backend_compile) — AVX2 is stable everywhere
    flags += " --xla_cpu_max_isa=AVX2"
os.environ["XLA_FLAGS"] = flags.strip()
# NOTE: no persistent compilation cache here.  Two failure modes were
# observed with one: (a) the container migrates across physical hosts and
# XLA:CPU AOT artifacts built for different vector extensions SIGABRT on
# load; (b) a killed process leaves a truncated cache entry that aborts the
# reader inside extract_executable_and_time.  In-process jit caching still
# applies; the full suite costs ~25 min cold either way.

import jax  # noqa: E402

# sitecustomize may have imported jax already (env var then has no effect);
# the config flag wins as long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

"""Test configuration: force a true 8-device virtual CPU mesh.

NOTE: this environment's sitecustomize registers an `axon` TPU backend
in every Python process and force-sets jax_platforms="axon,cpu",
OVERRIDING the JAX_PLATFORMS env var.  Tests must run on CPU (fast
iteration + virtual 8-device sharding, SURVEY.md §4), so we override
the config AFTER import, before any backend use — env vars alone are
not enough here.
"""
import os

# still set the env vars for any subprocesses tests may spawn
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# keep the JAX bp kernels (the TPU production path) under test: on the
# CPU backend _kernels would otherwise auto-select the native C
# replicas.  The native path is covered by tests/test_native_bp.py,
# which overrides this per-test.
os.environ.setdefault("DAMAR_BP", "jax")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng(request):
    """Per-test deterministic rng: a session-scoped generator made
    test outcomes depend on execution ORDER (different state depending
    on which tests ran before).  Seeding from the test id makes every
    test reproducible in isolation and in any selection."""
    import zlib
    seed = zlib.crc32(request.node.nodeid.encode()) & 0xFFFFFFFF
    return np.random.default_rng(seed)


@pytest.fixture(scope="session")
def small_sim():
    """A small simulated dataset shared across tests: 50 kb genome,
    ~12x coverage, 14% error."""
    from damar_tpu.utils.sim import make_genome, sample_reads
    g = make_genome(50_000, seed=7)
    return sample_reads(g, coverage=12.0, mean_len=4000, err=0.14, seed=8)

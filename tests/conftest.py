"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with 8 virtual devices so sharding/collective
paths are exercised without TPU hardware (SURVEY.md §4).  Must run
before jax is imported anywhere.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def small_sim():
    """A small simulated dataset shared across tests: 50 kb genome,
    ~12x coverage, 14% error."""
    from damar_tpu.utils.sim import make_genome, sample_reads
    g = make_genome(50_000, seed=7)
    return sample_reads(g, coverage=12.0, mean_len=4000, err=0.14, seed=8)

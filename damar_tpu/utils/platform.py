"""Platform selection helpers.

This build environment's sitecustomize force-registers an `axon` TPU
backend and sets jax_platforms="axon,cpu" in every process, overriding
the JAX_PLATFORMS env var.  Use force_cpu() BEFORE any jax backend use
to genuinely select the host CPU (e.g. for the virtual multi-device
mesh in tests/dry runs); production overlap runs should stay on the
default (TPU) platform.
"""
from __future__ import annotations

import os


def force_cpu(n_devices: int | None = None) -> None:
    """Select the CPU backend; optionally request n virtual devices.

    Must be called before the first jax backend use in the process.
    The device-count flag only takes effect if the backend is not yet
    initialized (XLA reads XLA_FLAGS at client creation).
    """
    if n_devices is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        want = f"--xla_force_host_platform_device_count={n_devices}"
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (flags + " " + want).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")


def platform_name() -> str:
    import jax
    return jax.devices()[0].platform


def on_tpu() -> bool:
    """True when the default backend is a TPU-class device (the axon
    tunnel presents as platform 'axon' with TPU device_kind)."""
    import jax
    d = jax.devices()[0]
    return "tpu" in d.platform.lower() or "tpu" in d.device_kind.lower() \
        or d.platform == "axon"

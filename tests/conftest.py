"""Test harness config: force an 8-device virtual CPU mesh.

Multi-chip hardware is unavailable in CI; sharding logic is exercised on the
jax CPU backend with 8 virtual devices (SURVEY.md §4 'Multi-chip without a
cluster'). Runs before any test imports jax-dependent modules.

Note: this machine's sitecustomize registers a TPU PJRT plugin and forces
``jax_platforms="axon,cpu"`` at interpreter start, which overrides the
JAX_PLATFORMS env var — so we must override the jax config value itself
(before any backend is initialized) to pin tests to CPU.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()

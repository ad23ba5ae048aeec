"""Test harness config: 8-device virtual CPU mesh, or the real-TPU lane.

Default lane: multi-chip hardware is unavailable in CI, so sharding logic
is exercised on the jax CPU backend with 8 virtual devices (SURVEY.md §4
'Multi-chip without a cluster') and ``tpu``-marked tests are skipped.

TPU lane: ``SEQUITR_TPU_LANE=1 pytest -m tpu`` leaves the machine's real
TPU backend in place and runs only the ``tpu``-marked tests — compiled
Pallas kernels, bf16 numerics vs CPU-f32 goldens, a real train step. This
is the lane that would catch a Mosaic lowering or bf16 regression the
interpreter-mode CPU suite cannot (VERDICT r1 weak #1).

Note: this machine's sitecustomize registers a TPU PJRT plugin and forces
``jax_platforms="axon,cpu"`` at interpreter start, which overrides the
JAX_PLATFORMS env var — so we must override the jax config value itself
(before any backend is initialized) to pin tests to CPU.

Runs before any test imports jax-dependent modules.
"""

import os

import pytest

TPU_LANE = os.environ.get("SEQUITR_TPU_LANE") == "1"

if not TPU_LANE:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not TPU_LANE:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# first TPU compiles go through a remote helper (minutes); persist them
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

if not TPU_LANE:
    assert jax.default_backend() == "cpu", jax.default_backend()


def pytest_collection_modifyitems(config, items):
    on_tpu = TPU_LANE and jax.default_backend() != "cpu"
    skip_tpu = pytest.mark.skip(
        reason="needs the real TPU backend (SEQUITR_TPU_LANE=1 pytest -m tpu)"
    )
    skip_cpu = pytest.mark.skip(reason="TPU lane runs only tpu-marked tests")
    for item in items:
        if "tpu" in item.keywords:
            if not on_tpu:
                item.add_marker(skip_tpu)
        elif on_tpu:
            # the virtual-mesh assumptions (8 CPU devices) don't hold here
            item.add_marker(skip_cpu)

"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding tests follow the JAX fake-backend idiom
(``xla_force_host_platform_device_count``) so the suite runs anywhere;
the real-TPU path is exercised by bench.py / __graft_entry__.py.

This must run before the first ``import jax`` anywhere in the suite.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep matmuls deterministic-ish and fp32 on CPU for parity tests.
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The container's sitecustomize force-registers a TPU PJRT plugin at
# interpreter start and pins jax_platforms; the env var alone does not
# win, so pin the config explicitly (jax is already imported by then).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the suite's cost is dominated by
# compiling near-identical tiny fwd/bwd programs — cache them across
# tests AND across pytest invocations (same idiom as paa_tpu.runtime).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "PAA_TEST_CACHE", os.path.expanduser("~/.cache/paa_tpu_xla_tests")
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(5)

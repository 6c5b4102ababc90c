"""Test config: run JAX on CPU with 8 virtual devices.

Mirrors SURVEY.md §4's implication: sharded index / collective logic must be
testable without a TPU pod, via
``XLA_FLAGS=--xla_force_host_platform_device_count=8``.

NOTE: this sandbox preimports ``jax`` before pytest starts, so plain
``JAX_PLATFORMS=cpu`` in the environment is not enough — we must also flip
``jax.config`` before the backend is initialized (it initializes lazily on
first use, so doing it at conftest import time is safe).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import subprocess  # noqa: E402

# Build the native decoder if the toolchain is available, so its tests and
# the native ingest path are exercised rather than silently skipped.
_so = os.path.join(
    os.path.dirname(__file__), "..", "image_search_tpu", "ingest", "_native_decoder.so"
)
if not os.path.exists(_so):
    try:
        subprocess.run(
            ["make", "-C", os.path.join(os.path.dirname(__file__), "..", "native")],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except Exception:
        pass  # tests fall back to the PIL path

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(0)

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
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    # XLA:CPU's concurrency-optimized scheduler lets independent collectives
    # in one module race across the 8 virtual-device threads; under host
    # load the all-reduce rendezvous misses its 40 s deadline and ABORTS
    # the process (reproduced deterministically in the FSDP train step).
    # A sequential-order schedule marches every device thread through
    # collectives in lockstep. CPU-test-only; real-TPU collectives are
    # compiler-scheduled over ICI and never see this flag.
    + " --xla_cpu_enable_concurrency_optimized_scheduler=false"
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

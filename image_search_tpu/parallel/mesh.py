"""Device-mesh helpers — the framework's NCCL-equivalent layer.

The reference has no distribution at all (SURVEY.md §2.4: no NCCL/MPI/Gloo;
its only inter-process links are a WebSocket and HTTP). Scaling here rides
``jax.sharding.Mesh`` + XLA collectives over ICI/DCN instead:

- ``data`` axis: shards the corpus (index rows) and ingest batches,
- ``model`` axis: optional tensor parallelism for oversized towers
  (ViT-bigG), unused (size 1) for ViT-L/14 which fits on one chip.

Multi-host pods: call ``maybe_init_distributed()`` once per process before
building the mesh; single-process and forced-CPU test environments are
no-ops.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

log = logging.getLogger(__name__)

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_init_distributed() -> None:
    """Initialize jax.distributed when running under a multi-host launcher."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        log.info(
            "jax.distributed initialized: process %d/%d",
            jax.process_index(),
            jax.process_count(),
        )


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Defaults to all devices on the data axis — the right layout for this
    workload, where the scaling dimension is the corpus, not the model
    (SURVEY.md §5 "long-context" row).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        assert len(devices) % n_model == 0, (len(devices), n_model)
        n_data = len(devices) // n_model
    use = n_data * n_model
    if use > len(devices):
        raise ValueError(f"mesh {n_data}x{n_model} needs {use} devices, have {len(devices)}")
    grid = np.asarray(devices[:use]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """[N, D] array sharded row-wise over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """[B, ...] batch sharded over the data axis (data-parallel ingest)."""
    return NamedSharding(mesh, P(DATA_AXIS))

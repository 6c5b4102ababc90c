"""TPU-specific compiler tuning shared by the hot jitted programs.

``xla_tpu_scoped_vmem_limit_kib=32768`` raises XLA's scoped-VMEM budget
from the 16 MB default to 32 MB, letting it pick larger fusion tiles for
the ViT forward. Measured on the real v5e (benchmarks-grade dependent-fetch
protocol, docs/PERF_NOTES.md round-2 flag sweep):

| scoped VMEM | ViT-L/14 batch-160 embed |
|---|---|
| 16 MB (default) | 919.7 img/s |
| 24 MB | 930.0 |
| **32 MB (shipped)** | **946.7** |
| 40 MB | 945.5 |
| 64 MB | 921.2 |

The curve peaks at 32 MB: bigger budgets crowd out the double-buffering
headroom the automatic pipeliner needs. Applied per-jit (NOT process-wide):
only the embed forward is measured to benefit; index/search programs keep
default budgets.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

TUNED_SCOPED_VMEM_KIB = 32768


def embed_compiler_options() -> Optional[dict]:
    """compiler_options for the image-embed forward; None off-TPU (the flag
    is TPU-only and XLA:CPU would reject it). ISX_SCOPED_VMEM_KIB overrides
    the tuned value for flag sweeps (benchmarks/vmem_sweep.py) — one
    compiler-options experiment per process (CLAUDE.md)."""
    if jax.default_backend() != "tpu":
        return None
    kib = os.environ.get("ISX_SCOPED_VMEM_KIB") or str(TUNED_SCOPED_VMEM_KIB)
    return {"xla_tpu_scoped_vmem_limit_kib": kib}

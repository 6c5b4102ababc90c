"""TPU-specific compiler tuning shared by the hot jitted programs.

``xla_tpu_scoped_vmem_limit_kib=40960`` raises XLA's scoped-VMEM budget
from the 16 MB default to 40 MB, letting it pick larger fusion tiles for
the ViT forward. The optimum moved when the core changed: under the
round-2 core (pre dots-policy, pre CLS-last) the curve peaked at 32 MB
(946.7 img/s vs 40 MB's 945.5); under the shipped round-3 core a
3-repeat interleaved re-adjudication (benchmarks/vmem_repeat.py, real
v5e, dependent-fetch protocol) found 40 MB decisively ahead:

| scoped VMEM | median of 3 (img/s) | spread |
|---|---|---|
| 24 MB | 961.3 | 960.9-962.6 |
| 32 MB | 961.7 | 961.5-961.8 |
| **40 MB (shipped)** | **968.5** | 968.3-969.2 |

(+0.7% over 32 MB, reproduced x3 with non-overlapping ranges —
benchmarks/vmem_repeat.json.) The batch knee stays at 160: at 40 MB,
batch 168 drops to 960.3 and 176 collapses to 872.3 (VMEM spill).
Applied per-jit (NOT process-wide): only the embed forward is measured
to benefit; index/search programs keep default budgets.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

TUNED_SCOPED_VMEM_KIB = 40960


def embed_compiler_options() -> Optional[dict]:
    """compiler_options for the image-embed forward; None off-TPU (the flag
    is TPU-only and XLA:CPU would reject it). ISX_SCOPED_VMEM_KIB overrides
    the tuned value for flag sweeps (benchmarks/vmem_sweep.py) — one
    compiler-options experiment per process (CLAUDE.md)."""
    if jax.default_backend() != "tpu":
        return None
    kib = os.environ.get("ISX_SCOPED_VMEM_KIB") or str(TUNED_SCOPED_VMEM_KIB)
    return {"xla_tpu_scoped_vmem_limit_kib": kib}

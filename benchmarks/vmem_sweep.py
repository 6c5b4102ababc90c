#!/usr/bin/env python
"""Re-sweep the embed-forward tuning knobs under the ROUND-3 default core.

The 32 MB scoped-VMEM flag was tuned in round 2 against the old
single-softmax attention kernel (utils/tpu.py table). The shipped core has
since changed twice — grouped double-buffered attention (ISX_ATTN_PIPE=4)
and the CLS-only last layer (ISX_CLS_LAST=1) — so the flag curve and the
pipe-group choice may have moved. This driver re-measures the e2e embed
throughput (bench.py protocol: batch 160, dependent-fetch bursts) for:

  - scoped VMEM in {24, 32, 40, 48} MB at pipe4 (shipped group)
  - pipe group in {2, 8} at the winning VMEM value

ONE subprocess per configuration, strictly sequential (a compiler_options
change forces a fresh compile; CLAUDE.md: one compiler-options experiment
per process). Each subprocess prints a single JSON line; the driver
appends to benchmarks/vmem_sweep.json incrementally so a mid-run tunnel
wedge loses nothing.

Run (lone TPU client): python benchmarks/vmem_sweep.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "benchmarks", "vmem_sweep.json")

CHILD_SRC = r"""
import json, sys, time
sys.path.insert(0, %(root)r)
import bench
dev = bench._init_device(timeout_s=420)
ips = bench.bench_embed(batch_size=160, iters=20, warmup=3)
print(json.dumps({"img_per_s": round(ips, 1)}), flush=True)
"""


def run_cfg(name: str, env_extra: dict) -> None:
    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    if name in results:
        print(f"[sweep] {name}: cached {results[name]}", flush=True)
        return
    env = dict(os.environ, **env_extra)
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-c", CHILD_SRC % {"root": ROOT}],
        cwd=ROOT, env=env, text=True, capture_output=True,
    )
    line = (r.stdout.strip().splitlines() or ["{}"])[-1]
    try:
        val = json.loads(line).get("img_per_s")
    except json.JSONDecodeError:
        val = None
    results[name] = val if r.returncode == 0 else f"rc={r.returncode}"
    with open(OUT + ".tmp", "w") as f:
        json.dump(results, f, indent=1)
    os.replace(OUT + ".tmp", OUT)
    print(
        f"[sweep] {name}: {results[name]} ({time.time() - t0:.0f}s)"
        + ("" if r.returncode == 0 else f"\n{r.stderr[-800:]}"),
        flush=True,
    )


def main() -> None:
    for mb in (24, 32, 40, 48):
        run_cfg(f"vmem{mb}_pipe4", {"ISX_SCOPED_VMEM_KIB": str(mb * 1024)})
    with open(OUT) as f:
        results = json.load(f)
    numeric = {k: v for k, v in results.items() if isinstance(v, (int, float))}
    if not numeric:
        print(json.dumps(results))
        sys.exit(1)
    best = max(numeric, key=numeric.get)
    best_kib = str(int(best.split("_")[0][4:]) * 1024)
    for grp in (2, 8):
        run_cfg(f"{best.split('_')[0]}_pipe{grp}",
                {"ISX_SCOPED_VMEM_KIB": best_kib, "ISX_ATTN_PIPE": str(grp)})
    with open(OUT) as f:
        print(json.dumps(json.load(f)))


if __name__ == "__main__":
    main()

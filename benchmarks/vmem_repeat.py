#!/usr/bin/env python
"""Adjudicate the dangling round-3 vmem sweep with REPEATS (verdict #5).

`benchmarks/vmem_sweep.json` (single runs, round-3 TPU queue) showed 40 MB
scoped VMEM at 967.6 img/s vs the shipped 32 MB's 960.6 — a possible free
+0.7%, but the sweep's own spread (48 MB: 952.8) is ±1.5%, so one run
decides nothing. This driver measures 3 runs each of {24, 32, 40} MB at
the shipped pipe4 core, INTERLEAVED (r0: 24,32,40; r1: 24,32,40; ...) so
slow thermal/tunnel drift hits every config equally, then probes the
batch knee {168, 176} (verdict #5's second half: the 160 knee was found
under the pre-CLS-last core) at the median-best VMEM value.

One subprocess per measurement (compiler_options forces a fresh compile;
CLAUDE.md: one compiler-options experiment per process), strictly
sequential, incremental JSON so a tunnel wedge loses nothing.

Run (lone TPU client): python benchmarks/vmem_repeat.py
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "benchmarks", "vmem_repeat.json")

CHILD_SRC = r"""
import json, sys
sys.path.insert(0, %(root)r)
import bench
dev = bench._init_device(timeout_s=420)
ips = bench.bench_embed(batch_size=%(batch)d, iters=20, warmup=3)
print(json.dumps({"img_per_s": round(ips, 1)}), flush=True)
"""


def _load() -> dict:
    if os.path.exists(OUT):
        with open(OUT) as f:
            return json.load(f)
    return {}


def run_cfg(name: str, env_extra: dict, batch: int = 160) -> None:
    results = _load()
    if name in results:
        print(f"[repeat] {name}: cached {results[name]}", flush=True)
        return
    env = dict(os.environ, **env_extra)
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-c", CHILD_SRC % {"root": ROOT, "batch": batch}],
        cwd=ROOT, env=env, text=True, capture_output=True,
    )
    line = (r.stdout.strip().splitlines() or ["{}"])[-1]
    try:
        val = json.loads(line).get("img_per_s")
    except json.JSONDecodeError:
        val = None
    results = _load()
    results[name] = val if r.returncode == 0 else f"rc={r.returncode}"
    with open(OUT + ".tmp", "w") as f:
        json.dump(results, f, indent=1)
    os.replace(OUT + ".tmp", OUT)
    print(
        f"[repeat] {name}: {results[name]} ({time.time() - t0:.0f}s)"
        + ("" if r.returncode == 0 else f"\n{r.stderr[-800:]}"),
        flush=True,
    )


def main() -> None:
    mbs = (24, 32, 40)
    for rep in range(3):
        for mb in mbs:
            run_cfg(f"vmem{mb}_r{rep}", {"ISX_SCOPED_VMEM_KIB": str(mb * 1024)})
    results = _load()
    medians = {}
    for mb in mbs:
        vals = [results[f"vmem{mb}_r{r}"] for r in range(3)
                if isinstance(results.get(f"vmem{mb}_r{r}"), (int, float))]
        if vals:
            medians[mb] = statistics.median(vals)
    print(f"[repeat] medians: {medians}", flush=True)
    if not medians:
        print(json.dumps(results))
        sys.exit(1)
    best_mb = max(medians, key=medians.get)
    for batch in (168, 176):
        run_cfg(f"knee_b{batch}_vmem{best_mb}",
                {"ISX_SCOPED_VMEM_KIB": str(best_mb * 1024)}, batch=batch)
    results = _load()
    results["_medians"] = {str(k): v for k, v in medians.items()}
    results["_best_mb"] = best_mb
    with open(OUT + ".tmp", "w") as f:
        json.dump(results, f, indent=1)
    os.replace(OUT + ".tmp", OUT)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

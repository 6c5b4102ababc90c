#!/usr/bin/env python
"""Retry-until-healthy runner for the round-3 TPU measurement queue.

The axon tunnel wedges for hours at a time (CLAUDE.md "Environment
gotchas"); a wedged backend-init attempt hangs ~30 min before erroring
UNAVAILABLE. This runner loops a BOUNDED health probe and, the moment the
tunnel answers, runs the pending measurement queue serialized in ONE
process at a time with a fresh probe between items:

Queue (edit QUEUE below as measurements land; the state file remembers
completed items, so delete benchmarks/tpu_queue_state.json when enqueueing
a fresh battery):

  1. benchmarks/vmem_sweep.py            (scoped-VMEM + pipe-group re-sweep, new core)
  2. benchmarks/train_step_bench.py b3   (batch knee under the dots remat policy)

Safety protocol (docs/PERF_NOTES.md "platform pathologies"):
  - the health probe does jax.devices() in a daemon thread and abandons it
    on timeout — NO compile is in flight, so abandoning is wedge-safe;
  - the tiny-matmul confirmation only runs after devices() answered, and is
    never killed;
  - queue items are never killed from outside (no `timeout`): each writes
    incremental JSON so a mid-run wedge loses nothing.

Run (background, lone TPU client):  python benchmarks/run_tpu_queue.py
State: benchmarks/tpu_queue_state.json ("done": true when the queue ran).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATE = os.path.join(ROOT, "benchmarks", "tpu_queue_state.json")
PROBE_BOUND_S = 360  # healthy first contact after idle measured up to ~5 min
RETRY_SLEEP_S = 600

QUEUE = [
    # round-5 battery (round-4 verdict #1, #2, #3, #7)
    ("latency_decomp", ["benchmarks/latency_decomp.py"], None, None),
    ("load_fused_10m", ["benchmarks/load_fused_10m.py"], None, None),
    ("dup_flat_10m", ["benchmarks/dup_flat_10m.py"], None, None),
]

PROBE_SRC = r"""
import sys, threading
out = {}
def init():
    try:
        import jax
        out["dev"] = str(jax.devices()[0])
    except Exception as e:
        out["err"] = repr(e)
t = threading.Thread(target=init, daemon=True)
t.start(); t.join(%d)
if "dev" not in out:
    print("PROBE_FAIL", out.get("err", "init hung %ds"), flush=True)
    sys.exit(3)
# backend answered: the tiny matmul may compile for a few seconds — run it
# to completion (never abandon a live compile)
import jax, jax.numpy as jnp
x = jnp.ones((128, 128), jnp.bfloat16)
print("PROBE_OK", out["dev"], float((x @ x).sum()), flush=True)
"""


def log(msg: str) -> None:
    print(f"[queue {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def save(state: dict) -> None:
    tmp = STATE + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1)
    os.replace(tmp, STATE)


def probe() -> bool:
    src = PROBE_SRC % (PROBE_BOUND_S, PROBE_BOUND_S)
    try:
        r = subprocess.run(
            [sys.executable, "-c", src], cwd=ROOT, text=True,
            capture_output=True, timeout=PROBE_BOUND_S + 240,
        )
    except subprocess.TimeoutExpired:
        log("probe process overran its own bound (killed at init — wedge-safe)")
        return False
    tail = (r.stdout.strip().splitlines() or ["<no output>"])[-1]
    log(f"probe rc={r.returncode}: {tail}")
    return r.returncode == 0 and "PROBE_OK" in r.stdout


def run_item(
    name: str, argv: list[str], stdout_to: str | None,
    env_extra: dict | None = None,
) -> int:
    log(f"running {name}: {' '.join(argv)}")
    t0 = time.time()
    out = open(stdout_to, "w") if stdout_to else None
    try:
        r = subprocess.run(
            [sys.executable, *argv], cwd=ROOT,
            stdout=out or None, text=True,
            env=dict(os.environ, **env_extra) if env_extra else None,
        )
    finally:
        if out:
            out.close()
    log(f"{name} exited rc={r.returncode} after {time.time() - t0:.0f}s")
    return r.returncode


def main() -> None:
    state = {"started": time.strftime("%Y-%m-%d %H:%M:%S"), "attempts": 0,
             "items": {}, "done": False}
    save(state)
    while not state["done"]:
        state["attempts"] += 1
        save(state)
        if not probe():
            log(f"tunnel down; retrying in {RETRY_SLEEP_S}s "
                f"(attempt {state['attempts']})")
            time.sleep(RETRY_SLEEP_S)
            continue
        for name, argv, stdout_to, env_extra in QUEUE:
            prev = state["items"].get(name, {})
            if prev.get("rc") == 0 or prev.get("fails", 0) >= 2:
                continue  # succeeded earlier, or a real (non-tunnel) failure
            if name != QUEUE[0][0] and not probe():
                log(f"tunnel lost before {name}; back to retry loop")
                break
            t0 = time.time()
            rc = run_item(name, argv, stdout_to, env_extra)
            state["items"][name] = {
                "rc": rc,
                "seconds": round(time.time() - t0),
                "fails": prev.get("fails", 0) + (rc != 0),
            }
            save(state)
        state["done"] = len(state["items"]) == len(QUEUE) and all(
            v.get("rc") == 0 or v.get("fails", 0) >= 2
            for v in state["items"].values()
        )
        save(state)
    log(f"queue complete: {state['items']}")


if __name__ == "__main__":
    main()

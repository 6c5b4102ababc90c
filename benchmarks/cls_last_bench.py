"""A/B the CLS-only final vision layer + batch re-sweep (real TPU).

The attention campaign closed with the core issue-bound at its MXU-only
floor (attn_pipeline_bench.json: nosm 42.8 TFLOP/s) — no softmax trick
reaches 1,000 img/s. The remaining exact-FLOP lever is structural: CLIP
pools ONLY the CLS token after the last layer, so the final block's MLP,
Q projection, and attention rows 1.. are dead work (~3.5% of the forward,
models/clip.py::_block_cls). This measures:

  1. full e2e bench_embed at B=160 with ISX_CLS_LAST=0 (control, the
     938.6 img/s configuration) vs =1 (candidate);
  2. a batch re-sweep {160, 176, 192} with the winner — the 160 knee was
     measured on round-2 kernels and may shift.

Same protocol as bench.py (async dispatch bursts + one dependent scalar
fetch). Incremental JSON after every measurement so a mid-run tunnel
wedge loses nothing. ONE process, serialized (CLAUDE.md).

Run: python benchmarks/cls_last_bench.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SMOKE = os.environ.get("ISX_SMOKE") == "1"  # CPU correctness pass, no timing
OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "cls_last_bench.smoke.json" if SMOKE else "cls_last_bench.json",
)

results: dict = {}


def save() -> None:
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(results, f, indent=1)
    os.replace(tmp, OUT)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    if SMOKE:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import bench

    bench._init_device()

    # smoke = wiring check only (env gate reaches the jitted forward, the
    # harness runs end-to-end); numerics are covered by
    # tests/test_model_parity.py::test_cls_only_last_layer_matches_full_scan
    iters = 1 if SMOKE else 20
    warmup = 0 if SMOKE else 3
    b = 2 if SMOKE else 160  # knee re-confirmed at 160 (176: 859, 192: 871)

    # First battery (2026-08-18): naive CLS block gained only +0.3%
    # (938.4 -> 941.5) — the removed ~5 ms of FLOPs were eaten by B*H tiny
    # attention matvecs and the blocks[:-1] stack copy. v2 decomposes:
    #   cls0       : full 24-layer scan (control)
    #   cls1_slice : TPU-shaped CLS block, head layers via sliced scan
    #   cls1_cond  : same + skip-last cond scan (no stack copy) — candidate
    configs = [
        ("cls0", {"ISX_CLS_LAST": "0"}),
        ("cls1_slice", {"ISX_CLS_LAST": "1", "ISX_CLS_COND": "0"}),
        ("cls1_cond", {"ISX_CLS_LAST": "1", "ISX_CLS_COND": "1"}),
    ]
    for name, env in configs:
        os.environ.update(env)
        ips = bench.bench_embed(batch_size=b, iters=iters, warmup=warmup)
        results[f"{name}_b{b}_img_s"] = round(ips, 1)
        save()
        log(f"{name} B={b}: {ips:.1f} img/s")
    save()
    print(json.dumps(results))


if __name__ == "__main__":
    main()

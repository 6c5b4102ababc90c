#!/usr/bin/env python
"""FLOP-accounted train-step MFU (round-3 verdict #8, host-only math).

Reads the measured step times (benchmarks/train_step_bench.json +
train_step_bench_b3.json, real-chip dependent-fetch protocol) and prints
the MFU against the v5e bf16 peak (197 TFLOP/s, the same constant
bench.py's embed MFU uses), with the FLOP model written out explicitly:

  per transformer layer, seq S, width D (matmul terms only):
    qkvo projections   8*S*D^2
    attention core     4*S^2*D      (QK^T + PV)
    MLP (D<->4D)      16*S*D^2
  forward  = sum over both towers (+ patch embed + projections)
  backward = 2x forward matmuls (dgrad + wgrad)
  remat    = under dots_with_no_batch_dims_saveable only non-dot work is
             recomputed (LN/GELU/softmax — no matmul FLOPs), EXCEPT the
             attention core: the Pallas forward is opaque to the policy
             and ops/attention.py::fused_attention_bwd recomputes
             logits+softmax in VMEM by design, so the backward pays the
             attention-core forward once more: +4*S^2*D per layer.
  contrastive head: 2*B*proj^2 (two projections) + 2*B^2*proj (logit
             matrix), x3 for fwd+bwd, amortized per pair.

FLOPs this model deliberately EXCLUDES (stated so the MFU is honest):
elementwise/LN/softmax work, the optimizer update (O(params), ~0.5
GFLOP/step), and padding waste inside kernels — MFU here is "useful
model matmul FLOPs / wall-clock / peak", the standard accounting.

Writes benchmarks/train_mfu.json. Pure host arithmetic — safe to run
anywhere: python benchmarks/train_mfu.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from image_search_tpu.config import clip_vit_l14

PEAK_TFLOPS = 197.0  # v5e bf16 (bench.py:10)
IMG_SEQ = (224 // 14) ** 2 + 1  # 257
TXT_SEQ = 77


def tower_fwd_flops(d: int, layers: int, s: int, mlp: int) -> tuple[float, float]:
    """(matmul fwd FLOPs, attention-core fwd FLOPs) for one sample."""
    qkvo = 8 * s * d * d
    attn = 4 * s * s * d
    mlp_f = 4 * s * d * mlp
    return layers * (qkvo + attn + mlp_f), layers * attn


def step_flops_per_pair(batch: int) -> dict:
    cfg = clip_vit_l14()
    v, t = cfg.vision, cfg.text
    v_fwd, v_attn = tower_fwd_flops(v.hidden_size, v.num_layers, IMG_SEQ, v.mlp_size)
    t_fwd, t_attn = tower_fwd_flops(t.hidden_size, t.num_layers, TXT_SEQ, t.mlp_size)
    patch = 2 * IMG_SEQ * v.hidden_size * 3 * v.patch_size**2
    proj = 2 * (v.hidden_size + t.hidden_size) * cfg.projection_dim
    head = 3 * (proj + 2 * batch * cfg.projection_dim)  # logits row per pair
    fwd = v_fwd + t_fwd + patch
    return {
        "fwd": fwd,
        "bwd": 2 * fwd,
        "attn_recompute": v_attn + t_attn,
        "head": head,
        "total": 3 * fwd + (v_attn + t_attn) + head,
    }


def main() -> None:
    bdir = os.path.dirname(os.path.abspath(__file__))
    measured = {}
    for fn, keys in (
        ("train_step_bench.json", {"fused_dots": 64}),
        ("train_step_bench_b3.json", {"dots_b80": 80, "dots_b96": 96,
                                      "dotsall_b64": 64}),
    ):
        path = os.path.join(bdir, fn)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            data = json.load(f)
        for key, batch in keys.items():
            ms = data.get(f"{key}_ms_per_step")
            if isinstance(ms, (int, float)):
                measured[key] = (batch, ms)

    out = {"peak_tflops": PEAK_TFLOPS}
    for key, (batch, ms) in measured.items():
        fl = step_flops_per_pair(batch)
        pairs_s = batch / (ms / 1e3)
        tflops = pairs_s * fl["total"] / 1e12
        out[key] = {
            "batch": batch,
            "ms_per_step": ms,
            "pairs_per_s": round(pairs_s, 1),
            "tflop_per_pair": round(fl["total"] / 1e12, 4),
            "achieved_tflops": round(tflops, 1),
            "mfu_pct": round(100 * tflops / PEAK_TFLOPS, 1),
        }
        print(f"{key:14s} batch {batch:3d}  {ms:6.1f} ms/step  "
              f"{pairs_s:6.1f} pairs/s  {fl['total'] / 1e12:.3f} TF/pair  "
              f"{tflops:6.1f} TF/s  MFU {100 * tflops / PEAK_TFLOPS:.1f}%")
    fl = step_flops_per_pair(64)
    out["flop_breakdown_b64"] = {k: round(v / 1e9, 2) for k, v in fl.items()}
    print("FLOP/pair breakdown (GF, b64): "
          + json.dumps(out["flop_breakdown_b64"]))
    with open(os.path.join(bdir, "train_mfu.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

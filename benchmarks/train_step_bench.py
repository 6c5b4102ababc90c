"""Fine-tune step A/B: fused Pallas attention backward vs the XLA oracle.

Round-2 measured the ViT-L/14 contrastive step at 395.7 ms @ batch 64
(bf16 + remat, dependent-fetch protocol). Its attention backward ran the
XLA oracle under jax.vjp — the [B, H, S, S] logits/probabilities and the
softmax-VJP temporaries round-trip HBM twice per layer (recompute + grad
math). ops/attention.py::fused_attention_bwd keeps all of it in VMEM
(ISX_ATTN_FUSED_BWD, default on). This measures ms/step for both routes
on the real chip, same protocol as the 395.7 baseline:

  oracle : ISX_ATTN_FUSED_BWD=0  (the round-2 configuration)
  fused  : ISX_ATTN_FUSED_BWD=1  (candidate default)

Incremental JSON; ONE process, serialized (CLAUDE.md).

Run: python benchmarks/train_step_bench.py
CPU smoke: ISX_CPU_SMOKE=1 python benchmarks/train_step_bench.py
  (tiny dims, wiring only — on CPU the model uses the XLA attention path,
   so the smoke proves the harness, not the kernel; kernel-grad parity
   lives in tests/test_attention.py.)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SMOKE = bool(os.environ.get("ISX_CPU_SMOKE"))
BATTERY = int(os.environ.get("ISX_TRAIN_BATTERY", "2") or 2)
OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "train_step_bench.smoke.json" if SMOKE
    else "train_step_bench.json" if BATTERY <= 2
    else f"train_step_bench_b{BATTERY}.json",
)

results: dict = {}


def save():
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def measure(
    gate: str, batch: int, steps: int, remat: bool = True, policy: str = ""
) -> float:
    """Fresh jitted step per config (env is read at trace time)."""
    os.environ["ISX_ATTN_FUSED_BWD"] = gate
    os.environ["ISX_REMAT_POLICY"] = policy
    import jax
    import jax.numpy as jnp
    import optax

    from image_search_tpu import config as cfglib
    from image_search_tpu.models import init_params
    from image_search_tpu.train.contrastive import make_train_step

    cfg = cfglib.tiny_test_config() if SMOKE else cfglib.clip_vit_l14()
    params = init_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    optimizer = optax.adamw(1e-5, weight_decay=0.01)
    init_fn, step_fn = make_train_step(
        cfg, optimizer, mesh=None, compute_dtype=jnp.bfloat16, remat=remat
    )
    state = init_fn(params)

    rng = np.random.default_rng(0)
    S, V = cfg.text.context_length, cfg.text.vocab_size
    ids = rng.integers(1, V - 2, size=(batch, S)).astype(np.int32)
    ids[:, -1] = cfg.text.eos_token_id
    px = rng.normal(size=(batch, cfg.vision.image_size, cfg.vision.image_size, 3))
    idsd = jax.device_put(ids)
    pxd = jax.device_put(px.astype(np.float32))

    def run(n):
        nonlocal state
        t0 = time.perf_counter()
        metrics = None
        for _ in range(n):
            state, metrics = step_fn(state, idsd, pxd)
        float(metrics["loss"])  # dependent fetch = true sync
        return (time.perf_counter() - t0) / n

    run(2)  # compile + warm
    ms = min(run(steps) for _ in range(3)) * 1e3
    del state
    return ms


def main():
    if SMOKE:
        import jax

        jax.config.update("jax_platforms", "cpu")
        batch, steps = 4, 2
    else:
        import jax
        import jax.numpy as jnp

        assert jax.default_backend() == "tpu"
        probe = jnp.ones((8, 8), jnp.bfloat16)
        float((probe @ probe)[0, 0])
        batch, steps = 64, 5

    # battery 1 (measured 2026-08-18): fused vs oracle backward — NEUTRAL
    # (374.6 vs 374.9 ms/step @64; the fused kernel keeps its HBM savings).
    # battery 2: remat-policy ladder — full remat recomputes the WHOLE
    # forward in the backward pass (~1/3 of step FLOPs); a save-the-matmuls
    # policy or no remat at a smaller batch may buy that back. Configs that
    # exceed HBM record "oom" instead of wedging (clean RESOURCE_EXHAUSTED).
    configs = [
        ("oracle", dict(gate="0", batch=batch, remat=True)),
        ("fused", dict(gate="1", batch=batch, remat=True)),
        ("fused_dots", dict(
            gate="1", batch=batch, remat=True,
            policy="dots_with_no_batch_dims_saveable")),
        ("fused_noremat_b32", dict(gate="1", batch=batch // 2, remat=False)),
        ("fused_noremat", dict(gate="1", batch=batch, remat=False)),
    ]
    # battery 3: the dots policy moved the memory/recompute frontier —
    # round 2's "saturated at B=64" was measured under FULL remat, so the
    # batch knee must be re-found under the new default policy; also probe
    # the heavier dots_saveable (saves batched dots too, incl. attention
    # logits — less recompute, more memory, may OOM).
    if BATTERY == 3:
        dots = "dots_with_no_batch_dims_saveable"
        configs = [
            ("dots_b96", dict(gate="1", batch=96, remat=True, policy=dots)),
            ("dots_b128", dict(gate="1", batch=128, remat=True, policy=dots)),
            ("dots_b80", dict(gate="1", batch=80, remat=True, policy=dots)),
            ("dotsall_b64", dict(
                gate="1", batch=batch, remat=True, policy="dots_saveable")),
        ]
        if SMOKE:
            configs = [(n, dict(c, batch=4)) for n, c in configs]
    for name, cf in configs:
        b = cf.pop("batch")
        try:
            ms = measure(cf.pop("gate"), b, steps, **cf)
        except Exception as err:  # XLA RESOURCE_EXHAUSTED etc.
            results[f"{name}_error"] = type(err).__name__
            save()
            log(f"{name}: failed ({type(err).__name__}) — continuing")
            continue
        results[f"{name}_ms_per_step"] = round(ms, 1)
        results[f"{name}_pairs_per_s"] = round(b / ms * 1e3, 1)
        save()
        log(f"{name}: {ms:.1f} ms/step @ batch {b}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()

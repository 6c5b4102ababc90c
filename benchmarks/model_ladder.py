"""Model-family embed-throughput ladder on the real chip.

Every preset in ``config.PRESETS`` (reference supports only ViT-L/14,
`/root/reference/clip/build.rs:10-11`; BASELINE config #5 asks for the
SigLIP / OpenCLIP swap-ins) measured through the SAME uint8 -> fused
preprocess -> bf16 tower -> normalized embedding path as bench.py, with
the bench.py dispatch-burst + dependent-fetch protocol (CLAUDE.md:
block_until_ready acks at dispatch on the tunneled backend).

Per model a small batch sweep finds the knee; the analytic matmul-FLOP
model turns img/s into MFU so families are comparable (the FLOP model
counts the full naive forward — the CLS-last exact-FLOP cut means
effective MFU is slightly flattered for CLIP-arch models, same
convention as bench.py's 162 GF/img).

Run (real TPU, serialized — nothing else on the tunnel):
    python benchmarks/model_ladder.py [--models l14,h14] [--iters 10]
Writes benchmarks/model_ladder.json.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# (preset name, batch sweep) — batches chosen so activations fit 16 GB HBM
# alongside params; L/14's 160 knee is re-used as the anchor.
LADDER = {
    "b32": ("clip-vit-base-patch32", (512, 768)),
    "b16": ("clip-vit-base-patch16", (256, 384)),
    "l14": ("clip-vit-large-patch14", (160,)),  # bench.py headline config
    "h14": ("openclip-vit-H-14", (64, 96, 128)),
    "bigg": ("openclip-vit-bigG-14", (32, 48, 64)),
    "siglip": ("siglip-base-patch16-224", (256, 384)),
}

V5E_BF16_PEAK = 197e12


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def vision_flops_per_image(cfg) -> float:
    """Naive-forward matmul FLOPs of the vision tower (2*M*N*K convention)."""
    v = cfg.vision
    s = (v.image_size // v.patch_size) ** 2 + (0 if v.no_class_token else 1)
    d = v.hidden_size
    mlp = v.mlp_size_override or 4 * d
    per_layer = 4 * 2 * s * d * d + 2 * 2 * s * s * d + 2 * 2 * s * d * mlp
    patch = 2 * s * 3 * v.patch_size**2 * d
    proj = 2 * d * cfg.projection_dim
    return float(v.num_layers * per_layer + patch + proj)


def measure_model(preset: str, batches, iters: int, short: str = "") -> dict:
    import jax
    import jax.numpy as jnp
    from functools import partial

    from image_search_tpu.config import PRESETS
    from image_search_tpu.models import get_model_module
    from image_search_tpu.ops.preprocess import fused_preprocess, pack_batch
    from image_search_tpu.utils.tpu import embed_compiler_options

    cfg = PRESETS[preset]()
    mod = get_model_module(cfg)
    params = mod.init_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)

    @partial(jax.jit, compiler_options=embed_compiler_options())
    def embed(params, u8, A_h, A_w):
        # mode="hf" for every family: stats don't change timing and the
        # ladder compares identical pipelines (SigLIP's 0.5/0.5 stats are a
        # serving-correctness concern, not a throughput one).
        pixels = fused_preprocess(u8, A_h, A_w, mode="hf", out_dtype=jnp.bfloat16)
        return mod.encode_image(
            params, cfg, pixels, compute_dtype=jnp.bfloat16, normalize=True
        )

    flops = vision_flops_per_image(cfg)
    rng = np.random.default_rng(0)
    rows = []
    for bsz in batches:
        images = [
            rng.integers(0, 256, size=(256, 256, 3), dtype=np.uint8)
            for _ in range(bsz)
        ]
        u8, A_h, A_w = pack_batch(images, size=cfg.vision.image_size, mode="hf")
        u8d, ahd, awd = jnp.asarray(u8), jnp.asarray(A_h), jnp.asarray(A_w)

        def sync(out):
            return float(jnp.sum(out[-1]))

        try:
            t0 = time.perf_counter()
            sync(embed(params, u8d, ahd, awd))
            compile_s = time.perf_counter() - t0
            for _ in range(2):
                sync(embed(params, u8d, ahd, awd))

            def timed_burst(n):
                t0 = time.perf_counter()
                out = None
                for _ in range(n):
                    out = embed(params, u8d, ahd, awd)
                sync(out)
                return time.perf_counter() - t0

            timed_burst(2)
            dt = min(timed_burst(iters) / iters for _ in range(4))
        except Exception as err:  # OOM at the top of a sweep is information
            log(f"  {preset} b={bsz}: FAILED {type(err).__name__}: {str(err)[:200]}")
            rows.append({"batch": bsz, "error": type(err).__name__})
            gc.collect()
            continue
        ips = bsz / dt
        mfu = ips * flops / V5E_BF16_PEAK
        log(
            f"  {preset} b={bsz}: {dt * 1e3:.2f} ms -> {ips:.1f} img/s "
            f"({ips * flops / 1e12:.1f} TF/s, {mfu * 100:.1f}% MFU, "
            f"compile {compile_s:.0f}s)"
        )
        rows.append(
            {
                "batch": bsz,
                "ms": round(dt * 1e3, 2),
                "img_per_s": round(ips, 1),
                "tflops": round(ips * flops / 1e12, 1),
                "mfu_pct": round(mfu * 100, 1),
            }
        )
    best = max((r for r in rows if "img_per_s" in r), key=lambda r: r["img_per_s"], default=None)
    del params
    gc.collect()
    return {
        "preset": short or preset,
        "model": cfg.name,
        "gflops_per_image": round(flops / 1e9, 1),
        "rows": rows,
        "best": best,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default=",".join(LADDER))
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "model_ladder.json"))
    args = ap.parse_args()

    import jax

    dev = jax.devices()[0]
    log(f"device: {dev}")
    probe = jax.numpy.ones((8, 8), jax.numpy.bfloat16)
    float((probe @ probe)[0, 0])

    results = []
    for key in args.models.split(","):
        name, batches = LADDER[key]
        log(f"== {name} ==")
        results.append(measure_model(name, batches, args.iters, short=key))

    out = {"device": str(dev), "results": results}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {args.out}")
    for r in results:
        b = r["best"]
        if b:
            log(
                f"{r['model']}: {b['img_per_s']} img/s @ b{b['batch']} "
                f"({b['mfu_pct']}% MFU, {r['gflops_per_image']} GF/img)"
            )


if __name__ == "__main__":
    main()

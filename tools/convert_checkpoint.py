#!/usr/bin/env python
"""Checkpoint build tool — the counterpart of the reference's build-time
model pipeline (``clip/build.rs``: HF ONNX download -> opset upgrade ->
burn codegen -> vision_model.mpk). Here the whole pipeline is: read an HF
model (directory or hub id), convert BOTH towers, write one safetensors
checkpoint with the config embedded.

    python tools/convert_checkpoint.py openai/clip-vit-large-patch14 \
        --out models/clip.safetensors [--tokenizer-out models/tokenizer]

Works offline when given a local HF directory.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("model", help="HF hub id or local directory")
    ap.add_argument("--out", required=True, help="output .safetensors path")
    ap.add_argument("--preset", default=None,
                    help="config preset (default: inferred from the model name)")
    ap.add_argument("--tokenizer-out", default=None,
                    help="also export vocab.json/merges.txt here")
    args = ap.parse_args()

    # Conversion is host-side (numpy/torch): never touch the TPU. The
    # sandbox preimports jax so JAX_PLATFORMS=cpu in the env is ignored
    # (CLAUDE.md) — force the platform via config before any jax op.
    import jax

    jax.config.update("jax_platforms", "cpu")

    from image_search_tpu.models.convert import convert_hf_model

    print(f"loading {args.model} ...")
    cfg = convert_hf_model(
        args.model, args.out, preset=args.preset, tokenizer_out=args.tokenizer_out
    )
    size_mb = os.path.getsize(args.out) / 1e6
    print(f"wrote {args.out} ({size_mb:.0f} MB, {cfg.name}, both towers + config)")
    if args.tokenizer_out:
        print(f"wrote tokenizer files to {args.tokenizer_out}")


if __name__ == "__main__":
    main()

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

    from image_search_tpu.config import get_config
    from image_search_tpu.models import save_checkpoint
    from image_search_tpu.models import params_from_hf_state_dict
    from image_search_tpu.models.siglip import (
        params_from_hf_state_dict as siglip_convert,
    )

    name = (args.preset or args.model).split("/")[-1]
    cfg = get_config(name)

    if cfg.arch == "siglip":
        from transformers import SiglipModel as Model
        convert = siglip_convert
    else:
        from transformers import CLIPModel as Model
        convert = params_from_hf_state_dict

    print(f"loading {args.model} ({cfg.name}, arch={cfg.arch}) ...")
    model = Model.from_pretrained(args.model)
    params = convert(model.state_dict(), cfg)
    save_checkpoint(args.out, params, cfg)
    size_mb = os.path.getsize(args.out) / 1e6
    print(f"wrote {args.out} ({size_mb:.0f} MB, both towers + config)")

    if args.tokenizer_out:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(args.model, use_fast=False)
        os.makedirs(args.tokenizer_out, exist_ok=True)
        tok.save_vocabulary(args.tokenizer_out)
        print(f"wrote tokenizer files to {args.tokenizer_out}")


if __name__ == "__main__":
    main()

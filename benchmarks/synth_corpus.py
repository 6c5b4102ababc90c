"""Shared 10M-scale synthetic serving fixture for the TPU benchmarks.

Builds the device-generated int8 corpus (rank-`rank`-dominant spectrum —
the covariance shape of real image embeddings, same generator family as
twostage_10m.py) directly into VectorIndex slabs (no disk, no tunnel
upload), trains a real BPE tokenizer, and wires a real SearchEngine
around a real ClipEmbedder. Used by latency_decomp.py (per-stage p50)
and load_fused_10m.py (concurrent throughput) so the two harnesses
measure the SAME engine.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "a dog on a beach at sunset",
    "red vintage car in the rain",
    "snow covered mountain cabin",
    "children playing football",
    "close-up of a bee on a flower",
]


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_engine(rows, k, sketch_dtype, rank=64, noise=0.02,
                 twostage_max_batch=4):
    """Returns (engine, embedder, tokenizer, params, cfg, index)."""
    import jax
    import jax.numpy as jnp

    from image_search_tpu.config import clip_vit_l14
    from image_search_tpu.index import VectorIndex
    from image_search_tpu.index.index import _write_block
    from image_search_tpu.models import init_params
    from image_search_tpu.models.embedder import ClipEmbedder
    from image_search_tpu.parallel.sharded_search import quantize_rows_int8
    from image_search_tpu.server.args import ServerArgs
    from image_search_tpu.server.engine import SearchEngine
    from image_search_tpu.tokenizer import CLIPBPETokenizer, train_bpe

    # real BPE tokenizer (trained on a synthetic corpus: realistic merge
    # depth) — the production tokenize cost, not the hash stub
    tok_dir = "/tmp/isx_decomp_tok"
    cfg = clip_vit_l14()
    if not os.path.exists(os.path.join(tok_dir, "vocab.json")):
        tok = train_bpe(QUERIES * 200, vocab_size=2048)
        tok.save(tok_dir)
    tokenizer = CLIPBPETokenizer.from_dir(tok_dir, cfg.text.context_length)
    cfg = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, eos_token_id=tokenizer.eos_id)
    )
    params = init_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    embedder = ClipEmbedder(params, cfg, tokenizer=tokenizer)
    d = cfg.projection_dim

    # ---- corpus: device-generated, injected straight into the slabs ----
    n = rows
    log(f"[build] {n/1e6:.2f}M-row int8 index (device-side generation)")
    index = VectorIndex(d, quantize="int8", capacity=n)
    mix = jax.device_put(
        jnp.asarray(np.random.default_rng(7).normal(size=(rank, d)), jnp.float32)
    )

    def make_gen(slab_rows):
        # one generator per distinct slab size (the tail slab is smaller)
        @jax.jit
        def gen(key, live):
            kz, kn = jax.random.split(key)
            e = (
                jax.random.normal(kz, (slab_rows, rank), jnp.float32) @ mix
                + noise * jax.random.normal(kn, (slab_rows, d), jnp.float32)
            )
            e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
            q, s = quantize_rows_int8(e)
            # rows past the corpus size keep the freshly-allocated-slab
            # invariant (zeros): searches/sketches mask by size
            keep = jax.lax.broadcasted_iota(jnp.int32, (slab_rows,), 0) < live
            return (
                jnp.where(keep[:, None], q, 0),
                jnp.where(keep, s, 0.0),
                jnp.where(keep, 1.0, 0.0),  # norms: synthetic rows are unit
            )

        return gen

    t0 = time.monotonic()
    gens = {}
    done = 0
    si = 0
    while done < n:
        slab_rows = index._emb_slabs[si].shape[0]
        gen = gens.setdefault(slab_rows, make_gen(slab_rows))
        live = min(slab_rows, n - done)
        q, s, nrm = gen(jax.random.key(si), jnp.asarray(live, jnp.int32))
        z = jnp.asarray(0, jnp.int32)
        index._emb_slabs[si] = _write_block(index._emb_slabs[si], q, z)
        index._scale_slabs[si] = _write_block(index._scale_slabs[si], s, z)
        index._norm_slabs[si] = _write_block(index._norm_slabs[si], nrm, z)
        done += live
        si += 1
    import jax.numpy as _jnp  # noqa: F401  (dependent fetch below)

    float(index._emb_slabs[si - 1][0, 0])  # generation complete
    index._paths = [f"/pictures/img_{i:08d}.jpg" for i in range(n)]
    # _row left empty on purpose: these harnesses use no feedback and the
    # 10M path->row dict costs ~2 GB host RAM they never read
    index._size = n
    log(f"[build] {n/1e6:.2f}M rows in {time.monotonic()-t0:.0f}s")

    t0 = time.monotonic()
    index.build_sketch(dtype=sketch_dtype, est_k=k)
    assert index.sketch_fresh, "certifiability gate refused the sketch?!"
    log(f"[build] {sketch_dtype} sketch in {time.monotonic()-t0:.0f}s")

    # a real engine around the prebuilt index
    eng_args = ServerArgs(
        model_weights="/nonexistent.safetensors",
        model="clip-tiny-test",
        media_dir="/pictures",
        index_dir="/tmp/isx_decomp_idx_unused",
        k=k,
        search_twostage=True,
        sketch_dtype=sketch_dtype,
        twostage_max_batch=twostage_max_batch,
    )
    engine = SearchEngine(eng_args)
    engine.embedder = embedder
    engine.cfg = cfg
    engine.index = index
    engine.mesh = None
    engine._wire_cache = {}
    engine._frag_cache = {}
    engine._text_cache = {}
    return engine, embedder, tokenizer, params, cfg, index

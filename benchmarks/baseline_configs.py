"""BASELINE.json benchmark configs, one runnable function each.

  1. text embed + cosine top-20 over 1k pre-embedded images
  2. ViT-L/14 image embedding, batch 32 @ 224px, FULL preprocess
     (host JPEG decode -> uint8 -> device resize/normalize -> tower)
  3. multi-round relevance-feedback search over a 100k corpus
  4. 10M-vector index: int8 rows on one chip (the sharded multi-chip
     variant is validated on the virtual CPU mesh in tests/)
  5. SigLIP swap-in with int8-quantized store

Usage:
    python benchmarks/baseline_configs.py                # all configs
    python benchmarks/baseline_configs.py --configs 1,3  # subset
    python benchmarks/baseline_configs.py --small        # CPU-friendly sizes

Prints one JSON line per config. ``bench.py`` at the repo root remains the
single-line headline benchmark for the driver.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def emit(config: int, name: str, **fields):
    print(json.dumps({"config": config, "name": name, **fields}), flush=True)


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(jnp.asarray(x[-1] if hasattr(x, "__getitem__") else x)))


def _median_time(fn, iters=10, reps=3):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        _sync(r)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def config1_text_topk(small: bool):
    """Text embed + top-20 over 1k vectors (the reference's whole query path,
    which it runs on CPU + an external DB). Device timing uses dispatch
    bursts with one dependent fetch — per-call sync would measure the
    host/tunnel hop, not the chip."""
    import jax
    import jax.numpy as jnp

    from image_search_tpu.config import clip_vit_l14, tiny_test_config
    from image_search_tpu.index.index import _search_local
    from image_search_tpu.models import get_model_module, init_params
    from image_search_tpu.tokenizer import HashTokenizer

    cfg = tiny_test_config() if small else clip_vit_l14()
    dtype = jnp.float32 if small else jnp.bfloat16
    params = init_params(jax.random.key(0), cfg, dtype=dtype)
    tok = HashTokenizer(cfg.text.vocab_size, cfg.text.context_length)
    mod = get_model_module(cfg)

    emb = jax.random.normal(jax.random.key(1), (1024, cfg.projection_dim), jnp.float32)
    emb = emb / jnp.linalg.norm(emb, axis=1, keepdims=True)
    size = jnp.asarray(1000, jnp.int32)

    ids = jnp.asarray(tok(["a photo of a cat sitting on a couch"]))
    embed = jax.jit(lambda p, i: mod.encode_text(p, cfg, i, compute_dtype=dtype))

    t_embed = _median_time(lambda: embed(params, ids), iters=20)
    q = embed(params, ids).astype(jnp.float32)
    t_search = _median_time(lambda: _search_local((emb,), size, q, 20)[0], iters=20)
    emit(1, "text_embed+top20@1k",
         text_embed_device_ms=round(t_embed * 1e3, 3),
         search_device_ms=round(t_search * 1e3, 3),
         total_device_ms=round((t_embed + t_search) * 1e3, 3))


def config2_image_batch32(small: bool):
    """Batch-32 image embedding INCLUDING host JPEG decode (the reference's
    per-chunk hot path, clip.rs:94-118)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from image_search_tpu.config import clip_vit_l14, tiny_test_config
    from image_search_tpu.ingest.decode import DecodePool
    from image_search_tpu.models import init_params
    from image_search_tpu.models.embedder import ClipEmbedder
    import os
    import tempfile

    cfg = tiny_test_config() if small else clip_vit_l14()
    dtype = jnp.float32 if small else jnp.bfloat16
    params = init_params(jax.random.key(0), cfg, dtype=dtype)
    emb = ClipEmbedder(params, cfg, compute_dtype=dtype)

    d = tempfile.mkdtemp()
    rng = np.random.default_rng(0)
    paths = []
    for i in range(32):
        arr = rng.integers(0, 256, size=(480, 640, 3), dtype=np.uint8)
        p = os.path.join(d, f"{i}.jpg")
        Image.fromarray(arr).save(p, quality=90)
        paths.append(p)
    import jax.numpy as jnp2

    from image_search_tpu.ops.preprocess import pack_batch

    pool = DecodePool(workers=16)

    # host stage: decode (true wall time; thread pool)
    t_dec = _median_time(lambda: pool.decode_batch(paths)[1][0], iters=3)
    _, images = pool.decode_batch(paths)
    pool.close()

    # device stage: uint8 -> fused preprocess -> tower, dispatch burst
    u8, A_h, A_w = pack_batch(images, size=cfg.vision.image_size, mode="hf")
    u8d, ahd, awd = jnp2.asarray(u8), jnp2.asarray(A_h), jnp2.asarray(A_w)
    t_dev = _median_time(lambda: emb._embed_u8(emb.params, u8d, ahd, awd), iters=5)
    # pipelined rate: decode overlaps device compute in the real scan loop
    t_pipe = max(t_dec, t_dev)
    emit(2, "image_embed_batch32_full_preprocess",
         decode_host_ms=round(t_dec * 1e3, 2),
         embed_device_ms=round(t_dev * 1e3, 2),
         pipelined_images_per_sec=round(32 / t_pipe, 1))


def config3_feedback_100k(small: bool):
    """Multi-round Rocchio feedback over a 100k corpus — each round is one
    fused device program (the reference needs 2 DB queries + host math)."""
    import jax

    from image_search_tpu.index import VectorIndex

    import jax.numpy as jnp

    from image_search_tpu.index.index import _feedback_search_local

    n = 10_000 if small else 100_000
    dim = 768
    rng = np.random.default_rng(0)
    emb = jax.random.normal(jax.random.key(0), (n, dim), jnp.float32)
    norms = jnp.linalg.norm(emb, axis=1)
    emb = emb / norms[:, None]
    size = jnp.asarray(n, jnp.int32)
    text = jnp.asarray(rng.normal(size=dim).astype(np.float32))
    sel = jnp.asarray(np.array([7, 42, 99, -1, -1, -1, -1, -1], np.int32))

    # one fused feedback round: gather + Rocchio average + matmul + top-1000
    t = _median_time(
        lambda: _feedback_search_local((emb,), (norms,), size, text[None], sel[None], 1000)[0],
        iters=10,
    )
    emit(3, f"rocchio_round@{n}",
         corpus=n, round_device_ms=round(t * 1e3, 3))


def config4_10m_int8(small: bool):
    """10M-vector int8 index on ONE chip (sharded multi-chip correctness is
    covered by tests/test_index.py + test_quantized_index.py on the virtual
    mesh)."""
    import jax
    import jax.numpy as jnp

    from image_search_tpu.index.index import _search_local
    from image_search_tpu.parallel.sharded_search import quantize_rows_int8

    n = 200_000 if small else 10_000_000
    dim, k, ch = 768, 1000, 200_000 if small else 1_000_000

    @jax.jit
    def gen_chunk(key):
        e = jax.random.normal(key, (ch, dim), jnp.float32)
        e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
        return quantize_rows_int8(e)

    # DONATED writes: this offline build has no concurrent readers, and the
    # index's non-donating _write_block would double-buffer the 7.7 GB slab
    # (15.4 GB transient = device OOM when run after configs 1-3's leftover
    # executables in the same process — observed round 2)
    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def write_donated(buf, block, offset):
        return jax.lax.dynamic_update_slice(
            buf, block, (offset,) + (0,) * (buf.ndim - 1)
        )

    buf = jnp.zeros((n, dim), jnp.int8)
    scl = jnp.zeros((n,), jnp.float32)
    for i in range(n // ch):
        qi, sc = gen_chunk(jax.random.key(i))
        buf = write_donated(buf, qi, jnp.asarray(i * ch, jnp.int32))
        scl = write_donated(scl, sc, jnp.asarray(i * ch, jnp.int32))
    buf.block_until_ready()

    q = jnp.asarray(np.random.default_rng(1).normal(size=(1, dim)).astype(np.float32))
    size = jnp.asarray(n, jnp.int32)
    t = _median_time(lambda: _search_local((buf,), size, q, k, (scl,))[0], iters=10)
    emit(4, f"int8_top{k}@{n}",
         corpus=n, query_ms=round(t * 1e3, 3),
         bytes_gb=round(n * dim / 1e9, 2))


def config5(small: bool):
    """SigLIP family swap-in + int8 store through the same engine surface."""
    import jax
    import jax.numpy as jnp

    from image_search_tpu.config import CLIPConfig, TextConfig, VisionConfig, siglip_base_patch16_224
    from image_search_tpu.models import get_model_module

    if small:
        cfg = CLIPConfig(
            name="siglip-tiny-bench",
            text=TextConfig(hidden_size=64, num_layers=2, num_heads=4, act="gelu_tanh",
                            layernorm_eps=1e-6, vocab_size=256, context_length=16, eos_token_id=1),
            vision=VisionConfig(hidden_size=64, num_layers=2, num_heads=4, act="gelu_tanh",
                                layernorm_eps=1e-6, image_size=32, patch_size=16, no_class_token=True),
            projection_dim=64, arch="siglip", logit_scale_init=0.0, logit_bias_init=-10.0,
        )
        dtype = jnp.float32
    else:
        cfg = siglip_base_patch16_224()
        dtype = jnp.bfloat16
    mod = get_model_module(cfg)
    params = mod.init_params(jax.random.key(0), cfg, dtype=dtype)

    B = 8 if small else 128
    pix = jax.random.normal(jax.random.key(1), (B, cfg.vision.image_size, cfg.vision.image_size, 3), dtype)
    f = jax.jit(lambda p, x: mod.encode_image(p, cfg, x, compute_dtype=dtype))
    t = _median_time(lambda: f(params, pix), iters=5)

    from image_search_tpu.index.index import _search_local
    from image_search_tpu.parallel.sharded_search import quantize_rows_int8

    rng = np.random.default_rng(0)
    n = 5_000 if small else 1_000_000
    dim = cfg.projection_dim
    e = jax.random.normal(jax.random.key(2), (n, dim), jnp.float32)
    e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
    rows, scales = quantize_rows_int8(e)
    del e
    q = jnp.asarray(rng.normal(size=(1, dim)).astype(np.float32))
    size = jnp.asarray(n, jnp.int32)
    tq = _median_time(
        lambda: _search_local((rows,), size, q, 100, (scales,))[0], iters=10
    )
    emit(5, f"siglip_embed+int8_top100@{n}",
         model=cfg.name, embed_images_per_sec=round(B / t, 1),
         int8_query_device_ms=round(tq * 1e3, 3))


CONFIGS = {1: config1_text_topk, 2: config2_image_batch32, 3: config3_feedback_100k,
           4: config4_10m_int8, 5: config5}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4,5")
    ap.add_argument("--small", action="store_true",
                    help="CPU-friendly sizes (CI / no TPU)")
    args = ap.parse_args()
    import jax

    log(f"device: {jax.devices()[0]}")
    import gc

    for c in [int(x) for x in args.configs.split(",")]:
        try:
            CONFIGS[c](args.small)
        except Exception as err:
            emit(c, "error", error=f"{type(err).__name__}: {err}")
        gc.collect()  # drop the previous config's device buffers promptly


if __name__ == "__main__":
    main()

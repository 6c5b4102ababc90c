"""High-level dual-tower embedding engine (the reference's two engines, fused).

Where the reference juggles an embed_anything CPU ``Embedder`` behind a mutex
(``server/src/main.rs:33-34``) plus a per-scan Burn model load
(``server/src/clip.rs:46-48``), this engine holds ONE set of device-resident
parameters serving both towers, compiled once and reused by every scan and
every query.

Throughput mechanics:
- batch sizes are bucketed to powers of two, so any corpus shape hits a
  handful of compiled programs;
- image batches enter as uint8 + resize matrices and run preprocess+model as
  a single XLA program (no intermediate host round-trip);
- with a mesh, batches shard over the data axis (data-parallel embed — the
  DP-embed component from SURVEY.md §2.4).
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from image_search_tpu.config import CLIPConfig
from image_search_tpu.ops.preprocess import fused_preprocess, pack_batch
from image_search_tpu.parallel.mesh import DATA_AXIS

log = logging.getLogger(__name__)


# Measured throughput sweet spot on v5e (docs/PERF_NOTES.md): ViT-L/14 peaks
# at batch 160 (913 img/s) vs 853 @128 and ~580 @512 — batch 160 keeps
# 160*257 = 41120 rows, a near-multiple of the MXU pipeline depth, without
# blowing VMEM double-buffering. Oversized inputs split into sub-dispatches.
MAX_DEVICE_BATCH = 160


def _bucket_batch(n: int, minimum: int = 8) -> int:
    b = minimum
    while b < n and b < 128:
        b *= 2
    if n <= b:
        return b
    return MAX_DEVICE_BATCH  # 129..160 (larger inputs were split upstream)


class ClipEmbedder:
    """Jit-compiled text/image embedding with batch bucketing and DP sharding."""

    def __init__(
        self,
        params,
        cfg: CLIPConfig,
        tokenizer=None,
        mesh: Optional[Mesh] = None,
        compute_dtype=None,
        preprocess_mode: str = "hf",
    ):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.mesh = mesh
        self.preprocess_mode = preprocess_mode
        if compute_dtype is None:
            platform = jax.devices()[0].platform
            compute_dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
        self.compute_dtype = compute_dtype
        self._n_data = mesh.shape[DATA_AXIS] if mesh is not None else 1

        if mesh is not None:
            from image_search_tpu.parallel.mesh import MODEL_AXIS

            if mesh.shape.get(MODEL_AXIS, 1) > 1:
                # tensor-parallel inference for towers that outgrow a chip
                # (ViT-bigG): shard the stacked block matmuls Megatron-style
                from image_search_tpu.train.contrastive import param_shardings

                params = jax.device_put(params, param_shardings(params, mesh))
            else:
                params = jax.device_put(params, NamedSharding(mesh, P()))
        self.params = params

        if tokenizer is not None and getattr(tokenizer, "eos_id", None) is not None:
            if tokenizer.eos_id != cfg.text.eos_token_id:
                # encode_text pools at the first cfg EOS; a mismatched
                # tokenizer would silently pool at position 0 for every text
                raise ValueError(
                    f"tokenizer eos_id {tokenizer.eos_id} != model "
                    f"eos_token_id {cfg.text.eos_token_id}"
                )

        from image_search_tpu.models import get_model_module

        self._model = get_model_module(cfg)  # clip | siglip behind one API
        from image_search_tpu.utils.tpu import embed_compiler_options

        opts = embed_compiler_options()  # +3% measured (utils/tpu.py table)
        self._encode_text = jax.jit(
            partial(self._model.encode_text, cfg=cfg, compute_dtype=self.compute_dtype)
        )
        self._encode_pixels = jax.jit(
            partial(self._model.encode_image, cfg=cfg, compute_dtype=self.compute_dtype),
            compiler_options=opts,
        )
        self._embed_u8 = jax.jit(self._embed_u8_impl, compiler_options=opts)

    # -- image path -----------------------------------------------------------

    def _embed_u8_impl(self, params, u8, A_h, A_w):
        pixels = fused_preprocess(
            u8, A_h, A_w, mode=self.preprocess_mode, out_dtype=self.compute_dtype
        )
        return self._model.encode_image(
            params, self.cfg, pixels, compute_dtype=self.compute_dtype
        )

    def _shard_batch(self, *arrays):
        if self.mesh is None:
            return tuple(jnp.asarray(a) for a in arrays)
        sh = lambda a: NamedSharding(self.mesh, P(DATA_AXIS, *([None] * (a.ndim - 1))))
        return tuple(jax.device_put(a, sh(a)) for a in arrays)

    def embed_images(self, images: Sequence[np.ndarray]) -> np.ndarray:
        """uint8 HWC arrays (any sizes) -> raw [N, projection_dim] f32.

        Raw (unnormalized) to match what the reference persists
        (clip.rs:124); the index normalizes at insert.
        """
        if len(images) == 0:
            return np.zeros((0, self.cfg.projection_dim), np.float32)
        out = self.embed_images_async(images)
        return np.asarray(out)[: len(images)]

    def embed_images_async(
        self, images: Sequence[np.ndarray], min_bucket: int = 8
    ) -> jax.Array:
        """Dispatch without blocking; returns the (padded) device array.

        The ingest pipeline uses this to overlap host decode of chunk N+1
        with device compute of chunk N (JAX's async dispatch is the
        double-buffer). Inputs larger than the per-dispatch sweet spot are
        split into sub-batches; the concatenation is also async.

        ``min_bucket=1`` serves the interactive query-by-image path: a
        lone uploaded photo must not pad to the ingest bucket floor of 8 —
        the padded rows' u8 pixels + resize matrices are 8x the
        host->device bytes, and on a tunneled backend that transfer was
        the whole latency (measured 682 ms -> the round-5 fix,
        benchmarks/latency_decomp.py search_image)."""
        max_b = max(MAX_DEVICE_BATCH, self._n_data)
        if len(images) > max_b:
            parts = [
                self._embed_one_batch(images[lo : lo + max_b])
                for lo in range(0, len(images), max_b)
            ]
            # each part is bucket-padded: keep only its real rows
            sizes = [min(max_b, len(images) - lo) for lo in range(0, len(images), max_b)]
            return jnp.concatenate([p[:s] for p, s in zip(parts, sizes)], axis=0)
        return self._embed_one_batch(images, min_bucket)

    def _embed_one_batch(
        self, images: Sequence[np.ndarray], min_bucket: int = 8
    ) -> jax.Array:
        u8, A_h, A_w = pack_batch(images, size=self.cfg.vision.image_size, mode=self.preprocess_mode)
        n = len(images)
        B = _bucket_batch(max(n, self._n_data), minimum=min_bucket)
        nd = self._n_data
        B = ((B + nd - 1) // nd) * nd  # shardable across the data axis
        if B > n:  # pad batch; padded rows are discarded by the caller
            pad = B - n
            u8 = np.concatenate([u8, np.zeros((pad,) + u8.shape[1:], u8.dtype)])
            A_h = np.concatenate([A_h, np.zeros((pad,) + A_h.shape[1:], A_h.dtype)])
            A_w = np.concatenate([A_w, np.zeros((pad,) + A_w.shape[1:], A_w.dtype)])
        u8, A_h, A_w = self._shard_batch(u8, A_h, A_w)
        return self._embed_u8(self.params, u8, A_h, A_w)

    def embed_pixels(self, pixels: np.ndarray) -> np.ndarray:
        """Pre-preprocessed [B, H, W, 3] float batch -> raw embeddings."""
        return np.asarray(self._encode_pixels(self.params, pixels=jnp.asarray(pixels)))

    # -- text path -------------------------------------------------------------

    @property
    def encode_text_fn(self):
        """The stable jitted text encoder, ``fn(params, input_ids=ids)``:
        identity-stable per embedder so it can key the fused serving
        program cache (index._fused_twostage_fn), and jit-of-jit inlines
        it into the fused program."""
        return self._encode_text

    def embed_texts_device(self, texts: Sequence[str]) -> jax.Array:
        """Strings -> raw [N, projection_dim] f32 as an UN-FETCHED device
        array: callers chaining into another device program (the index
        search) avoid a host round-trip entirely — tokenize is the only
        host work on the query path."""
        if self.tokenizer is None:
            raise ValueError("embedder constructed without a tokenizer")
        n = len(texts)
        ids = self.tokenizer(list(texts))
        B = _bucket_batch(max(n, self._n_data))
        nd = self._n_data
        B = ((B + nd - 1) // nd) * nd
        if B > n:
            pad_row = np.full((B - n, ids.shape[1]), self.tokenizer.eos_id, ids.dtype)
            ids = np.concatenate([ids, pad_row])
        (ids_dev,) = self._shard_batch(ids) if self.mesh else (jnp.asarray(ids),)
        out = self._encode_text(self.params, input_ids=ids_dev)
        return out[:n]

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        """Strings -> raw [N, projection_dim] f32 (tokenize + text tower)."""
        return np.asarray(self.embed_texts_device(texts))

    def embed_text(self, text: str) -> np.ndarray:
        """Single query string -> [projection_dim] raw vector
        (the ``clip()`` call at server/src/clip.rs:19-23)."""
        return self.embed_texts([text])[0]

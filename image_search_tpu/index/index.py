"""Device-resident exact-cosine vector index with fused Rocchio feedback.

Replaces the reference's SurrealDB MTREE index and its two query paths:

- KNN query ``SELECT ... WHERE embedding <|1000|> $reference``
  (``server/src/search.rs:70-77``) -> one jitted program: l2-normalize the
  query, one [B, D] x [D, N] matmul on the MXU, mask invalid rows,
  ``lax.top_k``. Exact (not approximate like MTREE), and milliseconds
  instead of a WebSocket round-trip.
- the Rocchio relevance-feedback step (fetch selected embeddings, average
  with the text vector at 1/2 : 1/2k weights, re-search;
  ``search.rs:43-67``) -> fused INTO the same program: gather + average +
  normalize + matmul + top_k in a single XLA compilation, the north star's
  "multi-round relevance-feedback as a single fused TPU step".

Storage layout: rows are kept l2-NORMALIZED (cosine == dot product) next to
their original norms, so the raw vectors the reference stores
(``clip.rs:124``) are recoverable exactly as ``emb * norm`` — the Rocchio
average is computed in raw space, bit-matching the reference's semantics.

Quantization (BASELINE config #5): ``quantize=`` selects the row format —
  - None       f32 rows (exact; 10M x 768 = 30 GB, needs sharding)
  - "bfloat16" 2x smaller, MXU-native; cosine error ~1e-3
  - "int8"     4x smaller with per-row symmetric scales; the score matmul
               runs int8 x int8 -> int32 on the MXU (XLA's f32-exact fast
               path, valid because K=768 <= 2^24/127^2) and is rescaled in
               f32 (10M x 768 = 7.7 GB -> fits ONE chip). The win is 4x
               less HBM traffic, not compute rate (docs/PERF_NOTES.md
               round-2 int8 study).

Capacity is bucketed (powers of two) and rows are appended on-device with
donated ``dynamic_update_slice`` blocks, so ingest never recompiles per
batch and never reuploads the corpus.

Multi-chip: pass a ``Mesh`` and rows shard across the data axis;
queries run through ``parallel.sharded_search.sharded_topk`` (per-shard
top-k + allgather merge over ICI).
"""

from __future__ import annotations

import logging
import threading
from functools import lru_cache, partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from image_search_tpu.index.store import EmbeddingStore
from image_search_tpu.parallel.mesh import DATA_AXIS
from image_search_tpu.parallel.sharded_search import shard_scores, sharded_topk

log = logging.getLogger(__name__)

NEG_INF = float(jnp.finfo(jnp.float32).min)
_UPDATE_BLOCK = 4096  # rows per on-device append slice

QUANT_DTYPES = {None: jnp.float32, "bfloat16": jnp.bfloat16, "int8": jnp.int8}


def _next_capacity(n: int, multiple: int) -> int:
    cap = multiple
    while cap < n:
        cap *= 2
    return cap


def _l2(x: jax.Array) -> jax.Array:
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(n, 1e-12)


# --- jitted kernels (module-level so caches are shared across instances) ---


# NB: deliberately NOT donated — concurrent searches snapshot the buffer
# references and run outside the index lock; donation would invalidate a
# snapshot mid-flight ("Array has been deleted"). The copy costs one
# _UPDATE_BLOCK row-slab per append and the old buffer frees as soon as the
# last search drops its reference.
@jax.jit
def _write_block(buf: jax.Array, block: jax.Array, offset: jax.Array) -> jax.Array:
    return jax.lax.dynamic_update_slice(buf, block, (offset,) + (0,) * (buf.ndim - 1))


@jax.jit
def _grow(new_buf: jax.Array, old_buf: jax.Array) -> jax.Array:
    return jax.lax.dynamic_update_slice(new_buf, old_buf, (0,) * old_buf.ndim)


def _dequant_rows(emb, scales, idx):
    """Gather rows back to f32 normalized space."""
    rows = emb[idx]
    if emb.dtype == jnp.int8:
        return rows.astype(jnp.float32) * scales[idx][:, None]
    return rows.astype(jnp.float32)


def _rocchio_query(emb, scales, norms, text_emb, sel_idx):
    """Reference Rocchio weighting (search.rs:60-67), in raw-vector space:
    query = average( average(selected_raw), text_raw )."""
    mask = (sel_idx >= 0).astype(jnp.float32)
    idx = jnp.maximum(sel_idx, 0)
    raw = _dequant_rows(emb, scales, idx) * norms[idx][:, None]
    raw = raw * mask[:, None]
    sel_avg = raw.sum(axis=0) / jnp.maximum(mask.sum(), 1.0)
    return (sel_avg + text_emb.astype(jnp.float32)) * 0.5


def _valid_mask(n: int, size):
    return jax.lax.broadcasted_iota(jnp.int32, (n,), 0) < size


@partial(jax.jit, static_argnames=("k", "approx"))
def _search_local(emb, size, queries, k: int, scales=None, approx: bool = False):
    q = _l2(queries.astype(jnp.float32))
    scores = shard_scores(emb, q, scales)
    scores = jnp.where(_valid_mask(emb.shape[0], size)[None, :], scores, NEG_INF)
    if approx:
        # TPU-optimized partial reduction (recall >= 0.95 by construction);
        # still stronger than the reference's approximate MTREE index.
        return jax.lax.approx_max_k(scores, k, recall_target=0.95)
    return jax.lax.top_k(scores, k)


@partial(jax.jit, static_argnames=("k", "approx"))
def _feedback_search_local(
    emb, norms, size, text_emb, sel_idx, k: int, scales=None, approx: bool = False
):
    """Batched fused Rocchio search: text_emb [B, D], sel_idx [B, m].

    A row of all -1 selections degrades to the plain text search BITWISE
    (query = 0.5 * text; the 0.5 is a power of two, so l2-normalization
    cancels it exactly) — concurrent plain and feedback searches can
    therefore coalesce into one device program."""
    q = jax.vmap(_rocchio_query, in_axes=(None, None, None, 0, 0))(
        emb, scales, norms, text_emb, sel_idx
    )
    return _search_local(emb, size, q, k, scales, approx)


@lru_cache(maxsize=64)
def _sharded_search_fn(mesh: Mesh, k: int, approx: bool):
    @jax.jit
    def fn(emb, size, queries, scales=None):
        q = _l2(queries.astype(jnp.float32))
        return sharded_topk(
            emb, _valid_mask(emb.shape[0], size), q, k, mesh, scales, approx
        )

    return fn


@lru_cache(maxsize=64)
def _sharded_feedback_fn(mesh: Mesh, k: int, approx: bool):
    @jax.jit
    def fn(emb, norms, size, text_emb, sel_idx, scales=None):
        q = jax.vmap(_rocchio_query, in_axes=(None, None, None, 0, 0))(
            emb, scales, norms, text_emb, sel_idx
        )
        qn = _l2(q)
        return sharded_topk(
            emb, _valid_mask(emb.shape[0], size), qn, k, mesh, scales, approx
        )

    return fn


class VectorIndex:
    """Exact cosine top-k index resident in device HBM."""

    def __init__(
        self,
        dim: int,
        mesh: Optional[Mesh] = None,
        min_capacity: int = 8192,
        store: Optional[EmbeddingStore] = None,
        quantize: Optional[str] = None,
    ):
        if quantize not in QUANT_DTYPES:
            raise ValueError(f"quantize must be one of {list(QUANT_DTYPES)}")
        self.dim = dim
        self.mesh = mesh
        self.store = store
        self.quantize = quantize
        self._row_dtype = QUANT_DTYPES[quantize]
        self._n_shards = mesh.shape[DATA_AXIS] if mesh is not None else 1
        self._cap_multiple = max(min_capacity, self._n_shards * _UPDATE_BLOCK)
        self._paths: List[str] = []
        self._row: dict[str, int] = {}
        self._size = 0
        # mutation lock: guards metadata (_paths/_row/_size) and buffer
        # swaps. Queries only hold it long enough to SNAPSHOT the buffer
        # references + size, then dispatch outside it — appends build new
        # buffers (no donation) so a snapshot stays valid concurrently.
        self._lock = threading.RLock()
        cap = self._cap_multiple
        self._emb = self._device_zeros((cap, dim), self._row_dtype)
        self._norms = self._device_zeros((cap,))
        self._scales = self._device_zeros((cap,)) if quantize == "int8" else None
        if store is not None and len(store):
            for paths, emb in store.iter_shards():
                self._add_in_memory(paths, emb)
            log.info("index restored from %s: %d vectors", store.directory, self._size)

    # -- construction helpers ------------------------------------------------

    def _sharding(self, ndim: int):
        if self.mesh is None:
            return None
        return NamedSharding(self.mesh, P(DATA_AXIS, *([None] * (ndim - 1))))

    def _device_zeros(self, shape, dtype=jnp.float32):
        z = jnp.zeros(shape, dtype)
        sh = self._sharding(len(shape))
        return jax.device_put(z, sh) if sh is not None else z

    @classmethod
    def from_store(
        cls,
        store: EmbeddingStore,
        mesh: Optional[Mesh] = None,
        quantize: Optional[str] = None,
    ) -> "VectorIndex":
        return cls(store.dim, mesh=mesh, store=store, quantize=quantize)

    # -- mutation -------------------------------------------------------------

    def __len__(self) -> int:
        return self._size

    @property
    def paths(self) -> List[str]:
        return self._paths

    def _ensure_capacity(self, n: int) -> None:
        cap = self._emb.shape[0]
        if n <= cap:
            return
        new_cap = _next_capacity(n, self._cap_multiple)
        self._emb = _grow(self._device_zeros((new_cap, self.dim), self._row_dtype), self._emb)
        self._norms = _grow(self._device_zeros((new_cap,)), self._norms)
        if self._scales is not None:
            self._scales = _grow(self._device_zeros((new_cap,)), self._scales)
        log.info("index capacity grown to %d", new_cap)

    def _quantize_host(self, normalized: np.ndarray):
        if self.quantize == "int8":
            amax = np.abs(normalized).max(axis=1)
            scale = np.maximum(amax, 1e-12) / 127.0
            q = np.clip(np.round(normalized / scale[:, None]), -127, 127).astype(np.int8)
            return q, scale.astype(np.float32)
        if self.quantize == "bfloat16":
            return jnp.asarray(normalized).astype(jnp.bfloat16), None
        return normalized, None

    def _add_in_memory(self, paths: Sequence[str], embeddings: np.ndarray) -> int:
        with self._lock:
            return self._add_in_memory_locked(paths, embeddings)

    def _add_in_memory_locked(self, paths: Sequence[str], embeddings: np.ndarray) -> int:
        embeddings = np.asarray(embeddings, np.float32)
        # dedup against the index AND within the batch (first occurrence
        # wins): a repeated path would otherwise insert two live rows with
        # _row pointing only at the last one
        seen_batch: set = set()
        keep = []
        for i, p in enumerate(paths):
            if p in self._row or p in seen_batch:
                continue
            seen_batch.add(p)
            keep.append(i)
        if not keep:
            return 0
        if len(keep) < len(paths):
            paths = [paths[i] for i in keep]
            embeddings = embeddings[keep]
        n = len(paths)
        # appends write FULL _UPDATE_BLOCK slices at self._size + off, so
        # capacity must cover the last block's whole extent —
        # dynamic_update_slice CLAMPS an out-of-bounds start instead of
        # erroring, which would silently overwrite earlier rows
        blocks = (n + _UPDATE_BLOCK - 1) // _UPDATE_BLOCK
        self._ensure_capacity(self._size + blocks * _UPDATE_BLOCK)

        norms = np.linalg.norm(embeddings, axis=1)
        normalized = embeddings / np.maximum(norms, 1e-12)[:, None]
        rows, scales = self._quantize_host(normalized)
        rows = np.asarray(rows)

        off = 0
        while off < n:
            m = min(_UPDATE_BLOCK, n - off)
            blk = np.zeros((_UPDATE_BLOCK, self.dim), rows.dtype)
            blk[:m] = rows[off : off + m]
            nrm = np.zeros((_UPDATE_BLOCK,), np.float32)
            nrm[:m] = norms[off : off + m]
            pos = jnp.asarray(self._size + off, jnp.int32)
            self._emb = _write_block(self._emb, jnp.asarray(blk), pos)
            self._norms = _write_block(self._norms, jnp.asarray(nrm), pos)
            if self._scales is not None:
                scl = np.zeros((_UPDATE_BLOCK,), np.float32)
                scl[:m] = scales[off : off + m]
                self._scales = _write_block(self._scales, jnp.asarray(scl), pos)
            off += m

        for i, p in enumerate(paths):
            self._row[p] = self._size + i
        self._paths.extend(paths)
        self._size += n
        return n

    def add(self, paths: Sequence[str], embeddings: np.ndarray) -> int:
        """Insert raw (unnormalized) embeddings; dedups by path; persists to
        the attached store if any. Returns #rows actually added."""
        with self._lock:  # store shard numbering must not race either
            added = self._add_in_memory(paths, embeddings)
            if added and self.store is not None:
                self.store.append(list(paths), np.asarray(embeddings, np.float32))
            return added

    # -- queries ---------------------------------------------------------------

    def _clamp_k(self, k: int) -> int:
        # top_k needs k <= N; reference hardcodes k=1000 (search.rs:76) even
        # for small corpora because the DB clamps — we clamp likewise.
        return max(1, min(k, self._size if self._size else 1))

    def search(self, queries: np.ndarray, k: int = 1000, approx: bool = False):
        """Raw query vectors [B, D] (or [D]) -> (scores [B,k], indices [B,k]).

        approx=True swaps ``lax.top_k`` for the TPU-native
        ``lax.approx_max_k`` (recall_target 0.95) — faster at 10M-scale,
        and still better-than-MTREE fidelity."""
        q = jnp.atleast_2d(jnp.asarray(queries, jnp.float32))
        with self._lock:  # snapshot only; compute runs concurrently
            if self._size == 0:
                B = int(q.shape[0])
                return np.zeros((B, 0), np.float32), np.zeros((B, 0), np.int32)
            k = self._clamp_k(k)
            emb, scales = self._emb, self._scales
            size = jnp.asarray(self._size, jnp.int32)
        if self.mesh is None:
            s, i = _search_local(emb, size, q, k, scales, approx)
        else:
            s, i = _sharded_search_fn(self.mesh, k, approx)(emb, size, q, scales)
        return np.asarray(s), np.asarray(i)

    def search_with_feedback(
        self,
        text_embedding: np.ndarray,
        selected_paths: Sequence[str],
        k: int = 1000,
        approx: bool = False,
    ):
        """The reference's refinement search (search.rs:34-77), one fused step.

        Unknown paths are skipped (the reference's ``WHERE image_path IN``
        silently drops them too). With no known selections this degrades to a
        plain text search, matching ``if !marked_image.is_empty()``
        (search.rs:59).
        """
        with self._lock:  # snapshot only
            known = any(p in self._row for p in selected_paths)
        if not known:
            return self.search(text_embedding, k, approx)
        return self.search_with_feedback_batch(
            np.asarray(text_embedding, np.float32).reshape(1, self.dim),
            [list(selected_paths)],
            k,
            approx=approx,
        )

    def search_with_feedback_batch(
        self,
        text_embeddings: np.ndarray,
        selected_paths_list: Sequence[Sequence[str]],
        k: int = 1000,
        approx: bool = False,
    ):
        """B concurrent Rocchio searches fused into ONE device program.

        ``text_embeddings`` is [B, D] raw text vectors; ``selected_paths_list``
        holds each request's referenced absolute paths (possibly empty —
        empty/unknown selections degrade to a plain text search bitwise, see
        ``_feedback_search_local``). This is the micro-batched counterpart of
        the reference's per-request feedback flow (search.rs:34-77), which
        serializes on its DB mutex under concurrency."""
        B = len(selected_paths_list)
        text = np.asarray(text_embeddings, np.float32).reshape(B, self.dim)
        with self._lock:  # snapshot only; compute runs concurrently
            if self._size == 0:
                return np.zeros((B, 0), np.float32), np.zeros((B, 0), np.int32)
            k = self._clamp_k(k)
            rows_list = [
                [self._row[p] for p in sel if p in self._row]
                for sel in selected_paths_list
            ]
            emb, norms, scales = self._emb, self._norms, self._scales
            size = jnp.asarray(self._size, jnp.int32)
        # pad selections and batch to pow2 buckets to bound jit variants
        m = 8
        while m < max((len(r) for r in rows_list), default=0):
            m *= 2
        Bpad = 1
        while Bpad < B:
            Bpad *= 2
        sel = np.full((Bpad, m), -1, np.int32)
        for b, r in enumerate(rows_list):
            sel[b, : len(r)] = r
        text_pad = np.zeros((Bpad, self.dim), np.float32)
        text_pad[:B] = text
        text_j, sel_j = jnp.asarray(text_pad), jnp.asarray(sel)
        if self.mesh is None:
            s, i = _feedback_search_local(
                emb, norms, size, text_j, sel_j, k, scales, approx
            )
        else:
            s, i = _sharded_feedback_fn(self.mesh, k, approx)(
                emb, norms, size, text_j, sel_j, scales
            )
        return np.asarray(s)[:B], np.asarray(i)[:B]

    # -- lookups ---------------------------------------------------------------

    def paths_for(self, indices: np.ndarray) -> List[str]:
        return [self._paths[int(i)] for i in np.asarray(indices).reshape(-1)]

    def has_path(self, path: str) -> bool:
        return path in self._row

    def get_raw_embeddings(self, paths: Sequence[str]) -> np.ndarray:
        """Stored raw vectors for given paths (the search.rs:43-58 SELECT)."""
        with self._lock:  # snapshot only
            rows = [self._row[p] for p in paths if p in self._row]
            if not rows:
                return np.zeros((0, self.dim), np.float32)
            emb, norms, scales = self._emb, self._norms, self._scales
        idx = jnp.asarray(np.asarray(rows))
        raw = _dequant_rows(emb, scales, idx) * norms[idx][:, None]
        return np.asarray(raw)

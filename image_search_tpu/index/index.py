"""Device-resident exact-cosine vector index with fused Rocchio feedback.

Replaces the reference's SurrealDB MTREE index and its two query paths:

- KNN query ``SELECT ... WHERE embedding <|1000|> $reference``
  (``server/src/search.rs:70-77``) -> one jitted program: l2-normalize the
  query, one [B, D] x [D, N] matmul on the MXU per slab, mask invalid rows,
  ``lax.top_k``. Exact (not approximate like MTREE), and milliseconds
  instead of a WebSocket round-trip.
- the Rocchio relevance-feedback step (fetch selected embeddings, average
  with the text vector at 1/2 : 1/2k weights, re-search;
  ``search.rs:43-67``) -> fused INTO the same program: gather + average +
  normalize + matmul + top_k in a single XLA compilation, batched over B
  concurrent requests ([B, m] selection matrix).

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

**Slab storage (10M-scale hardening).** Rows live in a list of fixed-size
device SLABS instead of one doubling buffer. The first slab doubles up to
``slab_rows`` (small corpora stay cheap); after that, growth allocates ONE
new full slab and copies nothing — the old design's grow-by-copy held
old+new simultaneously (a ~2x transient that approaches the 16 GB HBM limit
at 10M int8 rows, and an OOM can wedge the TPU tunnel, CLAUDE.md).
``capacity=`` (the ``--index-capacity`` flag) preallocates all slabs so
ingest never allocates at all. Appends write donated-free
``dynamic_update_slice`` blocks into the tail slab, so ingest never
recompiles per batch and never reuploads the corpus.

Multi-chip: pass a ``Mesh`` and every slab shards across the data axis;
queries run through ``parallel.sharded_search.sharded_topk`` (per-shard
top-k + allgather merge over ICI).
"""

from __future__ import annotations

import logging
import os
import threading
from functools import lru_cache, partial
from typing import List, Optional, Sequence, Tuple

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
DEFAULT_SLAB_ROWS = 1 << 20  # rows per full slab (int8 x 768 = 0.77 GB)

QUANT_DTYPES = {None: jnp.float32, "bfloat16": jnp.bfloat16, "int8": jnp.int8}


def _l2(x: jax.Array) -> jax.Array:
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(n, 1e-12)


# --- jitted kernels (module-level so caches are shared across instances) ---


# NB: deliberately NOT donated — concurrent searches snapshot the slab
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


@jax.jit
def _mask_rows(pen: jax.Array, idx: jax.Array) -> jax.Array:
    """Tombstone rows: set their additive score penalty to NEG_INF.
    idx may contain repeats (pow2 padding) — set is idempotent."""
    return pen.at[idx].set(NEG_INF)


def _gather_rows(slabs, scales, idx):
    """Gather global rows [m] from the slab list -> [m, D] f32 normalized."""
    D = slabs[0].shape[1]
    out = jnp.zeros((idx.shape[0], D), jnp.float32)
    start = 0
    for i, slab in enumerate(slabs):
        n = slab.shape[0]
        off = jnp.clip(idx - start, 0, n - 1)
        rows = slab[off].astype(jnp.float32)
        if slab.dtype == jnp.int8:
            rows = rows * scales[i][off][:, None]
        in_slab = (idx >= start) & (idx < start + n)
        out = jnp.where(in_slab[:, None], rows, out)
        start += n
    return out


def _gather_1d(slabs, idx):
    """Gather a slabbed 1-D quantity (norms) at global idx [m] -> [m] f32."""
    out = jnp.zeros((idx.shape[0],), jnp.float32)
    start = 0
    for vec in slabs:
        n = vec.shape[0]
        off = jnp.clip(idx - start, 0, n - 1)
        in_slab = (idx >= start) & (idx < start + n)
        out = jnp.where(in_slab, vec[off].astype(jnp.float32), out)
        start += n
    return out


def _rocchio_query(slabs, scales, norms, text_emb, sel_idx):
    """Reference Rocchio weighting (search.rs:60-67), in raw-vector space:
    query = average( average(selected_raw), text_raw )."""
    mask = (sel_idx >= 0).astype(jnp.float32)
    idx = jnp.maximum(sel_idx, 0)
    raw = _gather_rows(slabs, scales, idx) * _gather_1d(norms, idx)[:, None]
    raw = raw * mask[:, None]
    sel_avg = raw.sum(axis=0) / jnp.maximum(mask.sum(), 1.0)
    return (sel_avg + text_emb.astype(jnp.float32)) * 0.5


# process-level kill switch for the streaming score kernel (see
# _use_stream_scores for why it is not re-read per call)
_STREAM_GATE = os.environ.get("ISX_SCORE_STREAM", "1") == "1"


def _use_stream_scores(slabs, scales) -> bool:
    """ISX_SCORE_STREAM gates the Pallas streaming int8 score kernel
    (ops/score_stream.py). Measured at 10M rows (real v5e, full fused
    search head-to-head vs the XLA dot at B=1/8/32): 13.86/21.13/48.47 ms
    vs 14.00/21.22/48.54 — never slower, ~1% at B=1. Bit-exact vs the
    XLA path (proof in the kernel module), so enabling it never changes
    results. TPU-only (interpret mode would slow CPU tests for nothing);
    a dedicated parity test runs the kernel in interpret mode.

    The gate is resolved ONCE per process (_STREAM_GATE): `_search_local`
    is jitted, so reading the env var per trace would make a mid-process
    flip apply only to not-yet-compiled shapes — a kill switch that
    half-works is worse than one that must be set before start."""
    if not _STREAM_GATE:
        return False
    if scales is None or jax.default_backend() != "tpu":
        return False
    from image_search_tpu.ops.score_stream import stream_ok

    return all(stream_ok(s) for s in slabs)


@partial(jax.jit, static_argnames=("k", "approx"))
def _search_local(slabs, size, queries, k: int, scales=None, approx: bool = False, pens=None):
    """Exact/approx cosine top-k over the slab list; global row ids are the
    concatenation order (slabs hold contiguous row ranges). ``pens`` (same
    slab layout, f32) is an additive penalty: 0 for live rows, NEG_INF for
    tombstoned ones — XLA fuses the add into the score epilogue, and the
    arg is omitted entirely (None) until the first removal so the
    no-deletions program is unchanged."""
    q = _l2(queries.astype(jnp.float32))
    parts = []
    start = 0
    if _use_stream_scores(slabs, scales):
        from image_search_tpu.ops.score_stream import stream_scores_int8
        from image_search_tpu.parallel.sharded_search import quantize_rows_int8

        qi, qs = quantize_rows_int8(q)
        for i, slab in enumerate(slabs):
            parts.append(
                stream_scores_int8(
                    slab, qi, qs, scales[i], size - start,
                    None if pens is None else pens[i],
                )
            )
            start += slab.shape[0]
    else:
        for i, slab in enumerate(slabs):
            s = shard_scores(slab, q, None if scales is None else scales[i])
            if pens is not None:
                s = s + pens[i][None, :]
            n = slab.shape[0]
            valid = (jax.lax.broadcasted_iota(jnp.int32, (n,), 0) + start) < size
            parts.append(jnp.where(valid[None, :], s, NEG_INF))
            start += n
    scores = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    if approx:
        # TPU-optimized partial reduction (recall >= 0.95 by construction);
        # still stronger than the reference's approximate MTREE index.
        return jax.lax.approx_max_k(scores, k, recall_target=0.95)
    # hierarchical exact selection: 2.1x the whole 10M query vs lax.top_k
    # (29.4 -> 14.0 ms incl. scores; ops/topk.py has the exactness proof)
    from image_search_tpu.ops.topk import exact_topk

    return exact_topk(scores, k)


@partial(jax.jit, static_argnames=("k", "approx"))
def _feedback_search_local(
    slabs, norms, size, text_emb, sel_idx, k: int, scales=None,
    approx: bool = False, pens=None,
):
    """Batched fused Rocchio search: text_emb [B, D], sel_idx [B, m].

    A row of all -1 selections degrades to the plain text search BITWISE
    (query = 0.5 * text; the 0.5 is a power of two, so l2-normalization
    cancels it exactly) — concurrent plain and feedback searches can
    therefore coalesce into one device program."""
    q = jax.vmap(_rocchio_query, in_axes=(None, None, None, 0, 0))(
        slabs, scales, norms, text_emb, sel_idx
    )
    return _search_local(slabs, size, q, k, scales, approx, pens)


@jax.jit
def _rocchio_queries(slabs, norms, text_emb, sel_idx, scales=None):
    """Batched Rocchio refined queries [B, D] (the query-construction half
    of ``_feedback_search_local``, reusable by the two-stage path). Under a
    mesh the gather is KB-scale — GSPMD's collectives for it are noise."""
    return jax.vmap(_rocchio_query, in_axes=(None, None, None, 0, 0))(
        slabs, scales, norms, text_emb, sel_idx
    )


@lru_cache(maxsize=64)
def _sharded_search_fn(mesh: Mesh, k: int, approx: bool):
    @jax.jit
    def fn(slabs, size, queries, scales=None, pens=None):
        q = _l2(queries.astype(jnp.float32))
        return sharded_topk(slabs, size, q, k, mesh, scales, approx, pens)

    return fn


@lru_cache(maxsize=32)
def _fused_twostage_fn(text_fn, k: int, m: int, share: int):
    """ONE XLA program for the whole cold-query serving path: token ids ->
    text tower -> Rocchio query build -> certified two-stage bound+rescore
    (round-3 verdict #1: kill the tower->search dispatch hop). ``text_fn``
    is the embedder's (stable, jitted) text encoder — jit-of-jit inlines
    it, so index code stays model-agnostic. Also returns the raw text
    embeddings so the engine can fill its query cache and, on certificate
    failure, run the full-scan fallback without re-running the tower."""

    @jax.jit
    def fn(params, ids, sel, slabs, norms, scales, pens, size,
           sketches, resid, basis, ub_slack):
        from image_search_tpu.index.twostage import twostage_topk_block

        text = text_fn(params, input_ids=ids)
        q = _rocchio_queries(slabs, norms, text, sel, scales)
        s, i, cert = twostage_topk_block(
            slabs, sketches, resid, basis, size, q, k, m,
            scales, pens, ub_slack, share,
        )
        # the certificate is reduced IN-program: the caller's single
        # device_get is the only host round trip on the serving path
        return s, i, jnp.all(cert), text

    return fn


@lru_cache(maxsize=64)
def _sharded_twostage_fn(mesh: Mesh, k: int, c: int, share: int = 0):
    @jax.jit
    def fn(slabs, sketches, resid, basis, size, queries, ub_slack,
           scales=None, pens=None):
        from image_search_tpu.index.twostage import sharded_twostage_topk

        return sharded_twostage_topk(
            slabs, sketches, resid, basis, size, queries, k, mesh, c,
            scales, pens, ub_slack, share,
        )

    return fn


@lru_cache(maxsize=64)
def _sharded_feedback_fn(mesh: Mesh, k: int, approx: bool):
    @jax.jit
    def fn(slabs, norms, size, text_emb, sel_idx, scales=None, pens=None):
        q = jax.vmap(_rocchio_query, in_axes=(None, None, None, 0, 0))(
            slabs, scales, norms, text_emb, sel_idx
        )
        qn = _l2(q)
        return sharded_topk(slabs, size, qn, k, mesh, scales, approx, pens)

    return fn


class VectorIndex:
    """Exact cosine top-k index resident in device HBM (slab storage)."""

    # consecutive two-stage certificate failures before the sketch is
    # dropped (flat-spectrum corpora would otherwise pay bound pass + full
    # scan on every query forever); re-armed by build_sketch
    TWOSTAGE_DISABLE_AFTER = 8

    def __init__(
        self,
        dim: int,
        mesh: Optional[Mesh] = None,
        min_capacity: int = 8192,
        store: Optional[EmbeddingStore] = None,
        quantize: Optional[str] = None,
        slab_rows: int = DEFAULT_SLAB_ROWS,
        capacity: Optional[int] = None,
    ):
        if quantize not in QUANT_DTYPES:
            raise ValueError(f"quantize must be one of {list(QUANT_DTYPES)}")
        self.dim = dim
        self.mesh = mesh
        self.store = store
        self.quantize = quantize
        self._row_dtype = QUANT_DTYPES[quantize]
        self._n_shards = mesh.shape[DATA_AXIS] if mesh is not None else 1
        # the allocation granule: a multiple of BOTH the append block (so
        # 4096-aligned blocks never straddle a slab boundary) and the shard
        # count (so every slab splits evenly over the mesh data axis)
        granule = self._n_shards * _UPDATE_BLOCK
        self._cap_multiple = (
            (max(min_capacity, granule) + granule - 1) // granule
        ) * granule
        # slabs must be whole multiples of the block/shard granule
        self._slab_rows = max(
            self._cap_multiple,
            ((slab_rows + self._cap_multiple - 1) // self._cap_multiple)
            * self._cap_multiple,
        )
        self._paths: List[str] = []
        self._row: dict[str, int] = {}
        self._size = 0
        # host mirror of the tail slab's last PARTIAL block: appends restage
        # it so every device write is one full block (blocks are globally
        # 4096-aligned and never straddle a slab boundary)
        self._tail_emb = np.zeros((0, dim), np.dtype(self._row_dtype))
        self._tail_norms = np.zeros((0,), np.float32)
        self._tail_scales = np.zeros((0,), np.float32)
        # mutation lock: guards metadata (_paths/_row/_size) and slab
        # swaps. Queries only hold it long enough to SNAPSHOT the slab
        # references + size, then dispatch outside it — appends build new
        # buffers (no donation) so a snapshot stays valid concurrently.
        self._lock = threading.RLock()
        self._emb_slabs: List[jax.Array] = []
        self._norm_slabs: List[jax.Array] = []
        self._scale_slabs: Optional[List[jax.Array]] = (
            [] if quantize == "int8" else None
        )
        # additive score penalties: 0 live, NEG_INF tombstoned (lazily
        # passed to the search kernels only once a removal happened)
        self._pen_slabs: List[jax.Array] = []
        self._removed = 0
        # paths whose rows were tombstoned IN THIS PROCESS (bounded by
        # removals, not corpus size): lets the engine distinguish "pruned
        # earlier, honor an explicit /remove even while the file is absent"
        # from "never-indexed garbage path" (see engine.remove_images)
        self._dead_paths: set = set()
        # two-stage certified-exact search state (index/twostage.py);
        # None until build_sketch(); invalidated by any append
        self._sketch = None
        self.twostage_certified = 0
        self.twostage_fallbacks = 0
        self.sketch_incremental = 0  # appends absorbed without a rebuild
        # build-time certifiability gate (build_sketch min_certifiable):
        # last estimate (None until a gated build ran) + skip count
        self.sketch_certifiable_est: Optional[float] = None
        self.twostage_gate_skips = 0
        # consecutive certificate failures; at TWOSTAGE_DISABLE_AFTER the
        # sketch is dropped until the next build (see search_twostage)
        self._twostage_consec_failures = 0
        if capacity is not None:
            self._preallocate(capacity)
        else:
            self._append_slab(self._cap_multiple)
        if store is not None and len(store):
            # dead rows (tombstoned, or superseded by a later re-append)
            # are skipped OUTRIGHT: the restored index carries no penalty
            # slabs and no dead rows' HBM, and restore stays one bulk
            # append per segment regardless of tombstone count
            live_mask, _ = store.liveness()
            base, skipped = 0, 0
            for paths, emb in store.iter_shards():
                if live_mask is None:
                    self._add_in_memory(paths, emb)
                else:
                    keep = [i for i in range(len(paths)) if live_mask[base + i]]
                    skipped += len(paths) - len(keep)
                    if keep:
                        self._add_in_memory([paths[i] for i in keep], emb[keep])
                base += len(paths)
            log.info(
                "index restored from %s: %d live vectors (%d dead rows skipped)",
                store.directory, self._size, skipped,
            )
            # the index now owns its copy of every live path — free the
            # store's startup path cache (~1 GB at 10M rows)
            store.release_path_cache()

    # -- construction helpers ------------------------------------------------

    def _sharding(self, ndim: int):
        if self.mesh is None:
            return None
        return NamedSharding(self.mesh, P(DATA_AXIS, *([None] * (ndim - 1))))

    def _device_zeros(self, shape, dtype=jnp.float32):
        z = jnp.zeros(shape, dtype)
        sh = self._sharding(len(shape))
        return jax.device_put(z, sh) if sh is not None else z

    def _append_slab(self, rows: int) -> None:
        self._emb_slabs.append(self._device_zeros((rows, self.dim), self._row_dtype))
        self._norm_slabs.append(self._device_zeros((rows,)))
        if self._scale_slabs is not None:
            self._scale_slabs.append(self._device_zeros((rows,)))
        self._pen_slabs.append(self._device_zeros((rows,)))

    def _preallocate(self, capacity: int) -> None:
        """--index-capacity: allocate all slabs upfront — ingest performs
        ZERO device allocations (OOM-at-10M / tunnel-wedge hardening)."""
        self._check_hbm_budget(max(capacity, 1))
        remaining = max(capacity, 1)
        while remaining > 0:
            rows = min(self._slab_rows, max(remaining, self._cap_multiple))
            rows = ((rows + self._cap_multiple - 1) // self._cap_multiple) * self._cap_multiple
            self._append_slab(rows)
            remaining -= rows
        log.info(
            "index preallocated: %d slabs x <=%d rows (%d total)",
            len(self._emb_slabs), self._slab_rows, self.capacity,
        )

    @classmethod
    def from_store(
        cls,
        store: EmbeddingStore,
        mesh: Optional[Mesh] = None,
        quantize: Optional[str] = None,
        **kwargs,
    ) -> "VectorIndex":
        return cls(store.dim, mesh=mesh, store=store, quantize=quantize, **kwargs)

    # -- mutation -------------------------------------------------------------

    def __len__(self) -> int:
        """Number of LIVE (searchable) rows."""
        return self._size - self._removed

    @property
    def removed_count(self) -> int:
        return self._removed

    def live_paths(self) -> List[str]:
        """Snapshot of searchable paths (tombstoned ones excluded)."""
        with self._lock:
            return list(self._row)

    @property
    def paths(self) -> List[str]:
        return self._paths

    @property
    def capacity(self) -> int:
        return sum(s.shape[0] for s in self._emb_slabs)

    def device_bytes(self) -> int:
        """Live device bytes across all slabs (memory-hardening tests)."""
        total = sum(s.size * s.dtype.itemsize for s in self._emb_slabs)
        total += sum(s.size * 4 for s in self._norm_slabs)
        if self._scale_slabs is not None:
            total += sum(s.size * 4 for s in self._scale_slabs)
        return total

    def _bytes_per_row(self) -> int:
        per = self.dim * np.dtype(self._row_dtype).itemsize + 4 + 4  # emb+norm+pen
        if self._scale_slabs is not None:
            per += 4
        return per

    def _check_hbm_budget(self, projected_rows: int) -> None:
        """Fail fast with an actionable error instead of a device OOM.

        A device OOM on a remote TPU runtime can wedge the whole process
        (CLAUDE.md tunnel discipline), so growth is bounded ahead of time:
        projected per-device slab bytes must stay under 85% of the
        device's reported HBM (models/activations live in the rest).
        Override with ISX_INDEX_HBM_BUDGET_GB (<=0 disables); devices
        that report no limit (CPU) are never blocked.
        """
        import os

        env = os.environ.get("ISX_INDEX_HBM_BUDGET_GB")
        if env is not None:
            gb = float(env)
            budget = None if gb <= 0 else int(gb * 1e9)
        else:
            try:
                stats = jax.local_devices()[0].memory_stats()
                limit = (stats or {}).get("bytes_limit")
            except Exception:
                limit = None
            budget = int(limit * 0.85) if limit else None
        if budget is None:
            return
        per_device = projected_rows * self._bytes_per_row() // self._n_shards
        if per_device > budget:
            raise RuntimeError(
                f"index growth to {projected_rows:,} rows needs "
                f"~{per_device / 1e9:.1f} GB/device, over the "
                f"{budget / 1e9:.1f} GB budget (85% of device HBM). "
                f"Use --index-quantize int8 (4x smaller rows), shard over "
                f"more chips, or raise ISX_INDEX_HBM_BUDGET_GB."
            )

    def _ensure_capacity(self, n: int) -> None:
        while self.capacity < n:
            last = self._emb_slabs[-1].shape[0]
            if last < self._slab_rows:
                # the FIRST slab doubles up to slab_rows (small corpora pay
                # small transients); the copy holds old+new, both <= 1 slab
                new_rows = min(self._slab_rows, last * 2)
                self._check_hbm_budget(self.capacity - last + new_rows + last)
                self._emb_slabs[-1] = _grow(
                    self._device_zeros((new_rows, self.dim), self._row_dtype),
                    self._emb_slabs[-1],
                )
                self._norm_slabs[-1] = _grow(
                    self._device_zeros((new_rows,)), self._norm_slabs[-1]
                )
                if self._scale_slabs is not None:
                    self._scale_slabs[-1] = _grow(
                        self._device_zeros((new_rows,)), self._scale_slabs[-1]
                    )
                self._pen_slabs[-1] = _grow(
                    self._device_zeros((new_rows,)), self._pen_slabs[-1]
                )
                log.info("index tail slab grown to %d rows", new_rows)
            else:
                # beyond one full slab: allocate a fresh slab, copy NOTHING —
                # the transient is the new slab itself, never 2x the corpus
                self._check_hbm_budget(self.capacity + self._slab_rows)
                self._append_slab(self._slab_rows)
                log.info(
                    "index slab %d allocated (%d rows capacity)",
                    len(self._emb_slabs), self.capacity,
                )

    def _quantize_host(self, normalized: np.ndarray):
        if self.quantize == "int8":
            amax = np.abs(normalized).max(axis=1)
            scale = np.maximum(amax, 1e-12) / 127.0
            q = np.clip(np.round(normalized / scale[:, None]), -127, 127).astype(np.int8)
            return q, scale.astype(np.float32)
        if self.quantize == "bfloat16":
            return np.asarray(jnp.asarray(normalized).astype(jnp.bfloat16)), None
        return normalized, None

    def _locate(self, gpos: int) -> Tuple[int, int]:
        """Global row position -> (slab index, slab-local offset)."""
        start = 0
        for i, slab in enumerate(self._emb_slabs):
            n = slab.shape[0]
            if gpos < start + n:
                return i, gpos - start
            start += n
        raise IndexError(gpos)

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

        norms = np.linalg.norm(embeddings, axis=1)
        normalized = embeddings / np.maximum(norms, 1e-12)[:, None]
        rows, scales = self._quantize_host(normalized)
        rows = np.asarray(rows)

        # restage the tail partial block so every device write is one FULL
        # 4096-aligned block (dynamic_update_slice CLAMPS an out-of-bounds
        # start instead of erroring — full in-bounds blocks sidestep that)
        tail_len = len(self._tail_emb)
        data_emb = np.concatenate([self._tail_emb, rows]) if tail_len else rows
        data_norms = np.concatenate([self._tail_norms, norms.astype(np.float32)]) if tail_len else norms.astype(np.float32)
        if self._scale_slabs is not None:
            data_scales = (
                np.concatenate([self._tail_scales, scales]) if tail_len else scales
            )
        pos = self._size - tail_len  # multiple of _UPDATE_BLOCK
        total = len(data_emb)
        self._ensure_capacity(pos + ((total + _UPDATE_BLOCK - 1) // _UPDATE_BLOCK) * _UPDATE_BLOCK)

        off = 0
        while off < total:
            m = min(_UPDATE_BLOCK, total - off)
            slab_i, local = self._locate(pos + off)
            blk = np.zeros((_UPDATE_BLOCK, self.dim), rows.dtype)
            blk[:m] = data_emb[off : off + m]
            nrm = np.zeros((_UPDATE_BLOCK,), np.float32)
            nrm[:m] = data_norms[off : off + m]
            loc = jnp.asarray(local, jnp.int32)
            self._emb_slabs[slab_i] = _write_block(
                self._emb_slabs[slab_i], jnp.asarray(blk), loc
            )
            self._norm_slabs[slab_i] = _write_block(
                self._norm_slabs[slab_i], jnp.asarray(nrm), loc
            )
            if self._scale_slabs is not None:
                scl = np.zeros((_UPDATE_BLOCK,), np.float32)
                scl[:m] = data_scales[off : off + m]
                self._scale_slabs[slab_i] = _write_block(
                    self._scale_slabs[slab_i], jnp.asarray(scl), loc
                )
            off += m

        new_tail = (self._size + n) % _UPDATE_BLOCK
        self._tail_emb = data_emb[total - new_tail :].copy() if new_tail else data_emb[:0]
        self._tail_norms = data_norms[total - new_tail :].copy() if new_tail else data_norms[:0]
        if self._scale_slabs is not None:
            self._tail_scales = (
                data_scales[total - new_tail :].copy() if new_tail else data_scales[:0]
            )

        for i, p in enumerate(paths):
            self._row[p] = self._size + i
            self._dead_paths.discard(p)  # re-added after tombstone: live again
        self._paths.extend(paths)
        self._size += n
        return n

    def add(self, paths: Sequence[str], embeddings: np.ndarray) -> int:
        """Insert raw (unnormalized) embeddings; dedups by path; persists to
        the attached store if any. Returns #rows actually added."""
        with self._lock:  # store shard numbering must not race either
            prev_sketch = self._sketch
            added = self._add_in_memory(paths, embeddings)
            if added and self.store is not None:
                self.store.append(list(paths), np.asarray(embeddings, np.float32))
            if added and prev_sketch is not None:
                # an unsketched new row could be UNDER-bounded by a stale
                # sketch and silently dropped from a true top-k — so either
                # sketch the appended rows NOW against the existing basis
                # (per-row bound: still certified-exact; the basis is only
                # a tightness choice) or invalidate. Incremental keeps
                # queries on the certified fast path THROUGHOUT a scan,
                # instead of full-scanning until the post-scan rebuild.
                try:
                    ok = self._update_sketch_incremental(prev_sketch)
                except Exception:  # never trade ingest for sketch upkeep
                    logging.getLogger(__name__).exception(
                        "incremental sketch update failed; invalidating"
                    )
                    ok = False
                if ok:
                    self.sketch_incremental += 1
                else:
                    self._sketch = None
            return added

    def _update_sketch_incremental(self, sk) -> bool:
        """Sketch rows [sk.built_rows, self._size) with the EXISTING basis
        and splice them into the sketch slabs in place. Caller holds
        ``self._lock``. Returns False when unsupported (mesh-sharded
        sketches keep the invalidate-and-rebuild path).

        Soundness: the Cauchy–Schwarz UB is per-row (sketch dot + inflated
        residual w.r.t. the SAME basis), so rows sketched against an older
        basis keep a rigorous bound — a drifted distribution only loosens
        it (worst case: certificate fails, query falls back to the full
        scan; results stay exact either way). The engine's post-scan
        rebuild still re-fits the basis for tightness.
        """
        if self.mesh is not None:
            return False
        from image_search_tpu.index import twostage

        d_s = sk.basis.shape[1]
        to_bf16 = sk.sketches[0].dtype == jnp.bfloat16
        # re-sketch from the aligned block boundary: the restaged tail rows
        # below built_rows re-produce their existing sketch values, rows
        # past self._size are zeros (sketch 0, tiny resid) masked by size
        lo = (sk.built_rows // _UPDATE_BLOCK) * _UPDATE_BLOCK
        hi = self._size
        sketches, resid = list(sk.sketches), list(sk.resid)
        slack = sk.ub_slack
        while len(sketches) < len(self._emb_slabs):  # newly allocated slabs
            n_i = self._emb_slabs[len(sketches)].shape[0]
            sketches.append(jnp.zeros((n_i, d_s), sk.sketches[0].dtype))
            resid.append(jnp.zeros((n_i,), jnp.float32))
        start = 0
        for i, slab in enumerate(self._emb_slabs):
            n_i = slab.shape[0]
            if sketches[i].shape[0] != n_i:
                # the tail slab DOUBLED under this append (_ensure_capacity
                # copies old rows at offset 0) — zero-pad the sketch slab to
                # the new geometry; the pad rows are (re)sketched below
                pad = n_i - sketches[i].shape[0]
                if pad < 0:
                    return False  # slab shrank (compaction path): rebuild
                sketches[i] = jnp.concatenate(
                    [sketches[i], jnp.zeros((pad, d_s), sketches[i].dtype)], 0
                )
                resid[i] = jnp.concatenate(
                    [resid[i], jnp.zeros((pad,), jnp.float32)], 0
                )
            s_lo, s_hi = max(lo, start), min(hi, start + n_i)
            if s_lo < s_hi:
                # block-aligned local range: stable shapes per append size
                l0 = ((s_lo - start) // _UPDATE_BLOCK) * _UPDATE_BLOCK
                l1 = min(n_i, -(-(s_hi - start) // _UPDATE_BLOCK) * _UPDATE_BLOCK)
                sc = (
                    None
                    if self._scale_slabs is None
                    else self._scale_slabs[i][l0:l1]
                )
                s, t, d = twostage.sketch_slab(slab[l0:l1], sc, sk.basis, to_bf16)
                sketches[i] = sketches[i].at[l0:l1].set(s)
                resid[i] = resid[i].at[l0:l1].set(t)
                slack = jnp.maximum(slack, d)
            start += n_i
        self._sketch = twostage.SketchState(
            sk.basis, tuple(sketches), tuple(resid), self._size, slack
        )
        return True

    def _remove_in_memory(self, paths: Sequence[str]):
        with self._lock:
            rows, removed = [], []
            for p in paths:
                r = self._row.pop(p, None)
                if r is not None:
                    rows.append(r)
                    removed.append(p)
            if not rows:
                return 0, []
            self._dead_paths.update(removed)
            by_slab: dict[int, List[int]] = {}
            for g in rows:
                i, local = self._locate(g)
                by_slab.setdefault(i, []).append(local)
            for i, locs in by_slab.items():
                # pad to pow2 with repeats (set is idempotent) to bound
                # retraces of the scatter across removal batch sizes
                m = 1
                while m < len(locs):
                    m *= 2
                padded = locs + [locs[-1]] * (m - len(locs))
                self._pen_slabs[i] = _mask_rows(
                    self._pen_slabs[i], jnp.asarray(padded, jnp.int32)
                )
            self._removed += len(rows)
            return len(rows), removed

    def remove_paths(self, paths: Sequence[str], exclude: bool = False) -> int:
        """Tombstone rows by path: they stop appearing in every search path
        (local, sharded, Rocchio) immediately, and — with a store attached —
        stay removed across restarts. Rows are masked, not compacted (the
        slab layout keeps global ids stable); re-adding the same path later
        inserts a fresh live row. The reference has no deletion at all: a
        removed photo keeps surfacing there forever.

        ``exclude=True`` (explicit user deletion) additionally marks the
        paths excluded in the store: rescans skip them even while the
        files exist on disk (see EmbeddingStore.tombstone). Plain removal
        (prune of vanished files) stays resurrectable by rescan.

        Returns the number of rows actually removed."""
        n, _ = self.remove_paths_report(paths, exclude=exclude)
        return n

    def remove_paths_report(
        self, paths: Sequence[str], exclude: bool = False
    ) -> Tuple[int, List[str]]:
        """Like :meth:`remove_paths` but also returns the list of paths
        whose rows were actually tombstoned (request duplicates and
        never-indexed paths excluded) — callers tracking exclusion state
        need the precise set, not the count."""
        with self._lock:
            n, removed = self._remove_in_memory(paths)
            if removed and self.store is not None:
                self.store.tombstone(removed, exclude=exclude)
            return n, removed

    # -- two-stage certified-exact search (index/twostage.py) ------------------

    def build_sketch(
        self, d_s: int = 64, sample_rows: int = 8192, dtype: str = "float32",
        min_certifiable: float = 0.0, est_k: int = 1000,
    ) -> None:
        """Build the sketch for certified two-stage exact search.

        One streaming pass over the corpus (a ~10 ms-class matmul per slab)
        plus a host SVD of a strided row sample. Appends invalidate it;
        call again after ingest (the engine does this when
        ``--search-twostage`` is on). No-op on an empty index.

        ``dtype="bfloat16"`` stores the sketch in bf16 — halves stage-1
        HBM bytes per query (still certified-exact: the rounding cost is
        folded into a data-derived UB inflation, twostage._sketch_chunk) —
        worth it when the certificate margin affords ~0.004.

        ``min_certifiable`` > 0 gates PUBLICATION on the build-time
        certifiability estimate (twostage.estimate_certifiable_fraction,
        replayed on the row sample with ``est_k``-fraction-scaled ranks):
        a spectrally flat corpus then never serves a sketch — queries go
        straight to the full scan instead of paying
        TWOSTAGE_DISABLE_AFTER failed ~40 ms bound passes before adaptive
        disable triggers. The estimate lands in
        ``sketch_certifiable_est`` either way (served to /metrics)."""
        from image_search_tpu.index import twostage

        to_bf16 = dtype in ("bfloat16", "bf16")
        with self._lock:
            if self._size == 0:
                return
            slabs, _, scales, _ = self._snapshot()
            size = self._size
        m = min(sample_rows, size)
        idx = jnp.asarray(
            np.linspace(0, size - 1, m).astype(np.int32)
        )
        sample = np.asarray(
            _gather_rows(slabs, scales, idx), np.float32
        )
        basis = jnp.asarray(twostage.fit_basis(sample, d_s))
        if min_certifiable > 0.0:
            est = twostage.estimate_certifiable_fraction(
                sample, np.asarray(basis), size, k=est_k,
                candidate_rows=twostage.DEFAULT_BLOCKS * twostage.BLOCK,
                fs_slack=twostage.FULL_SCAN_SLACK[
                    jnp.dtype(slabs[0].dtype).name
                ],
                # bf16 sketch storage costs a data-derived ub_slack that is
                # not known yet — charge the measured-scale 0.01 bound
                ub_slack=0.01 if to_bf16 else 0.0,
            )
            self.sketch_certifiable_est = est
            if est < min_certifiable:
                logging.getLogger(__name__).warning(
                    "two-stage sketch NOT published: estimated certifiable "
                    "fraction %.2f < %.2f gate (corpus spectrum too flat — "
                    "queries will use the full scan; round-3 verdict #7)",
                    est, min_certifiable,
                )
                with self._lock:
                    self._sketch = None
                    self.twostage_gate_skips += 1
                return
        sketches, resid, slack = [], [], jnp.zeros((), jnp.float32)
        for i, slab in enumerate(slabs):
            sc = None if scales is None else scales[i]
            if self.mesh is not None:
                # per-device build keeps sketch rows aligned with the
                # slab's P(data, None) layout for sharded_twostage_topk
                s, t, d = twostage.sketch_slab_sharded(
                    slab, sc, basis, self.mesh, to_bf16
                )
            else:
                s, t, d = twostage.sketch_slab(slab, sc, basis, to_bf16)
            sketches.append(s)
            resid.append(t)
            slack = jnp.maximum(slack, jnp.asarray(d, jnp.float32).reshape(()))
        with self._lock:
            if self._size != size:
                return  # concurrent append won the race; sketch is stale
            self._sketch = twostage.SketchState(
                basis, tuple(sketches), tuple(resid), size, slack
            )
            self._twostage_consec_failures = 0  # re-arm adaptive disable

    @property
    def sketch_fresh(self) -> bool:
        return self._sketch is not None and self._sketch.built_rows == self._size

    def drop_sketch(self) -> None:
        """Unpublish the sketch. Used by the engine after building an
        UNGATED sketch solely for the approximate duplicate scan on a
        flat corpus — serving it to queries would re-introduce the failed
        bound passes the certifiability gate exists to avoid."""
        with self._lock:
            self._sketch = None

    def _twostage_snapshot(self, k, candidates, selected_paths_list=None):
        """One lock acquisition for everything the two-stage path needs:
        ``(sk, k, c, slabs, norms, scales, pens, size, rows_list)``, with
        ``sk=None`` whenever the fast path can't serve (empty index, stale
        or dropped sketch, or k so large that a c-candidate stage can't
        return k rows and could save nothing anyway)."""
        with self._lock:
            sk = self._sketch
            fresh = sk is not None and sk.built_rows == self._size
            if self._size == 0 or not fresh:
                return (None,) + (None,) * 8
            k = self._clamp_k(k)
            rows_list = None
            if selected_paths_list is not None:
                rows_list = [
                    [self._row[p] for p in sel if p in self._row]
                    for sel in selected_paths_list
                ]
            slabs, norms, scales, pens = self._snapshot()
            size = jnp.asarray(self._size, jnp.int32)
            n_pad = sum(s.shape[0] for s in slabs)
            c = min(max(candidates, k), n_pad - 1)
            if c < k:
                return (None,) + (None,) * 8
            return sk, k, c, slabs, norms, scales, pens, size, rows_list

    def _twostage_run(
        self, sk, q, k, c, slabs, scales, pens, size, fallback, count_failures,
        n_real: int = 0,
    ):
        """Dispatch the bound+rescore program (local or mesh-sharded) and
        apply the certificate / adaptive-disable bookkeeping. ``fallback``
        answers when the certificate fails; ``count_failures=False`` keeps
        by-construction failures (serving warmup's zero queries) out of the
        consecutive-failure counter. ``n_real`` is the count of DISTINCT
        queries in a batch padded by repetition (0: all of them) — the
        union budget splits over real queries, not pad copies; rounded up
        to a power of two so the program family stays {1,2,4,...}."""
        n_q = int(q.shape[0])
        share = n_q if n_real <= 0 else min(n_real, n_q)
        if share > 1:  # pow2 ceil: one compiled program per ladder rung
            share = 1 << (share - 1).bit_length()
        if self.mesh is not None:
            s, i, cert = _sharded_twostage_fn(self.mesh, k, c, share)(
                slabs, sk.sketches, sk.resid, sk.basis, size, q, sk.ub_slack,
                scales, pens
            )
        elif os.environ.get("ISX_TWOSTAGE_ROWS"):
            # row-candidate v1 (A/B gate): exact top-c UB selection — its
            # big-k sort costs ~20 ms at 10M rows (PERF_NOTES round-3)
            from image_search_tpu.index.twostage import twostage_topk

            s, i, cert = twostage_topk(
                slabs, sk.sketches, sk.resid, sk.basis, size, q, k, c,
                scales, pens, sk.ub_slack,
            )
        else:
            # block-candidate v2 (default): candidates are whole 128-row
            # blocks — cheaper selection, tighter-or-equal certificate
            from image_search_tpu.index.twostage import (
                BLOCK, twostage_topk_block)

            nb = sum(s.shape[0] for s in slabs) // BLOCK
            # scale the block budget so each of the `share` real queries
            # keeps a measured per-query floor of its own pick. f32
            # sketches certify at c/4 = 1024 blocks/query at 10M
            # (twostage_decomp: B=2/4/8 pass; 512 fails at B=8). bf16
            # sketches carry ub_slack ~4e-3 that eats that share (B=4/8
            # m=4096 failed) — they get double the floor, c/2 = 2048/query
            # (benchmarks/twostage_bf16_batch.py). A raised
            # --twostage-max-batch stays certified instead of silently
            # diluting the union share.
            per_q = c // 2 if sk.sketches[0].dtype == jnp.bfloat16 else c // 4
            m = min(max(c, per_q * share), nb - 1)
            if m < 1 or m * BLOCK < k or (share > 1 and (m // share) * BLOCK < k):
                # corpus too small for block granularity to leave both a
                # non-chosen block AND k rescore rows (batched: each query
                # is guaranteed only its m//share union share): full scan
                # is as cheap
                self.twostage_fallbacks += 1
                return fallback()
            s, i, cert = twostage_topk_block(
                slabs, sk.sketches, sk.resid, sk.basis, size, q, k, m,
                scales, pens, sk.ub_slack, share,
            )
        if bool(jnp.all(cert)):
            self.twostage_certified += 1
            self._twostage_consec_failures = 0
            return np.asarray(s), np.asarray(i)
        if count_failures:
            self._note_twostage_failure()
        else:
            self.twostage_fallbacks += 1
        return fallback()

    def search_twostage(
        self, queries: np.ndarray, k: int = 1000, candidates: int = 4096,
        count_failures: bool = True,
    ):
        """Certified exact top-k: sketch-bound pass + exact rescore; falls
        back to the full scan whenever the certificate fails or the sketch
        is stale/absent — results are ALWAYS exact (twostage.py module doc).

        Mesh-sharded indexes ride ``sharded_twostage_topk``: the same
        construction per shard (local UB pass + local rescore, zero row
        movement) with one devices*local_k all_gather merge — both the
        7.7 GB/chip read bound AND the per-query bytes shrink linearly
        with the mesh.

        Adaptive disable: a spectrally flat corpus fails the certificate
        on EVERY query — each one would pay bound pass + full scan, a
        permanent ~30% latency tax. After ``TWOSTAGE_DISABLE_AFTER``
        consecutive certificate failures the sketch is dropped (searches
        go straight to the full scan); the next ``build_sketch`` (every
        scan with --search-twostage) re-arms it, so a corpus whose
        spectrum concentrates as it grows gets re-tried.
        ``count_failures=False`` exempts a call from that accounting
        (serving warmup probes fail by construction)."""
        q = jnp.atleast_2d(jnp.asarray(queries, jnp.float32))
        sk, k2, c, slabs, _, scales, pens, size, _ = self._twostage_snapshot(
            k, candidates
        )
        if sk is None:
            self.twostage_fallbacks += 1
            return self.search(queries, k)
        return self._twostage_run(
            sk, q, k2, c, slabs, scales, pens, size,
            lambda: self.search(queries, k), count_failures,
        )

    def _note_twostage_failure(self):
        self.twostage_fallbacks += 1
        self._twostage_consec_failures += 1
        if self._twostage_consec_failures >= self.TWOSTAGE_DISABLE_AFTER:
            logging.getLogger(__name__).warning(
                "two-stage certificate failed %d consecutive times — "
                "corpus spectrum too flat; disabling the sketch until the "
                "next rebuild",
                self._twostage_consec_failures,
            )
            with self._lock:
                self._sketch = None

    def search_twostage_feedback_batch(
        self,
        text_embeddings,
        selected_paths_list: Sequence[Sequence[str]],
        k: int = 1000,
        candidates: int = 4096,
        count_failures: bool = True,
    ):
        """Certified two-stage counterpart of ``search_with_feedback_batch``:
        the Rocchio refined query is just another query vector, so feedback
        rounds can ride the sketch-bound fast path too. One tiny gather
        program builds the refined queries (KB-scale reads), then the same
        two-stage machinery answers them; empty selections degrade to the
        plain text search BITWISE (query = 0.5*text and the power-of-two
        factor cancels in l2-normalization), so plain and feedback traffic
        share one padded program family. Falls back to the fused full-scan
        feedback program whenever the sketch is absent/stale or the
        certificate fails — results always equal the full path's.

        Batch and selection counts are padded to pow2 buckets internally
        (batch pads by REPEATING query 0 with no selections: a zero-padded
        query would fail the certificate by construction)."""
        B = len(selected_paths_list)
        text = jnp.asarray(text_embeddings, jnp.float32).reshape(B, self.dim)
        sk, k2, c, slabs, norms, scales, pens, size, rows_list = (
            self._twostage_snapshot(k, candidates, selected_paths_list)
        )
        if sk is None:
            self.twostage_fallbacks += 1
            return self.search_with_feedback_batch(text_embeddings,
                                                   selected_paths_list, k)
        # pow2 padding, same buckets as search_with_feedback_batch
        m = 8
        while m < max((len(r) for r in rows_list), default=0):
            m *= 2
        Bpad = 8
        while Bpad < B:
            Bpad *= 2
        sel = np.full((Bpad, m), -1, np.int32)
        for b, r in enumerate(rows_list):
            sel[b, : len(r)] = r
        text_j = (
            jnp.concatenate(
                [text, jnp.broadcast_to(text[:1], (Bpad - B, self.dim))]
            )
            if Bpad > B
            else text
        )
        q = _rocchio_queries(slabs, norms, text_j, jnp.asarray(sel), scales)
        s_i = self._twostage_run(
            sk, q, k2, c, slabs, scales, pens, size,
            lambda: None, count_failures, n_real=B,
        )
        if s_i is None:  # certificate failed: fused full-scan feedback
            return self.search_with_feedback_batch(
                text_embeddings, selected_paths_list, k
            )
        return s_i[0][:B], s_i[1][:B]

    def search_twostage_fused_tokens(
        self,
        text_fn,
        params,
        ids: np.ndarray,
        selected_paths_list: Sequence[Sequence[str]],
        k: int = 1000,
        candidates: int = 4096,
        count_failures: bool = True,
    ):
        """Whole cold-query path in ONE dispatched program (verdict #1):
        token ids [Bpad, L] -> text tower -> Rocchio -> certified two-stage.
        ``ids`` must already be padded to a pow2 bucket (>= 1: a lone HTTP
        request runs the B=1 program — padding it to 8 measured +9 ms of
        selection work at 10M, latency_decomp round 4) by REPEATING row 0
        (an EOS-only pad row would be a distinct query and claim a share
        of the union candidate budget; a repeat adds no new blocks — same
        rule as ``search_twostage_feedback_batch``'s text padding).

        Returns ``(scores[:B], ids[:B], text[:B] np)`` on certified
        success; ``(None, None, text)`` when the certificate failed
        (caller runs the full-scan fallback on the already-computed
        embeddings); and ``(None, None, None)`` when the fused path cannot
        serve at all (no/stale sketch, sharded index, corpus too small for
        block granularity) — caller uses the classic two-program path."""
        B = len(selected_paths_list)
        sk, k2, c, slabs, norms, scales, pens, size, rows_list = (
            self._twostage_snapshot(k, candidates, selected_paths_list)
        )
        if sk is None or self.mesh is not None:
            return None, None, None
        Bpad = int(ids.shape[0])
        m_sel = 8
        while m_sel < max((len(r) for r in rows_list), default=0):
            m_sel *= 2
        sel = np.full((Bpad, m_sel), -1, np.int32)
        for b, r in enumerate(rows_list):
            sel[b, : len(r)] = r
        share = 1 << (B - 1).bit_length() if B > 1 else 1
        from image_search_tpu.index.twostage import BLOCK

        nb = sum(s.shape[0] for s in slabs) // BLOCK
        per_q = c // 2 if sk.sketches[0].dtype == jnp.bfloat16 else c // 4
        m = min(max(c, per_q * share), nb - 1)
        if m < 1 or m * BLOCK < k2 or (share > 1 and (m / share) * BLOCK < k2):
            self.twostage_fallbacks += 1
            return None, None, None
        fn = _fused_twostage_fn(text_fn, k2, m, share)
        s, i, cert, text = fn(
            params, jnp.asarray(ids), jnp.asarray(sel), slabs, norms,
            scales, pens, size, sk.sketches, sk.resid, sk.basis, sk.ub_slack,
        )
        # ONE host round trip for the whole request: certificate + scores
        # + ids + text embeddings fetched together (text is ~B x 3 KB; the
        # caller's cache wants it either way, and fetching it here kills
        # the B per-query device slice dispatches the engine used to pay)
        cert_ok, s_np, i_np, text_np = jax.device_get(
            (cert, s[:B], i[:B], text[:B])
        )
        if bool(cert_ok):
            self.twostage_certified += 1
            self._twostage_consec_failures = 0
            return s_np, i_np, text_np
        if count_failures:
            self._note_twostage_failure()
        else:
            self.twostage_fallbacks += 1
        return None, None, text_np

    # -- queries ---------------------------------------------------------------

    def _clamp_k(self, k: int) -> int:
        # top_k needs k <= N; reference hardcodes k=1000 (search.rs:76) even
        # for small corpora because the DB clamps — we clamp likewise.
        return max(1, min(k, self._size if self._size else 1))

    def _snapshot(self):
        """Caller must hold the lock: immutable references for lock-free compute.

        Penalties are ``None`` until the first removal, so the
        no-deletions jit program (and its cache entry) is byte-identical
        to a tombstone-free index."""
        return (
            tuple(self._emb_slabs),
            tuple(self._norm_slabs),
            None if self._scale_slabs is None else tuple(self._scale_slabs),
            tuple(self._pen_slabs) if self._removed else None,
        )

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
            slabs, _, scales, pens = self._snapshot()
            size = jnp.asarray(self._size, jnp.int32)
        if self.mesh is None:
            s, i = _search_local(slabs, size, q, k, scales, approx, pens)
        else:
            s, i = _sharded_search_fn(self.mesh, k, approx)(slabs, size, q, scales, pens)
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
            jnp.asarray(text_embedding, jnp.float32).reshape(1, self.dim),
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
        # jnp (not np): a device-resident query — e.g. the text tower's
        # un-fetched output — must chain into this dispatch WITHOUT a host
        # round-trip (the fully on-device query path, round 3)
        text = jnp.asarray(text_embeddings, jnp.float32).reshape(B, self.dim)
        with self._lock:  # snapshot only; compute runs concurrently
            if self._size == 0:
                return np.zeros((B, 0), np.float32), np.zeros((B, 0), np.int32)
            k = self._clamp_k(k)
            rows_list = [
                [self._row[p] for p in sel if p in self._row]
                for sel in selected_paths_list
            ]
            slabs, norms, scales, pens = self._snapshot()
            size = jnp.asarray(self._size, jnp.int32)
        # pad selections and batch to pow2 buckets to bound jit variants.
        # The batch bucket floors at 8: the score sweep is B-flat on the MXU
        # (a matvec pads the query tile to 128 lanes regardless), so B=8
        # costs what B=1 costs, and {8,16,32,...} is a small enough program
        # family to precompile at startup (engine.warm_serving_buckets)
        m = 8
        while m < max((len(r) for r in rows_list), default=0):
            m *= 2
        Bpad = 8
        while Bpad < B:
            Bpad *= 2
        sel = np.full((Bpad, m), -1, np.int32)
        for b, r in enumerate(rows_list):
            sel[b, : len(r)] = r
        text_j = jnp.pad(text, ((0, Bpad - B), (0, 0)))
        sel_j = jnp.asarray(sel)
        if self.mesh is None:
            s, i = _feedback_search_local(
                slabs, norms, size, text_j, sel_j, k, scales, approx, pens
            )
        else:
            s, i = _sharded_feedback_fn(self.mesh, k, approx)(
                slabs, norms, size, text_j, sel_j, scales, pens
            )
        return np.asarray(s)[:B], np.asarray(i)[:B]

    def find_near_duplicates(
        self,
        threshold: float = 0.95,
        neighbors: int = 8,
        batch: int = 1024,
        approx: bool = False,
        progress: Optional[callable] = None,
    ):
        """Near-duplicate pairs by cosine similarity: every live row is
        queried against the index in device-sized batches (the stored rows
        ARE l2-normalized, so the query gather is free) and neighbor pairs
        scoring >= threshold are returned as (row_i, row_j, score) with
        i < j, each pair once. No reference counterpart — SurrealDB MTREE
        could not scan itself in reasonable time; here a 1M-row corpus is
        ~1k fused batched searches. ``progress(rows_done, rows_total)`` is
        called after every batch so long scans are observable (and the
        server can publish a progress gauge); pair extraction is fully
        vectorized — no per-element Python loop over the [B, k] results."""
        with self._lock:
            rows = sorted(self._row.values())
            if not rows:
                return []
            slabs, norms, scales, pens = self._snapshot()
            size = jnp.asarray(self._size, jnp.int32)
        k = min(neighbors + 1, self._size)  # +1: self-match is always there
        pair_chunks: List[np.ndarray] = []
        score_chunks: List[np.ndarray] = []
        total = len(rows)
        for lo in range(0, total, batch):
            chunk = rows[lo : lo + batch]
            idx = np.full((batch,), chunk[-1], np.int64)
            idx[: len(chunk)] = chunk
            q = _gather_rows(slabs, scales, jnp.asarray(idx))  # normalized f32
            if self.mesh is None:
                sc, nb = _search_local(slabs, size, q, k, scales, approx, pens)
            else:
                sc, nb = _sharded_search_fn(self.mesh, k, approx)(
                    slabs, size, q, scales, pens
                )
            sc = np.asarray(sc)[: len(chunk)]
            nb = np.asarray(nb)[: len(chunk)].astype(np.int64)
            r = np.asarray(chunk, np.int64)[:, None]  # [C, 1]
            # emit BOTH orientations normalized to (min, max): in a cluster
            # larger than `neighbors`, top-k tie-breaking can make high-id
            # members visible only from their OWN query side
            # (review-reproduced: an 11-copy cluster silently lost rows
            # 39-40 under `if r < j` alone)
            mask = (nb != r) & (sc >= threshold)
            if mask.any():
                ri = np.broadcast_to(r, nb.shape)[mask]
                rj = nb[mask]
                pair_chunks.append(
                    np.stack([np.minimum(ri, rj), np.maximum(ri, rj)], axis=1)
                )
                score_chunks.append(sc[mask].astype(np.float32))
            if progress is not None:
                progress(min(lo + batch, total), total)
        if not pair_chunks:
            return []
        pairs = np.concatenate(pair_chunks)
        scores = np.concatenate(score_chunks)
        # dedupe keeping the max score per (i, j): sort by (i, j, -score),
        # keep each pair's first occurrence (lexsort: last key is primary)
        order = np.lexsort((-scores, pairs[:, 1], pairs[:, 0]))
        pairs, scores = pairs[order], scores[order]
        first = np.ones(len(pairs), bool)
        first[1:] = (pairs[1:] != pairs[:-1]).any(axis=1)
        pairs, scores = pairs[first], scores[first]
        return [
            (int(i), int(j), float(s)) for (i, j), s in zip(pairs, scores)
        ]

    def find_near_duplicates_sketch(
        self,
        threshold: float = 0.95,
        progress: Optional[callable] = None,
        **kw,
    ):
        """Sketch-accelerated COMPLETE pair scan (index/dupscan.py): every
        live pair with cosine >= threshold, not truncated to a per-row
        neighbor count like :meth:`find_near_duplicates`. Needs a fresh
        sketch and a single-device index; raises
        :class:`dupscan.DupScanBailout` when either precondition fails or
        the corpus is too flat for the bound to prune — callers fall back
        to the legacy scan (engine.find_duplicate_groups does)."""
        from image_search_tpu.index import dupscan

        with self._lock:
            if self.mesh is not None:
                raise dupscan.DupScanBailout("sharded index: legacy scan only")
            sk = self._sketch
            if sk is None or sk.built_rows != self._size:
                raise dupscan.DupScanBailout("no fresh sketch")
            if self._size == 0:
                return []
            slabs, _, scales, pens = self._snapshot()
            size = self._size
        return dupscan.sketch_duplicate_pairs(
            slabs, scales, pens, size, sk, threshold,
            progress=progress, **kw,
        )

    def find_near_duplicates_candidates(
        self,
        threshold: float = 0.95,
        progress: Optional[callable] = None,
        **kw,
    ):
        """NON-certified sketch-candidate pair scan
        (dupscan.sketch_candidate_pairs): the flat-corpus middle path when
        :meth:`find_near_duplicates_sketch` bails out. Emitted pairs carry
        true f32 scores >= threshold (no false positives); recall is
        heuristic (top-c sketch candidates per block). Same preconditions
        as the certified scan: fresh sketch, single-device index."""
        from image_search_tpu.index import dupscan

        with self._lock:
            if self.mesh is not None:
                raise dupscan.DupScanBailout("sharded index: legacy scan only")
            sk = self._sketch
            if sk is None or sk.built_rows != self._size:
                raise dupscan.DupScanBailout("no fresh sketch")
            if self._size == 0:
                return []
            slabs, _, scales, pens = self._snapshot()
            size = self._size
        return dupscan.sketch_candidate_pairs(
            slabs, scales, pens, size, sk, threshold,
            progress=progress, **kw,
        )

    # -- lookups ---------------------------------------------------------------

    def paths_for(self, indices: np.ndarray) -> List[str]:
        return [self._paths[int(i)] for i in np.asarray(indices).reshape(-1)]

    def has_path(self, path: str) -> bool:
        return path in self._row

    def was_removed(self, path: str) -> bool:
        """Whether ``path``'s row was tombstoned in THIS process and not
        re-added since. Lets the engine honor an explicit /remove on a
        previously pruned path even while the file is absent from disk,
        without accepting never-indexed garbage paths as exclusions (the
        durable cross-restart complement is the store's tombstone log)."""
        return path in self._dead_paths

    def get_raw_embeddings(self, paths: Sequence[str]) -> np.ndarray:
        """Stored raw vectors for given paths (the search.rs:43-58 SELECT)."""
        with self._lock:  # snapshot only
            rows = [self._row[p] for p in paths if p in self._row]
            if not rows:
                return np.zeros((0, self.dim), np.float32)
            slabs, norms, scales, _ = self._snapshot()
        idx = jnp.asarray(np.asarray(rows))
        raw = _gather_rows(slabs, scales, idx) * _gather_1d(norms, idx)[:, None]
        return np.asarray(raw)

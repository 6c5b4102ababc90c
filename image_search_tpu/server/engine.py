"""SearchEngine: wires model + tokenizer + index + ingest into one object.

The runtime counterpart of the reference's ``AppState``
(``server/src/main.rs:30-35``: CLI args + DB handle + embedder behind
mutexes) — except everything lives in-process on the TPU, nothing blocks a
socket, and the model is loaded ONCE at startup instead of per scan
(clip.rs:46-48).
"""

from __future__ import annotations

import logging
import os
import threading
import urllib.parse
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from image_search_tpu.config import get_config
from image_search_tpu.index import EmbeddingStore, VectorIndex
from image_search_tpu.index.index import NEG_INF
from image_search_tpu.ingest.pipeline import ScanStats, scan_directory
from image_search_tpu.models.convert import load_checkpoint
from image_search_tpu.models.embedder import ClipEmbedder
from image_search_tpu.parallel.mesh import make_mesh, maybe_init_distributed
from image_search_tpu.server.args import ServerArgs
from image_search_tpu.tokenizer import CLIPBPETokenizer, HashTokenizer
from image_search_tpu.utils.metrics import global_metrics

log = logging.getLogger(__name__)

MEDIA_PREFIX = "media/"


class SearchEngine:
    def __init__(self, args: ServerArgs):
        self.args = args
        # normalize ONCE: the walker builds index paths from media_dir and
        # to_abs_path normpaths reconstructed ones — a relative/'./'-style
        # media dir would otherwise make feedback selections never match
        self.media_dir = os.path.normpath(os.path.abspath(args.expanded_media_dir()))
        # route of the most recent duplicate scan ('certified',
        # 'approximate', 'legacy_exact', 'legacy_approx'); /duplicates
        # surfaces it so approximate results are never mistaken for
        # certified-complete ones
        self.last_duplicate_mode: Optional[str] = None

        maybe_init_distributed()
        n_dev = len(jax.devices())
        self.mesh = (
            make_mesh(args.mesh_data, args.mesh_model)
            if (args.mesh_data or args.mesh_model > 1 or n_dev > 1)
            else None
        )

        params, cfg = self._load_model()
        self.cfg = cfg
        tokenizer = self._load_tokenizer()
        dtype = {
            "auto": None,
            "float32": jnp.float32,
            "bfloat16": jnp.bfloat16,
        }[args.compute_dtype]
        self.embedder = ClipEmbedder(
            params,
            cfg,
            tokenizer=tokenizer,
            mesh=self.mesh,
            compute_dtype=dtype,
            preprocess_mode=args.preprocess_mode,
        )
        self._text_cache: dict = {}
        # guards get/insert/evict: asyncio.to_thread searches mutate the
        # dict concurrently; unguarded next(iter(...)) eviction can raise
        # "dictionary changed size during iteration" under load
        self._text_lock = threading.Lock()
        # row -> wire-dict template memo (see _wire_row); sparse, filled
        # per returned row (racing threads write identical values)
        self._wire_cache: dict = {}
        self.WIRE_CACHE_MAX = 1_000_000  # ~0.4 GB worst case, then cleared
        # id -> pre-escaped JSON fragment memo (see render_images_json):
        # json.dumps over k=1000 result dicts measured 1.78 ms/request at
        # the 10M latency decomposition — escaping the same id/path strings
        # every request. Same lifecycle rules as _wire_cache.
        self._frag_cache: dict = {}
        self.thumb_cache = None
        if getattr(args, "thumb_cache", ""):
            from image_search_tpu.ingest.thumbcache import ThumbCache

            self.thumb_cache = ThumbCache(args.thumb_cache)
            log.info("thumbnail cache enabled at %s", args.thumb_cache)
        store = EmbeddingStore(args.index_dir, cfg.projection_dim)
        # explicitly removed images (POST /remove): scans skip these until
        # the user deletes the files or the paths are re-added
        self._excluded = store.excluded_paths()
        self.index = VectorIndex(
            cfg.projection_dim,
            mesh=self.mesh,
            store=store,
            quantize=args.index_quantize,
            capacity=args.index_capacity,
        )
        if getattr(args, "search_twostage", False) and len(self.index):
            # restored rows: certified path from query 1
            self.index.build_sketch(
                dtype=getattr(args, "sketch_dtype", "float32"),
                min_certifiable=getattr(args, "twostage_min_certifiable", 0.5),
                est_k=args.k,
            )
        log.info(
            "engine ready: model=%s dim=%d corpus=%d devices=%d",
            cfg.name,
            cfg.projection_dim,
            len(self.index),
            n_dev,
        )

    # -- construction ---------------------------------------------------------

    def _load_model(self):
        path = self.args.model_weights
        if not os.path.exists(path) and self.args.from_hf:
            # fetch-and-convert at startup (reference does this at build
            # time, clip/build.rs:9-11); degrades with a warning offline
            from image_search_tpu.models.convert import HF_REPOS, convert_hf_model

            ref = self.args.from_hf
            if ref == "auto":
                ref = HF_REPOS.get(self.args.model, self.args.model)
            tok_out = None
            if self.args.tokenizer_dir and not os.path.exists(
                os.path.join(self.args.tokenizer_dir, "vocab.json")
            ):
                tok_out = self.args.tokenizer_dir
            try:
                log.info("--from-hf: converting %s -> %s", ref, path)
                convert_hf_model(ref, path, preset=self.args.model, tokenizer_out=tok_out)
            except Exception as err:
                log.warning("--from-hf %s failed (%s); continuing without", ref, err)
        if os.path.exists(path):
            params, cfg = load_checkpoint(path)
            log.info("loaded checkpoint %s (%s)", path, cfg.name)
            return params, cfg
        cfg = get_config(self.args.model)
        log.warning(
            "checkpoint %s not found — using RANDOM %s weights (demo mode; "
            "searches will not be semantic)",
            path,
            cfg.name,
        )
        from image_search_tpu.models import get_model_module

        return get_model_module(cfg).init_params(jax.random.key(0), cfg), cfg

    def _load_tokenizer(self):
        d = self.args.tokenizer_dir
        if d and os.path.exists(os.path.join(d, "vocab.json")):
            log.info("loaded BPE tokenizer from %s", d)
            return CLIPBPETokenizer.from_dir(d, self.cfg.text.context_length)
        if d:
            log.warning("tokenizer dir %s missing vocab.json", d)
        log.warning("no tokenizer files — using deterministic hash tokenizer")
        return HashTokenizer(
            self.cfg.text.vocab_size,
            self.cfg.text.context_length,
            eos_id=self.cfg.text.eos_token_id,
        )

    # -- path mapping (media/ URL <-> absolute path) ----------------------------

    def to_abs_path(self, media_path: str) -> Optional[str]:
        """'media/x/y.jpg' -> '<media_dir>/x/y.jpg' (search.rs:35-40 remap).
        Rejects non-media/ paths and directory traversal.

        Paths arrive VERBATIM (the reference does no unquoting, and the
        bundled client posts image_path exactly as served) — unquoting here
        would corrupt filenames containing literal %XX sequences."""
        if not media_path.startswith(MEDIA_PREFIX):
            return None
        rel = media_path[len(MEDIA_PREFIX) :]
        abs_path = os.path.normpath(os.path.join(self.media_dir, rel))
        if not abs_path.startswith(os.path.normpath(self.media_dir) + os.sep):
            return None
        return abs_path

    def _abs_candidates(self, media_path: str) -> List[str]:
        """Absolute-path candidates for a client-supplied path: the raw
        string first, then the urldecoded form (a client may echo the
        urlencoded ``id`` field instead of ``image_path``)."""
        out: List[str] = []
        abs_raw = self.to_abs_path(media_path)
        if abs_raw is not None:
            out.append(abs_raw)
        unquoted = urllib.parse.unquote(media_path)
        if unquoted != media_path:
            abs_unq = self.to_abs_path(unquoted)
            if abs_unq is not None and abs_unq not in out:
                out.append(abs_unq)
        return out

    def _resolve_selection(self, media_path: str) -> Optional[str]:
        """Referenced-image path -> indexed absolute path.

        Tries the raw string first; falls back to the urldecoded form only
        when the raw path is unknown to the index."""
        cands = self._abs_candidates(media_path)
        for c in cands:
            if self.index.has_path(c):
                return c
        return cands[0] if cands else None

    def to_media_path(self, abs_path: str) -> str:
        """absolute -> 'media/...' URL (search.rs:93-99 reverse map)."""
        root = os.path.normpath(self.media_dir)
        rel = os.path.relpath(abs_path, root)
        return MEDIA_PREFIX + rel.replace(os.sep, "/")

    # -- operations -------------------------------------------------------------

    def _publish_twostage_gauges(self):
        global_metrics.gauge(
            "twostage_certified_total", float(self.index.twostage_certified)
        )
        global_metrics.gauge(
            "twostage_fallback_total", float(self.index.twostage_fallbacks)
        )
        global_metrics.gauge(
            "twostage_sketch_active", float(self.index.sketch_fresh)
        )
        global_metrics.gauge(
            "twostage_sketch_incremental_total",
            float(self.index.sketch_incremental),
        )
        global_metrics.gauge(
            "twostage_gate_skips_total", float(self.index.twostage_gate_skips)
        )
        if self.index.sketch_certifiable_est is not None:
            global_metrics.gauge(
                "twostage_certifiable_est",
                round(self.index.sketch_certifiable_est, 4),
            )

    def search(
        self, query: str, referenced_images: Sequence[str] = (), k: Optional[int] = None
    ) -> List[dict]:
        """The full ``web_search_text`` flow (search.rs:20-102), fused.

        referenced_images are 'media/...' URLs of marked results; with any
        known ones present the Rocchio-refined fused search runs, else plain
        text search. Delegates to ``search_many`` (a batch of one): single
        HTTP requests without a micro-batcher get the same serving ladder —
        the ONE-program fused path when cold + certified-capable, the
        two-stage batch program, or the padded full-scan feedback program."""
        return self.search_many([query], [referenced_images], k or self.args.k)[0]

    def search_by_image(
        self,
        image_bytes: bytes,
        k: Optional[int] = None,
        referenced_images: Sequence[str] = (),
    ):
        """Query-by-image (POST /search_image): decode the uploaded bytes,
        embed with the vision tower, search the index with the image
        embedding. Beyond the reference, which can only query by text or by
        marking prior results — here any photo can BE the query. Rides the
        certified two-stage path when enabled, like text queries.

        ``referenced_images`` (marked results, same resolution rules as
        /search) runs the Rocchio-refined fused search with the image
        embedding in the text embedding's role — feedback rounds work
        uniformly for both query types.

        Raises ValueError on undecodable bytes (the handler maps it to 400).
        """
        from image_search_tpu.ingest.decode import decode_image_bytes

        k = k or self.args.k
        arr = decode_image_bytes(image_bytes)
        if arr is None:
            raise ValueError("could not decode query image")
        with global_metrics.timer("image_embed"):
            # B=1 bucket (min_bucket=1), one real row kept ON DEVICE (the
            # search dispatch chains on it without a host round-trip).
            # Padding to the ingest bucket floor of 8 shipped 8x the
            # pixels+resize-matrix bytes host->device — measured as the
            # entire 682 ms query-by-image latency on the tunneled
            # backend (latency_decomp round 5)
            emb = self.embedder.embed_images_async([arr], min_bucket=1)[:1]
        selected = [
            p for p in (self._resolve_selection(m) for m in referenced_images)
            if p is not None
        ]
        approx = self.args.search_approx
        use_twostage = (
            getattr(self.args, "search_twostage", False)
            and not approx
            and self.index.sketch_fresh
        )
        with global_metrics.timer("index_search"):
            if selected and use_twostage:
                scores, idx = self.index.search_twostage_feedback_batch(
                    emb, [selected], k
                )
                self._publish_twostage_gauges()
            elif selected:
                scores, idx = self.index.search_with_feedback(
                    emb, selected, k, approx=approx
                )
            elif use_twostage:
                scores, idx = self.index.search_twostage(emb, k)
                self._publish_twostage_gauges()
            else:
                scores, idx = self.index.search(emb, k, approx=approx)
        global_metrics.inc("searches")
        global_metrics.inc("image_searches")
        if selected:
            global_metrics.inc("searches_with_feedback")
        return self._format_results(scores, idx)

    def search_many(
        self,
        queries: Sequence[str],
        selections: Optional[Sequence[Sequence[str]]] = None,
        k: Optional[int] = None,
    ):
        """Coalesced multi-query search: ONE text-tower batch + ONE fused
        index program for B concurrent requests (the micro-batching path
        behind --batch-window-ms). ``selections`` carries each request's
        referenced_images ('media/...' URLs); plain and Rocchio-feedback
        searches coalesce into the same batched program (the reference
        serializes these on its DB mutex, search.rs:26). Returns a list of
        result lists in request order."""
        k = k or self.args.k
        queries = list(queries)
        sel_lists = [
            [p for p in (self._resolve_selection(m) for m in sel) if p is not None]
            for sel in (selections or [()] * len(queries))
        ]
        n_feedback = sum(1 for s in sel_lists if s)
        # reuse the text cache (the feedback round re-sends the same q);
        # snapshot hits locally — a concurrent search could evict entries
        # between our insert and the stack below
        local = {}
        for q in queries:
            hit = self._cache_get(q)
            if hit is not None:
                local[q] = hit
        misses = [q for q in queries if q not in local]
        if (
            not local
            and not self.args.search_approx
            and getattr(self.args, "search_twostage", False)
            and self.index.sketch_fresh
            and self.index.mesh is None
            and len(queries) <= getattr(self.args, "twostage_max_batch", 4)
            and self.embedder.tokenizer is not None
        ):
            # all-cold certified batch: the whole path (tokens -> text
            # tower -> Rocchio -> two-stage bound+rescore) is ONE dispatched
            # XLA program (round-3 verdict #1) — no tower->search dispatch
            # hop. Returns None when the fused path can't serve (e.g. the
            # sketch went stale between the check and the snapshot) — then
            # the classic two-program path below answers.
            out = self._search_many_fused(queries, sel_lists, k)
            if out is not None:
                self._inc_search_metrics(len(queries), n_feedback)
                return out
        if misses:
            with global_metrics.timer("text_embed"):
                # device arrays, NOT fetched: the search dispatch below
                # chains on them without a host round-trip
                embs = self.embedder.embed_texts_device(misses)
            for b, q in enumerate(misses):
                local[q] = embs[b]
                self._cache_put(q, embs[b])
        global_metrics.inc("text_embed_cache_hits", len(queries) - len(misses))
        import jax.numpy as _jnp

        q_mat = _jnp.stack([_jnp.asarray(local[q]) for q in queries])
        use_twostage = (
            not self.args.search_approx
            and getattr(self.args, "search_twostage", False)
            and self.index.sketch_fresh
            # big coalesced batches go straight to the full scan, whose one
            # read amortizes across the batch. The union selection keeps
            # distinct batches certified through B=8 for BOTH sketch dtypes
            # with the dtype-aware per-query floor (index.py: f32 c/4, bf16
            # c/2 — measured at 10M in twostage_bf16_batch.json: bf16 B=2
            # 9.99 ms / B=4 12.18 / B=8 16.97 vs full scans 15.05/16.02/
            # 17.14, all bitwise-equal). The default max-batch stays 4:
            # at B=8 the two-stage win is a wash vs the amortized full scan
            and len(queries) <= getattr(self.args, "twostage_max_batch", 4)
        )
        with global_metrics.timer("index_search"):
            if use_twostage:
                # fresh sketch: the whole micro-batch — plain AND feedback
                # — rides the certified two-stage path (the Rocchio query
                # is just another query vector; empty selections degrade to
                # the plain search bitwise). Padding to the {8,16,32}
                # bucket family happens inside, by REPEATING query 0 —
                # zero-padding would fail the certificate by construction.
                # Buckets incl. the fallback program are precompiled by
                # warm_serving_buckets.
                scores, idx = self.index.search_twostage_feedback_batch(
                    q_mat, sel_lists, k
                )
                self._publish_twostage_gauges()
            else:
                # otherwise ALWAYS the batched feedback program, even for
                # all-plain batches: an empty selection degrades to the
                # plain search bitwise (_feedback_search_local), and
                # index.search would run at the UNPADDED arrival count B —
                # every distinct B compiles a fresh XLA program, which
                # showed up as multi-second p99 stalls in the first
                # 32-client load-test rung (benchmarks/RESULTS.md). One
                # padded program family serves both.
                scores, idx = self.index.search_with_feedback_batch(
                    q_mat, sel_lists, k, approx=self.args.search_approx
                )
        self._inc_search_metrics(len(queries), n_feedback)
        return [self._format_results(scores[b], idx[b]) for b in range(len(queries))]

    def _inc_search_metrics(self, n_queries: int, n_feedback: int) -> None:
        global_metrics.inc("searches", n_queries)
        global_metrics.inc("searches_with_feedback", n_feedback)
        if n_queries > 1:  # only true coalescing counts
            global_metrics.inc("batched_searches", n_queries)
            if n_feedback:
                global_metrics.inc("batched_feedback_searches", n_feedback)

    def _search_many_fused(self, queries, sel_lists, k):
        """One-program serving path (verdict #1): tokenize on host
        (~0.02 ms), then token ids -> text tower -> Rocchio -> certified
        two-stage as a single dispatched XLA program
        (index.search_twostage_fused_tokens). Returns formatted results,
        or None when the fused path cannot serve (caller falls back to
        the classic tower+search pair). Certificate failures run the
        full-scan feedback program on the embeddings the fused program
        already computed — the tower is never re-run."""
        B = len(queries)
        ids = self.embedder.tokenizer(list(queries))
        # pow2 bucket from 1: the lone-request B=1 program is ~9 ms
        # cheaper at 10M than padding to 8 (selection work scales with
        # Bpad, latency_decomp round 4); the family {1,2,4,...} up to
        # twostage-max-batch is precompiled by warm_serving_buckets
        Bpad = 1 << (B - 1).bit_length() if B > 1 else 1
        if Bpad > B:
            # pad by REPEATING query 0: an EOS-only pad row would be a
            # distinct query and claim union-budget share (index method doc)
            ids = np.concatenate([ids, np.repeat(ids[:1], Bpad - B, axis=0)])
        with global_metrics.timer("index_search"):
            scores, idx, text = self.index.search_twostage_fused_tokens(
                self.embedder.encode_text_fn,
                self.embedder.params,
                ids,
                sel_lists,
                k,
            )
        if text is not None:
            for b, q in enumerate(queries):
                self._cache_put(q, text[b])
        if scores is None:
            if text is None:
                return None  # fused path unavailable: classic path serves
            with global_metrics.timer("index_search"):
                scores, idx = self.index.search_with_feedback_batch(
                    text[:B], sel_lists, k
                )
        self._publish_twostage_gauges()
        global_metrics.inc("fused_searches", B)
        return [self._format_results(scores[b], idx[b]) for b in range(B)]

    def warm_serving_buckets(self, max_batch: int = 32) -> int:
        """Precompile the serving program family so no XLA compile lands
        inside a live request.

        The batcher's searches hit exactly one program per (text-tower
        bucket, index Bpad bucket) pair; both bucket ladders are
        {8, 16, 32, ...} capped at ``max_batch``. Without this, the FIRST
        request at each new arrival count pays a multi-second remote
        compile — measured as 3.2 s p99 stalls in the first 32-client
        load-test rung (benchmarks/RESULTS.md). Returns the number of
        buckets warmed; publishes the ``serving_warmup_done`` gauge."""
        if len(self.index) == 0:
            global_metrics.gauge("serving_warmup_done", 1.0)
            return 0
        sizes, b = [], 8
        while True:
            sizes.append(min(b, max_batch))
            if b >= max_batch:
                break
            b *= 2
        for n in sizes:
            # direct embedder call: bypasses the text cache entirely, so
            # warmup leaves no cache entries behind
            self.embedder.embed_texts_device([f"\0warm{n}_{i}" for i in range(n)])
            self.index.search_with_feedback_batch(
                np.zeros((n, self.cfg.projection_dim), np.float32),
                [[] for _ in range(n)],
                self.args.k,
                approx=self.args.search_approx,
            )
        if getattr(self.args, "search_twostage", False) and self.index.sketch_fresh:
            # warm the batched two-stage programs (the unified
            # plain+feedback entry: rocchio gather + bound pass) at the
            # share ladder serving can actually hit: real arrival counts
            # are 1..twostage_max_batch (search_many routes bigger batches
            # to the full scan), each padded to the Bpad=8 bucket inside,
            # with the union budget split by the pow2-rounded REAL count —
            # so the program family is (Bpad=8, share in {1,2,4,...}).
            # On a corpus larger than the candidate budget the zero
            # query's certificate fails by construction, which also
            # compiles the full-scan fallback at this bucket size (tiny
            # corpora certify trivially — every row is a candidate).
            # count_failures=False: by-construction failures say nothing
            # about the corpus spectrum — they must not trip (or be wiped
            # from) the adaptive-disable counter
            tmb = max(1, getattr(self.args, "twostage_max_batch", 4))
            r = 1
            while True:
                self.index.search_twostage_feedback_batch(
                    np.zeros((r, self.cfg.projection_dim), np.float32),
                    [[] for _ in range(r)],
                    self.args.k,
                    count_failures=False,
                )
                if self.embedder.tokenizer is not None and self.mesh is None:
                    # the fused one-program family serves cold arrivals at
                    # Bpad in {1,2,4,...} (engine._search_many_fused) —
                    # compile those too, or the first cold request per
                    # bucket pays the biggest compile of all (tower +
                    # bound + rescore in one program)
                    ids = self.embedder.tokenizer([f"\0warm_fused_{i}" for i in range(r)])
                    self.index.search_twostage_fused_tokens(
                        self.embedder.encode_text_fn,
                        self.embedder.params,
                        ids,
                        [[] for _ in range(r)],
                        self.args.k,
                        count_failures=False,
                    )
                if r >= tmb:
                    break
                r *= 2
        # search_by_image runs outside the batcher at B=1 — warm its index
        # program and the vision tower's smallest batch bucket (source-size
        # buckets beyond the warmed one still compile on first use)
        zq = np.zeros((1, self.cfg.projection_dim), np.float32)
        if getattr(self.args, "search_twostage", False) and self.index.sketch_fresh:
            self.index.search_twostage(zq, self.args.k, count_failures=False)
        else:
            self.index.search(zq, self.args.k, approx=self.args.search_approx)
        # the query path embeds at B=1 (min_bucket=1) — warm that program,
        # not just the B=8 ingest bucket. _DRAFT_TARGET-decoded uploads
        # land in small source buckets; 256x256 covers the common case
        # (other source sizes compile on first use, as before)
        self.embedder.embed_images_async(
            [np.zeros((256, 256, 3), np.uint8)], min_bucket=1
        ).block_until_ready()
        self.embedder.embed_images([np.zeros((512, 512, 3), np.uint8)])
        global_metrics.gauge("serving_warmup_done", 1.0)
        log.info("serving warmup: %d batch buckets compiled", len(sizes))
        return len(sizes)

    def _wire_row(self, row: int) -> dict:
        """Memoized ``{"id", "image_path"}`` template for an index row
        (id = urlencoded path, data/src/lib.rs:19-26). Built ONCE per
        RETURNED row instead of relpath+urlencode for k=1000 rows on every
        request (round-2 review: formatting dominated host-side latency).
        Sparse on purpose: eagerly filling the whole corpus would stall the
        first request for tens of seconds at 10M rows and pin GBs for rows
        no query ever returns. ``index.paths`` rows are append-only
        (tombstones mask in place; compaction is offline), so memoized
        entries never go stale; racing threads write identical values.
        Bounded: at ~400 B/entry an uncapped memo approaches corpus size
        (GBs at 10M rows) under long-lived diverse traffic — when full it
        is simply cleared (entries are pure recomputable templates)."""
        d = self._wire_cache.get(row)
        if d is None:
            media = self.to_media_path(self.index.paths[row])
            d = {"id": urllib.parse.quote(media, safe=""), "image_path": media}
            if len(self._wire_cache) >= self.WIRE_CACHE_MAX:
                self._wire_cache.clear()
            self._wire_cache[row] = d
        return d

    def render_images_json(self, images) -> bytes:
        """``{"images": [...]}`` response body, byte-identical to
        ``json.dumps`` but ~10x cheaper at k=1000: the id/path escaping
        (the bulk of the 1.78 ms/request serialize measured at 10M,
        round-3 verdict #1) is memoized per row id — only the score repr
        is formatted per request. Fragment entries are pure recomputable
        templates with the same lifecycle as ``_wire_cache`` (append-only
        rows, cleared wholesale when full)."""
        import json as _json

        cache = self._frag_cache
        parts = []
        ap = parts.append
        get = cache.get
        for d in images:
            i = d["id"]
            frag = get(i)
            if frag is None:
                frag = _json.dumps({"id": i, "image_path": d["image_path"]})[:-1]
                if len(cache) >= self.WIRE_CACHE_MAX:
                    cache.clear()
                cache[i] = frag
            # measured floor: repr() of 1000 shortest-roundtrip doubles is
            # ~0.69 ms of the ~0.72 total — the strings around it are free
            ap(f'{frag}, "score": {d["score"]!r}}}')
        return ('{"images": [%s]}' % ", ".join(parts)).encode()

    def _format_results(self, scores_row, idx_row):
        idx_np = np.asarray(idx_row).reshape(-1)
        sc_np = np.asarray(scores_row).reshape(-1)
        # sentinel rows: k exceeded the live corpus (tombstoned or padded
        # rows carry NEG_INF-class scores) — never surface
        keep = sc_np > NEG_INF / 2
        out = []
        for row, score in zip(idx_np[keep], sc_np[keep]):
            d = dict(self._wire_row(int(row)))
            d["score"] = float(score)
            out.append(d)
        return out

    # Text-tower output cached per query string (LRU): feedback rounds
    # repeat the same q (the reference re-embeds it every round,
    # search.rs:27). Eviction is least-recently-USED — dict order is
    # insertion order and hits reinsert, so next(iter(...)) is the LRU
    # entry; hot repeated queries survive sustained mixed load.
    _TEXT_CACHE_CAP = 512

    def _cache_get(self, query: str) -> Optional[np.ndarray]:
        with self._text_lock:
            hit = self._text_cache.pop(query, None)
            if hit is not None:
                self._text_cache[query] = hit  # reinsert: LRU refresh
        return hit

    def _cache_put(self, query: str, emb: np.ndarray) -> None:
        with self._text_lock:
            if len(self._text_cache) >= self._TEXT_CACHE_CAP:
                self._text_cache.pop(next(iter(self._text_cache)), None)
            self._text_cache[query] = emb

    def _cached_text_embed(self, query: str) -> np.ndarray:
        hit = self._cache_get(query)
        if hit is not None:
            global_metrics.inc("text_embed_cache_hits")
            return hit
        with global_metrics.timer("text_embed"):
            # un-fetched device value: index.search chains on it directly,
            # so a cache-miss query costs ONE host<->device round-trip
            # (results fetch), not two
            emb = self.embedder.embed_texts_device([query])[0]
        self._cache_put(query, emb)
        return emb

    # above this corpus size, duplicate scans default to approx_max_k
    # candidates (recall ~0.95 per query side; near-dups score far above
    # typical neighbors, so group recall stays high) — an exact 10M
    # self-scan is ~10k batched searches and minutes of device time
    DUPLICATES_APPROX_ABOVE = 1_000_000
    # above this corpus size the sketch-pruned COMPLETE pair scan
    # (index/dupscan.py) is attempted first: certified-exact pairs in
    # minutes at 10M where the legacy per-row scan takes hours. Below it
    # the legacy scan is already fast and not worth a sketch build.
    DUPLICATES_SKETCH_ABOVE = 200_000

    def find_duplicate_groups(self, threshold: float = 0.95, approx: Optional[bool] = None):
        """Near-duplicate photo groups (cosine >= threshold), as lists of
        'media/...' paths sorted largest-group first. Union-find over the
        index's self-scan; a capability the reference's out-of-process
        approximate index cannot offer at all.

        Route: corpora over :data:`DUPLICATES_SKETCH_ABOVE` rows (or with
        a fresh sketch already resident) first try the sketch-pruned
        complete pair scan — exact, un-truncated, and the only route that
        scales to 10M (round-3 verdict #2). On bailout (flat corpus, no
        certifiable sketch, sharded index) the legacy batched self-scan
        runs; ``approx`` then defaults to exact below
        :data:`DUPLICATES_APPROX_ABOVE` rows and approximate above.

        Publishes ``duplicate_scan_progress`` (0..1) to /metrics while
        running, so the async /duplicates job is observable."""
        if approx is None:
            approx = len(self.index) > self.DUPLICATES_APPROX_ABOVE

        def _progress(done: int, total: int) -> None:
            global_metrics.gauge(
                "duplicate_scan_progress", round(done / max(total, 1), 4)
            )

        _progress(0, 1)
        with global_metrics.timer("duplicate_scan"):
            pairs, mode = self._duplicate_pairs(threshold, approx, _progress)
        # surfaced by /duplicates responses: 'certified' pair sets are
        # provably complete; 'approximate'/'legacy_approx' may miss pairs
        # (never emit false ones — every mode rescores in exact f32)
        self.last_duplicate_mode = mode
        global_metrics.gauge(
            "duplicate_scan_certified",
            1.0 if mode in ("certified", "legacy_exact") else 0.0,
        )
        _progress(1, 1)
        parent: dict = {}

        def find(x):
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for i, j, _ in pairs:
            ri, rj = find(i), find(j)
            if ri != rj:
                parent[ri] = rj
        groups: dict = {}
        for i, j, _ in pairs:
            groups.setdefault(find(i), set()).update((i, j))
        out = [
            sorted(self.to_media_path(self.index.paths[r]) for r in members)
            for members in groups.values()
        ]
        out.sort(key=len, reverse=True)
        global_metrics.inc("duplicate_scans")
        return out

    def _duplicate_pairs(self, threshold: float, approx: bool, progress):
        """Sketch-pruned complete scan when it can serve; on bailout at
        scales where the legacy scan is hours, the NON-certified
        sketch-candidate scan (round-4 verdict #3); legacy otherwise.
        Returns (pairs, mode) with mode in {'certified', 'approximate',
        'legacy_exact', 'legacy_approx'}."""
        from image_search_tpu.index.dupscan import DupScanBailout

        try_sketch = self.index.mesh is None and (
            self.index.sketch_fresh
            or len(self.index) > self.DUPLICATES_SKETCH_ABOVE
        )
        if try_sketch:
            if not self.index.sketch_fresh:
                # same build the two-stage search path uses; the
                # certifiability gate may refuse publication (flat corpus)
                # in which case find_near_duplicates_sketch bails out below
                self.index.build_sketch(
                    dtype=getattr(self.args, "sketch_dtype", "float32"),
                    min_certifiable=getattr(
                        self.args, "twostage_min_certifiable", 0.5
                    ),
                )
            try:
                pairs = self.index.find_near_duplicates_sketch(
                    threshold=threshold, progress=progress
                )
                global_metrics.gauge("duplicate_scan_sketch", 1.0)
                return pairs, "certified"
            except DupScanBailout as e:
                log.info("sketch duplicate scan bailed out (%s)", e)
            # middle path: flat corpus at a scale where the legacy scan
            # degenerates to hours — top-c sketch candidates per block,
            # exact rescore, explicitly surfaced as approximate
            if len(self.index) > self.DUPLICATES_APPROX_ABOVE:
                built_ungated = False
                try:
                    if not self.index.sketch_fresh:
                        self.index.build_sketch(
                            dtype=getattr(self.args, "sketch_dtype", "float32"),
                            min_certifiable=0.0,
                        )
                        built_ungated = True
                    pairs = self.index.find_near_duplicates_candidates(
                        threshold=threshold, progress=progress
                    )
                    global_metrics.gauge("duplicate_scan_sketch", 1.0)
                    return pairs, "approximate"
                except DupScanBailout as e:
                    log.info("candidate duplicate scan bailed out (%s); legacy", e)
                finally:
                    if built_ungated:
                        # the gate refused this sketch for SEARCH; don't
                        # leave it published now that the scan is done
                        self.index.drop_sketch()
        global_metrics.gauge("duplicate_scan_sketch", 0.0)
        pairs = self.index.find_near_duplicates(
            threshold=threshold, approx=approx, progress=progress
        )
        return pairs, ("legacy_approx" if approx else "legacy_exact")

    def remove_images(self, media_paths) -> int:
        """Explicit durable deletion (POST /remove): tombstone + EXCLUDE, so
        a rescan does not resurrect the photos while their files remain on
        disk. Returns rows removed."""
        resolved = [
            p
            for p in (self._resolve_selection(m) for m in media_paths)
            if p is not None
        ]
        n, removed = self.index.remove_paths_report(resolved, exclude=True)
        # only the rows actually tombstoned become exclusions — NOT request
        # duplicates or paths the store never held
        self._excluded.update(removed)
        if n:
            global_metrics.inc("removed_images", n)
        # an already-pruned path (file vanished — it may reappear on disk
        # later) has no live row, so remove_paths is a no-op on it — still
        # honor the user's explicit deletion by recording an exclusion so a
        # rescan can never resurrect it, EVEN if the file is absent right
        # now (filtering on os.path.exists alone would silently drop the
        # exclusion exactly in the vanished-then-restored case). But do not
        # let never-indexed garbage paths pollute the exclusion set: accept
        # a rowless path only if the file exists on disk, or the index/store
        # remembers actually deleting it (in-process tombstone set; the
        # store's log covers prune-then-restart).
        gone = set(removed)
        candidates = [
            p
            for p in dict.fromkeys(resolved)
            if p not in gone and p not in self._excluded
        ]
        tombstoned: set = set()
        if any(not os.path.exists(p) for p in candidates):
            store = self.index.store
            tombstoned = store.tombstoned_paths() if store is not None else set()
        leftovers = [
            p
            for p in candidates
            if os.path.exists(p)
            or self.index.was_removed(p)
            or p in tombstoned
        ]
        if leftovers:
            self._excluded.update(leftovers)
            if self.index.store is not None:
                self.index.store.exclude_paths(leftovers)
        return n

    def restore_images(self, media_paths) -> int:
        """Undo POST /remove exclusions: the next scan re-embeds the files
        (they must still exist on disk). Accepts either the ``image_path``
        or the urlencoded ``id`` form, like /remove. Returns exclusions
        cleared."""
        if self.index.store is None:
            return 0
        excluded = self.index.store.excluded_paths()
        resolved = []
        for m in media_paths:
            cands = self._abs_candidates(m)
            # prefer the candidate that is actually excluded (has_path is
            # useless here — removed paths are no longer in the index)
            pick = next((c for c in cands if c in excluded), cands[0] if cands else None)
            if pick is not None:
                resolved.append(pick)
        if not resolved:
            return 0
        n = self.index.store.clear_exclusion(resolved)
        for p in resolved:
            self._excluded.discard(p)
        return n

    def prune_missing(self) -> int:
        """Tombstone indexed images whose files no longer exist on disk —
        capability the reference lacks entirely (a deleted photo keeps
        surfacing in its results forever; here `--prune-on-scan` folds
        cleanup into the rescan the user already triggers).

        Uses ONE directory walk (readdir-bound) instead of stat-ing every
        indexed path, and refuses to prune when the media tree looks
        unavailable — a down NAS mount must not durably tombstone the
        whole corpus."""
        from image_search_tpu.ingest.walk import iter_images

        live = self.index.live_paths()
        if not live:
            return 0
        if not os.path.isdir(self.media_dir):
            log.warning(
                "prune skipped: media dir %s is missing/unmounted", self.media_dir
            )
            return 0
        found = set(iter_images(self.media_dir))
        if not found:
            log.warning(
                "prune skipped: media dir %s yielded ZERO images while the "
                "index holds %d — treating as unavailable, not emptied",
                self.media_dir, len(live),
            )
            return 0
        missing = [p for p in live if p not in found]
        n = self.index.remove_paths(missing) if missing else 0
        if n:
            global_metrics.inc("pruned_missing", n)
            log.info("pruned %d missing images from the index", n)
        return n

    def scan(self) -> ScanStats:
        """The ``GET /scan`` ingest (search.rs:104-126 -> clip.rs:42-151).

        Multi-host: with a PROCESS-LOCAL index each process partitions the
        walk and runs the plain pipeline independently. With a globally
        sharded index every process must issue identical jit programs
        (SPMD), so the partitioned-decode SPMD scan runs instead — hosts
        decode disjoint subsets, exchange decode masks + embeddings, and
        apply identical merged index adds (round 2 had every host decode
        the FULL corpus here)."""
        multi = jax.process_count() > 1
        partition = multi and self.mesh is None
        spmd = multi and self.mesh is not None
        with global_metrics.timer("scan"):
            if spmd:
                from image_search_tpu.ingest.pipeline import scan_directory_spmd

                stats = scan_directory_spmd(
                    self.embedder,
                    self.index,
                    self.media_dir,
                    chunk_size=self.args.chunk_size,
                    decode_workers=self.args.decode_workers,
                    process_index=jax.process_index(),
                    process_count=jax.process_count(),
                    skip_paths=self._excluded,
                    thumb_cache=self.thumb_cache,
                )
            else:
                stats = scan_directory(
                    self.embedder,
                    self.index,
                    self.media_dir,
                    chunk_size=self.args.chunk_size,
                    decode_workers=self.args.decode_workers,
                    process_index=jax.process_index() if partition else 0,
                    process_count=jax.process_count() if partition else 1,
                    skip_paths=self._excluded,
                    thumb_cache=self.thumb_cache,
                )
        if getattr(self.args, "prune_on_scan", False):
            stats.pruned = self.prune_missing()
        if getattr(self.args, "search_twostage", False) and stats.embedded:
            # appends invalidated the sketch; rebuild so queries stay on
            # the certified fast path (one streaming pass per slab)
            with global_metrics.timer("sketch_build"):
                self.index.build_sketch(
                    dtype=getattr(self.args, "sketch_dtype", "float32"),
                    min_certifiable=getattr(
                        self.args, "twostage_min_certifiable", 0.5
                    ),
                    est_k=self.args.k,
                )
        global_metrics.inc("scans")
        global_metrics.inc("images_embedded", stats.embedded)
        global_metrics.inc("decode_failures", stats.decode_failures)
        global_metrics.gauge("corpus_size", float(len(self.index)))
        global_metrics.gauge("last_scan_images_per_sec", round(stats.images_per_sec, 2))
        return stats

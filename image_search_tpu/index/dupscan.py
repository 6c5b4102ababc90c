"""Sketch-accelerated near-duplicate scan: all pairs >= threshold, certified.

The legacy scan (`VectorIndex.find_near_duplicates`) self-queries every
row: O(N) fused top-k searches, each an O(N) slab sweep — measured 97-165 s
at 1M rows (benchmarks/dup_scan_1m.json) and ~hours extrapolated at 10M.
This module replaces the N^2 full-dimension sweep with the two-stage
sketch's pair bound (round-3 verdict item #2):

  phase 1 — block prune (ops/blockmax.py, Pallas): every row's sketch is
    AUGMENTED with its residual norm as a 65th coordinate, a_i = [s_i,
    t_i], so the per-pair Cauchy-Schwarz bound r_i.r_j <= s_i.s_j +
    t_i*t_j is one MXU dot a_i.a_j. For every pair of 128-row blocks the
    kernel takes the blockwise max of that product and thresholds at
    (threshold - pair_slack): cleared block pairs PROVABLY contain no
    qualifying pair. The sweep reads augmented sketches only (130 B/row
    vs 768 B) and writes packed bitmasks — minutes of MXU time at 10M
    rows instead of hours.

  phase 2 — exact rescore: surviving block pairs (always including the
    nb diagonal blocks — a block's self-bound is ~1) are gathered from
    the slab and rescored with a HIGHEST-precision f32 dot; pairs
    scoring >= threshold are emitted as (i, j, score), i < j, each once.

Guarantee: with rows r (the dequantized stored vectors the legacy scan
also scores), every pair with true dot >= threshold + ~2e-4 is emitted
and none below threshold - ~2e-4 (slack bounds: module docstrings here
and in ops/blockmax.py). Unlike the legacy scan the output is NOT
truncated to a per-row neighbor count — it is the complete pair set.

Worst case: on spectrally flat corpora residual products alone exceed
dup thresholds, nothing prunes, and the rescore would degenerate to an
exact N^2 — ``DupScanBailout`` fires when surviving block pairs exceed
``max_rescore_frac`` of all block pairs, and the caller falls back to
the legacy scan (engine.find_duplicate_groups). Correctness never
depends on the corpus; only the speedup does.

No reference counterpart: SurrealDB's MTREE (search.rs:70-77) cannot
self-join; /duplicates is an extension endpoint.
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from image_search_tpu.index.twostage import SLACK, SketchState
from image_search_tpu.ops.blockmax import (
    BLOCK,
    COLS_TILE,
    COLS_TILE_V,
    ROWS_TILE,
    blockpair_mask,
    blockpair_values,
)

NEG_INF = float(jnp.finfo(jnp.float32).min)
HIGHEST = jax.lax.Precision.HIGHEST

# rows per phase-1 kernel call: amortizes re-reading the full sketch
# array (col side) per call — HBM col traffic is (N / ROWS_PER_CALL) * N *
# 128 B. 262144 keeps the row tile at 32 MB VMEM-side slices and ~38
# calls at 10M. Must be a multiple of both ROWS_TILE and COLS_TILE.
ROWS_PER_CALL = 262_144
assert ROWS_PER_CALL % ROWS_TILE == 0 and ROWS_PER_CALL % COLS_TILE == 0


class DupScanBailout(RuntimeError):
    """Sketch bound prunes too little on this corpus — use the legacy scan."""


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


@jax.jit
def _prep_slab(sketch, resid, pen, start, size):
    """Augment the slab's sketches with their residual norms (so the
    kernel's dot IS the per-pair UB, blockmax.py module doc) and zero the
    rows that must never produce a pair: tombstoned (pen == NEG_INF) and
    beyond the live size. Returns (bf16 augmented sketch [n, d_s+1],
    max ||a - bf16(a)|| over kept rows)."""
    n = sketch.shape[0]
    live = (jax.lax.broadcasted_iota(jnp.int32, (n,), 0) + start) < size
    if pen is not None:
        live = live & (pen >= 0.0)
    a32 = jnp.concatenate(
        [sketch.astype(jnp.float32), resid.astype(jnp.float32)[:, None]],
        axis=1,
    )
    a32 = jnp.where(live[:, None], a32, 0.0)
    a16 = a32.astype(jnp.bfloat16)
    delta = jnp.sqrt(jnp.sum((a32 - a16.astype(jnp.float32)) ** 2, axis=1))
    return a16, jnp.max(delta)


def _pair_slack(max_delta: float) -> float:
    """Additive UB inflation covering both operands' bf16 rounding plus
    f32 accumulation error: |a_i.a_j - bf16dot(a~_i, a~_j)| <=
    delta_i ||a_j|| + delta_j ||a~_i|| <= 2 * 1.01 * max_delta (augmented
    norms = sqrt(||s||^2 + t^2) = ||r|| <= 1 + 2^-8), and gamma_65
    accumulation < SLACK."""
    return 2.0 * 1.01 * float(max_delta) + SLACK


def _decode_words(words: np.ndarray, row_block0: int):
    """Packed int32 [rb, W] -> (bi, bj) int64 arrays (bit layout:
    ops/blockmax.py module docstring)."""
    rloc, wc = np.nonzero(words)
    if len(rloc) == 0:
        return (np.empty(0, np.int64),) * 2
    w = words[rloc, wc].astype(np.uint32)[:, None]
    bits = (w >> np.arange(32, dtype=np.uint32)[None, :]) & 1
    sel = bits.astype(bool)
    bi = np.broadcast_to((rloc + row_block0)[:, None], sel.shape)[sel]
    bj = (wc[:, None] * 32 + np.arange(32)[None, :])[sel]
    return bi.astype(np.int64), bj.astype(np.int64)


def _rescore_chunk_fn(slabs, scales, pens, size, bi, bj, cap: int):
    """PB surviving block pairs -> (top-cap masked scores, flat indices,
    count >= thr is computed by the CALLER from the returned values)."""
    from image_search_tpu.index.index import _gather_1d, _gather_rows
    from image_search_tpu.ops.topk import exact_topk

    pb = bi.shape[0]
    ar = jnp.arange(BLOCK, dtype=jnp.int32)[None, :]
    gi = bi[:, None] * BLOCK + ar            # [PB, 128] global row ids
    gj = bj[:, None] * BLOCK + ar
    a = _gather_rows(slabs, scales, gi.reshape(-1)).reshape(pb, BLOCK, -1)
    b = _gather_rows(slabs, scales, gj.reshape(-1)).reshape(pb, BLOCK, -1)
    # HIGHEST: the emitted score must match the true f32 dot to ~1e-5 so
    # the module-level guarantee band stays ~2e-4 (TPU DEFAULT would cast
    # operands to bf16: ~4e-3 error, 20x the band)
    sc = jnp.einsum("pid,pjd->pij", a, b, precision=HIGHEST)
    vi = (gi >= 0) & (gi < size)
    vj = (gj >= 0) & (gj < size)
    if pens is not None:
        vi = vi & (_gather_1d(pens, gi.reshape(-1)).reshape(pb, BLOCK) >= 0)
        vj = vj & (_gather_1d(pens, gj.reshape(-1)).reshape(pb, BLOCK) >= 0)
    keep = (
        vi[:, :, None]
        & vj[:, None, :]
        & (gi[:, :, None] < gj[:, None, :])  # i < j once, kills self-pairs
    )
    sc = jnp.where(keep, sc, NEG_INF)
    vals, idx = exact_topk(sc.reshape(1, -1), cap)
    return vals[0], idx[0]


_rescore_chunk = jax.jit(_rescore_chunk_fn, static_argnames=("cap",))


def sketch_duplicate_pairs(
    slabs: Sequence[jax.Array],
    scales: Optional[Sequence[jax.Array]],
    pens: Optional[Sequence[jax.Array]],
    size: int,
    sketch: SketchState,
    threshold: float,
    *,
    progress: Optional[Callable[[int, int], None]] = None,
    rows_per_call: int = ROWS_PER_CALL,
    # 256 block pairs/chunk: the rescore gather materializes a
    # [chunk*128, D] f32 temp PER SLAB PER SIDE (_gather_rows sweeps every
    # slab) — 1024 pairs x 10 slabs OOM'd a 16 GB chip at 10M rows with
    # the corpus resident (measured, dup_scan_10m round 4)
    chunk_pairs: int = 256,
    cap: int = 32768,
    max_rescore_frac: float = 0.01,
    interpret: Optional[bool] = None,
) -> List[Tuple[int, int, float]]:
    """Complete (i, j, score) pair list with score >= threshold, i < j.

    ``sketch`` must cover exactly the live corpus (``built_rows ==
    size``); the index wrapper enforces that. Raises
    :class:`DupScanBailout` when the bound prunes too little (flat
    corpus) — callers fall back to the legacy scan."""
    if interpret is None:
        interpret = _interpret_default()
    cap = max(cap, BLOCK * BLOCK)  # a 1-pair chunk can never overflow
    s_all, n_pad, slack, nb_real, rows_per_call = _prep_sketch(
        pens, size, sketch, rows_per_call
    )
    # padded/zeroed rows rely on their UB of 0 falling below the compare
    # point — thresholds at or under the slack (~0.013) are not duplicate
    # territory anyway, so refuse rather than emit garbage
    if threshold - slack <= 0.0:
        raise DupScanBailout(
            f"threshold {threshold} <= pair slack {slack:.4f}; use the legacy scan"
        )
    n_calls = n_pad // rows_per_call
    total_block_pairs = nb_real * (nb_real + 1) // 2
    budget = max(int(max_rescore_frac * total_block_pairs), 4 * nb_real)

    def _prog(frac: float) -> None:
        if progress is not None:
            progress(int(frac * 1000), 1000)

    # ---- phase 1: block-pair sweep, two-deep dispatch pipeline ---------
    thr_dev = jnp.asarray(threshold - slack, jnp.float32)
    pend: List[Tuple[int, jax.Array]] = []
    all_bi: List[np.ndarray] = []
    all_bj: List[np.ndarray] = []
    survivors = 0

    def _drain(entry):
        nonlocal survivors
        r0, fut = entry
        bi, bj = _decode_words(np.asarray(fut), r0 // BLOCK)
        # padded col blocks carry zero sketches (never set); row blocks
        # past nb_real likewise — no masking needed beyond the decode
        all_bi.append(bi)
        all_bj.append(bj)
        survivors += len(bi)
        if survivors > budget:
            raise DupScanBailout(
                f"{survivors} surviving block pairs > budget {budget} "
                f"(max_rescore_frac={max_rescore_frac}); corpus too flat "
                f"for the sketch bound at threshold {threshold}"
            )

    for ci, r0 in enumerate(range(0, n_pad, rows_per_call)):
        fut = blockpair_mask(
            jax.lax.slice(s_all, (r0, 0), (r0 + rows_per_call, s_all.shape[1])),
            s_all,
            thr_dev,
            jnp.asarray(r0 // BLOCK, jnp.int32),
            interpret=interpret,
        )
        pend.append((r0, fut))
        if len(pend) >= 2:
            _drain(pend.pop(0))
        _prog(0.45 * (ci + 1) / n_calls)
    while pend:
        _drain(pend.pop(0))
    _prog(0.5)

    del s_all  # free the concatenated sketch: phase 2 needs HBM headroom
    bi = np.concatenate(all_bi) if all_bi else np.empty(0, np.int64)
    bj = np.concatenate(all_bj) if all_bj else np.empty(0, np.int64)
    if len(bi) == 0:
        _prog(1.0)
        return []
    # gather locality: rescore chunks touch contiguous slab ranges
    order = np.lexsort((bj, bi))
    bi, bj = bi[order], bj[order]

    # ---- phase 2: exact rescore of survivors ---------------------------
    out = _rescore_pairs(
        slabs, scales, pens, size, bi, bj, threshold, chunk_pairs, cap, _prog
    )
    _prog(1.0)
    return out


def _prep_sketch(
    pens, size, sketch: SketchState, rows_per_call: int,
    granule: int = COLS_TILE,
):
    """Shared phase-0 of both scans: augment+zero every slab's sketches
    (_prep_slab), concat, pad to a rows_per_call multiple. ``granule`` is
    the kernel's col-tile size (COLS_TILE for the mask kernel,
    COLS_TILE_V for the values kernel). Returns (s_all [n_pad, d_s+1]
    bf16, n_pad, pair slack, nb_real, adjusted rows_per_call)."""
    assert rows_per_call % ROWS_TILE == 0 and rows_per_call % granule == 0
    # small corpora: shrink the call so padding (and the interpret-mode
    # grid, on CPU) stays proportional to the data
    total_cap = sum(s.shape[0] for s in sketch.sketches)
    rows_per_call = min(
        rows_per_call, -(-total_cap // granule) * granule
    )
    parts_s, deltas = [], []
    start = 0
    for i, slab_sketch in enumerate(sketch.sketches):
        pen = None if pens is None else pens[i]
        a16, d = _prep_slab(
            slab_sketch, sketch.resid[i], pen,
            jnp.asarray(start, jnp.int32), jnp.asarray(size, jnp.int32),
        )
        parts_s.append(a16)
        deltas.append(d)
        start += slab_sketch.shape[0]
    # stored-bf16 sketches: _prep_slab's delta only sees the f32 view of
    # the stored values; the original quantization error is bounded by the
    # state's recorded ub_slack (>= max storage delta by construction)
    max_delta = float(max(float(jnp.max(jnp.stack(deltas))), 0.0))
    if sketch.sketches[0].dtype == jnp.bfloat16 and sketch.ub_slack is not None:
        max_delta += float(sketch.ub_slack)
    slack = _pair_slack(max_delta)
    n_pad = -(-start // rows_per_call) * rows_per_call
    s_all = jnp.concatenate(parts_s, axis=0) if len(parts_s) > 1 else parts_s[0]
    del parts_s  # the concat supersedes the per-slab copies (HBM headroom)
    if n_pad != start:
        s_all = jnp.pad(s_all, ((0, n_pad - start), (0, 0)))
    nb_real = -(-size // BLOCK)
    return s_all, n_pad, slack, nb_real, rows_per_call


def sketch_candidate_pairs(
    slabs: Sequence[jax.Array],
    scales: Optional[Sequence[jax.Array]],
    pens: Optional[Sequence[jax.Array]],
    size: int,
    sketch: SketchState,
    threshold: float,
    *,
    progress: Optional[Callable[[int, int], None]] = None,
    # 65536 rows/call caps the values transient at [512, N/128] f32 —
    # 160 MB at 10M — vs the mask kernel's packed words; more calls only
    # re-read the 130 B/row sketch array (~0.3 s of HBM traffic at 10M)
    rows_per_call: int = 65_536,
    chunk_pairs: int = 256,
    cap: int = 32768,
    cands_per_block: int = 8,
    interpret: Optional[bool] = None,
) -> List[Tuple[int, int, float]]:
    """NON-certified sketch-candidate duplicate scan (round-4 verdict #3).

    The middle path for spectrally flat corpora where
    :func:`sketch_duplicate_pairs` bails out: residual products swamp the
    Cauchy-Schwarz bound so nothing PROVABLY prunes, but a true
    near-duplicate pair still tops its block-row's sketch-UB dots. Phase 1
    keeps, for every 128-row block, its top-``cands_per_block`` column
    blocks by blockwise-max augmented-sketch dot (ops/blockmax.py
    ``blockpair_values``) plus its diagonal block; phase 2 exact-rescores
    exactly like the certified scan (every EMITTED pair carries a true
    HIGHEST-precision f32 score >= threshold — false positives are
    impossible; only recall is heuristic). Cost is O(N^2) sketch MXU dots
    + O(nb * c) rescores — no bailout, bounded by construction.

    Callers MUST surface the approximate label (engine sets
    ``last_duplicate_mode='approximate'``; /duplicates serves it)."""
    if interpret is None:
        interpret = _interpret_default()
    cap = max(cap, BLOCK * BLOCK)
    s_all, n_pad, slack, nb_real, rows_per_call = _prep_sketch(
        pens, size, sketch, rows_per_call, granule=COLS_TILE_V
    )
    # pairs whose UB falls below the compare point are still PROVABLY
    # clean — the candidate filter composes with the certified bound, it
    # just additionally drops low-ranked uncertifiable pairs
    floor = max(threshold - slack, 0.0)
    c = int(min(cands_per_block, n_pad // BLOCK))

    def _prog(frac: float) -> None:
        if progress is not None:
            progress(int(frac * 1000), 1000)

    # ---- phase 1: blockmax values sweep + per-block-row top-c ----------
    n_calls = n_pad // rows_per_call
    pend: List[Tuple[int, Tuple[jax.Array, jax.Array]]] = []
    host_bi: List[np.ndarray] = []
    host_bj: List[np.ndarray] = []

    def _drain(entry):
        r0, (vals, cols) = entry
        vals = np.asarray(vals)            # [rb, c] f32
        cols = np.asarray(cols)            # [rb, c] int32
        rb = vals.shape[0]
        bi = np.repeat(np.arange(rb, dtype=np.int64) + r0 // BLOCK, c)
        bj = cols.reshape(-1).astype(np.int64)
        keep = (
            (vals.reshape(-1) > floor)
            & (bi < nb_real)
            & (bj < nb_real)
            & (bj >= bi)  # values kernel already -infs the lower triangle
        )
        host_bi.append(bi[keep])
        host_bj.append(bj[keep])

    from image_search_tpu.ops.topk import exact_topk

    for ci, r0 in enumerate(range(0, n_pad, rows_per_call)):
        vals = blockpair_values(
            jax.lax.slice(s_all, (r0, 0), (r0 + rows_per_call, s_all.shape[1])),
            s_all,
            jnp.asarray(r0 // BLOCK, jnp.int32),
            interpret=interpret,
        )
        # hierarchical exact top-k (ops/topk.py): full-sort lax.top_k over
        # 82k lanes per block-row would dominate the sweep at 10M
        fut = exact_topk(vals, c)
        pend.append((r0, fut))
        if len(pend) >= 2:
            _drain(pend.pop(0))
        _prog(0.45 * (ci + 1) / n_calls)
    while pend:
        _drain(pend.pop(0))
    _prog(0.5)

    del s_all
    # diagonal blocks always rescore (self-UB ~1 tops every row anyway,
    # but adjacent-row duplicates must never hinge on the ranking)
    diag = np.arange(nb_real, dtype=np.int64)
    bi = np.concatenate(host_bi + [diag])
    bj = np.concatenate(host_bj + [diag])
    pairs = np.unique(np.stack([bi, bj], axis=1), axis=0)
    bi, bj = pairs[:, 0], pairs[:, 1]

    # ---- phase 2: exact rescore — identical to the certified scan ------
    out = _rescore_pairs(
        slabs, scales, pens, size, bi, bj, threshold, chunk_pairs, cap, _prog
    )
    _prog(1.0)
    return out


def _rescore_pairs(
    slabs, scales, pens, size, bi, bj, threshold, chunk_pairs, cap, prog
) -> List[Tuple[int, int, float]]:
    """Exact-rescore the (bi, bj) block pairs, emitting every row pair with
    true f32 dot >= threshold, i < j. Shared phase-2 of both the certified
    and the candidate (approximate) scans; ``prog`` is called with fractions
    in [0.5, 1.0]."""
    size_dev = jnp.asarray(size, jnp.int32)
    out: List[Tuple[int, int, float]] = []

    def _run(lo_bi: np.ndarray, lo_bj: np.ndarray) -> None:
        pb = len(lo_bi)
        pad = 8  # pow2 buckets bound the jit program family
        while pad < pb:
            pad *= 2
        cbi = np.full(pad, -1, np.int32)
        cbj = np.full(pad, -1, np.int32)
        cbi[:pb], cbj[:pb] = lo_bi, lo_bj
        vals, idx = _rescore_chunk(
            slabs, scales, pens, size_dev,
            jnp.asarray(cbi), jnp.asarray(cbj), cap=cap,
        )
        vals = np.asarray(vals)
        n_hit = int((vals >= threshold).sum())
        if n_hit >= cap and pb > 1:
            mid = pb // 2
            _run(lo_bi[:mid], lo_bj[:mid])
            _run(lo_bi[mid:], lo_bj[mid:])
            return
        idx = np.asarray(idx)[:n_hit].astype(np.int64)
        v = vals[:n_hit]
        p = idx // (BLOCK * BLOCK)
        rem = idx % (BLOCK * BLOCK)
        gi = cbi[p].astype(np.int64) * BLOCK + rem // BLOCK
        gj = cbj[p].astype(np.int64) * BLOCK + rem % BLOCK
        out.extend(zip(gi.tolist(), gj.tolist(), v.astype(float).tolist()))

    n_chunks = -(-len(bi) // chunk_pairs)
    for k, lo in enumerate(range(0, len(bi), chunk_pairs)):
        _run(bi[lo : lo + chunk_pairs], bj[lo : lo + chunk_pairs])
        prog(0.5 + 0.5 * (k + 1) / n_chunks)
    return out

"""Two-stage EXACT top-k: sketch-bound pass + certified exact rescore.

The full-scan exact query is HBM-READ-bound: 10M int8 rows = 7.7 GB at the
measured 640 GB/s streamed-read wall = 12 ms minimum for ANY one-pass
method (docs/PERF_NOTES.md round-3 frontier study). Going faster while
staying exact requires reading FEWER bytes per query. This module does
that with a provable score upper bound (VERDICT round-2 item #9):

Build (once per corpus, one streaming pass):
  - W [D, d_s]: orthonormal basis of the corpus's top-d_s principal
    directions (host SVD of a row sample, d_s=64 default).
  - per row i with (dequantized) stored vector r_i:
      s_i = W^T r_i          — the sketch  [d_s] f32  (256 B vs 768 B int8)
      t_i = ||r_i - W s_i||  — residual norm, 4 B

Query q~ (the EXACT query vector the full path dots against — for int8
slabs that is quantize(q) * scale, integer-exact in f32):
  q_s = W^T q~,  q_t = ||q~ - W q_s||.
  Because W is orthonormal, the cross terms vanish and
      q~ . r_i  =  q_s . s_i  +  (q~ - W q_s) . (r_i - W s_i)
  so by Cauchy-Schwarz
      q~ . r_i  <=  q_s . s_i + q_t * t_i  =: UB_i                  (*)

Search:
  1. UB pass: read only (s_i, t_i) — 260 B/row, ~3x fewer bytes than the
     int8 row — and take the exact top-(C+1) rows by UB.
  2. Rescore the top C candidates with the SAME arithmetic as the full
     scan (integer dot * scales for int8 — bitwise identical scores);
     take their top-k; tau = k-th exact score.
  3. CERTIFICATE: if the (C+1)-th largest UB <= tau then by (*) no
     non-candidate can beat the k-th result and the answer is EXACT.
     Otherwise the caller falls back to the full scan — correctness never
     depends on the data; only the speedup does.

Floating-point rigor: (*) holds in real arithmetic; f32 evaluation of
either side can err by at most gamma_D ~ 9.2e-5 for D=768 unit-scale
vectors, so UB is inflated by ``SLACK`` (1e-4) and residual norms by
``SLACK_T`` before the comparison. The inflation only admits extra
candidates / fails the certificate more often — never drops a true
top-k row.

TPU matmul precision (round-3 soundness review): XLA's DEFAULT f32 dot on
TPU rounds operands to bf16 (relative error up to 2^-8 each — 40x SLACK),
which breaks the analysis above in two places:
  1. The sketch-side matmuls (build ``r @ W``, query ``q @ W``, and the
     f32 stage-1 UB dot) must be f32-accurate for the decomposition
     identity to hold: they run at ``Precision.HIGHEST`` (exact bf16
     multi-pass). All three are HBM-read- or shape-bound, so the extra
     MXU passes are free; the bf16-sketch stage-1 dot instead charges its
     operand roundings to ``ub_slack`` (see ``_sketch_chunk``).
  2. The FULL SCAN the certificate promises to match keeps DEFAULT
     precision (that IS the serving path): for f32/bf16 slabs its scores
     can differ from the real dot by up to ~2^-8 * ||q|| * ||r|| per
     rounded operand. ``FULL_SCAN_SLACK[dtype]`` (3x the per-route cast
     bound: UB-vs-real on non-candidates + rescore-vs-full-scan route
     divergence on candidates) is therefore SUBTRACTED from tau in the
     certificate. int8 slabs charge zero — the integer dot is bitwise
     identical on both routes.

When it wins: real image embeddings have sharply decaying spectra, so
t_i (the energy outside the top-64 directions) is small and the bound is
tight. On spectrally flat (random) corpora t_i ~ q_t ~ 1, every UB
crowds together, the certificate fails, and the fallback runs — that is
the documented worst case, not a correctness risk.

No reference counterpart: SurrealDB's MTREE (search.rs:70-77) is
approximate with no certificate of any kind.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = float(jnp.finfo(jnp.float32).min)
SLACK = 1e-4   # UB inflation: bounds f32 reduction error of either route
SLACK_T = 1e-5  # residual-norm-squared inflation before the sqrt
DEFAULT_SKETCH_DIM = 64
DEFAULT_CANDIDATES = 4096
HIGHEST = jax.lax.Precision.HIGHEST  # f32-accurate dots on TPU (module doc)

# Certificate deduction for the full scan's DEFAULT-precision operand
# rounding (module doc item 2). Rows are l2-normalized (||r|| <= 1 + 2^-8
# after bf16 storage rounding) and ||q|| = 1, so the full scan's score can
# exceed the real dot the UB bounds by the operand-cast bound: bf16 slabs
# round only the query (<= 2^-8 * (1+2^-8)); f32 slabs round both operands
# (<= 2^-8 + 2^-8 * (1+2^-8)). The rescore rounds operands IDENTICALLY
# (deterministic elementwise bf16 casts of the same values — XLA applies
# one DEFAULT dot policy per backend), so rescore-vs-full-scan divergence
# on candidates is reduction-order only; 5e-4 covers it plus headroom
# (gamma_768 ~ 9.2e-5). int8 slabs charge zero: bitwise-equal integer dot.
FULL_SCAN_SLACK = {
    "int8": 0.0,
    "bfloat16": (2.0 ** -8) * (1.0 + 2.0 ** -8) + 5e-4,
    "float32": (2.0 ** -8) * (2.0 + 2.0 ** -8) + 5e-4,
}


def estimate_certifiable_fraction(
    sample_rows: np.ndarray,    # [n, D] f32 (dequantized, ~unit) row sample
    basis: np.ndarray,          # [D, d_s] the fitted orthonormal basis
    corpus_size: int,
    k: int,
    candidate_rows: int,
    fs_slack: float,
    ub_slack: float = 0.0,
    n_queries: int = 256,
) -> float:
    """Predict, at build time, the fraction of queries the certificate will
    pass — so a spectrally flat corpus can skip PUBLISHING the sketch
    instead of paying TWOSTAGE_DISABLE_AFTER failed bound passes (~40 ms
    each at 10M) before adaptive disable kicks in (round-3 verdict item #7).

    Method: replay the certificate on the row sample itself. Sample rows
    stand in for queries (leave-self-out); ranks are FRACTION-scaled so the
    sample-size quantiles estimate the corpus-size ones: tau becomes the
    ceil(k/N * n)-th best exact score, rest_max the (c/N * n + 1)-th best
    UB. This is row-granularity (the v1 selection) — the shipped block
    selection's certificate is at least as tight (twostage_topk_block
    module comment), so the estimate errs toward NOT publishing, which is
    the cheap mistake (fallback = full scan, always exact).

    Purely advisory: the gate affects SPEED only — a published sketch is
    still certified per query, an unpublished one just means full scans."""
    x = np.asarray(sample_rows, np.float32)
    n = x.shape[0]
    if n < 32 or corpus_size <= 0:
        return 1.0  # tiny corpora fall back by construction anyway
    w = np.asarray(basis, np.float32)
    s = x @ w                                             # [n, d_s]
    t = np.sqrt(
        np.maximum((x * x).sum(1) - (s * s).sum(1), 0.0) + SLACK_T
    )                                                     # [n]
    qi = np.unique(np.linspace(0, n - 1, min(n_queries, n)).astype(np.int64))
    q, qs, q_res = x[qi], s[qi], t[qi]
    exact = q @ x.T                                       # [nq, n]
    infl = np.sqrt((qs * qs).sum(1)) * ub_slack + SLACK   # [nq]
    ub = qs @ s.T + q_res[:, None] * t[None, :] + infl[:, None]
    # leave-self-out: a text query is not a corpus row, and self's 1.0
    # score would make every flat corpus look certifiable
    ar = np.arange(len(qi))
    exact[ar, qi] = -np.inf
    ub[ar, qi] = -np.inf
    k_s = max(1, round(k / corpus_size * n))
    c_s = int(min(max(k_s, round(candidate_rows / corpus_size * n)), n - 2))
    tau = np.partition(exact, n - k_s, axis=1)[:, n - k_s]
    rest = np.partition(ub, n - (c_s + 1), axis=1)[:, n - (c_s + 1)]
    return float(np.mean(rest <= tau - fs_slack))


class SketchState(NamedTuple):
    """Device-resident sketch aligned with the index's emb slabs."""

    basis: jax.Array            # [D, d_s] f32 orthonormal
    sketches: Tuple[jax.Array, ...]  # per slab: [n_b, d_s] f32 or bf16
    resid: Tuple[jax.Array, ...]     # per slab: [n_b] f32 residual norms
    built_rows: int             # corpus size the sketch covers
    # UB inflation for lossy sketch storage (bf16): the data-derived
    # max over rows of ||a_i - round(a_i)|| + 2^-9 ||round(a_i)||, which
    # dominates BOTH the storage rounding and the query-side cast in the
    # UB dot (see _sketch_chunk). Zero for f32 sketches. Device scalar so
    # a rebuild never retraces the search program.
    ub_slack: jax.Array = None  # f32 scalar


def fit_basis(sample_rows: np.ndarray, d_s: int = DEFAULT_SKETCH_DIM) -> np.ndarray:
    """Top-d_s principal directions of a (dequantized) row sample.

    Host-side float64 SVD; orthonormality error ~1e-15 is absorbed by
    ``SLACK``. The basis only affects SPEED (bound tightness) — any
    orthonormal W keeps the method exact — so a few-10k-row sample is
    plenty.
    """
    x = np.asarray(sample_rows, np.float64)
    assert x.ndim == 2 and x.shape[0] >= 1
    d_s = min(d_s, min(x.shape))
    # principal directions of the raw second moment (not mean-centered:
    # the bound is about energy capture, not variance)
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    return np.ascontiguousarray(vt[:d_s].T.astype(np.float32))  # [D, d_s]


@jax.jit
def _dequant_rows(slab: jax.Array, scale: Optional[jax.Array]) -> jax.Array:
    r = slab.astype(jnp.float32)
    if scale is not None:
        r = r * scale[:, None]
    return r


@partial(jax.jit, static_argnames=("to_bf16",))
def _sketch_chunk(slab, scale, basis, to_bf16: bool = False):
    """One chunk -> (sketch, inflated residual norm, ub_slack scalar).

    ``to_bf16`` stores the sketch in bfloat16: stage 1 then reads HALF the
    bytes per row (128 B vs 256 B at d_s=64). The bound stays rigorous:
    with a = W^T r and a~ = bf16(a),
        q_s . a  <=  q_s . a~  +  ||q_s|| (||a - a~|| + 2^-8 ||a~||)
    where the 2^-8 ||a~|| term absorbs rounding q_s itself to bf16 for
    the MXU dot: bf16 has p = 8 significant bits, so round-to-nearest
    relative error is <= 2^-p = 2^-8 per element (NOT 2^-(p+1): eps =
    2^(1-p) = 2^-7, RN error eps/2), giving
    |(q_s - bf16(q_s)) . a~| <= 2^-8 ||q_s|| ||a~||. The per-chunk MAX of
    the bracket is a valid additive UB inflation once scaled by ||q_s|| —
    returned as a scalar so it costs zero extra HBM reads per query
    (measured bracket ~= 0.006; spend it only when the certificate margin
    affords it)."""
    r = _dequant_rows(slab, scale)
    # HIGHEST: the decomposition identity needs s = W^T r to f32 accuracy —
    # TPU DEFAULT precision would silently put ~2^-8 error into every
    # sketch component AND make nrm2-ss underestimate the true residual
    s = jnp.matmul(r, basis, precision=HIGHEST)
    nrm2 = jnp.sum(r * r, axis=1)
    ss = jnp.sum(s * s, axis=1)
    t = jnp.sqrt(jnp.maximum(nrm2 - ss, 0.0) + SLACK_T)
    if not to_bf16:
        return s, t, jnp.zeros((), jnp.float32)
    s16 = s.astype(jnp.bfloat16)
    s16f = s16.astype(jnp.float32)
    delta = jnp.sqrt(jnp.sum((s - s16f) ** 2, axis=1))
    anorm = jnp.sqrt(jnp.sum(s16f * s16f, axis=1))
    return s16, t, jnp.max(delta + anorm * (2.0 ** -8))


# per-chunk dequantized-f32 temp cap: 262144 x 768 f32 = 805 MB. Sketching
# a whole slab in one program would materialize n x D f32 (a 1M-row slab =
# 3 GB, a single 10M-row benchmark slab = 30 GB -> HBM OOM), so the build
# streams fixed-shape chunks instead: at most two program shapes (body +
# tail), each freed before the next dispatch.
SKETCH_CHUNK_ROWS = 262_144


def sketch_slab(
    slab: jax.Array,                 # [n, D] f32/bf16/int8 rows
    scale: Optional[jax.Array],      # [n] f32 for int8, else None
    basis: jax.Array,                # [D, d_s] f32
    to_bf16: bool = False,
):
    """One slab -> (sketch [n, d_s], inflated residual norms [n] f32,
    ub_slack f32 scalar — see _sketch_chunk)."""
    n = slab.shape[0]
    g = SKETCH_CHUNK_ROWS
    if n <= g:
        return _sketch_chunk(slab, scale, basis, to_bf16)
    parts_s, parts_t, slacks = [], [], []
    for off in range(0, n, g):  # static slice bounds: one compile per shape
        end = min(off + g, n)
        sc = None if scale is None else scale[off:end]
        s, t, d = _sketch_chunk(slab[off:end], sc, basis, to_bf16)
        parts_s.append(s)
        parts_t.append(t)
        slacks.append(d)
    return (
        jnp.concatenate(parts_s, axis=0),
        jnp.concatenate(parts_t, axis=0),
        jnp.max(jnp.stack(slacks)),
    )


def _exact_query_vector(q: jax.Array, is_int8: bool) -> jax.Array:
    """The vector the full scan ACTUALLY dots rows against (module doc)."""
    if is_int8:
        from image_search_tpu.parallel.sharded_search import quantize_rows_int8

        qi, qs = quantize_rows_int8(q)
        return qi.astype(jnp.float32) * qs[:, None], qi, qs
    return q, None, None


def _rescore_int8(slabs, scales, idx, qi, qs):
    """Exact candidate rescore, bitwise-equal to the full int8 scan:
    integer dot (exact in s32/f32) * query scale * row scale, same
    multiply order as ``shard_scores`` / the stream kernel."""
    b, c = idx.shape
    d = slabs[0].shape[1]
    rows = jnp.zeros((b, c, d), jnp.int8)
    rscale = jnp.zeros((b, c), jnp.float32)
    start = 0
    for i, slab in enumerate(slabs):
        n = slab.shape[0]
        off = jnp.clip(idx - start, 0, n - 1)
        in_slab = (idx >= start) & (idx < start + n)
        rows = jnp.where(in_slab[:, :, None], slab[off], rows)
        rscale = jnp.where(in_slab, scales[i][off], rscale)
        start += n
    s32 = jnp.einsum(
        "bd,bcd->bc", qi, rows, preferred_element_type=jnp.int32
    )
    return s32.astype(jnp.float32) * qs[:, None] * rscale


def _rescore_float(slabs, idx, q):
    """Exact candidate rescore for f32/bf16 slabs (same operand dtypes as
    ``shard_scores``; scores equal to the full scan up to f32
    reduction-order rounding — the top-k SET is still certified exact)."""
    b, c = idx.shape
    d = slabs[0].shape[1]
    dt = slabs[0].dtype
    rows = jnp.zeros((b, c, d), dt)
    start = 0
    for i, slab in enumerate(slabs):
        n = slab.shape[0]
        off = jnp.clip(idx - start, 0, n - 1)
        in_slab = (idx >= start) & (idx < start + n)
        rows = jnp.where(in_slab[:, :, None], slab[off], rows)
        start += n
    return jnp.einsum(
        "bd,bcd->bc", q.astype(dt), rows, preferred_element_type=jnp.float32
    ).astype(jnp.float32)


def _gather_pens(pens, idx):
    b, c = idx.shape
    out = jnp.zeros((b, c), jnp.float32)
    start = 0
    for p in pens:
        n = p.shape[0]
        off = jnp.clip(idx - start, 0, n - 1)
        in_slab = (idx >= start) & (idx < start + n)
        out = jnp.where(in_slab, out + p[off], out)
        start += n
    return out


def sketch_slab_sharded(slab, scale, basis, mesh, to_bf16: bool = False):
    """Sketch one mesh-sharded slab: per-device ``_sketch_chunk`` over the
    LOCAL rows, so sketch/residual shardings align row-for-row with the
    slab's ``P(data, None)`` layout and the f32 dequantized temp is bounded
    at local_n x D per device (no cross-device traffic at all). Returns
    (sketch, resid, ub_slack scalar — the pmax over devices)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from image_search_tpu.parallel.mesh import DATA_AXIS

    in_specs = [P(DATA_AXIS, None), P(None, None)]
    args = [slab, basis]
    if scale is not None:
        in_specs.append(P(DATA_AXIS))
        args.append(scale)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS), P()),
        check_rep=False,
    )
    def _build(slab_l, basis_r, *rest):
        # sketch_slab's chunking bounds the per-device dequantized-f32 temp
        # (a 1M-row local shard would otherwise materialize a 3 GB f32 temp)
        sc_l = rest[0] if rest else None
        s, t, d = sketch_slab(slab_l, sc_l, basis_r, to_bf16)
        return s, t, jax.lax.pmax(d, DATA_AXIS)

    return _build(*args)


def sharded_twostage_topk(
    slabs,                  # tuple of [n_b, D] slabs, each P(data, None)
    sketches,               # tuple of [n_b, d_s] f32, each P(data, None)
    resid,                  # tuple of [n_b] f32, each P(data)
    basis,                  # [D, d_s] f32, replicated
    size,                   # int32 scalar: #valid rows
    queries: jax.Array,     # [B, D] raw queries, replicated
    k: int,
    mesh,
    c: int = DEFAULT_CANDIDATES,
    scales=None,            # tuple of [n_b] f32 for int8 slabs, each P(data)
    pens=None,              # tuple of [n_b] f32 additive penalties, or None
    ub_slack=0.0,           # f32 scalar: bf16-sketch UB inflation (0 for f32)
    share: int = 0,         # #DISTINCT queries (twostage_topk_block doc)
):
    """Certified exact top-k over a row-sharded corpus (SPMD two-stage).

    Per shard: UB pass over the LOCAL sketch rows -> exact top-(c_l+1) by
    UB -> exact rescore of the c_l local candidates (candidate rows live on
    the selecting device, so rescore moves ZERO rows across ICI) -> local
    top-k. One ``all_gather`` of [devices, B, local_k] (score, gid) pairs
    plus a ``pmax`` of the per-shard residual UB maxima; merge and
    certificate evaluate replicated.

    Certificate: every non-candidate row on shard s has UB <= rest_max_s
    <= max_s rest_max_s, so if that max is <= tau (the merged k-th exact
    score) no non-candidate anywhere can displace the merged answer — the
    result equals ``sharded_topk``'s full scan. Per-query False rows must
    be re-answered by the full sharded scan (VectorIndex.search_twostage)."""
    from image_search_tpu.index.index import _l2
    from image_search_tpu.ops.topk import exact_topk
    from image_search_tpu.parallel.mesh import DATA_AXIS
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    n_shards = mesh.shape[DATA_AXIS]
    slabs = tuple(slabs)
    slab_rows = [s.shape[0] for s in slabs]
    for n in slab_rows:
        assert n % n_shards == 0, (n, n_shards)
    local_n = sum(slab_rows) // n_shards
    # per-shard candidate budget in BLOCKS (the v2 selection — see the
    # block-candidate module comment): c spread across shards, floored so
    # the local pool can hold k rows; clamped at full local coverage
    # (local_m == local_nb rescores every local row — trivially exact,
    # rest_max = -inf). A shard whose true top-k rows span more than
    # local_m blocks fails ITS certificate and the caller falls back —
    # exactness never depends on the spread.
    local_nb = local_n // BLOCK
    local_m = int(min(max(-(-c // n_shards), -(-k // BLOCK)), local_nb))
    local_k = min(k, local_m * BLOCK)
    slab_starts = np.concatenate([[0], np.cumsum(slab_rows)])[:-1]
    is_int8 = slabs[0].dtype == jnp.int8
    fs_slack = FULL_SCAN_SLACK[jnp.dtype(slabs[0].dtype).name]

    in_specs = [
        tuple(P(DATA_AXIS, None) for _ in slabs),
        tuple(P(DATA_AXIS, None) for _ in sketches),
        tuple(P(DATA_AXIS) for _ in resid),
        P(None, None),
        P(),
        P(None, None),
        P(),
    ]
    args = [slabs, tuple(sketches), tuple(resid), basis, size, queries,
            jnp.asarray(ub_slack, jnp.float32)]
    has_scales = scales is not None
    if has_scales:
        in_specs.append(tuple(P(DATA_AXIS) for _ in slabs))
        args.append(tuple(scales))
    has_pens = pens is not None
    if has_pens:
        in_specs.append(tuple(P(DATA_AXIS) for _ in slabs))
        args.append(tuple(pens))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(None, None), P(None, None), P(None)),
        check_rep=False,
    )
    def _search(slabs_l, sk_l, rs_l, basis_r, size_l, queries_r, slack_r, *rest):
        scales_l = rest[0] if has_scales else None
        pens_l = rest[int(has_scales)] if has_pens else None
        shard_id = jax.lax.axis_index(DATA_AXIS)

        q = _l2(queries_r.astype(jnp.float32))
        qt_vec, qi, qs = _exact_query_vector(q, is_int8)
        q_s = jnp.matmul(qt_vec, basis_r, precision=HIGHEST)
        qs2 = jnp.sum(q_s * q_s, 1)
        q_res = jnp.sqrt(
            jnp.maximum(jnp.sum(qt_vec * qt_vec, 1) - qs2, 0.0) + SLACK_T
        )
        infl = jnp.sqrt(qs2) * slack_r + SLACK

        # stage 1: upper bounds over local sketch rows only
        ub_parts, gid_parts = [], []
        qsk = q_s.astype(sk_l[0].dtype)
        for b, sk in enumerate(sk_l):
            nb_local = sk.shape[0]
            # HIGHEST: f32 sketches need the f32-accurate dot the bound
            # assumes (read-bound op — extra MXU passes are free); for bf16
            # sketches the operand roundings are charged to ub_slack and
            # HIGHEST is a no-op on bf16-native inputs
            dot = jax.lax.dot_general(
                qsk, sk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HIGHEST,
            )
            ub = dot + q_res[:, None] * rs_l[b][None, :] + infl[:, None]
            if pens_l is not None:
                ub = ub + pens_l[b][None, :]
            ub_parts.append(ub)
            gid_parts.append(
                int(slab_starts[b])
                + shard_id * nb_local
                + jax.lax.broadcasted_iota(jnp.int32, (nb_local,), 0)
            )
        ub_all = ub_parts[0] if len(ub_parts) == 1 else jnp.concatenate(ub_parts, 1)
        gids = gid_parts[0] if len(gid_parts) == 1 else jnp.concatenate(gid_parts)
        ub_all = jnp.where((gids < size_l)[None, :], ub_all, NEG_INF)

        # block-candidate selection (v2): per-block maxima -> local_m
        # shared blocks; rest_max = each query's own max over non-chosen
        # blocks. Batched selection is the union of per-query top-
        # (local_m//B) blocks filled to local_m by batch-max (same
        # construction and rationale as twostage_topk_block). Slab rows
        # are 4096/n_shards multiples so blocks never straddle slab
        # boundaries in local concat space.
        B = queries_r.shape[0]
        bmax = ub_all.reshape(B, local_nb, BLOCK).max(2)
        share_eff = B if share <= 0 else max(1, min(share, B))
        if share_eff == 1:
            _, blocks = jax.lax.top_k(bmax.max(0), local_m)
        else:
            mq = max(1, local_m // share_eff)
            shared_l = bmax.max(0)
            _, qb = jax.lax.top_k(bmax, mq)
            union = jnp.zeros((local_nb,), bool).at[qb.reshape(-1)].set(True)
            _, blocks = jax.lax.top_k(
                jnp.where(union, shared_l + 1e30, shared_l), local_m
            )
        chosen = jnp.zeros((local_nb,), bool).at[blocks].set(True)
        rest_max_l = jnp.where(chosen[None, :], NEG_INF, bmax).max(1)

        # stage 2: exact rescore of every row in the chosen local blocks
        # (contiguous 128-row tiles; full-scan arithmetic)
        rows, rscale, rpens, gid_l = _gather_block_rows(
            slabs_l, scales_l, pens_l, blocks, pens_l is not None
        )
        if is_int8:
            s32 = jnp.einsum(
                "bd,nd->bn", qi, rows, preferred_element_type=jnp.int32
            )
            ex = s32.astype(jnp.float32) * qs[:, None] * rscale[None, :]
        else:
            ex = jnp.einsum(
                "bd,nd->bn", q.astype(rows.dtype), rows,
                preferred_element_type=jnp.float32,
            ).astype(jnp.float32)
        if rpens is not None:
            ex = ex + rpens[None, :]
        gid_cand = gids[gid_l]                # [local_m*BLOCK] global ids
        ex = jnp.where(gid_cand[None, :] < size_l, ex, NEG_INF)

        v_l, pos = exact_topk(ex, local_k)
        g_l = gid_cand[pos]

        # ONE collective round: devices*local_k candidate pairs + the
        # certificate scalar, instead of N scores
        all_v = jax.lax.all_gather(v_l, DATA_AXIS, axis=0)
        all_g = jax.lax.all_gather(g_l, DATA_AXIS, axis=0)
        rest_max = jax.lax.pmax(rest_max_l, DATA_AXIS)
        B = queries_r.shape[0]
        all_v = jnp.moveaxis(all_v, 0, 1).reshape(B, n_shards * local_k)
        all_g = jnp.moveaxis(all_g, 0, 1).reshape(B, n_shards * local_k)
        kk = min(k, n_shards * local_k)
        m_v, m_pos = jax.lax.top_k(all_v, kk)
        m_g = jnp.take_along_axis(all_g, m_pos, axis=1)
        tau = m_v[:, kk - 1]
        certified = rest_max <= tau - fs_slack
        if kk < k:
            # the merged pool cannot even HOLD k rows (tiny shards:
            # n_shards*local_k < k) — the [B, kk] result can never equal
            # the full scan's [B, k]; force the fallback (static shapes,
            # so this is a compile-time constant, not a traced branch)
            certified = jnp.zeros_like(certified)
        return m_v, m_g, certified

    return _search(*args)


@partial(jax.jit, static_argnames=("k", "c"))
def twostage_topk(
    slabs,                  # tuple of [n_b, D] row slabs (f32/bf16/int8)
    sketches,               # tuple of [n_b, d_s] (SketchState.sketches)
    resid,                  # tuple of [n_b] f32 (SketchState.resid)
    basis,                  # [D, d_s] f32
    size,                   # int32 scalar: #valid rows
    queries: jax.Array,     # [B, D] raw (un-normalized) queries
    k: int,
    c: int = DEFAULT_CANDIDATES,
    scales=None,            # tuple of [n_b] f32 for int8 slabs
    pens=None,              # tuple of [n_b] f32 additive penalties, or None
    ub_slack=0.0,           # f32 scalar: bf16-sketch UB inflation (0 for f32)
):
    """Certified exact top-k. Returns (vals [B,k], ids [B,k],
    certified [B] bool). Rows of ``certified`` that are False MUST be
    re-answered by the full scan (VectorIndex.search does this)."""
    from image_search_tpu.index.index import _l2
    from image_search_tpu.ops.topk import exact_topk

    is_int8 = slabs[0].dtype == jnp.int8
    fs_slack = FULL_SCAN_SLACK[jnp.dtype(slabs[0].dtype).name]
    q = _l2(queries.astype(jnp.float32))
    qt_vec, qi, qs = _exact_query_vector(q, is_int8)
    q_s = jnp.matmul(qt_vec, basis, precision=HIGHEST)     # [B, d_s]
    qs2 = jnp.sum(q_s * q_s, 1)
    q_res = jnp.sqrt(
        jnp.maximum(jnp.sum(qt_vec * qt_vec, 1) - qs2, 0.0) + SLACK_T
    )                                                      # [B]
    # per-query additive inflation for lossy sketches (see _sketch_chunk)
    infl = jnp.sqrt(qs2) * ub_slack + SLACK                # [B]

    # stage 1: upper bounds, reading only sketches + residual norms
    parts = []
    start = 0
    qsk = q_s.astype(sketches[0].dtype)  # bf16 dot for bf16 sketches
    for i, sk in enumerate(sketches):
        n = sk.shape[0]
        # HIGHEST: see the sharded path — required for f32 sketches, no-op
        # for bf16 ones (whose roundings ub_slack covers)
        dot = jax.lax.dot_general(
            qsk, sk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HIGHEST,
        )
        ub = dot + q_res[:, None] * resid[i][None, :] + infl[:, None]
        if pens is not None:
            ub = ub + pens[i][None, :]
        valid = (jax.lax.broadcasted_iota(jnp.int32, (n,), 0) + start) < size
        parts.append(jnp.where(valid[None, :], ub, NEG_INF))
        start += n
    ub_all = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    ub_vals, ub_idx = exact_topk(ub_all, c + 1)            # exact top-(C+1) by UB
    cand = ub_idx[:, :c]
    rest_max = ub_vals[:, c]                               # max UB outside candidates

    # stage 2: exact rescore of the C candidates (full-scan arithmetic)
    if is_int8:
        ex = _rescore_int8(slabs, scales, cand, qi, qs)
    else:
        ex = _rescore_float(slabs, cand, q)
    if pens is not None:
        ex = ex + _gather_pens(pens, cand)
    # re-apply the valid mask (clipped gathers may fetch pad rows)
    ex = jnp.where(cand < size, ex, NEG_INF)

    vals, pos = jax.lax.top_k(ex, k)
    ids = jnp.take_along_axis(cand, pos, axis=1)
    tau = vals[:, k - 1]
    certified = rest_max <= tau - fs_slack
    return vals, ids, certified


# -- block-candidate variant (v2): cheap selection, contiguous gathers -------
#
# The row-candidate path above spends most of its time SELECTING the
# exact top-(c+1) upper bounds: exact_topk at k=4097 escalates its HOLD to
# 16384 rows and ends in a lax.top_k over 2.1M values — measured ~20 ms at
# 10M rows, dwarfing the 2.6 GB bound-pass read it exists to exploit
# (benchmarks/twostage_decomp.py). The v2 path picks candidates at
# 128-row BLOCK granularity instead:
#
#   blockmax_j = max of UB over block j's 128 rows      (fused VPU pass)
#   choose the m blocks with the largest blockmax       (top_k over N/128)
#   rest_max   = (m+1)-th largest blockmax
#   rescore ALL 128*m rows of the chosen blocks exactly (contiguous DMA)
#
# Certificate: every row outside the chosen blocks has UB <= its block's
# max <= rest_max, so rest_max <= tau - FULL_SCAN_SLACK certifies exactness
# precisely as before. TIGHTNESS: the top m+1 blockmaxes are m+1 UB values
# from DISTINCT blocks, so the (m+1)-th blockmax is <= the (m+1)-th largest
# UB overall — with m blocks the certificate is AT LEAST as tight as the
# row path with c = m candidates, usually tighter (hot rows cluster).
# Cost: selection shrinks to one top_k over N/128 blockmaxes, and the
# rescore reads 128x more rows — but those are CONTIGUOUS 96 KB int8 tiles
# (m=4096 -> 402 MB ~ 0.7 ms at the 640 GB/s read wall), not 4096 random
# 768 B rows. Batched queries share ONE block set so the gather cost does
# not scale with B; each query's certificate uses its OWN max over
# non-chosen blocks.
#
# BATCHED SELECTION (B > 1): the shared set is the UNION of each query's
# own top-(m//B) blocks, FILLED to m with the best remaining blocks by
# batch-max — not the plain top-m of the batch-max. Batch-max alone lets
# one hot query hog the whole budget (measured: distinct-8 batches never
# certified at m=4096); the union guarantees every query its m//B best
# blocks (each certificate at least as tight as a solo run at m//B),
# while the fill makes identical-query batches degenerate to exactly the
# old batch-max selection (full m coverage). The pool every query's
# top-k draws from is all m chosen blocks either way.

BLOCK = 128
DEFAULT_BLOCKS = 4096


def _gather_block_rows(slabs, scales, pens, blocks, has_pens: bool):
    """Gather the chosen blocks' rows from the concatenated slab space.

    ``blocks`` [m] are block ids in concat space; slab sizes are 4096-row
    multiples so a block never straddles slabs. Returns (rows [m*B, D],
    rscale [m*B] or None, rpens [m*B] or None, gid [m*B] concat row ids).
    """
    m = blocks.shape[0]
    d = slabs[0].shape[1]
    rows = jnp.zeros((m, BLOCK, d), slabs[0].dtype)
    rscale = None if scales is None else jnp.zeros((m, BLOCK), jnp.float32)
    rpens = jnp.zeros((m, BLOCK), jnp.float32) if has_pens else None
    start_blk = 0
    for i, slab in enumerate(slabs):
        nb_i = slab.shape[0] // BLOCK
        off = jnp.clip(blocks - start_blk, 0, nb_i - 1)
        in_slab = (blocks >= start_blk) & (blocks < start_blk + nb_i)
        s3 = slab.reshape(nb_i, BLOCK, d)
        rows = jnp.where(in_slab[:, None, None], s3[off], rows)
        if rscale is not None:
            rscale = jnp.where(
                in_slab[:, None], scales[i].reshape(nb_i, BLOCK)[off], rscale
            )
        if rpens is not None:
            rpens = jnp.where(
                in_slab[:, None], pens[i].reshape(nb_i, BLOCK)[off], rpens
            )
        start_blk += nb_i
    gid = (blocks[:, None] * BLOCK + jnp.arange(BLOCK, dtype=jnp.int32)).reshape(-1)
    flat = lambda x: None if x is None else x.reshape(m * BLOCK)
    return rows.reshape(m * BLOCK, d), flat(rscale), flat(rpens), gid


@partial(jax.jit, static_argnames=("k", "m", "share"))
def twostage_topk_block(
    slabs,                  # tuple of [n_b, D] row slabs (f32/bf16/int8)
    sketches,               # tuple of [n_b, d_s] (SketchState.sketches)
    resid,                  # tuple of [n_b] f32 (SketchState.resid)
    basis,                  # [D, d_s] f32
    size,                   # int32 scalar: #valid rows
    queries: jax.Array,     # [B, D] raw (un-normalized) queries
    k: int,
    m: int = DEFAULT_BLOCKS,
    scales=None,            # tuple of [n_b] f32 for int8 slabs
    pens=None,              # tuple of [n_b] f32 additive penalties, or None
    ub_slack=0.0,           # f32 scalar: bf16-sketch UB inflation
    share: int = 0,         # #DISTINCT queries to split the union budget
                            # over (serving pads batches by REPEATING rows;
                            # m//B would charge the pad copies). 0 -> B.
):
    """Certified exact top-k, block-candidate selection (module comment
    above). Returns (vals [B,k], ids [B,k], certified [B] bool); False
    rows MUST be re-answered by the full scan, exactly as twostage_topk."""
    from image_search_tpu.index.index import _l2
    from image_search_tpu.ops.topk import exact_topk

    is_int8 = slabs[0].dtype == jnp.int8
    fs_slack = FULL_SCAN_SLACK[jnp.dtype(slabs[0].dtype).name]
    q = _l2(queries.astype(jnp.float32))
    qt_vec, qi, qs = _exact_query_vector(q, is_int8)
    q_s = jnp.matmul(qt_vec, basis, precision=HIGHEST)     # [B, d_s]
    qs2 = jnp.sum(q_s * q_s, 1)
    q_res = jnp.sqrt(
        jnp.maximum(jnp.sum(qt_vec * qt_vec, 1) - qs2, 0.0) + SLACK_T
    )
    infl = jnp.sqrt(qs2) * ub_slack + SLACK

    # PER-SLAB QUOTAS (round 4): selection and gather stay WITHIN each
    # slab. The first version selected m blocks in concat-block space and
    # gathered them with a masked pass over EVERY slab — each pass reads
    # m*128 rows, so a 10-slab production index paid 10x the gather
    # traffic of the single-slab benchmark corpus (measured: 8.3 ms
    # single-slab vs ~21 ms on ten 2^20-row slabs, latency_decomp round
    # 4). With per-slab quotas the gather reads ~m blocks TOTAL regardless
    # of slab count. Each slab's static quota m_i is proportional to its
    # block count; the certificate stays sound (every non-chosen block of
    # every slab is covered by rest_max) — only tightness redistributes:
    # a query whose hot blocks all live in one slab gets m_i from it
    # instead of m. Benchmark corpora insert in arrival order, so hot
    # rows scatter ~uniformly across slabs and the quota costs nothing.
    B = q.shape[0]
    share_eff = B if share <= 0 else max(1, min(share, B))
    nb_list = [s.shape[0] // BLOCK for s in slabs]
    nb = sum(nb_list)
    quotas = [min(nb_i, -(-m * nb_i // nb)) for nb_i in nb_list]

    qsk = q_s.astype(sketches[0].dtype)
    rows_parts, rscale_parts, rpens_parts, gid_parts = [], [], [], []
    rest_max = jnp.full((B,), NEG_INF)
    start = 0
    for i, sk in enumerate(sketches):
        n = sk.shape[0]
        nb_i, m_i = nb_list[i], quotas[i]
        # stage 1: this slab's UB tile -> per-block maxima (the full
        # [B, N] UB array is never materialized)
        dot = jax.lax.dot_general(
            qsk, sk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HIGHEST,
        )
        ub = dot + q_res[:, None] * resid[i][None, :] + infl[:, None]
        if pens is not None:
            ub = ub + pens[i][None, :]
        valid = (jax.lax.broadcasted_iota(jnp.int32, (n,), 0) + start) < size
        ub = jnp.where(valid[None, :], ub, NEG_INF)
        bmax = ub.reshape(B, nb_i, BLOCK).max(2)           # [B, nb_i]

        # one shared block set per slab for the whole batch (gather cost
        # is B-invariant)
        if share_eff == 1 or m_i <= 1:
            # one distinct query (any further rows are pad copies): the
            # whole quota is its top-m_i by batch-max == its own blockmax
            _, blocks = jax.lax.top_k(bmax.max(0), m_i)    # [m_i]
        else:
            # union of per-query top-(m_i//share) blocks, FILLED to m_i
            # with the best remaining blocks by batch-max (module comment:
            # batch-max alone lets one hot query hog the budget — measured
            # never certifying on distinct-8 batches; the union guarantees
            # each query its own m_i//share best blocks per slab, and the
            # fill makes identical-query batches degenerate to exactly the
            # old batch-max selection). Pad copies of a real query pick
            # its same set, so the union stays within share*mq <= m_i. The
            # lift promotes finite union blocks above every non-union
            # block while leaving NEG_INF (invalid/tombstoned) blocks
            # unpromoted — any selection is sound (the certificate only
            # reads the final mask), this one is just tight for both batch
            # shapes.
            mq = max(1, m_i // share_eff)
            shared = bmax.max(0)                           # [nb_i]
            _, qb = jax.lax.top_k(bmax, mq)                # [B, mq]
            union = jnp.zeros((nb_i,), bool).at[qb.reshape(-1)].set(True)
            _, blocks = jax.lax.top_k(
                jnp.where(union, shared + 1e30, shared), m_i
            )                                              # [m_i] distinct
        chosen = jnp.zeros((nb_i,), bool).at[blocks].set(True)
        rest_max = jnp.maximum(
            rest_max, jnp.where(chosen[None, :], NEG_INF, bmax).max(1)
        )

        # stage 2 gather: this slab's chosen blocks from THIS slab only
        d = slabs[i].shape[1]
        rows_parts.append(slabs[i].reshape(nb_i, BLOCK, d)[blocks])
        if scales is not None:
            rscale_parts.append(scales[i].reshape(nb_i, BLOCK)[blocks])
        if pens is not None:
            rpens_parts.append(pens[i].reshape(nb_i, BLOCK)[blocks])
        gid_parts.append(
            (start + blocks[:, None] * BLOCK
             + jnp.arange(BLOCK, dtype=jnp.int32)[None, :]).reshape(-1)
        )
        start += n

    mt = sum(quotas)
    cat = lambda ps: ps[0] if len(ps) == 1 else jnp.concatenate(ps)
    rows = cat(rows_parts).reshape(mt * BLOCK, slabs[0].shape[1])
    gid = cat(gid_parts)

    # exact rescore of every gathered row in ONE matmul
    if is_int8:
        s32 = jnp.einsum("bd,nd->bn", qi, rows, preferred_element_type=jnp.int32)
        rscale = cat(rscale_parts).reshape(mt * BLOCK)
        ex = s32.astype(jnp.float32) * qs[:, None] * rscale[None, :]
    else:
        ex = jnp.einsum(
            "bd,nd->bn", q.astype(rows.dtype), rows,
            preferred_element_type=jnp.float32,
        ).astype(jnp.float32)
    if pens is not None:
        ex = ex + cat(rpens_parts).reshape(mt * BLOCK)[None, :]
    ex = jnp.where(gid[None, :] < size, ex, NEG_INF)

    vals, pos = exact_topk(ex, k)
    ids = gid[pos]
    tau = vals[:, k - 1]
    certified = rest_max <= tau - fs_slack
    return vals, ids, certified

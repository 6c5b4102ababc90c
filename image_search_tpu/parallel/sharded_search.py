"""Mesh-sharded exact top-k: per-shard matmul+top-k, all-gather, merge.

This is the BASELINE.json config-#4 path ("10M-vector sharded index:
data-parallel embed + allgather, on-TPU cosine top-k per query"): the
embedding matrix lives row-sharded across the mesh; each device scores only
its shard and contributes k candidates, so the collective moves
``devices * k`` (score, index) pairs per query instead of N scores. XLA
compiles the ``all_gather`` onto ICI — the role NCCL allgather would play in
a GPU design (SURVEY.md §5, distributed-communication row).

Supports the quantized row formats of ``index.index``: pass ``scales`` for
int8 rows (per-row dequantization factors); the int8 matmul stays on the
MXU via XLA's f32-exact fast path (K=768 <= 2^24/127^2) and is rescaled in
f32 afterward — the int8 win is 4x less HBM traffic, which is what bounds
the big-corpus score matmul (docs/PERF_NOTES.md).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from image_search_tpu.parallel.mesh import DATA_AXIS

# plain float, NOT jnp.float32(...): a module-level device scalar would
# initialize the JAX backend (and grab the TPU) at import time
NEG_INF = float(jnp.finfo(jnp.float32).min)


def quantize_rows_int8(x: jax.Array):
    """[N, D] f32 -> (int8 values, f32 per-row scales). Symmetric."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale[..., 0]


def shard_scores(emb_l: jax.Array, q: jax.Array, scales_l: Optional[jax.Array]):
    """[B, D] queries x one shard of rows -> [B, n_local] f32 cosine scores."""
    if emb_l.dtype == jnp.int8:
        qi, qs = quantize_rows_int8(q)
        s32 = jax.lax.dot_general(
            qi, emb_l, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )
        return s32.astype(jnp.float32) * qs[:, None] * scales_l[None, :]
    scores = jnp.einsum(
        "bd,nd->bn", q.astype(emb_l.dtype), emb_l, preferred_element_type=jnp.float32
    )
    return scores.astype(jnp.float32)


def sharded_topk(
    slabs,  # tuple of [N_b, D] row slabs (f32/bf16 normalized, or int8), each P(data, None)
    size,  # scalar int32: #valid rows (rows at global id >= size are masked)
    queries: jax.Array,  # [B, D] l2-normalized f32, replicated
    k: int,
    mesh: Mesh,
    scales=None,  # tuple of [N_b] f32 for int8 rows, each P(data)
    approx: bool = False,  # per-shard approx_max_k (recall 0.95) instead of top_k
    pens=None,  # tuple of [N_b] f32 additive penalties (0 live / NEG_INF tombstoned)
):
    """Exact cosine top-k over a row-sharded slabbed corpus.

    Returns (scores [B, k], global_indices [B, k]) replicated on every
    device. Global row ids follow the slab concatenation order (slab b's
    rows span [sum_{c<b} N_c, sum_{c<=b} N_c); within a slab, shard s owns
    the contiguous range [s*N_b/S, (s+1)*N_b/S)). Exactness: global top-k
    rows of the full matrix are a subset of the union of per-shard top-k
    candidates, so the merge loses nothing.
    """
    n_shards = mesh.shape[DATA_AXIS]
    slabs = tuple(slabs)
    slab_rows = [s.shape[0] for s in slabs]
    for n in slab_rows:
        assert n % n_shards == 0, (n, n_shards)
    local_n = sum(slab_rows) // n_shards
    local_k = min(k, local_n)
    slab_starts = np.concatenate([[0], np.cumsum(slab_rows)])[:-1]

    in_specs = [tuple(P(DATA_AXIS, None) for _ in slabs), P(), P(None, None)]
    args = [slabs, size, queries]
    has_scales = scales is not None
    if has_scales:
        in_specs.append(tuple(P(DATA_AXIS) for _ in slabs))
        args.append(tuple(scales))
    if pens is not None:
        in_specs.append(tuple(P(DATA_AXIS) for _ in slabs))
        args.append(tuple(pens))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(None, None), P(None, None)),
        check_rep=False,
    )
    def _search(slabs_l, size_l, q, *rest):
        scales_l = rest[0] if has_scales else None
        pens_l = rest[1 if has_scales else 0] if len(rest) > int(has_scales) else None
        shard_id = jax.lax.axis_index(DATA_AXIS)
        parts, gid_parts = [], []
        for b, emb_l in enumerate(slabs_l):
            nb_local = emb_l.shape[0]
            sc = shard_scores(emb_l, q, None if scales_l is None else scales_l[b])
            if pens_l is not None:
                sc = sc + pens_l[b][None, :]
            parts.append(sc)
            gid_parts.append(
                int(slab_starts[b])
                + shard_id * nb_local
                + jax.lax.broadcasted_iota(jnp.int32, (nb_local,), 0)
            )
        scores = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
        gids = gid_parts[0] if len(gid_parts) == 1 else jnp.concatenate(gid_parts)
        scores = jnp.where((gids < size_l)[None, :], scores, NEG_INF)
        if approx and local_k * 4 < local_n:
            s_k, i_k = jax.lax.approx_max_k(scores, local_k, recall_target=0.95)
        else:
            from image_search_tpu.ops.topk import exact_topk

            s_k, i_k = exact_topk(scores, local_k)  # [B, local_k], exact
        gi_k = gids[i_k]  # local candidate -> global row id

        # gather the candidate sets from every shard: [S, B, local_k]
        all_s = jax.lax.all_gather(s_k, DATA_AXIS, axis=0)
        all_i = jax.lax.all_gather(gi_k, DATA_AXIS, axis=0)
        B = q.shape[0]
        all_s = jnp.moveaxis(all_s, 0, 1).reshape(B, n_shards * local_k)
        all_i = jnp.moveaxis(all_i, 0, 1).reshape(B, n_shards * local_k)

        kk = min(k, n_shards * local_k)
        m_s, m_pos = jax.lax.top_k(all_s, kk)
        m_i = jnp.take_along_axis(all_i, m_pos, axis=1)
        return m_s, m_i

    return _search(*args)

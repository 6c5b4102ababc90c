"""Blockwise-max sketch-dot kernel: the phase-1 sweep of the sketch-based
duplicate scan (index/dupscan.py).

Problem: an all-pairs duplicate scan at corpus scale needs, for every
pair of 128-row blocks (A, B), an upper bound on max_{i in A, j in B}
dot(r_i, r_j). With the two-stage sketch (index/twostage.py) that bound is

    UB(A, B) = max_{i,j} (s_i . s_j) + maxT(A) * maxT(B) + slack

where s are d_s-dim sketches and t the residual norms. The max-sketch-dot
term is an N x N matrix reduced 128x128-blockwise — 1e14 f32 values at
10M rows. XLA cannot fuse a reduction into a dot's output, so a pure-XLA
version would round-trip the FULL product matrix through HBM: 2 x 1e14 x
4 B = 800 TB at ~640 GB/s = hours. This kernel keeps each [ROWS_TILE,
COLS_TILE] product tile in VMEM, reduces it to a [ROWS_TILE/128,
COLS_TILE/128] block of thresholded bits, and writes ONLY the packed
bitmask — HBM traffic drops from O(N^2) values to O(N^2 / 128^2 / 32)
words, and the sweep runs at the MXU's rate (K = d_s = 64 per pass).

Output packing: each int32 word w = out[br, wc] holds the keep-bits of
block-row ``br`` vs block-cols ``wc*32 .. wc*32+31`` (bit b = col block
``wc*32 + b``, LSB-first). Only pairs with col_block >= row_block are
emitted (upper triangle incl. the diagonal); the caller owns
de-duplication below block granularity.

Soundness of the bit: bit set iff

    blockmax(bf16_dot(s~_i, s~_j)) + maxT_r * maxT_c >= thr_minus_slack

where thr_minus_slack = threshold - pair_slack and pair_slack (computed
by the caller, see dupscan._pair_slack) bounds |s_i.s_j - bf16dot| from
sketch storage/cast rounding plus f32 accumulation error. bf16 MXU
products are exact; only the two operand roundings and the f32
accumulation order contribute. A cleared bit therefore PROVES no pair in
the block pair has true dot >= threshold.

No reference counterpart: SurrealDB's MTREE (search.rs:70-77) cannot
self-join at all; this kernel is what makes the 10M /duplicates endpoint
(round-3 verdict item #2) feasible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128          # rows per duplicate-scan block (lane width)
ROWS_TILE = 2048     # row-tile rows per grid step (16 block-rows)
COLS_TILE = 4096     # col-tile rows per grid step (32 block-cols = 1 word)
_RB = ROWS_TILE // BLOCK   # 16 block-rows per tile
_CB = COLS_TILE // BLOCK   # 32 block-cols per tile (= bits per int32 word)


def _kernel(thr_ref, rb0_ref, s_rows_ref, s_cols_ref, tr_ref, tc_ref, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    row_b0 = rb0_ref[0, 0] + i * _RB   # global block index of this tile's 1st row
    col_b0 = j * _CB                   # global block index of this tile's 1st col

    @pl.when(col_b0 + _CB > row_b0)   # tile touches the upper triangle
    def _compute():
        # [ROWS_TILE, COLS_TILE] f32 sketch dots, VMEM-resident only
        d = jax.lax.dot_general(
            s_rows_ref[:], s_cols_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # 128x128-blockwise max, statically unrolled (Mosaic-friendly:
        # aligned sublane/lane slices + plain axis reductions)
        m1 = jnp.concatenate(
            [
                jnp.max(d[r * BLOCK : (r + 1) * BLOCK, :], axis=0, keepdims=True)
                for r in range(_RB)
            ],
            axis=0,
        )  # [_RB, COLS_TILE]
        m = jnp.concatenate(
            [
                jnp.max(m1[:, c * BLOCK : (c + 1) * BLOCK], axis=1, keepdims=True)
                for c in range(_CB)
            ],
            axis=1,
        )  # [_RB, _CB]
        ub = m + tr_ref[:] * tc_ref[:]             # + maxT_r * maxT_c
        rowb = row_b0 + jax.lax.broadcasted_iota(jnp.int32, (_RB, _CB), 0)
        colb = col_b0 + jax.lax.broadcasted_iota(jnp.int32, (_RB, _CB), 1)
        keep = (ub >= thr_ref[0, 0]) & (colb >= rowb)
        bit = jax.lax.broadcasted_iota(jnp.int32, (_RB, _CB), 1)
        words = jnp.sum(
            jnp.where(keep, jnp.left_shift(jnp.int32(1), bit), 0),
            axis=1,
            keepdims=True,
        )  # [_RB, 1] int32, LSB = first col block of the tile
        out_ref[:] = words

    @pl.when(col_b0 + _CB <= row_b0)  # strictly below the diagonal: skip
    def _skip():
        out_ref[:] = jnp.zeros((_RB, 1), jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def blockpair_mask(
    s_rows: jax.Array,        # [R, d_s] bf16 row-tile sketches (R % ROWS_TILE == 0)
    s_cols: jax.Array,        # [N, d_s] bf16 full corpus sketches (N % COLS_TILE == 0)
    t_rows: jax.Array,        # [R // BLOCK] f32 block-max residual norms (row side)
    t_cols: jax.Array,        # [N // BLOCK] f32 block-max residual norms (col side)
    thr_minus_slack,          # f32 scalar: threshold - pair_slack
    row_block0,               # int32 scalar: global block index of s_rows[0]
    interpret: bool = False,
) -> jax.Array:
    """Packed upper-triangle block-pair keep mask.

    Returns [R // BLOCK, N // (BLOCK*32)] int32 — see module docstring for
    the bit layout and the soundness statement."""
    r, ds = s_rows.shape
    n = s_cols.shape[0]
    assert r % ROWS_TILE == 0 and n % COLS_TILE == 0, (r, n)
    assert s_rows.dtype == jnp.bfloat16 and s_cols.dtype == jnp.bfloat16
    grid = (r // ROWS_TILE, n // COLS_TILE)
    thr = jnp.full((1, 1), thr_minus_slack, jnp.float32)
    rb0 = jnp.full((1, 1), row_block0, jnp.int32)
    tr = t_rows.astype(jnp.float32).reshape(r // BLOCK, 1)
    tc = t_cols.astype(jnp.float32).reshape(1, n // BLOCK)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                        # thr
            pl.BlockSpec(memory_space=pltpu.SMEM),                        # rb0
            pl.BlockSpec((ROWS_TILE, ds), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((COLS_TILE, ds), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_RB, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _CB), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_RB, 1), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((r // BLOCK, n // COLS_TILE), jnp.int32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(thr, rb0, s_rows, s_cols, tr, tc)

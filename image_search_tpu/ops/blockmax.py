"""Blockwise-max sketch-dot kernel: the phase-1 sweep of the sketch-based
duplicate scan (index/dupscan.py).

Problem: an all-pairs duplicate scan at corpus scale needs, for every
pair of 128-row blocks (A, B), an upper bound on max_{i in A, j in B}
dot(r_i, r_j). With the two-stage sketch (index/twostage.py), Cauchy-
Schwarz on the residuals gives the per-PAIR bound

    r_i . r_j  <=  s_i . s_j + t_i * t_j

where s are d_s-dim sketches and t the (inflated) residual norms. The
caller AUGMENTS each sketch with its residual norm as one extra
coordinate, a_i = [s_i, t_i], so the whole right side is a single dot
a_i . a_j — the per-pair UB is exactly an MXU contraction, and the
block-pair bound is the 128x128-blockwise max of that product matrix.
(This is tighter than the separable blockmax(s.s) + maxT*maxT form, and
it keeps every kernel operand MXU/VPU-shaped — no sub-128-lane side
inputs, which Mosaic's (8,128) tiling rules reject.)

That product matrix is 1e14 f32 values at 10M rows. XLA cannot fuse a
reduction into a dot's output, so a pure-XLA version would round-trip
the FULL matrix through HBM: 800 TB at ~640 GB/s = hours. This kernel
keeps each [ROWS_TILE, COLS_TILE] product tile in VMEM, reduces it to a
[ROWS_TILE/128, COLS_TILE/128] block of thresholded bits, and writes
ONLY packed bitmask words — HBM traffic drops from O(N^2) values to
O(N^2 / 128^2 / 32) words, and the sweep runs at the MXU's rate.

Output packing: each int32 word w = out[br, wc] holds the keep-bits of
block-row ``br`` vs block-cols ``wc*32 .. wc*32+31`` (bit b = col block
``wc*32 + b``, LSB-first). Only pairs with col_block >= row_block are
emitted (upper triangle incl. the diagonal); the caller owns
de-duplication below block granularity. The word row is accumulated in
a VMEM-resident [_RB, W] block across the j grid sweep (index_map pins
it per row-tile) and each j-tile contributes its word column via a
lane-masked select — no sub-128-lane output blocks.

Soundness of the bit: bit set iff blockmax(bf16_dot(a~_i, a~_j)) >=
thr_minus_slack, where thr_minus_slack = threshold - pair_slack and
pair_slack (computed by the caller, see dupscan._pair_slack) bounds
|a_i.a_j - bf16dot| from storage/cast rounding plus f32 accumulation
error. bf16 MXU products are exact; only the two operand roundings and
the f32 accumulation order contribute. A cleared bit therefore PROVES no
pair in the block pair has true dot >= threshold.

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
ROWS_TILE = 1024     # row-tile rows per grid step (8 block-rows)
COLS_TILE = 4096     # col-tile rows per grid step (32 block-cols = 1 word)
_RB = ROWS_TILE // BLOCK   # 8 block-rows per tile
_CB = COLS_TILE // BLOCK   # 32 block-cols per tile (= bits per int32 word)


def _kernel(thr_ref, rb0_ref, s_rows_ref, s_cols_ref, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    row_b0 = rb0_ref[0, 0] + i * _RB   # global block index of this tile's 1st row
    col_b0 = j * _CB                   # global block index of this tile's 1st col

    @pl.when(j == 0)                  # fresh word row for this row-tile
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(col_b0 + _CB > row_b0)   # tile touches the upper triangle
    def _compute():
        # [ROWS_TILE, COLS_TILE] f32 augmented-sketch dots (= per-pair
        # UBs), VMEM-resident only: 1024 x 4096 x 4 B = 16 MB
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
        rowb = row_b0 + jax.lax.broadcasted_iota(jnp.int32, (_RB, _CB), 0)
        colb = col_b0 + jax.lax.broadcasted_iota(jnp.int32, (_RB, _CB), 1)
        keep = (m >= thr_ref[0, 0]) & (colb >= rowb)
        bit = jax.lax.broadcasted_iota(jnp.int32, (_RB, _CB), 1)
        words = jnp.sum(
            jnp.where(keep, jnp.left_shift(jnp.int32(1), bit), 0),
            axis=1,
            keepdims=True,
        )  # [_RB, 1] int32, LSB = first col block of the tile
        # contribute word column j of the resident [_RB, W] row block
        lane = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
        out_ref[:] = jnp.where(lane == j, words, out_ref[:])


# values-kernel col tiling: one grid step covers 128 block-cols so its
# output block is a NATIVE (8, 128) f32 tile — Mosaic rejects mid-array
# blocks narrower than the (8, 128) tiling granule, which is why the mask
# kernel packs words into a resident full-row block instead. The 16384
# cols are swept as 4 sequential sub-dots of COLS_TILE=4096 rows so the
# VMEM-resident product tile stays 1024 x 4096 x 4 B = 16 MB, same as
# the mask kernel's.
COLS_TILE_V = 4 * COLS_TILE     # 16384 rows = 128 block-cols per grid step
_CBV = COLS_TILE_V // BLOCK     # 128


def _values_kernel(rb0_ref, s_rows_ref, s_cols_ref, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    row_b0 = rb0_ref[0, 0] + i * _RB
    col_b0 = j * _CBV

    @pl.when(col_b0 + _CBV > row_b0)  # tile touches the upper triangle
    def _compute():
        parts = []
        for s in range(COLS_TILE_V // COLS_TILE):
            d = jax.lax.dot_general(
                s_rows_ref[:],
                s_cols_ref[s * COLS_TILE : (s + 1) * COLS_TILE, :],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [ROWS_TILE, COLS_TILE], reduced before the next sub-dot
            m1 = jnp.concatenate(
                [
                    jnp.max(d[r * BLOCK : (r + 1) * BLOCK, :], axis=0,
                            keepdims=True)
                    for r in range(_RB)
                ],
                axis=0,
            )  # [_RB, COLS_TILE]
            parts.append(jnp.concatenate(
                [
                    jnp.max(m1[:, c * BLOCK : (c + 1) * BLOCK], axis=1,
                            keepdims=True)
                    for c in range(_CB)
                ],
                axis=1,
            ))  # [_RB, _CB]
        m = jnp.concatenate(parts, axis=1)  # [_RB, _CBV]
        rowb = row_b0 + jax.lax.broadcasted_iota(jnp.int32, (_RB, _CBV), 0)
        colb = col_b0 + jax.lax.broadcasted_iota(jnp.int32, (_RB, _CBV), 1)
        out_ref[:] = jnp.where(colb >= rowb, m, jnp.float32(-jnp.inf))

    @pl.when(col_b0 + _CBV <= row_b0)  # fully below the diagonal: no compute
    def _skip():
        out_ref[:] = jnp.full_like(out_ref, -jnp.inf)


@functools.partial(jax.jit, static_argnames=("interpret",))
def blockpair_values(
    s_rows: jax.Array,        # [R, d_a] bf16 row-tile sketches
    s_cols: jax.Array,        # [N, d_a] bf16 full-corpus sketches
    row_block0,               # int32 scalar: global block index of s_rows[0]
    interpret: bool = False,
) -> jax.Array:
    """Upper-triangle blockwise-max sketch-dot VALUES, [R//BLOCK, N//BLOCK]
    f32 (lower triangle = -inf).

    The NON-certified sibling of :func:`blockpair_mask`: instead of
    thresholding against a provable per-pair upper bound, it hands the raw
    blockmax products to the caller, which keeps only each block-row's
    top-c column blocks as rescore candidates (index/dupscan.py
    ``sketch_candidate_pairs``). Used when the certified scan bails out on
    spectrally flat corpora — there the residual term swamps the bound but
    a true near-duplicate pair still tops its block-row's sketch dots.
    Same row tiling and VMEM discipline as the mask kernel; HBM output is
    O(N^2 / 128^2) f32 values per sweep instead of packed words (160 MB
    per 65536-row call at 10M — why the candidate scan uses smaller calls
    than the certified scan's ROWS_PER_CALL)."""
    r, da = s_rows.shape
    n = s_cols.shape[0]
    assert r % ROWS_TILE == 0 and n % COLS_TILE_V == 0, (r, n)
    assert s_rows.dtype == jnp.bfloat16 and s_cols.dtype == jnp.bfloat16
    grid = (r // ROWS_TILE, n // COLS_TILE_V)
    rb0 = jnp.full((1, 1), row_block0, jnp.int32)
    return pl.pallas_call(
        _values_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                        # rb0
            pl.BlockSpec((ROWS_TILE, da), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((COLS_TILE_V, da), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_RB, _CBV), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((r // BLOCK, n // BLOCK), jnp.float32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(rb0, s_rows, s_cols)


@functools.partial(jax.jit, static_argnames=("interpret",))
def blockpair_mask(
    s_rows: jax.Array,        # [R, d_a] bf16 row-tile AUGMENTED sketches
    s_cols: jax.Array,        # [N, d_a] bf16 full-corpus augmented sketches
    thr_minus_slack,          # f32 scalar: threshold - pair_slack
    row_block0,               # int32 scalar: global block index of s_rows[0]
    interpret: bool = False,
) -> jax.Array:
    """Packed upper-triangle block-pair keep mask.

    ``s_rows``/``s_cols`` carry the residual norm as their last
    coordinate (see module docstring), so the kernel's dot IS the
    per-pair upper bound. Returns [R // BLOCK, N // (BLOCK*32)] int32 —
    see module docstring for the bit layout and soundness statement."""
    r, da = s_rows.shape
    n = s_cols.shape[0]
    assert r % ROWS_TILE == 0 and n % COLS_TILE == 0, (r, n)
    assert s_rows.dtype == jnp.bfloat16 and s_cols.dtype == jnp.bfloat16
    grid = (r // ROWS_TILE, n // COLS_TILE)
    w = n // COLS_TILE
    thr = jnp.full((1, 1), thr_minus_slack, jnp.float32)
    rb0 = jnp.full((1, 1), row_block0, jnp.int32)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                        # thr
            pl.BlockSpec(memory_space=pltpu.SMEM),                        # rb0
            pl.BlockSpec((ROWS_TILE, da), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((COLS_TILE, da), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            # full word row per row-tile, revisited across the j sweep
            (_RB, w), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((r // BLOCK, w), jnp.int32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(thr, rb0, s_rows, s_cols)

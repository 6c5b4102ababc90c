"""Streaming int8 score kernel: one-pass cosine scoring with fused epilogue.

Streams the slab through VMEM in double-buffered blocks and fuses the
scale / tombstone-penalty / valid-row masking epilogue, so each int8 byte
is read exactly once. Measured at 10M rows (real v5e, benchmarks/
stream_vs_xla_batched.json): full fused search 13.86/21.13/48.47 ms vs
the XLA dot's 14.00/21.22/48.54 at B=1/8/32 — never slower, ~1% at B=1.
Both engines plateau at ~630 GB/s effective (the 819 GB/s HBM roofline
is NOT the binding constraint; see benchmarks/hbm_read_probe.py and the
PERF_NOTES round-3 study), so this kernel is the measured floor of this
toolchain, not a bandwidth breakthrough.

Bit-exactness vs the XLA int8 path (``parallel/sharded_search.py:42``):
the int8 query and int8 rows are upcast to bf16 in VMEM and multiplied on
the MXU with f32 accumulation. Every product of two ints in [-127, 127]
has <= 16 mantissa bits (exact in the MXU's f32 product), and every
partial sum is an integer <= 127*127*D < 2^24 for D <= 1024 (exact in
f32) — so the accumulated score EQUALS the int32 accumulation bitwise,
and the epilogue applies the same multiplies in the same order as the
XLA path. CPU/XLA and TPU/Pallas therefore agree bitwise on int8 scores.

Replaces the scoring half of the reference's out-of-process MTREE KNN
(``server/src/search.rs:70-77``) on the serving path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)

# rows streamed per grid step; every slab (and every per-shard slab piece)
# is a multiple of the 4096-row append block (index.py:66), so any
# power-of-two divisor of 4096 up to the slab size divides cleanly.
_DEFAULT_BLOCK = int(os.environ.get("ISX_SCORE_BLOCK", "4096"))


def _dot(qi_ref, rows_ref, accum: str):
    """[B, D] query block x [block, D] rows -> [B, block] f32 scores.

    Both modes produce the SAME f32 value bitwise: every accumulated sum is
    an integer < 2^24 (see module docstring), exact in f32 and in s32 alike.
    ``s32`` feeds the MXU int8 inputs directly (no upcast VPU pass; Mosaic's
    s8 dot measured ~1.1x bf16 rate, docs/PERF_NOTES.md round-2 int8 study —
    just enough to cross from compute-bound to HBM-bound at B <= 128);
    ``bf16`` upcasts in VMEM.
    """
    if accum == "s32":
        s32 = jax.lax.dot_general(
            qi_ref[:], rows_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return s32.astype(jnp.float32)
    r = rows_ref[:].astype(jnp.bfloat16)
    return jax.lax.dot_general(
        qi_ref[:].astype(jnp.bfloat16), r, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kernel(limit_ref, qi_ref, qs_ref, rows_ref, scale_ref, out_ref, *, accum):
    i = pl.program_id(0)
    bn = rows_ref.shape[0]
    s = _dot(qi_ref, rows_ref, accum)
    s = s * qs_ref[:]                 # == s32.astype(f32) * qs[:, None]
    s = s * scale_ref[:]              # == ... * scales[None, :]
    gpos = i * bn + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    out_ref[:] = jnp.where(gpos < limit_ref[0, 0], s, NEG_INF)


def _kernel_pen(limit_ref, qi_ref, qs_ref, rows_ref, scale_ref, pen_ref, out_ref, *, accum):
    i = pl.program_id(0)
    bn = rows_ref.shape[0]
    s = _dot(qi_ref, rows_ref, accum)
    s = s * qs_ref[:]
    s = s * scale_ref[:]
    s = s + pen_ref[:]                # == s + pens[None, :]
    gpos = i * bn + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    out_ref[:] = jnp.where(gpos < limit_ref[0, 0], s, NEG_INF)


@functools.partial(jax.jit, static_argnames=("block", "interpret", "accum"))
def stream_scores_int8(
    rows: jax.Array,      # [N, D] int8 slab (N % block == 0, D % 128 == 0)
    qi: jax.Array,        # [B, D] int8 quantized queries
    qs: jax.Array,        # [B] f32 per-query scales
    scales: jax.Array,    # [N] f32 per-row scales
    limit,                # int32 scalar: rows at local pos >= limit -> NEG_INF
    pens: jax.Array | None = None,  # [N] f32 additive penalties, or None
    block: int = _DEFAULT_BLOCK,
    interpret: bool = False,
    accum: str = "s32",
):
    """Masked cosine scores [B, N] f32, one streaming pass over the slab."""
    n, d = rows.shape
    b = qi.shape[0]
    assert n % block == 0 and d % 128 == 0, (n, d, block)
    assert accum in ("s32", "bf16"), accum
    grid = (n // block,)
    limit_arr = jnp.full((1, 1), limit, jnp.int32)
    qi_in = qi if accum == "s32" else qi.astype(jnp.bfloat16)
    qs_col = qs.astype(jnp.float32).reshape(b, 1)
    scale_row = scales.astype(jnp.float32).reshape(1, n)
    kernel = functools.partial(
        _kernel if pens is None else _kernel_pen, accum=accum
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                      # limit
        pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    args = [limit_arr, qi_in, qs_col, rows, scale_row]
    if pens is not None:
        in_specs.append(
            pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
        args.append(pens.astype(jnp.float32).reshape(1, n))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*args)


def stream_ok(rows: jax.Array, block: int = _DEFAULT_BLOCK) -> bool:
    """True when the slab's shape admits the streaming kernel."""
    n, d = rows.shape
    return rows.dtype == jnp.int8 and n % block == 0 and d % 128 == 0

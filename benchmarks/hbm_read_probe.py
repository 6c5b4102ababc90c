"""Discriminator: is the 10M int8 score pass HBM-bound or MXU-bound?

stream_vs_xla_batched.py showed every scoring engine (XLA int8 dot, XLA
bf16-upcast dot, Pallas stream kernel s32/bf16, any block size) plateaus at
12.2-12.7 ms for the 7.69 GB slab read = ~630 GB/s effective. Two theories:
  (a) MXU wall: the B<=128 matvec pads the query tile, 983 GMACs = 10.0 ms
      at bf16 peak; measured 12.2 = 82% MFU, bandwidth to spare.
  (b) HBM wall: ~630 GB/s is simply v5e's practical streamed-read rate for
      this pattern; peak 819 is unreachable.
This kernel reads the same slab with NO matmul (per-block int8 max, trivial
VPU work) at several block sizes. ~9.4-10 ms favors (a) — a VPU scorer
could beat the dot; ~12+ ms proves (b) — 13.9 ms full search is the floor.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from image_search_tpu.index.index import _write_block
    from image_search_tpu.parallel.sharded_search import quantize_rows_int8

    dim = 768
    n = 10_000_000
    n_pad = 2444 * 4096
    ch = 1_000_000

    @jax.jit
    def gen_int8(key):
        e = jax.random.normal(key, (ch, dim), jnp.float32)
        e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
        return quantize_rows_int8(e)

    log("building corpus...")
    buf = jnp.zeros((n_pad, dim), jnp.int8)
    for i in range(n // ch):
        qi, _ = gen_int8(jax.random.key(i))
        buf = _write_block(buf, qi, jnp.asarray(i * ch, jnp.int32))
    buf.block_until_ready()

    def _kernel(rows_ref, out_ref):
        # Mosaic rejects output blocks narrower than (8, 128); keep one
        # running-max tile resident in VMEM across all grid steps
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            out_ref[:] = jnp.full((8, 128), jnp.iinfo(jnp.int32).min, jnp.int32)

        m = jnp.max(rows_ref[:].astype(jnp.int32))
        out_ref[:] = jnp.maximum(out_ref[:], m)

    @functools.partial(jax.jit, static_argnames=("block",))
    def read_max(rows, block):
        grid = (rows.shape[0] // block,)
        per_block = pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block, dim), lambda i: (i, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(rows)
        return jnp.max(per_block)

    def timeit(fn, *args, iters=15, reps=3):
        def burst(m):
            t0 = time.perf_counter()
            out = None
            for _ in range(m):
                out = fn(*args)
            float(out)
            return (time.perf_counter() - t0) / m

        burst(2)
        return min(burst(iters) for _ in range(reps)) * 1e3

    results = {}
    gb = n_pad * dim / 1e9
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "hbm_read_probe.json"
    )
    # blk 8192 trips the 16 MB scoped-VMEM limit (the i32 upcast inside the
    # max materializes a 25 MB block); 2048/4096 suffice — both measured
    # 12.0 ms = ~640 GB/s, the platform's streamed-read wall
    for blk in (2048, 4096):
        ms = timeit(read_max, buf, blk)
        results[f"pure_read_blk{blk}_ms"] = round(ms, 2)
        results[f"pure_read_blk{blk}_gbps"] = round(gb / (ms / 1e3), 1)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        log(json.dumps(results))
    print(json.dumps(results))


if __name__ == "__main__":
    main()

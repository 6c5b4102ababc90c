"""Domain fine-tuning driver: (image, caption) pairs -> adapted checkpoint.

The reference ships frozen weights only; a production search deployment
wants its embedding space adapted to its corpus (product photos, medical
imagery, ...). This driver closes the loop around ``train.contrastive``:

    python -m image_search_tpu.train.finetune \
        --data-dir /captions --weights models/clip.safetensors \
        --tokenizer-dir models/tokenizer --out models/clip_ft.safetensors

Data layout: every image file with a same-stem ``.txt`` sidecar caption
(``dog.jpg`` + ``dog.txt``). Batches shard over the mesh's data axis; the
towers stay numerically the checkpoint's (bf16 compute optional).
"""

from __future__ import annotations

import argparse
import logging
import os
import random
from typing import List, Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)


class BatchPrefetcher:
    """Keeps ONE batch of host work (decode + preprocess + tokenize) in
    flight on a background thread, so step N+1's input is built while the
    device runs step N — the same software double-buffer the ingest
    pipeline uses (ingest/pipeline.py). Without it the chip idles for the
    full decode time between steps (round-2 review: ~500 ms of decode per
    396 ms step at batch 64 = >50% input-bound).

    ``make_batch()`` runs strictly serialized on the single worker thread,
    so shared state inside it (the sampling RNG, the decode pool) needs no
    extra locking and batch order stays deterministic."""

    def __init__(self, make_batch):
        from concurrent.futures import ThreadPoolExecutor

        self._make = make_batch
        self._pool = ThreadPoolExecutor(max_workers=1)
        self._inflight = self._pool.submit(make_batch)

    def next(self):
        """Return the ready batch and immediately start building the next
        one (overlapping whatever the caller does with the result)."""
        batch = self._inflight.result()
        self._inflight = self._pool.submit(self._make)
        return batch

    def close(self) -> None:
        self._pool.shutdown(wait=False, cancel_futures=True)


def find_pairs(data_dir: str) -> List[Tuple[str, str]]:
    """(image_path, caption) pairs via .txt sidecars."""
    from image_search_tpu.ingest.walk import iter_images

    pairs = []
    for img in iter_images(data_dir):
        txt = os.path.splitext(img)[0] + ".txt"
        if os.path.exists(txt):
            with open(txt, encoding="utf-8") as f:
                caption = f.read().strip()
            if caption:
                pairs.append((img, caption))
    return pairs


def run_finetune(
    params,
    cfg,
    tokenizer,
    pairs: List[Tuple[str, str]],
    *,
    mesh=None,
    batch_size: int = 64,
    steps: int = 100,
    learning_rate: float = 1e-5,
    compute_dtype=None,
    preprocess_mode: str = "hf",
    remat: bool = False,
    remat_policy: str = "dots_with_no_batch_dims_saveable",
    fsdp: bool = False,
    seed: int = 0,
    log_every: int = 10,
    checkpoint_dir: str | None = None,
    save_every: int = 100,
    thumb_cache=None,
):
    """Returns (trained params, list of losses). Pure-Python loop around the
    jitted mesh-sharded train step.

    remat_policy (with remat=True) picks the jax.checkpoint policy for the
    scanned blocks. The default saves matmul outputs and recomputes only
    the cheap elementwise/LN work: measured 324.6 vs full remat's 375.1
    ms/step at ViT-L/14 batch 64 (+15.6% train throughput,
    benchmarks/train_step_bench.json; no-remat OOMs a 16 GB chip at B>=32).
    Pass "" for full remat (max memory headroom)."""
    import os

    import jax
    import jax.numpy as jnp
    import optax

    if remat:  # consumed by models/clip.py::_encoder at trace time
        os.environ["ISX_REMAT_POLICY"] = remat_policy

    from image_search_tpu.ingest.decode import DecodePool
    from image_search_tpu.ops.preprocess import fused_preprocess, pack_batch
    from image_search_tpu.train.contrastive import make_train_step

    if compute_dtype is None:
        compute_dtype = (
            jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32
        )
    optimizer = optax.adamw(learning_rate, weight_decay=0.01)
    init_fn, step_fn = make_train_step(
        cfg, optimizer, mesh=mesh, compute_dtype=compute_dtype, remat=remat,
        fsdp=fsdp,
    )
    state = init_fn(params)
    if checkpoint_dir:
        from image_search_tpu.train.checkpoint import load_train_state

        restored = load_train_state(checkpoint_dir, state)
        if restored is not None:
            state = restored

    rng = random.Random(seed)
    pool = DecodePool(workers=8, thumb_cache=thumb_cache)

    def make_batch():
        """Decode + pack + tokenize one batch — HOST work only, no device
        dispatch. Runs on the prefetch thread, overlapped with the device
        step; the (cheap, fused) device preprocess runs on the main thread
        so exactly one thread ever talks to the device — concurrent
        dispatch from the prefetch thread intermittently aborted XLA:CPU
        in tests, and on TPU it serialized behind the step anyway."""
        # keep the batch EXACTLY batch_size: a short batch breaks
        # mesh in_shardings divisibility and forces jit retraces
        images, captions = [], []
        for _ in range(5):  # refill rounds for decode failures
            need = batch_size - len(images)
            if need == 0:
                break
            # sample WITHOUT replacement within a batch: a pair drawn
            # twice puts two identical caption rows in the contrastive
            # batch, and each is a false negative for the other (the
            # in-batch softmax labels conflict on identical text
            # embeddings). With-replacement draws at batch~dataset size
            # measurably smeared the learned clusters (round 5,
            # examples/learned_retrieval.py experiments).
            if len(pairs) >= need:
                batch = rng.sample(pairs, need)
            else:
                batch = [pairs[rng.randrange(len(pairs))] for _ in range(need)]
            kept, decoded = pool.decode_batch([p for p, _ in batch])
            cap_by_path = {p: c for p, c in batch}
            images.extend(decoded)
            captions.extend(cap_by_path[p] for p in kept)
        if len(images) < batch_size:
            return None
        u8, a_h, a_w = pack_batch(
            images, size=cfg.vision.image_size, mode=preprocess_mode
        )
        ids = tokenizer(captions, cfg.text.context_length)
        return ids, u8, a_h, a_w

    losses: List[float] = []
    prefetcher = BatchPrefetcher(make_batch)
    try:
        for step in range(int(state.step), steps):
            batch = prefetcher.next()  # next batch builds during this step
            if batch is None:
                log.warning("step %d skipped: could not fill batch", step)
                continue
            ids, u8, a_h, a_w = batch
            # device preprocess on the main thread; the array stays on
            # device — the step consumes it without a host round-trip
            pixels = fused_preprocess(
                jnp.asarray(u8), jnp.asarray(a_h), jnp.asarray(a_w),
                mode=preprocess_mode, out_dtype=jnp.float32,
            )
            state, metrics = step_fn(state, ids, pixels)
            loss = float(metrics["loss"])
            losses.append(loss)
            if step % log_every == 0:
                log.info(
                    "step %d loss %.4f acc %.3f", step, loss,
                    float(metrics["img_to_txt_acc"]),
                )
            if checkpoint_dir and (step + 1) % save_every == 0:
                from image_search_tpu.train.checkpoint import save_train_state

                save_train_state(checkpoint_dir, state)
    finally:
        prefetcher.close()
        pool.close()
    if checkpoint_dir:
        from image_search_tpu.train.checkpoint import save_train_state

        save_train_state(checkpoint_dir, state)
    return state.params, losses


def main(argv: Optional[List[str]] = None) -> None:
    logging.basicConfig(level="INFO")
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--weights", required=True)
    ap.add_argument("--tokenizer-dir", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--mesh-data", type=int, default=None)
    ap.add_argument("--mesh-model", type=int, default=1)
    ap.add_argument("--remat", action="store_true",
                    help="recompute activations in backward (fits ViT-L/14 on 16GB)")
    ap.add_argument("--remat-policy", default="dots_with_no_batch_dims_saveable",
                    help="jax.checkpoint policy with --remat: the default "
                         "saves matmul outputs (324.6 vs 375.1 ms/step at "
                         "ViT-L/14 batch 64); '' = full remat")
    ap.add_argument("--fsdp", action="store_true",
                    help="ZeRO-3: shard params/grads/optimizer state over the "
                         "data axis (for towers whose adam state outgrows a chip)")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="orbax train-state dir: resume + periodic saves")
    ap.add_argument("--save-every", type=int, default=100)
    ap.add_argument("--eval-dir", default=None,
                    help="held-out (image, .txt caption) pairs: retrieval "
                         "R@k is measured before and after training "
                         "(train/eval.py) so the run proves an improvement")
    ap.add_argument("--thumb-cache", default="",
                    help="persistent decoded-tile cache dir (shareable with "
                         "the server's --thumb-cache): epochs after the "
                         "first skip full decode entirely")
    args = ap.parse_args(argv)

    import jax

    from image_search_tpu.models.convert import load_checkpoint, save_checkpoint
    from image_search_tpu.parallel.mesh import make_mesh
    from image_search_tpu.tokenizer import CLIPBPETokenizer, HashTokenizer

    params, cfg = load_checkpoint(args.weights)
    if args.tokenizer_dir:
        tokenizer = CLIPBPETokenizer.from_dir(args.tokenizer_dir, cfg.text.context_length)
    else:
        log.warning("no --tokenizer-dir: hash tokenizer (NOT for real training)")
        tokenizer = HashTokenizer(cfg.text.vocab_size, cfg.text.context_length)

    pairs = find_pairs(args.data_dir)
    log.info("found %d (image, caption) pairs", len(pairs))
    if not pairs:
        raise SystemExit("no training pairs (need image files with .txt sidecars)")

    mesh = (
        make_mesh(args.mesh_data, args.mesh_model)
        if (args.mesh_data or args.mesh_model > 1 or len(jax.devices()) > 1)
        else None
    )

    def eval_retrieval(p, tag: str):
        if not args.eval_dir:
            return
        from image_search_tpu.models.embedder import ClipEmbedder
        from image_search_tpu.train.eval import evaluate_pairs

        eval_pairs = find_pairs(args.eval_dir)
        if not eval_pairs:
            log.warning("--eval-dir %s has no pairs; skipping", args.eval_dir)
            return
        emb = ClipEmbedder(p, cfg, tokenizer=tokenizer, mesh=mesh)
        metrics, n = evaluate_pairs(emb, eval_pairs)
        log.info("retrieval %s (%d pairs): %s", tag, n, metrics)

    eval_retrieval(params, "BEFORE")
    thumb_cache = None
    if args.thumb_cache:
        from image_search_tpu.ingest.thumbcache import ThumbCache

        thumb_cache = ThumbCache(args.thumb_cache)
    trained, losses = run_finetune(
        params, cfg, tokenizer, pairs,
        mesh=mesh, batch_size=args.batch_size, steps=args.steps,
        learning_rate=args.lr, remat=args.remat,
        remat_policy=args.remat_policy, fsdp=args.fsdp,
        checkpoint_dir=args.checkpoint_dir, save_every=args.save_every,
        thumb_cache=thumb_cache,
    )
    save_checkpoint(args.out, trained, cfg)
    log.info("wrote %s (final loss %.4f)", args.out, losses[-1] if losses else float("nan"))
    eval_retrieval(trained, "AFTER")


if __name__ == "__main__":
    main()

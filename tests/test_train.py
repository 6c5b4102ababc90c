"""Contrastive training: loss decreases, DP/TP sharded step == unsharded."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from image_search_tpu.config import tiny_test_config
from image_search_tpu.models import init_params
from image_search_tpu.parallel import make_mesh
from image_search_tpu.train import make_train_step


def make_batch(rng, cfg, B):
    ids = rng.integers(1, cfg.text.eos_token_id - 1, size=(B, cfg.text.context_length))
    ids[:, 0] = cfg.text.eos_token_id - 1
    ids[:, -1] = cfg.text.eos_token_id
    pix = rng.normal(size=(B, cfg.vision.image_size, cfg.vision.image_size, 3))
    return ids.astype(np.int32), pix.astype(np.float32)


def test_loss_decreases(rng):
    cfg = tiny_test_config()
    params = init_params(jax.random.key(0), cfg)
    init_fn, step_fn = make_train_step(cfg, optax.adam(1e-3))
    state = init_fn(params)
    ids, pix = make_batch(rng, cfg, 16)
    losses = []
    for _ in range(30):
        state, metrics = step_fn(state, jnp.asarray(ids), jnp.asarray(pix))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses[::10]
    assert int(state.step) == 30


@pytest.mark.parametrize("n_data,n_model", [(8, 1), (4, 2)])
def test_sharded_step_matches_unsharded(rng, n_data, n_model):
    cfg = tiny_test_config()
    params = init_params(jax.random.key(1), cfg)
    ids, pix = make_batch(rng, cfg, 16)
    opt = optax.sgd(1e-2)

    init_u, step_u = make_train_step(cfg, opt)
    su = init_u(params)
    su, mu = step_u(su, jnp.asarray(ids), jnp.asarray(pix))

    mesh = make_mesh(n_data, n_model)
    init_s, step_s = make_train_step(cfg, opt, mesh=mesh)
    # step_fn donates its state, so the first branch consumed `params`
    ss = init_s(init_params(jax.random.key(1), cfg))
    ss, ms = step_s(ss, jnp.asarray(ids), jnp.asarray(pix))

    assert np.allclose(float(mu["loss"]), float(ms["loss"]), atol=1e-5)
    # updated parameters must agree across sharding layouts
    flat_u = jax.tree.leaves(su.params)
    flat_s = jax.tree.leaves(ss.params)
    for a, b in zip(flat_u, flat_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5)


def test_finetune_driver_end_to_end(tmp_path, rng):
    """Full fine-tune loop: sidecar dataset -> decode -> preprocess -> train
    -> checkpoint; loss must be finite and the checkpoint loadable."""
    from PIL import Image

    from image_search_tpu.models.convert import load_checkpoint, save_checkpoint
    from image_search_tpu.tokenizer import HashTokenizer
    from image_search_tpu.train.finetune import find_pairs, run_finetune

    cfg = tiny_test_config()
    params = init_params(jax.random.key(0), cfg)
    data = tmp_path / "data"
    data.mkdir()
    captions = ["a red photo", "a green photo", "a blue photo", "noise"]
    for i, cap in enumerate(captions * 2):
        arr = rng.integers(0, 256, size=(40, 40, 3)).astype(np.uint8)
        Image.fromarray(arr).save(data / f"img{i}.jpg")
        (data / f"img{i}.txt").write_text(cap)

    pairs = find_pairs(str(data))
    assert len(pairs) == 8

    tok = HashTokenizer(cfg.text.vocab_size, cfg.text.context_length)
    trained, losses = run_finetune(
        params, cfg, tok, pairs, batch_size=8, steps=5, learning_rate=1e-3,
        log_every=100,
    )
    assert len(losses) == 5 and all(np.isfinite(l) for l in losses)

    # same loop under mesh + fsdp (the driver's --fsdp path)
    trained_f, losses_f = run_finetune(
        params, cfg, tok, pairs, mesh=make_mesh(8, 1), fsdp=True,
        batch_size=8, steps=2, learning_rate=1e-3, log_every=100,
    )
    assert len(losses_f) == 2 and all(np.isfinite(l) for l in losses_f)

    out = str(tmp_path / "ft.safetensors")
    save_checkpoint(out, trained, cfg)
    p2, cfg2 = load_checkpoint(out)
    assert cfg2 == cfg


def test_retrieval_metrics():
    from image_search_tpu.utils.eval import retrieval_metrics

    rng2 = np.random.default_rng(0)
    emb = rng2.normal(size=(50, 16)).astype(np.float32)
    perfect = retrieval_metrics(emb, emb)
    assert perfect["recall@1_t2i"] == 1.0 and perfect["median_rank_i2t"] == 1.0

    shuffled = retrieval_metrics(emb, rng2.normal(size=(50, 16)).astype(np.float32))
    assert shuffled["recall@1_t2i"] < 0.5


def test_remat_step_matches_plain(rng):
    """jax.checkpoint must not change the math, only the memory profile."""
    cfg = tiny_test_config()
    ids, pix = make_batch(rng, cfg, 8)
    opt = optax.sgd(1e-2)

    init_a, step_a = make_train_step(cfg, opt)
    sa, ma = step_a(init_a(init_params(jax.random.key(3), cfg)),
                    jnp.asarray(ids), jnp.asarray(pix))
    init_b, step_b = make_train_step(cfg, opt, remat=True)
    sb, mb = step_b(init_b(init_params(jax.random.key(3), cfg)),
                    jnp.asarray(ids), jnp.asarray(pix))

    assert abs(float(ma["loss"]) - float(mb["loss"])) < 1e-6
    for a, b in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_train_state_checkpoint_roundtrip(tmp_path, rng):
    """orbax save/restore resumes training exactly (params+moments+step)."""
    from image_search_tpu.train.checkpoint import load_train_state, save_train_state

    cfg = tiny_test_config()
    ids, pix = make_batch(rng, cfg, 8)
    opt = optax.adamw(1e-3)
    init_fn, step_fn = make_train_step(cfg, opt)
    state = init_fn(init_params(jax.random.key(0), cfg))
    state, _ = step_fn(state, jnp.asarray(ids), jnp.asarray(pix))

    d = str(tmp_path / "ckpt")
    save_train_state(d, state)
    template = init_fn(init_params(jax.random.key(0), cfg))
    restored = load_train_state(d, template)
    assert restored is not None
    assert int(restored.step) == 1

    # continuing from restored must equal continuing from the original
    s1, m1 = step_fn(state, jnp.asarray(ids), jnp.asarray(pix))
    s2, m2 = step_fn(restored, jnp.asarray(ids), jnp.asarray(pix))
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-7
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    assert load_train_state(str(tmp_path / "missing"), template) is None


def test_siglip_train_step(rng):
    """Regression (code review): training must dispatch by arch — a SigLIP
    checkpoint trains with siglip.forward + sigmoid loss, not clip's."""
    import sys

    sys.path.insert(0, "tests")
    from test_siglip import tiny_siglip_config

    from image_search_tpu.models import get_model_module

    cfg = tiny_siglip_config()
    params = get_model_module(cfg).init_params(jax.random.key(0), cfg)
    init_fn, step_fn = make_train_step(cfg, optax.adam(1e-3))
    state = init_fn(params)
    ids = rng.integers(2, cfg.text.vocab_size, size=(8, cfg.text.context_length)).astype(np.int32)
    pix = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
    losses = []
    for _ in range(10):
        state, m = step_fn(state, jnp.asarray(ids), jnp.asarray(pix))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_siglip_remat_step_matches_plain(rng):
    """Regression (advisor): --remat must not be a silent no-op for SigLIP —
    it threads through siglip.forward and leaves the math unchanged."""
    import sys

    sys.path.insert(0, "tests")
    from test_siglip import tiny_siglip_config

    from image_search_tpu.models import get_model_module

    cfg = tiny_siglip_config()
    params = get_model_module(cfg).init_params(jax.random.key(1), cfg)
    ids = rng.integers(2, cfg.text.vocab_size, size=(4, cfg.text.context_length)).astype(np.int32)
    pix = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
    opt = optax.sgd(1e-2)

    init_a, step_a = make_train_step(cfg, opt)
    sa, ma = step_a(init_a(params), jnp.asarray(ids), jnp.asarray(pix))
    init_b, step_b = make_train_step(cfg, opt, remat=True)
    sb, mb = step_b(init_b(params), jnp.asarray(ids), jnp.asarray(pix))

    assert abs(float(ma["loss"]) - float(mb["loss"])) < 1e-6
    for a, b in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.parametrize("n_data,n_model", [(8, 1), (4, 2)])
def test_fsdp_step_matches_unsharded(rng, n_data, n_model):
    """ZeRO-3-style FSDP (optionally composed with TP) computes the same
    step as the replicated baseline. SGD like the TP test above: adam's
    first step is ~lr*sign(g), which amplifies legitimate reduction-order
    noise in near-zero gradients to full-lr param differences."""
    cfg = tiny_test_config()
    ids, pix = make_batch(rng, cfg, 16)
    opt = optax.sgd(1e-2)

    init_u, step_u = make_train_step(cfg, opt)
    su = init_u(init_params(jax.random.key(1), cfg))
    su, mu = step_u(su, jnp.asarray(ids), jnp.asarray(pix))

    mesh = make_mesh(n_data, n_model)
    init_s, step_s = make_train_step(cfg, opt, mesh=mesh, fsdp=True)
    ss = init_s(init_params(jax.random.key(1), cfg))
    ss, ms = step_s(ss, jnp.asarray(ids), jnp.asarray(pix))

    assert np.allclose(float(mu["loss"]), float(ms["loss"]), atol=1e-5)
    flat_u = jax.tree.leaves(su.params)
    flat_s = jax.tree.leaves(ss.params)
    for a, b in zip(flat_u, flat_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5)


def test_fsdp_shards_params_and_moments():
    """The big weights AND the adam moments genuinely live 1/n_data per
    device after init and STAY sharded after a step (the inferred output
    sharding must not silently re-replicate them)."""
    cfg = tiny_test_config()
    ids, pix = make_batch(np.random.default_rng(3), cfg, 16)
    mesh = make_mesh(8, 1)
    init_s, step_s = make_train_step(cfg, optax.adam(1e-3), mesh=mesh, fsdp=True)
    ss = init_s(init_params(jax.random.key(1), cfg))

    def check_sharded(state, when):
        qkv = state.params["vision"]["blocks"]["qkv_w"]
        mom = state.opt_state[0].mu["vision"]["blocks"]["qkv_w"]
        for arr, what in ((qkv, "param"), (mom, "adam-mu")):
            local = arr.addressable_shards[0].data.size
            assert local * 8 <= arr.size, (
                f"{what} not FSDP-sharded {when}: {local} of {arr.size}"
            )

    check_sharded(ss, "after init")
    ss, _ = step_s(ss, jnp.asarray(ids), jnp.asarray(pix))
    check_sharded(ss, "after step")


def test_fsdp_requires_mesh():
    cfg = tiny_test_config()
    with pytest.raises(ValueError, match="fsdp"):
        make_train_step(cfg, optax.sgd(1e-2), fsdp=True)


def test_fsdp_shardings_cover_siglip_tree():
    """param_shardings must map every SigLIP leaf (same block names as CLIP;
    MAP head + differently-named top-level params stay replicated)."""
    import sys

    sys.path.insert(0, "tests")
    from test_siglip import tiny_siglip_config

    from image_search_tpu.models import get_model_module
    from image_search_tpu.train.contrastive import param_shardings

    cfg = tiny_siglip_config()
    params = get_model_module(cfg).init_params(jax.random.key(0), cfg)
    mesh = make_mesh(8, 1)
    sh = param_shardings(params, mesh, fsdp=True)
    assert "data" in str(sh["vision"]["blocks"]["qkv_w"].spec)
    assert "data" not in str(sh["vision"]["head"]["probe"].spec)


def test_fsdp_train_state_checkpoint_roundtrip(tmp_path, rng):
    """orbax save/restore works with ZeRO-3-sharded state: restore lands on
    the template's shardings and training continues identically."""
    from image_search_tpu.train.checkpoint import load_train_state, save_train_state

    cfg = tiny_test_config()
    ids, pix = make_batch(rng, cfg, 16)
    opt = optax.adamw(1e-3)
    mesh = make_mesh(8, 1)
    init_fn, step_fn = make_train_step(cfg, opt, mesh=mesh, fsdp=True)
    state = init_fn(init_params(jax.random.key(0), cfg))
    state, _ = step_fn(state, jnp.asarray(ids), jnp.asarray(pix))

    d = str(tmp_path / "ckpt")
    save_train_state(d, state)
    template = init_fn(init_params(jax.random.key(0), cfg))
    restored = load_train_state(d, template)
    assert restored is not None and int(restored.step) == 1
    qkv = restored.params["vision"]["blocks"]["qkv_w"]
    assert qkv.addressable_shards[0].data.size * 8 <= qkv.size  # still sharded

    s1, m1 = step_fn(state, jnp.asarray(ids), jnp.asarray(pix))
    s2, m2 = step_fn(restored, jnp.asarray(ids), jnp.asarray(pix))
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-6


def test_batch_prefetcher_overlaps_producer_with_consumer():
    """Round-2 review Weak #8: the fine-tune data path must build step
    N+1's batch WHILE step N runs. The prefetcher starts make_batch for
    the next batch the moment the current one is handed out, so after a
    consumer 'step' longer than the build time, the next batch is ready
    with (near-)zero wait."""
    import threading
    import time

    from image_search_tpu.train.finetune import BatchPrefetcher

    BUILD = 0.15
    starts, seq = [], []
    lock = threading.Lock()

    def make_batch():
        with lock:
            starts.append(time.monotonic())
            seq.append(f"build{len(starts)}-start")
        time.sleep(BUILD)
        with lock:
            seq.append(f"build{len(starts)}-end")
        return len(starts)

    pf = BatchPrefetcher(make_batch)
    try:
        b1 = pf.next()  # waits for batch 1, kicks off batch 2
        assert b1 == 1
        with lock:
            seq.append("step1-start")
        time.sleep(BUILD * 1.5)  # the "device step"
        with lock:
            seq.append("step1-end")
        t0 = time.monotonic()
        b2 = pf.next()
        wait = time.monotonic() - t0
        assert b2 == 2
        # batch 2 was fully built during step 1: no wait at the handoff
        assert wait < BUILD / 3, f"prefetch did not overlap (waited {wait:.3f}s)"
        # and its build STARTED before the step finished
        assert seq.index("build2-start") < seq.index("step1-end")
    finally:
        pf.close()


def test_batch_prefetcher_serializes_builds():
    """make_batch mutates shared state (RNG, decode pool) without locks —
    legal only because builds are strictly serialized on one thread."""
    import threading
    import time

    from image_search_tpu.train.finetune import BatchPrefetcher

    active = 0
    max_active = 0
    lock = threading.Lock()

    def make_batch():
        nonlocal active, max_active
        with lock:
            active += 1
            max_active = max(max_active, active)
        time.sleep(0.02)
        with lock:
            active -= 1
        return object()

    pf = BatchPrefetcher(make_batch)
    try:
        for _ in range(5):
            pf.next()
    finally:
        pf.close()
    assert max_active == 1


def test_fsdp_tp_step_compiles_without_involuntary_remat(rng, capfd):
    """Round-2 review Weak #4: the 4x2 FSDP+TP composition made GSPMD log
    'Involuntary full rematerialization' (replicate+repartition of the
    token-embedding gradient — wasted interconnect every step). Sharding
    token_embedding over D instead of the gather dim V fixed it; this
    compiles the same composition and asserts the warning stays gone."""
    import optax

    from image_search_tpu.config import tiny_test_config
    from image_search_tpu.models import init_params
    from image_search_tpu.parallel import make_mesh
    from image_search_tpu.train import make_train_step

    cfg = tiny_test_config()
    mesh = make_mesh(4, 2)
    init_fn, step_fn = make_train_step(
        cfg, optax.adamw(1e-4), mesh=mesh, fsdp=True
    )
    state = init_fn(init_params(jax.random.key(0), cfg))
    B = 16
    ids = rng.integers(
        1, cfg.text.eos_token_id - 1, size=(B, cfg.text.context_length)
    ).astype(np.int32)
    ids[:, -1] = cfg.text.eos_token_id
    pix = rng.normal(
        size=(B, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    capfd.readouterr()  # drain
    step_fn.lower(state, ids, pix).compile()
    err = capfd.readouterr().err
    assert "Involuntary full rematerialization" not in err, err


# -- retrieval evaluation (train/eval.py; the reference measures nothing) ----


def test_retrieval_metrics_exact_values():
    from image_search_tpu.utils.eval import retrieval_metrics

    rng = np.random.default_rng(0)
    base = rng.normal(size=(6, 16)).astype(np.float32)
    # perfectly aligned towers: every true pair is rank 1
    m = retrieval_metrics(base, base.copy(), ks=(1, 5))
    assert m["recall@1_i2t"] == 1.0 and m["recall@1_t2i"] == 1.0
    assert m["median_rank_i2t"] == 1.0

    # shift texts by one: image i's true caption scores like a random
    # other row, so R@1 collapses while R@6 is still 1 by definition
    shifted = np.roll(base, 1, axis=0)
    m2 = retrieval_metrics(base, shifted, ks=(1, 6))
    assert m2["recall@1_i2t"] < 1.0
    assert m2["recall@6_i2t"] == 1.0 and m2["recall@6_t2i"] == 1.0

    # hand-built 3x3 with exactly known ranks: image 0 points mostly at
    # caption 1, so its true caption is beaten by exactly one candidate
    # (i2t rank 2); images 1 and 2 are axis-aligned (rank 1). t2i stays
    # perfect (caption 0's best image is still image 0).
    img = np.eye(3, dtype=np.float32)
    img[0] = [0.1, 0.99, 0.0]
    txt = np.eye(3, dtype=np.float32)
    m3 = retrieval_metrics(img, txt, ks=(1, 2))
    assert m3["recall@1_i2t"] == pytest.approx(2 / 3)
    assert m3["recall@2_i2t"] == 1.0
    assert m3["recall@1_t2i"] == 1.0


def test_retrieval_metrics_tie_pessimism():
    """A collapsed tower (all captions identical) must score at the
    BOTTOM, not the top: ties count against the true pair (the old
    argsort ranking silently rewarded collapse with recall@1 = 1)."""
    from image_search_tpu.utils.eval import retrieval_metrics

    rng = np.random.default_rng(1)
    img = rng.normal(size=(8, 16)).astype(np.float32)
    txt = np.tile(rng.normal(size=(1, 16)).astype(np.float32), (8, 1))
    m = retrieval_metrics(img, txt, ks=(1,))
    assert m["recall@1_i2t"] == 0.0  # every candidate ties; rank = N
    assert m["median_rank_i2t"] == 8.0


def test_finetune_cli_with_eval_dir(tmp_path, rng, caplog):
    """finetune.main: --eval-dir measures retrieval BEFORE and AFTER the
    run (proof-of-improvement hook); the output checkpoint is written."""
    import logging as _logging

    from PIL import Image

    from image_search_tpu.models.convert import save_checkpoint
    from image_search_tpu.train import finetune

    cfg = tiny_test_config()
    params = init_params(jax.random.key(0), cfg)
    ckpt = str(tmp_path / "in.safetensors")
    save_checkpoint(ckpt, params, cfg)
    for sub in ("data", "eval"):
        d = tmp_path / sub
        d.mkdir()
        for i in range(8):
            arr = rng.integers(0, 256, size=(36, 36, 3)).astype(np.uint8)
            Image.fromarray(arr).save(d / f"im{i}.jpg")
            (d / f"im{i}.txt").write_text(f"{sub} caption {i}")
    out = str(tmp_path / "out.safetensors")
    with caplog.at_level(_logging.INFO):
        finetune.main([
            "--data-dir", str(tmp_path / "data"),
            "--weights", ckpt,
            "--out", out,
            "--batch-size", "8",
            "--steps", "2",
            "--eval-dir", str(tmp_path / "eval"),
        ])
    import os as _os

    assert _os.path.exists(out)
    text = caplog.text
    assert "retrieval BEFORE" in text and "retrieval AFTER" in text
    assert "recall@1_i2t" in text


def test_evaluate_pairs_end_to_end(tmp_path):
    """Tiny random model: decode + embed + score; undecodable images are
    skipped; all metric keys present and bounded."""
    from PIL import Image

    from image_search_tpu.models import init_params
    from image_search_tpu.models.embedder import ClipEmbedder
    from image_search_tpu.tokenizer import HashTokenizer
    from image_search_tpu.train.eval import evaluate_pairs

    rng = np.random.default_rng(2)
    pairs = []
    for i in range(5):
        p = str(tmp_path / f"im{i}.jpg")
        Image.fromarray(
            rng.integers(0, 256, size=(32, 40, 3), dtype=np.uint8)
        ).save(p)
        pairs.append((p, f"caption number {i}"))
    bad = str(tmp_path / "bad.jpg")
    open(bad, "wb").write(b"not an image")
    pairs.append((bad, "broken"))

    cfg = tiny_test_config()
    params = init_params(jax.random.key(0), cfg)
    emb = ClipEmbedder(
        params, cfg,
        tokenizer=HashTokenizer(
            cfg.text.vocab_size, cfg.text.context_length,
            eos_id=cfg.text.eos_token_id,
        ),
    )
    metrics, n = evaluate_pairs(emb, pairs, ks=(1, 3), batch_size=4)
    assert n == 5  # the broken image was skipped
    for key in ("recall@1_i2t", "recall@1_t2i", "recall@3_i2t", "recall@3_t2i"):
        assert 0.0 <= metrics[key] <= 1.0
    assert 1.0 <= metrics["median_rank_i2t"] <= 5.0


def test_remat_policy_is_math_identical(rng):
    """ISX_REMAT_POLICY (save-dots) changes WHAT is recomputed, never the
    math: losses must match full remat step for step."""
    import os

    import optax

    from image_search_tpu.train.contrastive import make_train_step

    cfg = tiny_test_config()
    params = init_params(jax.random.key(1), cfg)
    ids = np.asarray(rng.integers(1, 50, size=(4, cfg.text.context_length)), np.int32)
    ids[:, -1] = cfg.text.eos_token_id
    px = np.asarray(rng.normal(size=(4, 28, 28, 3)), np.float32)
    opt = optax.adam(1e-3)

    def run(policy):
        old = os.environ.pop("ISX_REMAT_POLICY", None)
        try:
            if policy:
                os.environ["ISX_REMAT_POLICY"] = policy
            init_fn, step_fn = make_train_step(cfg, opt, remat=True)
            state = init_fn(params)
            losses = []
            for _ in range(3):
                state, m = step_fn(state, jnp.asarray(ids), jnp.asarray(px))
                losses.append(float(m["loss"]))
            return losses
        finally:
            os.environ.pop("ISX_REMAT_POLICY", None)
            if old is not None:
                os.environ["ISX_REMAT_POLICY"] = old

    full = run("")
    dots = run("dots_with_no_batch_dims_saveable")
    np.testing.assert_allclose(dots, full, rtol=1e-6, atol=1e-7)

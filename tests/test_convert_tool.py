"""tools/convert_checkpoint.py end-to-end with a local HF model directory
(the build-pipeline equivalent of the reference's clip/build.rs)."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_convert_tool_roundtrip(tmp_path, rng):
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_model_parity import build_hf_clip, make_text_ids

    from image_search_tpu import config as cfglib
    from image_search_tpu.models import clip as jclip
    from image_search_tpu.models.convert import load_checkpoint

    cfg = cfglib.tiny_test_config()
    model = build_hf_clip(cfg)
    hf_dir = str(tmp_path / "hf")
    model.save_pretrained(hf_dir, safe_serialization=True)

    out = str(tmp_path / "ckpt.safetensors")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "convert_checkpoint.py"),
            hf_dir,
            "--preset", "clip-tiny-test",
            "--out", out,
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert os.path.exists(out)

    params, cfg2 = load_checkpoint(out)
    assert cfg2 == cfg
    ids = make_text_ids(cfg, 2, rng)
    got = np.asarray(jclip.encode_text(params, cfg2, jnp.asarray(ids)))
    with torch.no_grad():
        want = model.get_text_features(
            input_ids=torch.from_numpy(ids.astype(np.int64))
        ).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_server_from_hf_converts_at_startup(tmp_path, rng):
    """--from-hf: a missing checkpoint is fetched (here: local HF dir) and
    converted at engine startup — the runtime counterpart of the reference's
    build-time weight download (clip/build.rs:9-11). The loaded engine must
    serve the CONVERTED weights, not random ones."""
    import numpy as np
    from PIL import Image

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_model_parity import build_hf_clip

    from image_search_tpu import config as cfglib
    from image_search_tpu.server.args import ServerArgs
    from image_search_tpu.server.engine import SearchEngine

    cfg = cfglib.tiny_test_config()
    model = build_hf_clip(cfg)
    hf_dir = str(tmp_path / "hf")
    model.save_pretrained(hf_dir, safe_serialization=True)

    media = str(tmp_path / "pics")
    os.makedirs(media)
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(media + "/a.jpg")

    ckpt = str(tmp_path / "models" / "clip.safetensors")
    args = ServerArgs(
        model_weights=ckpt,
        model="clip-tiny-test",
        from_hf=hf_dir,
        media_dir=media,
        index_dir=str(tmp_path / "idx"),
    )
    eng = SearchEngine(args)
    assert os.path.exists(ckpt)  # converted at startup
    # converted (not random) weights: text embedding matches the HF model
    import torch

    ids = np.full((1, cfg.text.context_length), cfg.text.eos_token_id, np.int64)
    ids[0, 0] = 3
    with torch.no_grad():
        want = model.get_text_features(input_ids=torch.from_numpy(ids)).numpy()
    got = eng.embedder._encode_text(eng.embedder.params, input_ids=ids.astype(np.int32))
    cos = float(
        (np.asarray(got)[0] @ want[0])
        / (np.linalg.norm(got[0]) * np.linalg.norm(want[0]))
    )
    assert cos > 0.999

    # a bogus hub id degrades to a warning + random weights, not a crash
    args2 = ServerArgs(
        model_weights=str(tmp_path / "none.st"),
        model="clip-tiny-test",
        from_hf="no-such-org/no-such-model-xyz",
        media_dir=media,
        index_dir=str(tmp_path / "idx2"),
    )
    eng2 = SearchEngine(args2)
    assert eng2.cfg.name == "clip-tiny-test"

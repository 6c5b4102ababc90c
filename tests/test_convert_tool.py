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

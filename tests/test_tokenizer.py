"""Tokenizer parity vs transformers.CLIPTokenizer.

No CLIP vocab can be downloaded offline, so a vocab is TRAINED here with our
own BPE trainer, saved in the standard vocab.json/merges.txt format, loaded
into HF's slow CLIPTokenizer, and both tokenizers must then agree on
arbitrary text. This exercises the full format + algorithm, not fixtures.
"""

import numpy as np
import pytest

from image_search_tpu.tokenizer import CLIPBPETokenizer, HashTokenizer, train_bpe

CORPUS = [
    "A photo of a cat sitting on a red couch.",
    "Two dogs playing in the snow, golden retriever and husky!",
    "the quick brown fox jumps over the lazy dog",
    "a painting of mountains at sunset with purple clouds",
    "black and white photograph of a city street at night",
    "children playing football on the beach during summer vacation",
    "it's the photographer's favourite don't you think, we'll see",
    "cats cats cats everywhere, photos of cats, paintings of cats",
    "sunset sunrise landscape portrait macro wildlife photography",
    "a close-up photo of a flower with a bee collecting pollen 123",
]

TEST_TEXTS = [
    "a photo of a cat",
    "DOGS PLAYING in THE snow!!!",
    "it's a sunset, isn't it?",
    "unseen wordzz with weird    spacing\t\tand tabs",
    "numbers 42 and punctuation... #hashtag @mention",
    "",
    "     ",
    "naïve café — unicode façade",
]


@pytest.fixture(scope="module")
def trained():
    return train_bpe(CORPUS, vocab_size=700)


@pytest.fixture(scope="module")
def hf_tok(trained, tmp_path_factory):
    transformers = pytest.importorskip("transformers")
    d = tmp_path_factory.mktemp("tok")
    trained.save(str(d))
    return transformers.CLIPTokenizer(
        vocab_file=str(d / "vocab.json"), merges_file=str(d / "merges.txt")
    )


@pytest.mark.parametrize("text", TEST_TEXTS)
def test_matches_hf_slow_tokenizer(trained, hf_tok, text):
    ours = trained(text)[0].tolist()
    theirs = hf_tok(
        text, padding="max_length", truncation=True, max_length=77
    )["input_ids"]
    assert ours == theirs, f"{text!r}: {ours[:12]} vs {theirs[:12]}"


def test_matches_hf_unpadded_ids(trained, hf_tok):
    for text in TEST_TEXTS:
        ours = trained.encode(text)
        theirs = hf_tok(text, add_special_tokens=False)["input_ids"]
        assert ours == theirs, text


def test_truncation_keeps_eos(trained):
    long_text = " ".join(["word"] * 500)
    ids = trained(long_text)[0]
    assert len(ids) == 77
    assert ids[0] == trained.bos_id
    assert ids[-1] == trained.eos_id


def test_roundtrip_decode(trained):
    text = "a photo of a cat"
    assert trained.decode(trained.encode(text)) == text


def test_save_load_roundtrip(trained, tmp_path):
    trained.save(str(tmp_path))
    loaded = CLIPBPETokenizer.from_dir(str(tmp_path))
    for text in TEST_TEXTS:
        assert loaded.encode(text) == trained.encode(text)


def test_eos_padding_pools_first_eos(trained):
    """Pad id == eos id, so models.clip first-EOS pooling hits the real EOS."""
    ids = trained("cat")[0]
    assert trained.eos_id == ids[-1]
    first_eos = int(np.argmax(ids == trained.eos_id))
    assert ids[first_eos - 1] != trained.bos_id or first_eos >= 2


def test_hash_tokenizer_deterministic():
    t = HashTokenizer(vocab_size=1000, context_length=16)
    a = t(["hello world", "hello world"])
    assert (a[0] == a[1]).all()
    assert a.shape == (2, 16)
    assert a[0][0] == t.bos_id


def test_pretokenizer_fallback_matches_regex():
    """The no-`regex` scanner must agree with the regex pattern."""
    import regex as re

    pat = re.compile(
        r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
        re.IGNORECASE,
    )
    from image_search_tpu.tokenizer import bpe as bpe_mod

    texts = [t.lower() for t in TEST_TEXTS + CORPUS]
    for text in texts:
        want = pat.findall(" ".join(text.split()))
        # call the pure-python scanner directly
        got = _scan(" ".join(text.split()))
        assert got == want, text


def _scan(text):
    """Reimplementation of the fallback scanner for comparison (mirrors
    bpe._pre_tokenize's except-branch)."""
    contractions = ("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")
    out, i, n = [], 0, len(text)
    while i < n:
        ch = text[i]
        if ch.isspace():
            i += 1
            continue
        if ch == "'":
            low = text[i:].lower()
            for c in contractions:
                if low.startswith(c):
                    out.append(text[i : i + len(c)])
                    i += len(c)
                    break
            else:
                j = i + 1
                while j < n and not (text[j].isspace() or text[j].isalpha() or text[j].isnumeric()):
                    j += 1
                out.append(text[i:j])
                i = j
            continue
        if ch.isalpha():
            j = i
            while j < n and text[j].isalpha():
                j += 1
            out.append(text[i:j])
            i = j
            continue
        if ch.isnumeric():
            out.append(ch)
            i += 1
            continue
        j = i
        while j < n and not (text[j].isspace() or text[j].isalpha() or text[j].isnumeric()):
            j += 1
        out.append(text[i:j])
        i = j
    return out


def test_hash_tokenizer_stable_across_processes():
    """Regression (code review): ids must not depend on PYTHONHASHSEED."""
    import subprocess
    import sys

    code = (
        "from image_search_tpu.tokenizer import HashTokenizer;"
        "print(HashTokenizer(1000, 8)(['hello world'])[0].tolist())"
    )
    outs = {
        subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, cwd=".",
            env={"PYTHONHASHSEED": seed, "PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu"},
        ).stdout.strip()
        for seed in ("1", "2")
    }
    assert len(outs) == 1 and outs != {""}, outs

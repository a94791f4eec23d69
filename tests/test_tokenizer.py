"""CLIP byte-level BPE tokenizer tests.

Parity oracle: ``transformers.CLIPTokenizer`` constructed from the SAME
vendored vocab/merges fixture files — this checks our BPE algorithm
(byte mapping, word split regex, merge order, normalization) against HF's
implementation, which is what the reference uses for its text path
(reference image_search.py:47-64, app_pipeline.py:184-186).
"""

import os

import numpy as np
import pytest

from image_retrieval_tpu.models.tokenizer import (
    CLIPBPETokenizer,
    FIXTURE_DIR,
    HashTokenizer,
    get_tokenizer,
    normalize_text,
)

VOCAB = os.path.join(FIXTURE_DIR, "vocab.json")
MERGES = os.path.join(FIXTURE_DIR, "merges.txt")

PARITY_TEXTS = [
    "a photo of a white car",
    "The quick brown FOX jumps over the lazy dog!!",
    "it's a dog's life, isn't it?  They've been searching...",
    "naïve café résumé jalapeño",
    "東京の猫と犬",
    "привет мир",
    "search 42 images @ threshold 0.25; top-10 results!",
    "zürich    \t\n whitespace   collapse",
    "",
    "unseen-token wordzzz qqqxyzzy 99999",
    "MIXED Case AND 123 digits 456",
    "<|startoftext|> literal specials pass through <|endoftext|>",
]


@pytest.fixture(scope="module")
def tok():
    return CLIPBPETokenizer(VOCAB, MERGES)


@pytest.fixture(scope="module")
def hf_tok():
    transformers = pytest.importorskip("transformers")
    return transformers.CLIPTokenizer(VOCAB, MERGES)


@pytest.mark.parametrize("text", PARITY_TEXTS)
def test_bpe_parity_with_hf(tok, hf_tok, text):
    ours = tok.encode(text)
    theirs = hf_tok(text)["input_ids"]
    assert theirs[0] == tok.bos_id and theirs[-1] == tok.eos_id
    assert ours == theirs[1:-1]


def test_batch_layout(tok):
    out = tok(["a white car", ""], context_length=77)
    assert out.shape == (2, 77) and out.dtype == np.int32
    for row in out:
        assert row[0] == tok.bos_id
        (eos_pos,) = np.where(row == tok.eos_id)[0][:1]
        assert np.all(row[eos_pos + 1 :] == tok.pad_id)
    # eos is the max id in the fixture vocab, so argmax-pooling in the text
    # tower lands on the eos position (OpenAI CLIP convention)
    assert int(np.argmax(out[0])) == int(np.where(out[0] == tok.eos_id)[0][0])


def test_truncation(tok):
    long = " ".join(["search"] * 500)
    out = tok([long], context_length=77)[0]
    assert out.shape == (77,)
    assert out[0] == tok.bos_id and out[76] == tok.eos_id


def test_byte_fallback_no_unk_for_ascii(tok):
    # every byte is a base symbol, so arbitrary ASCII never maps to unk
    ids = tok.encode("qqqxyzzy")
    assert all(i != tok.unk_id for i in ids)


def test_get_tokenizer_is_real_bpe(tmp_path):
    # production path: never the hash fallback
    t = get_tokenizer(None)
    assert isinstance(t, CLIPBPETokenizer)
    # bogus weights_path without vocab files -> still fixture BPE
    t2 = get_tokenizer(str(tmp_path))
    assert isinstance(t2, CLIPBPETokenizer)


def test_get_tokenizer_prefers_checkpoint_vocab(tmp_path):
    import shutil

    shutil.copy(VOCAB, tmp_path / "vocab.json")
    shutil.copy(MERGES, tmp_path / "merges.txt")
    t = get_tokenizer(str(tmp_path))
    assert isinstance(t, CLIPBPETokenizer)
    assert t.encode("a white car") == CLIPBPETokenizer(VOCAB, MERGES).encode(
        "a white car"
    )


def test_normalize_text():
    assert normalize_text("  Hello\t WORLD \n") == "hello world"
    assert normalize_text("東京猫") == "東 京 猫"  # CJK spaced per-char
    assert normalize_text("a\x00b\x07c") == "abc"  # control chars stripped
    # NFC: decomposed e + combining acute -> composed é
    assert normalize_text("café") == "café"


def test_hash_tokenizer_still_deterministic():
    h = HashTokenizer()
    a = h(["a white car"])
    b = h(["a white car"])
    assert np.array_equal(a, b)


def test_fixture_files_committed():
    assert os.path.exists(VOCAB) and os.path.exists(MERGES)

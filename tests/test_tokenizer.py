"""Tokenizer tests: BPE algorithm on synthetic merges + CLIP context semantics."""

import numpy as np
import pytest

from tpualign.tokenizer.bpe import (
    DEFAULT_CONTEXT_LENGTH,
    ClipTokenizer,
    bytes_to_unicode,
)


@pytest.fixture()
def merges_file(tmp_path):
    # Small hand-built merges list; ranks are line order.
    merges = [
        "l o",
        "lo w</w>",
        "e r</w>",
        "h e",
        "he llo</w>",  # never reachable (llo</w> not a single symbol) — harmless
        "l lo",
        "w o",
        "wo r",
        "wor ld</w>",
        "l d</w>",
    ]
    p = tmp_path / "merges.txt"
    p.write_text("#version: test\n" + "\n".join(merges) + "\n", encoding="utf-8")
    return str(p)


def test_bytes_to_unicode_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_bpe_hand_computed(merges_file):
    tok = ClipTokenizer(bpe_path=merges_file)
    # "low": l o w</w> -> (l o)->lo -> (lo w</w>)->low</w>
    assert tok.bpe("low") == "low</w>"
    # "lower": l o w e r</w> -> lo w e r</w> -> lo w er</w>
    assert tok.bpe("lower") == "lo w er</w>"
    # "world": w o r l d</w> -> wo r l d</w> -> wor l d</w> -> wor ld</w> -> world</w>
    assert tok.bpe("world") == "world</w>"


def test_encode_decode_roundtrip(merges_file):
    tok = ClipTokenizer(bpe_path=merges_file)
    ids = tok.encode("hello world")
    assert ids, "non-empty encoding"
    assert tok.decode(ids).strip() == "hello world"


def test_vocab_layout(merges_file):
    tok = ClipTokenizer(bpe_path=merges_file)
    # 256 bytes + 256 byte</w> + merges + 2 specials
    assert tok.vocab_size == 256 * 2 + 10 + 2
    assert tok.eot_id == tok.vocab_size - 1
    assert tok.sot_id == tok.vocab_size - 2


def test_context_semantics(merges_file):
    tok = ClipTokenizer(bpe_path=merges_file)
    out = tok(["low lower world"])
    assert out.shape == (1, DEFAULT_CONTEXT_LENGTH)
    assert out.dtype == np.int32
    assert out[0, 0] == tok.sot_id
    nonzero = out[0][out[0] != 0]
    assert nonzero[-1] == tok.eot_id
    # padding after EOT is zeros
    eot_pos = int(np.argmax(out[0]))  # eot is the largest id
    assert (out[0, eot_pos + 1 :] == 0).all()


def test_truncation_forces_eot(merges_file):
    tok = ClipTokenizer(bpe_path=merges_file)
    long_text = "hello " * 200  # way past 77 tokens
    out = tok([long_text])
    assert out.shape == (1, 77)
    assert out[0, 0] == tok.sot_id
    assert out[0, -1] == tok.eot_id
    assert (out[0] != 0).all()


def test_lowercase_and_whitespace(merges_file):
    tok = ClipTokenizer(bpe_path=merges_file)
    a = tok.encode("Hello   World")
    b = tok.encode("hello world")
    assert a == b


def test_fallback_vocab_no_merges():
    tok = ClipTokenizer(bpe_path=None) if ClipTokenizer(bpe_path=None).exact_vocab is False else None
    if tok is None:
        pytest.skip("real merges file present in environment")
    ids = tok.encode("abc")
    assert all(0 <= i < tok.vocab_size for i in ids)
    assert tok.decode(ids).strip() == "abc"
    # deterministic
    assert ids == tok.encode("abc")


# ---------------------------------------------------------------------------
# Committed real-format fixture: the CLIP_BPE_PATH provisioning path.
# Dropping in the published bpe_simple_vocab_16e6.txt.gz must be a config
# change only (docs/PARITY.md "provisioning real weights").
# ---------------------------------------------------------------------------

import gzip
import hashlib
import os
from pathlib import Path

FIXTURE_DIR = Path(__file__).parent / "fixtures"
FIXTURE_TXT = FIXTURE_DIR / "bpe_fixture_vocab.txt"
FIXTURE_GZ = FIXTURE_DIR / "bpe_fixture_vocab.txt.gz"
FIXTURE_SHA256 = "23345dbb73c81fe0006f4d0356985e3cb1eed41688a16c1aeeb55e0292dd1916"


def test_fixture_integrity():
    """The committed fixture is byte-exact (hash-pinned) and the .gz decodes
    to the same content, so both load paths are known-good."""
    assert hashlib.sha256(FIXTURE_TXT.read_bytes()).hexdigest() == FIXTURE_SHA256
    with gzip.open(FIXTURE_GZ, "rt", encoding="utf-8") as f:
        assert (
            hashlib.sha256(f.read().encode("utf-8")).hexdigest()
            == hashlib.sha256(FIXTURE_TXT.read_bytes()).hexdigest()
        )


def test_real_format_plain_and_gz_identical():
    """Version-header file format loads identically from .txt and .txt.gz."""
    t1 = ClipTokenizer(bpe_path=str(FIXTURE_TXT))
    t2 = ClipTokenizer(bpe_path=str(FIXTURE_GZ))
    assert t1.exact_vocab and t2.exact_vocab
    assert t1.encoder == t2.encoder
    assert t1.bpe_ranks == t2.bpe_ranks
    text = "Verwijder de oliefilter met de sleutel."
    np.testing.assert_array_equal(t1(text), t2(text))
    # merges actually fire: "filter" collapses to multi-char tokens
    assert len(t1.encode("filter")) < len("filter")


def test_clip_bpe_path_env(monkeypatch):
    """CLIP_BPE_PATH env var is honored by the default-location search."""
    monkeypatch.setenv("CLIP_BPE_PATH", str(FIXTURE_GZ))
    tok = ClipTokenizer()  # no explicit path -> env
    ref = ClipTokenizer(bpe_path=str(FIXTURE_GZ))
    assert tok.exact_vocab
    assert tok.encoder == ref.encoder


def test_merges_through_encode_text_end_to_end():
    """Fixture merges -> token ids -> text tower -> unit-norm embedding:
    provisioning a real merges file requires no code change anywhere in the
    encode path (ref text path: ref:src/insert_clip_embeddings.py:133-137)."""
    import jax.numpy as jnp

    from tpualign.config import ClipVariant
    from tpualign.models.clip import CLIP, init_clip_params

    tok = ClipTokenizer(bpe_path=str(FIXTURE_GZ))
    ids = tok(["verwijder de oliefilter", "de pomp en de sleutel"])
    assert ids.shape == (2, DEFAULT_CONTEXT_LENGTH)
    assert (ids < tok.vocab_size).all()

    variant = ClipVariant(
        name="tok-e2e", embed_dim=32, image_size=32, patch_size=8,
        vision_width=64, vision_layers=1, vision_heads=2,
        context_length=DEFAULT_CONTEXT_LENGTH, vocab_size=tok.vocab_size,
        text_width=64, text_layers=1, text_heads=2,
    )
    model = CLIP(variant=variant, use_quick_gelu=True, compute_dtype=jnp.float32)
    params = init_clip_params(model, seed=0)
    emb = model.apply(
        {"params": params}, jnp.asarray(ids), normalize=True,
        method=model.encode_text,
    )
    emb = np.asarray(emb)
    assert emb.shape == (2, 32)
    assert np.isfinite(emb).all()
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)

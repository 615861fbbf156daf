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

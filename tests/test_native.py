"""Native C++ kernel tests (skipped when g++ unavailable)."""

import numpy as np
import pytest

from tpualign.native import lexical_counts, native_available, topk_merge


pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable"
)


def test_lexical_counts_matches_python():
    texts = [
        "Verwijder de filterdeksel en de schroef",
        "De POMP werkt",
        "niets",
        "",
        "ünïcode filter ✓",
    ]
    terms = ["filter", "pomp", "schroef", "deksel", "ünïcode"]
    got = lexical_counts(texts, terms)
    want = [sum(1 for t in terms if t in text.lower()) for text in texts]
    np.testing.assert_array_equal(got, want)


def test_lexical_counts_term_counted_once():
    got = lexical_counts(["filter filter filter"], ["filter"])
    np.testing.assert_array_equal(got, [1])


def test_topk_merge():
    vals = np.asarray([[0.1, 0.9, 0.5, 0.9], [0.2, 0.1, 0.0, -1.0]], np.float32)
    idx = np.asarray([[10, 3, 7, 1], [0, 1, 2, 3]], np.int64)
    out_vals, out_idx = topk_merge(vals, idx, k=3)
    # ties (0.9, 0.9) break by ascending index: 1 before 3
    np.testing.assert_array_equal(out_idx[0], [1, 3, 7])
    np.testing.assert_allclose(out_vals[0], [0.9, 0.9, 0.5])
    np.testing.assert_array_equal(out_idx[1], [0, 1, 2])


def test_topk_merge_k_exceeds_cols():
    vals = np.asarray([[0.5, 0.4]], np.float32)
    idx = np.asarray([[9, 8]], np.int64)
    out_vals, out_idx = topk_merge(vals, idx, k=4)
    np.testing.assert_array_equal(out_idx[0][:2], [9, 8])
    assert out_idx[0][2] == -1 and out_vals[0][3] <= -1e29


def test_native_bpe_matches_python(tmp_path):
    """Native merge core produces identical ids to the pure-Python bpe()
    across random words over a synthetic merges table."""
    import itertools
    import random

    from tpualign.tokenizer.bpe import ClipTokenizer, bytes_to_unicode

    # synthetic merges over common letter pairs
    letters = "abcdefgh"
    pairs = list(itertools.product(letters, repeat=2))
    random.Random(0).shuffle(pairs)
    merges = [f"{a} {b}" for a, b in pairs[:20]]
    merges += [f"{a}{b} {c}</w>" for (a, b), c in zip(pairs[:5], letters)]
    p = tmp_path / "merges.txt"
    p.write_text("#version: t\n" + "\n".join(merges))

    tok = ClipTokenizer(bpe_path=str(p))
    assert tok._bpe_core is not None, "native core should be active"

    rng = random.Random(1)
    for _ in range(300):
        word = "".join(rng.choice(letters) for _ in range(rng.randint(1, 12)))
        btoken = "".join(tok.byte_encoder[b] for b in word.encode())
        native_ids = tok._encode_token_ids(btoken)
        python_ids = [tok.encoder[t] for t in tok.bpe(btoken).split(" ")]
        assert native_ids == python_ids, word


def test_native_bpe_full_encode_equivalence(tmp_path):
    from tpualign.tokenizer.bpe import ClipTokenizer

    merges = ["l o", "lo w</w>", "e r</w>", "w o", "wo r", "wor ld</w>", "l d</w>"]
    p = tmp_path / "m.txt"
    p.write_text("\n".join(merges))
    tok_native = ClipTokenizer(bpe_path=str(p))
    tok_py = ClipTokenizer(bpe_path=str(p))
    tok_py._bpe_core = None  # force the pure-Python path
    text = "low lower world hello-world 123 Ünïcode!"
    assert tok_native.encode(text) == tok_py.encode(text)

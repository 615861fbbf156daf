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

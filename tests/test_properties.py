"""Property-based tests (hypothesis) for core pure-function invariants."""

import numpy as np
from hypothesis import given, settings, strategies as st

from tpualign.parallel.retrieval import NONE_PAGE, encode_keys
from tpualign.tokenizer.bpe import ClipTokenizer
from tpualign.weaksup.calibration import apply_calibration, fit_isotonic

settings.register_profile("ci", deadline=None, max_examples=50)
settings.load_profile("ci")


# -- encode_keys ---------------------------------------------------------------

manuals_st = st.lists(
    st.text(alphabet=st.characters(codec="utf-8", categories=("L", "N")),
            min_size=1, max_size=8),
    min_size=1, max_size=30,
)


@given(manuals_st, st.data())
def test_encode_keys_equality_iff_pair_equality(manuals, data):
    pages = data.draw(
        st.lists(st.one_of(st.none(), st.integers(0, 5000)),
                 min_size=len(manuals), max_size=len(manuals))
    )
    keys, vocab = encode_keys(manuals, pages, {})
    assert (keys >= 0).all()
    for i in range(len(manuals)):
        for j in range(len(manuals)):
            same_pair = manuals[i] == manuals[j] and pages[i] == pages[j]
            assert (keys[i] == keys[j]) == same_pair, (i, j)


@given(manuals_st)
def test_encode_keys_shared_vocab_stable(manuals):
    pages = [0] * len(manuals)
    k1, vocab = encode_keys(manuals, pages, {})
    k2, _ = encode_keys(manuals, pages, vocab)  # re-encode with grown vocab
    np.testing.assert_array_equal(k1, k2)


def test_encode_keys_none_page_distinct():
    keys, _ = encode_keys(["m", "m"], [None, NONE_PAGE - 1], {})
    assert keys[0] != keys[1]


# -- tokenizer (byte-level fallback vocab) --------------------------------------

_tok = None


def get_tok():
    global _tok
    if _tok is None:
        _tok = ClipTokenizer()
    return _tok


@given(st.text(max_size=200))
def test_tokenizer_ids_in_range_and_context_shape(text):
    tok = get_tok()
    arr = tok([text])
    assert arr.shape == (1, tok.context_length)
    assert arr.dtype == np.int32
    assert (arr >= 0).all() and (arr < tok.vocab_size).all()
    assert arr[0, 0] == tok.sot_id
    # EOT present exactly where padding starts (or forced at the end)
    row = arr[0]
    eots = np.where(row == tok.eot_id)[0]
    assert len(eots) >= 1


@given(st.text(alphabet=st.characters(codec="utf-8",
                                      categories=("L", "N", "P", "Zs")),
               max_size=60))
def test_tokenizer_decode_preserves_characters(text):
    """decode(encode(x)) preserves the cleaned character content exactly,
    modulo word-boundary whitespace (CLIP's regex splits digit runs into
    single-digit words, and decode renders each </w> as a space — matching
    the upstream SimpleTokenizer's decode semantics)."""
    tok = get_tok()
    ids = tok.encode(text)
    out = tok.decode(ids)
    from tpualign.tokenizer.bpe import _basic_clean, _whitespace_clean

    cleaned = _whitespace_clean(_basic_clean(text)).lower()
    assert out.replace(" ", "") == cleaned.replace(" ", "")


# -- isotonic calibration --------------------------------------------------------


@given(
    st.lists(st.floats(0, 1, allow_nan=False), min_size=1, max_size=60),
    st.data(),
)
def test_isotonic_monotone_and_mean_preserving(xs, data):
    ys = data.draw(
        st.lists(st.floats(-1, 1, allow_nan=False),
                 min_size=len(xs), max_size=len(xs))
    )
    x = np.asarray(xs)
    y = np.asarray(ys)
    knots = fit_isotonic(x, y)
    fitted = apply_calibration(x, knots)
    order = np.argsort(x, kind="stable")
    assert (np.diff(fitted[order]) >= -1e-9).all()
    # PAV preserves the total mass over the fitted points
    np.testing.assert_allclose(fitted.sum(), y.sum(), atol=1e-6 * max(1, len(xs)))
    # fit is a function of x: equal x -> equal fitted value
    for v in np.unique(x):
        same = fitted[x == v]
        assert np.allclose(same, same[0])

"""Weak-supervision tests: vectorized scores pinned to scalar reference
semantics, threshold/combination logic, record ordering."""

import numpy as np
import pytest

from tpualign.weaksup.alignment import compute_alignments, same_page_mask
from tpualign.weaksup.lexical import lexical_scores
from tpualign.weaksup.positional import positional_score_scalar, positional_scores


def ref_lexical_score(text, terms):
    """Scalar transcription of ref:src/insert_clip_embeddings.py:144-156."""
    if not terms:
        return 0.0
    lower = text.lower()
    matching = sum(1 for t in terms if t in lower)
    return min(1.0, matching / max(len(terms) * 0.1, 1))


def test_lexical_scores_match_reference():
    terms = ["filter", "pomp", "schroef", "deksel", "ventiel",
             "slang", "klep", "moer", "bout", "ring", "as"]
    texts = [
        "Verwijder de filterdeksel en de schroef",
        "De pomp werkt",
        "niets relevants hier",
        "FILTER POMP SCHROEF DEKSEL VENTIEL SLANG KLEP MOER BOUT RING AS",
    ]
    got = lexical_scores(texts, terms)
    want = [ref_lexical_score(t, terms) for t in texts]
    np.testing.assert_allclose(got, want, atol=1e-7)
    assert got[3] == 1.0  # capped at 1.0


def test_lexical_empty_vocab():
    np.testing.assert_array_equal(lexical_scores(["abc"], []), [0.0])


BBOXES = [
    [0, 0, 10, 10],
    [5, 5, 15, 15],      # overlaps first
    [100, 100, 110, 110],  # disjoint
    [0, 0, 0, 0],        # degenerate
    [0, 0, 10, 0],       # zero height
    [2000, 0, 2010, 10],  # very far -> distance score clamps to 0
    [0, 0, 10, 10],      # identical to first (IoU = 1)
]


def test_positional_vectorized_matches_scalar():
    grid = np.asarray(positional_scores(np.asarray(BBOXES, np.float32),
                                        np.asarray(BBOXES, np.float32)))
    for i, a in enumerate(BBOXES):
        for j, b in enumerate(BBOXES):
            want = positional_score_scalar(a, b)
            assert abs(grid[i, j] - want) < 1e-6, (i, j, grid[i, j], want)


def test_positional_known_values():
    grid = np.asarray(positional_scores(
        np.asarray([[0, 0, 10, 10]], np.float32),
        np.asarray([[5, 5, 15, 15], [20, 0, 30, 10], [0, 0, 10, 10]], np.float32),
    ))
    # IoU of two 10x10 boxes overlapping 5x5: 25 / (100+100-25)
    np.testing.assert_allclose(grid[0, 0], 25 / 175, atol=1e-6)
    # disjoint, centers (5,5) and (25,5): d=20 -> 1 - 20/1000
    np.testing.assert_allclose(grid[0, 1], 0.98, atol=1e-6)
    np.testing.assert_allclose(grid[0, 2], 1.0, atol=1e-6)


def test_same_page_mask():
    images = [
        {"image_id": "a", "manual_id": "m1", "page": 1},
        {"image_id": "b", "manual_id": "m1", "page": 2},
        {"image_id": "c", "manual_id": "m2", "page": 1},
    ]
    chunks = [
        {"chunk_id": "x", "manual_id": "m1", "page": 1},
        {"chunk_id": "y", "manual_id": "m2", "page": 1},
    ]
    mask = same_page_mask(images, chunks)
    np.testing.assert_array_equal(mask, [[True, False], [False, False], [False, True]])


def make_pair(lex_hit_text, img_bbox, chunk_bbox):
    images = [{"image_id": "i0", "manual_id": "m", "page": 1, "bbox": img_bbox}]
    chunks = [{"chunk_id": "c0", "manual_id": "m", "page": 1, "bbox": chunk_bbox,
               "text": lex_hit_text}]
    return images, chunks


def test_alignment_combined_mode():
    terms = ["filter"]  # one term: denom = max(0.1, 1) = 1 -> score = 1.0 on hit
    images, chunks = make_pair("de filter", [0, 0, 10, 10], [5, 5, 15, 15])
    recs = compute_alignments(images, chunks, terms, True, True)
    # lex = 1.0 > .05; pos = 25/175 ≈ .143 > .05; combined ≈ .571 > .1
    assert len(recs) == 1
    img_id, chunk_id, score, a_type = recs[0]
    assert (img_id, chunk_id, a_type) == ("i0", "c0", "combined")
    np.testing.assert_allclose(score, (1.0 + 25 / 175) / 2, atol=1e-6)


def test_alignment_individual_when_one_fails():
    # positional fails threshold (degenerate bbox) -> lexical row only
    images, chunks = make_pair("de filter", [0, 0, 0, 0], [5, 5, 15, 15])
    recs = compute_alignments(images, chunks, ["filter"], True, True)
    assert recs == [("i0", "c0", 1.0, "lexical")]


def test_alignment_single_strategy_schemas():
    images, chunks = make_pair("de filter", [0, 0, 10, 10], [5, 5, 15, 15])
    lex_only = compute_alignments(images, chunks, ["filter"], True, False)
    assert [r[3] for r in lex_only] == ["lexical"]
    pos_only = compute_alignments(images, chunks, ["filter"], False, True)
    assert [r[3] for r in pos_only] == ["positional"]
    vanilla = compute_alignments(images, chunks, ["filter"], False, False)
    assert vanilla == []


def test_alignment_threshold_suppression():
    # 20-term vocabulary, chunk hits 1 term: score = 1/2 = .5 > .05 kept;
    # chunk hitting 0 terms: 0 suppressed.
    terms = [f"term{i}" for i in range(20)]
    images = [{"image_id": "i0", "manual_id": "m", "page": 1, "bbox": [0, 0, 10, 10]}]
    chunks = [
        {"chunk_id": "c0", "manual_id": "m", "page": 1, "bbox": [0, 0, 0, 0], "text": "has term3"},
        {"chunk_id": "c1", "manual_id": "m", "page": 1, "bbox": [0, 0, 0, 0], "text": "nothing"},
    ]
    recs = compute_alignments(images, chunks, terms, True, False)
    assert recs == [("i0", "c0", 0.5, "lexical")]


def test_alignment_cross_page_excluded():
    images = [{"image_id": "i0", "manual_id": "m", "page": 1, "bbox": [0, 0, 10, 10]}]
    chunks = [{"chunk_id": "c0", "manual_id": "m", "page": 2, "bbox": [0, 0, 10, 10],
               "text": "de filter"}]
    assert compute_alignments(images, chunks, ["filter"], True, True) == []


def test_alignment_record_order_image_major():
    images = [
        {"image_id": "i0", "manual_id": "m", "page": 1, "bbox": [0, 0, 10, 10]},
        {"image_id": "i1", "manual_id": "m", "page": 1, "bbox": [0, 0, 10, 10]},
    ]
    chunks = [
        {"chunk_id": "c0", "manual_id": "m", "page": 1, "bbox": [1, 1, 9, 9], "text": "x"},
        {"chunk_id": "c1", "manual_id": "m", "page": 1, "bbox": [2, 2, 8, 8], "text": "x"},
    ]
    recs = compute_alignments(images, chunks, [], False, True)
    assert [(r[0], r[1]) for r in recs] == [
        ("i0", "c0"), ("i0", "c1"), ("i1", "c0"), ("i1", "c1"),
    ]


def test_rerank_with_weak_scores():
    from tpualign.weaksup.rerank import build_weak_lookup, rerank_with_weak_scores
    from tpualign.ops.similarity import NEG_INF

    # cosine ranks c1 > c0; weak evidence strongly favors c0
    vals = np.asarray([[0.30, 0.28, NEG_INF]], np.float32)
    idx = np.asarray([[1, 0, -1]])
    lookup = build_weak_lookup([("img", "c0", 0.9, "combined"),
                                ("img", "c0", 0.4, "lexical")])  # max wins
    assert lookup[("img", "c0")] == 0.9

    # alpha=0: unchanged cosine order
    v0, i0 = rerank_with_weak_scores(vals, idx, ["img"], ["c0", "c1"], lookup, 0.0)
    np.testing.assert_array_equal(i0[0], [1, 0, -1])
    np.testing.assert_allclose(v0[0][:2], [0.30, 0.28], atol=1e-6)

    # alpha=0.5: c0 gets 0.5*0.28+0.5*0.9=0.59 > c1 0.15 -> order flips
    v5, i5 = rerank_with_weak_scores(vals, idx, ["img"], ["c0", "c1"], lookup, 0.5)
    np.testing.assert_array_equal(i5[0], [0, 1, -1])
    np.testing.assert_allclose(v5[0][0], 0.59, atol=1e-6)
    assert v5[0][2] <= NEG_INF / 2  # empty slot stays last

    with pytest.raises(ValueError):
        rerank_with_weak_scores(vals, idx, ["img"], ["c0", "c1"], lookup, 1.5)


def test_rerank_tie_break_by_index():
    from tpualign.weaksup.rerank import rerank_with_weak_scores

    vals = np.asarray([[0.5, 0.5]], np.float32)
    idx = np.asarray([[7, 3]])
    _, i = rerank_with_weak_scores(vals, idx, ["q"], ["c"] * 8, {}, 0.0)
    np.testing.assert_array_equal(i[0], [3, 7])


class TestCalibration:
    def test_pav_monotone_and_means(self):
        from tpualign.weaksup.calibration import apply_calibration, fit_isotonic

        # textbook PAV case with a violator: (1,3) pooled with (2,1) -> 2.0
        x = np.array([0.1, 0.2, 0.3, 0.4])
        y = np.array([1.0, 3.0, 1.0, 4.0])
        knots = fit_isotonic(x, y)
        fitted = apply_calibration(x, knots)
        assert (np.diff(fitted) >= -1e-9).all()
        np.testing.assert_allclose(fitted, [1.0, 2.0, 2.0, 4.0])
        # means preserved within pooled blocks
        np.testing.assert_allclose(fitted.sum(), y.sum())

    def test_pav_ties_pooled(self):
        from tpualign.weaksup.calibration import apply_calibration, fit_isotonic

        x = np.array([0.5, 0.5, 0.9])
        y = np.array([0.0, 1.0, 2.0])
        knots = fit_isotonic(x, y)
        np.testing.assert_allclose(apply_calibration(np.array([0.5]), knots), [0.5])

    def test_calibrate_schema_roundtrip(self, tmp_path):
        from tpualign.store import EmbeddingStore
        from tpualign.weaksup.calibration import calibrate_schema

        rng = np.random.default_rng(0)
        store = EmbeddingStore(tmp_path / "s", embed_dim=8)
        store.setup(["clip_combined"])
        n = 20
        emb_i = rng.normal(size=(n, 8)).astype(np.float32)
        emb_i /= np.linalg.norm(emb_i, axis=1, keepdims=True)
        # chunks = noisy copies of their image -> sims correlate with index
        noise = rng.normal(size=(n, 8)).astype(np.float32) * np.linspace(
            1.5, 0.0, n
        )[:, None]
        emb_c = emb_i + noise
        emb_c /= np.linalg.norm(emb_c, axis=1, keepdims=True)
        img_rows = [{"image_id": f"i{k}", "manual_id": "m", "page": k,
                     "bbox": [0, 0, 1, 1], "bbox_source": "native",
                     "caption": None, "filename": None,
                     "image_type": "raster_image"} for k in range(n)]
        chunk_rows = [{"chunk_id": f"c{k}", "manual_id": "m", "page": k,
                       "bbox": [0, 0, 1, 1], "text": f"t{k}"} for k in range(n)]
        store.insert_images("clip_combined", img_rows, emb_i)
        store.insert_chunks("clip_combined", chunk_rows, emb_c)
        # weak scores roughly increasing with true quality, noisy
        weak = np.clip(np.linspace(0.1, 0.9, n) + rng.normal(0, 0.05, n), 0, 1)
        store.insert_alignments(
            "clip_combined",
            [(f"i{k}", f"c{k}", float(weak[k]), "combined") for k in range(n)],
        )

        out = calibrate_schema(store, "clip_combined", write=True)
        assert out["n_pairs"] == n
        lo, hi = out["calibrated_range"]
        assert -1.0 <= lo <= hi <= 1.0  # cosine scale now
        # write-back preserved ranking (monotone map) and hit the store
        new = {(a, b): s for a, b, s, _ in store.alignments("clip_combined")}
        raw_order = np.argsort(weak, kind="stable")
        cal = np.array([new[(f"i{k}", f"c{k}")] for k in range(n)])
        assert (np.diff(cal[raw_order]) >= -1e-6).all()


def test_batched_alignments_match_dense_oracle(monkeypatch):
    """r5: compute_alignments now batches images (O(valid pairs) memory,
    not O(I*C) — the 94 GB cliff bench_pipeline_scale caught). The
    batched path must emit EXACTLY what the dense-grid formulation
    emits — same records, same order — including with a batch size
    forced small enough to split every page group."""
    import numpy as np

    from tpualign.weaksup import alignment as A
    from tpualign.weaksup.alignment import (
        COMBINED_THRESHOLD, LEXICAL_THRESHOLD, POSITIONAL_THRESHOLD,
        alignment_grids, compute_alignments,
    )

    rng = np.random.default_rng(11)
    images, chunks = [], []
    for m in range(3):
        for p in range(5):
            for i in range(rng.integers(0, 4)):
                x, y = rng.uniform(0, 500, 2)
                images.append({
                    "image_id": f"m{m}_p{p}_i{i}", "manual_id": f"m{m}",
                    "page": p, "bbox": [x, y, x + 80, y + 60],
                })
            for c in range(rng.integers(1, 7)):
                x, y = rng.uniform(0, 500, 2)
                chunks.append({
                    "chunk_id": f"m{m}_p{p}_c{c}", "manual_id": f"m{m}",
                    "page": p, "bbox": [x, y, x + 120, y + 12],
                    "text": "de filter pomp" if c % 2 else "niets hier",
                })
    rng.shuffle(images)  # image order need not be page-contiguous
    terms = ["filter", "pomp"]

    def dense(use_lex, use_pos):
        mask, lex, pos = alignment_grids(images, chunks, terms,
                                         use_lex, use_pos)
        out = []
        for i, j in np.argwhere(mask):
            lex_hit = use_lex and lex[i, j] > LEXICAL_THRESHOLD
            pos_hit = use_pos and pos[i, j] > POSITIONAL_THRESHOLD
            if use_lex and use_pos and lex_hit and pos_hit:
                comb = (float(lex[i, j]) + float(pos[i, j])) / 2.0
                if comb > COMBINED_THRESHOLD:
                    out.append((images[i]["image_id"],
                                chunks[j]["chunk_id"], comb, "combined"))
            else:
                if lex_hit:
                    out.append((images[i]["image_id"],
                                chunks[j]["chunk_id"], float(lex[i, j]),
                                "lexical"))
                if pos_hit:
                    out.append((images[i]["image_id"],
                                chunks[j]["chunk_id"], float(pos[i, j]),
                                "positional"))
        return out

    for use_lex, use_pos in ((True, True), (True, False), (False, True)):
        want = dense(use_lex, use_pos)
        got = compute_alignments(images, chunks, terms, use_lex, use_pos)
        assert got == want
        # force pathologically small batches: output must not change
        monkeypatch.setattr(A, "_ALIGN_BATCH_CELLS", 1)
        got_small = compute_alignments(images, chunks, terms,
                                       use_lex, use_pos)
        monkeypatch.setattr(A, "_ALIGN_BATCH_CELLS", 8 * 1024 * 1024)
        assert got_small == want

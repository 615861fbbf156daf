"""Store tests: schemas, upsert semantics, persistence roundtrip, checks."""

import numpy as np
import pytest

from tpualign.store import SCHEMAS, EmbeddingStore


def img_row(i, page=1, manual="m"):
    return {
        "image_id": f"{manual}_p{page}_img{i}",
        "manual_id": manual,
        "page": page,
        "bbox": [0.0, 0.0, 10.0, 10.0],
        "bbox_source": "native",
        "caption": None,
        "filename": f"{manual}_p{page}_img{i}.png",
        "image_type": "raster_image",
    }


def chunk_row(i, page=1, manual="m"):
    return {
        "chunk_id": f"{manual}_p{page}_c{i}",
        "manual_id": manual,
        "page": page,
        "bbox": [0.0, 20.0, 30.0, 30.0],
        "text": f"chunk {i}",
    }


def test_setup_and_exists(tmp_path):
    store = EmbeddingStore(tmp_path / "store", embed_dim=8)
    assert not store.schema_exists("vanilla_clip")
    store.setup()
    for s in SCHEMAS:
        assert store.schema_exists(s)
        assert not store.has_embeddings(s)


def test_upsert_updates_only_embedding(tmp_path):
    store = EmbeddingStore(tmp_path, embed_dim=4)
    store.setup(["vanilla_clip"])
    e1 = np.ones((1, 4), np.float32)
    row = img_row(0)
    store.insert_images("vanilla_clip", [row], e1)
    # second insert, same id, different metadata + embedding
    row2 = dict(row, caption="changed")
    e2 = np.full((1, 4), 2.0, np.float32)
    store.insert_images("vanilla_clip", [row2], e2)
    assert store.counts("vanilla_clip")["images"] == 1
    # metadata keeps the original (conflict updates only clip_embedding)
    assert store.images("vanilla_clip")[0]["caption"] is None
    ids, mat = store.embedding_matrix("vanilla_clip", "images")
    np.testing.assert_array_equal(mat, e2)


def test_alignment_upsert(tmp_path):
    store = EmbeddingStore(tmp_path, embed_dim=4)
    store.setup(["clip_combined"])
    store.insert_alignments("clip_combined", [("i0", "c0", 0.5, "combined")])
    store.insert_alignments("clip_combined", [("i0", "c0", 0.9, "combined"),
                                              ("i0", "c0", 0.4, "lexical")])
    rows = store.alignments("clip_combined")
    assert len(rows) == 2
    assert ("i0", "c0", 0.9, "combined") in rows  # score updated on conflict
    assert ("i0", "c0", 0.4, "lexical") in rows   # distinct type = new row


def test_persistence_roundtrip(tmp_path):
    store = EmbeddingStore(tmp_path / "s", embed_dim=4)
    store.setup(["clip_lexical"])
    rng = np.random.default_rng(0)
    imgs = [img_row(i) for i in range(3)]
    chunks = [chunk_row(i) for i in range(5)]
    ie = rng.normal(size=(3, 4)).astype(np.float32)
    ce = rng.normal(size=(5, 4)).astype(np.float32)
    store.insert_images("clip_lexical", imgs, ie)
    store.insert_chunks("clip_lexical", chunks, ce)
    store.insert_alignments("clip_lexical", [("m_p1_img0", "m_p1_c0", 0.7, "lexical")])
    store.save(["clip_lexical"])

    # fresh instance reads from disk
    store2 = EmbeddingStore(tmp_path / "s", embed_dim=4)
    assert store2.has_embeddings("clip_lexical")
    assert store2.counts("clip_lexical") == {
        "images": 3, "text_chunks": 5, "alignments": 1,
    }
    ids, mat = store2.embedding_matrix("clip_lexical", "images")
    assert ids == [r["image_id"] for r in imgs]
    np.testing.assert_allclose(mat, ie, atol=1e-7)
    cids, cmat = store2.embedding_matrix("clip_lexical", "text_chunks")
    np.testing.assert_allclose(cmat, ce, atol=1e-7)
    assert store2.chunks("clip_lexical")[0]["text"] == "chunk 0"
    assert store2.alignments("clip_lexical") == [("m_p1_img0", "m_p1_c0", 0.7, "lexical")]


def test_force_recreates(tmp_path):
    store = EmbeddingStore(tmp_path, embed_dim=4)
    store.setup(["vanilla_clip"])
    store.insert_images("vanilla_clip", [img_row(0)], np.zeros((1, 4)))
    store.save(["vanilla_clip"])
    store2 = EmbeddingStore(tmp_path, embed_dim=4)
    store2.setup(["vanilla_clip"], force=True)
    assert not store2.has_embeddings("vanilla_clip")


def test_missing_schema_raises(tmp_path):
    store = EmbeddingStore(tmp_path, embed_dim=4)
    with pytest.raises(FileNotFoundError):
        store.counts("nope")


def test_record_mismatch_raises(tmp_path):
    store = EmbeddingStore(tmp_path, embed_dim=4)
    store.setup(["vanilla_clip"])
    with pytest.raises(AssertionError):
        store.insert_images("vanilla_clip", [img_row(0)], np.zeros((2, 4)))

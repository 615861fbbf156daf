"""Refine rescore-corpus storage modes (_RefineCorpus: ram/fp16/memmap).

VERDICT r3 weak #6: the refine stage's host fp32 copy did not scale to
the capacity ladder it is sold with (~49 GB RSS at the measured 24M x
512 int8 point). The fix stores rescore rows in one of three modes —
"ram" (fp32, the old behavior), "fp16" (half RAM, pgvector-halfvec
economics), "memmap" (fp32 rows in a disk file, ~0 resident — postgres
heap-table economics, ref:src/setup_vector_db.py:100-151) — with "auto"
routing by size. These tests pin:

- gather parity: memmap results are BIT-identical to ram; fp16 is exact
  over fp16-rounded rows (proven by building from fp16-representable
  rows, where all three modes agree bit-for-bit);
- the copy-on-write snapshot discipline (append/select return new
  objects; in-flight snapshots keep serving, memmap files live until
  the last snapshot dies);
- end-to-end RetrievalIndex / IVFIndex searches and the full
  add/remove/compact mutation cycle per mode;
- the RETRIEVAL_REFINE_STORE knob threading config -> service -> index.
"""

from __future__ import annotations

import gc
import os

import numpy as np
import pytest

from tpualign.parallel import retrieval as R
from tpualign.parallel.retrieval import _RefineCorpus, RetrievalIndex


@pytest.fixture
def rows():
    rng = np.random.default_rng(7)
    # fp16-representable values: every storage mode holds the SAME
    # bits, so cross-mode comparisons below can demand exact equality
    return rng.standard_normal((200, 32)).astype(np.float16).astype(np.float32)


ALL_MODES = ("ram", "fp16", "memmap")


class TestRefineCorpus:
    @pytest.mark.parametrize("mode", ALL_MODES)
    def test_take_matches_source(self, rows, mode):
        c = _RefineCorpus.build(rows, mode)
        rng = np.random.default_rng(0)
        idx = rng.integers(0, len(rows), (9, 4))
        got = c.take(idx)
        assert got.dtype == np.float32 and got.shape == (9, 4, 32)
        np.testing.assert_array_equal(got, rows[idx])

    @pytest.mark.parametrize("mode", ALL_MODES)
    def test_append_select_empty(self, rows, mode):
        c = _RefineCorpus.build(rows, mode)
        extra = (rows[:17] * 0.5).astype(np.float16).astype(np.float32)
        c2 = c.appended(extra)
        assert len(c) == 200  # immutable snapshot untouched
        assert len(c2) == 217
        np.testing.assert_array_equal(
            c2.take(np.arange(200, 217)), extra
        )
        # tail-straddling gather (memmap base + RAM tail in one take)
        idx = np.array([[0, 205], [199, 216]])
        np.testing.assert_array_equal(
            c2.take(idx), np.concatenate([rows, extra])[idx]
        )
        sel = np.arange(1, 217, 3)
        c3 = c2.selected(sel)
        assert c3.mode == mode and len(c3) == len(sel)
        np.testing.assert_array_equal(
            c3.take(np.arange(len(sel))), np.concatenate([rows, extra])[sel]
        )
        # boolean-mask selection
        mask = np.zeros(217, bool)
        mask[[3, 7, 211]] = True
        np.testing.assert_array_equal(
            c2.selected(mask).take(np.arange(3)),
            np.concatenate([rows, extra])[[3, 7, 211]],
        )
        e = c3.empty()
        assert len(e) == 0 and e.dim == 32

    def test_auto_routes_by_size(self, rows, monkeypatch):
        assert _RefineCorpus.build(rows, "auto").mode == "ram"
        monkeypatch.setattr(R, "REFINE_RAM_MAX_BYTES", 64)
        assert _RefineCorpus.build(rows, "auto").mode == "memmap"

    def test_env_knob_picks_mode(self, rows, monkeypatch):
        monkeypatch.setenv("RETRIEVAL_REFINE_STORE", "fp16")
        assert _RefineCorpus.build(rows, None).mode == "fp16"
        monkeypatch.setenv("RETRIEVAL_REFINE_STORE", "bogus")
        with pytest.raises(ValueError, match="refine store"):
            _RefineCorpus.build(rows, None)

    def test_memmap_resident_is_tail_only(self, rows):
        c = _RefineCorpus.build(rows, "memmap")
        assert c.nbytes_resident == 0
        c2 = c.appended(rows[:10])
        assert c2.nbytes_resident == 10 * 32 * 4
        assert _RefineCorpus.build(rows, "fp16").nbytes_resident \
            == rows.nbytes // 2

    def test_memmap_dir_knob(self, rows, tmp_path, monkeypatch):
        monkeypatch.setenv("RETRIEVAL_REFINE_DIR", str(tmp_path / "rf"))
        c = _RefineCorpus.build(rows, "memmap")
        assert c._file.path.startswith(str(tmp_path / "rf"))

    def test_memmap_file_lifecycle(self, rows):
        """The base file is shared by snapshots and unlinked only when
        the LAST one is collected — an in-flight search's snapshot can
        never lose its rows to a racing compact."""
        c = _RefineCorpus.build(rows, "memmap")
        path = c._file.path
        c2 = c.appended(rows[:5])  # shares the base file
        del c
        gc.collect()
        assert os.path.exists(path)  # c2 still references it
        sel = c2.selected(np.arange(50))  # fresh file
        path2 = sel._file.path
        assert path2 != path
        del c2
        gc.collect()
        assert not os.path.exists(path)
        del sel
        gc.collect()
        assert not os.path.exists(path2)

    def test_empty_selection_from_memmap(self, rows):
        c = _RefineCorpus.build(rows, "memmap")
        e = c.selected(np.zeros(0, np.int64))
        assert len(e) == 0

    def test_zero_row_build_never_memmaps(self):
        c = _RefineCorpus.build(np.zeros((0, 8), np.float32), "memmap")
        assert c.mode == "ram" and len(c) == 0


@pytest.mark.slow
class TestIndexIntegration:
    @pytest.fixture
    def corpus(self):
        rng = np.random.default_rng(3)
        emb = rng.standard_normal((300, 32)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        man = ["m%d" % (i % 3) for i in range(300)]
        pages = [i % 5 for i in range(300)]
        return emb, man, pages

    @pytest.fixture
    def queries(self):
        rng = np.random.default_rng(4)
        q = rng.standard_normal((6, 32)).astype(np.float32)
        return q / np.linalg.norm(q, axis=1, keepdims=True)

    def _search(self, ix, q):
        v, i = ix.search(q, k=8, global_search=True)
        return np.asarray(v), np.asarray(i)

    @pytest.mark.parametrize("mode", ("fp16", "memmap"))
    def test_exact_index_mode_parity_with_mutations(
            self, corpus, queries, mode):
        """int8+refine searches and the full mutation cycle return the
        same ids as the ram-mode baseline (memmap bit-identical values
        too; fp16 values match to its rounding)."""
        emb, man, pages = corpus
        base = RetrievalIndex(emb, man, pages, precision="int8",
                              refine=4, refine_store="ram")
        ix = RetrievalIndex(emb, man, pages, precision="int8",
                            refine=4, refine_store=mode)
        vb, ib = self._search(base, queries)
        v, i = self._search(ix, queries)
        np.testing.assert_array_equal(ib, i)
        if mode == "memmap":
            np.testing.assert_array_equal(vb, v)
        else:
            np.testing.assert_allclose(vb, v, atol=2e-3)
        for j in (base, ix):
            j.add(emb[:20] * 0.9, man[:20], pages[:20])
            j.remove([2, 4, 8, 310])
            j.compact()
        vb, ib = self._search(base, queries)
        v, i = self._search(ix, queries)
        np.testing.assert_array_equal(ib, i)
        if mode == "memmap":
            np.testing.assert_array_equal(vb, v)

    def test_ivf_index_memmap_parity(self, corpus, queries):
        from tpualign.parallel.ivf import IVFIndex

        emb, man, pages = corpus
        kw = dict(n_lists=8, n_probes=8, precision="int8", refine=4)
        base = IVFIndex(emb, man, pages, refine_store="ram", **kw)
        ix = IVFIndex(emb, man, pages, refine_store="memmap", **kw)
        vb, ib = self._search(base, queries)
        v, i = self._search(ix, queries)
        np.testing.assert_array_equal(ib, i)
        np.testing.assert_array_equal(vb, v)
        for j in (base, ix):
            j.add(emb[:10] * 0.8, man[:10], pages[:10])
            j.remove([1, 3])
            j.compact()
        vb, ib = self._search(base, queries)
        v, i = self._search(ix, queries)
        np.testing.assert_array_equal(ib, i)

    def test_build_index_factory_threads_store(self, corpus):
        emb, man, pages = corpus
        ix = R.build_index(emb, man, pages, precision="int8", refine=4,
                           refine_store="memmap")
        assert ix._refine_corpus.mode == "memmap"

    def test_config_knob_reaches_service(self, corpus, monkeypatch):
        """RETRIEVAL_REFINE_STORE flows config -> retrieval_kwargs ->
        RetrievalService -> index."""
        from tpualign.config import load_config
        from tpualign.serving.server import RetrievalService

        emb, man, pages = corpus
        monkeypatch.setenv("RETRIEVAL_PRECISION", "int8")
        monkeypatch.setenv("RETRIEVAL_REFINE", "4")
        monkeypatch.setenv("RETRIEVAL_REFINE_STORE", "memmap")
        cfg = load_config()
        assert cfg.retrieval_refine_store == "memmap"
        svc = RetrievalService(
            chunk_embeddings=emb, chunk_ids=[str(i) for i in range(len(emb))],
            chunk_manuals=man, chunk_pages=pages,
            precision=cfg.retrieval_precision,
            refine=cfg.retrieval_refine,
            refine_store=cfg.retrieval_refine_store,
            coalesce_window_ms=None,
        )
        assert svc.index._refine_corpus.mode == "memmap"


@pytest.mark.slow
class TestSkipValsFetch:
    def test_streaming_refine_skips_vals_fetch_identically(self, monkeypatch):
        """In the beyond-HBM streaming branch a refined search fetches
        only indices (values are recomputed by the rescore; SENTINEL_IDX
        discipline makes idx alone authoritative). Results must be
        identical to the both-arrays path."""
        rng = np.random.default_rng(11)
        emb = rng.standard_normal((600, 32)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        man = ["m%d" % (i % 7) for i in range(600)]  # keyed: some rows
        pages = [i % 3 for i in range(600)]          # masked per query
        q = rng.standard_normal((4, 32)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)

        ix = RetrievalIndex(emb, man, pages, precision="int8",
                            refine=4, refine_store="memmap")
        # force the streaming-only route at test scale
        monkeypatch.setattr(R, "STREAM_ONLY_SIM_BYTES", 1)
        v_skip, i_skip = ix.search(q, ["m1"] * 4, [0, 1, 2, 0], k=5)
        # the skip path must have produced real rescored values
        assert np.isfinite(np.asarray(v_skip)).any()
        # same search with skip disabled (raw path fetches both arrays)
        v_raw, i_raw = ix._search_encoded_raw(
            q, R.encode_keys(["m1"] * 4, [0, 1, 2, 0],
                             dict(ix.vocab))[0], 20)
        v_ref, i_ref = R._refine_rescore(q, v_raw, i_raw,
                                         ix._refine_corpus, 5)
        np.testing.assert_array_equal(np.asarray(i_skip), i_ref)
        np.testing.assert_array_equal(np.asarray(v_skip), v_ref)
        # queries with NO candidates (unknown manual) stay all-sentinel
        v0, i0 = ix.search(q[:1], ["nope"], [0], k=5)
        assert (np.asarray(i0) == -1).all()
        assert (np.asarray(v0) <= R.NEG_INF / 2).all()


class TestMemmap16:
    def test_memmap16_matches_fp16(self, rows):
        """fp16-on-disk holds the same values as fp16-in-RAM (the rows
        fixture is fp16-representable, so gathers are bit-exact against
        the source), at half the disk bytes of fp32 memmap."""
        c = _RefineCorpus.build(rows, "memmap16")
        assert c.mode == "memmap16" and c.nbytes_resident == 0
        assert c._file.path.endswith(".f16")
        assert os.path.getsize(c._file.path) == rows.nbytes // 2
        idx = np.random.default_rng(2).integers(0, len(rows), (5, 3))
        np.testing.assert_array_equal(c.take(idx), rows[idx])
        c2 = c.appended(rows[:9])
        assert c2._tail.dtype == np.float16
        sel = c2.selected(np.arange(0, 209, 2))
        assert sel.mode == "memmap16" and sel._file.path.endswith(".f16")
        np.testing.assert_array_equal(
            sel.take(np.arange(3)), np.concatenate([rows, rows[:9]])[[0, 2, 4]]
        )
        assert c.empty().mode == "fp16"

    def test_memmap16_end_to_end_int2(self):
        """The mode it exists for: int2 first stage + fp16-on-disk
        rescore returns the fp16-rescored ranking (vs the int2-only
        ranking, which near-ties scramble)."""
        rng = np.random.default_rng(5)
        emb = rng.standard_normal((300, 64)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        man, pages = ["m"] * 300, [1] * 300
        q = emb[42:43] + 1e-3 * rng.standard_normal((1, 64)).astype(np.float32)
        ix = RetrievalIndex(emb, man, pages, precision="int2",
                            refine=8, refine_store="memmap16")
        assert ix._refine_corpus.mode == "memmap16"
        v, i = ix.search(q, k=5, global_search=True)
        exact16 = (q[0].astype(np.float64)
                   @ emb.astype(np.float16).astype(np.float64).T)
        # the true neighbor survives int2's noise into the top-k*R and
        # the fp16 rescore ranks it first
        assert int(np.asarray(i)[0, 0]) == 42
        want = np.argsort(-exact16)[:1]
        assert int(np.asarray(i)[0, 0]) == int(want[0])


def test_empty_index_with_refine_builds_then_grows():
    """Regression (r4 review): a quantized+refine index built BEFORE any
    rows exist must construct (ingest-then-add workflows), and the first
    add() re-initializes the rescore corpus from the real rows."""
    ix = RetrievalIndex(
        np.zeros((0,), np.float32), [], [], precision="int8",
        refine=8, refine_store="memmap",
    )
    assert ix.n == 0
    v, i = ix.search(np.zeros((2, 16), np.float32), k=3, global_search=True)
    assert (np.asarray(i) == -1).all()
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((50, 16)).astype(np.float32)
    ix.add(emb, ["m"] * 50, [1] * 50)
    assert len(ix._refine_corpus) == 50
    v, i = ix.search(emb[7:8], k=1, global_search=True)
    assert int(np.asarray(i)[0, 0]) == 7


class TestStaleFileReclaim:
    """r5: orphan and failed-write reclamation for refine memmap files
    (VERDICT r4 weak #5 + ADVICE r4 #2)."""

    def _dead_pid(self):
        import subprocess

        p = subprocess.Popen(["true"])
        p.wait()
        return p.pid  # just exited; reuse within this test is unlikely

    def test_sweep_reclaims_dead_owner_files(self, tmp_path):
        d = str(tmp_path)
        dead = self._dead_pid()
        orphan = tmp_path / f"tpualign_refine_{dead}_abc.f32"
        orphan.write_bytes(b"x" * 64)
        mine = tmp_path / f"tpualign_refine_{os.getpid()}_def.f32"
        mine.write_bytes(b"y" * 64)
        other = tmp_path / "unrelated.f32"
        other.write_bytes(b"z")
        legacy = tmp_path / "tpualign_refine_noPid.f32"  # pre-r5 naming
        legacy.write_bytes(b"w")
        removed = R._sweep_stale_refine_files(d)
        assert removed == 1
        assert not orphan.exists()          # dead owner: reclaimed
        assert mine.exists()                # live owner (us): kept
        assert other.exists()               # non-matching name: kept
        assert legacy.exists()              # unparseable pid: kept

    def test_build_triggers_sweep_once(self, rows, tmp_path, monkeypatch):
        d = tmp_path / "rf"
        d.mkdir()
        monkeypatch.setenv("RETRIEVAL_REFINE_DIR", str(d))
        monkeypatch.setattr(R, "_swept_refine_dirs", set())
        dead = self._dead_pid()
        orphan = d / f"tpualign_refine_{dead}_abc.f32"
        orphan.write_bytes(b"x" * 64)
        c = _RefineCorpus.build(rows, "memmap")
        assert not orphan.exists()  # first build swept the orphan
        # and our OWN freshly-written file survived the sweep
        assert len(c) == len(rows)
        np.testing.assert_array_equal(c.take([0]), rows[None, 0])

    def test_failed_write_unlinks_temp_file(self, tmp_path, monkeypatch):
        monkeypatch.setenv("RETRIEVAL_REFINE_DIR", str(tmp_path))
        monkeypatch.setattr(R, "_swept_refine_dirs", {str(tmp_path)})

        def bad_rows(s, e):
            raise OSError("disk full")

        with pytest.raises(OSError, match="disk full"):
            R._write_refine_memmap(10, 4, bad_rows)
        left = [p for p in os.listdir(tmp_path)
                if p.startswith("tpualign_refine_")]
        assert left == []  # the temp file did not orphan

    def test_ram_mode_build_still_sweeps(self, rows, tmp_path, monkeypatch):
        """A daemon that crashed in memmap mode and restarted in ram
        mode must still reclaim the orphan (the sweep rides EVERY first
        build, not just memmap ones)."""
        d = tmp_path / "rf2"
        d.mkdir()
        monkeypatch.setenv("RETRIEVAL_REFINE_DIR", str(d))
        monkeypatch.setattr(R, "_swept_refine_dirs", set())
        dead = self._dead_pid()
        orphan = d / f"tpualign_refine_{dead}_x.f16"
        orphan.write_bytes(b"x" * 64)
        c = _RefineCorpus.build(rows, "ram")
        assert not orphan.exists()
        assert c.mode == "ram"

"""IVF (cluster-probed) index: oracle exactness at full probes, recall on
clusterable data, (manual, page) key masking, spill correctness, and the
build's determinism. The reference's IVFFlat (ref:src/setup_vector_db.py:
171-190) had none of these guarantees measured."""

import numpy as np
import pytest

from tpualign.ops.similarity import NEG_INF
from tpualign.parallel.ivf import IVFIndex
from tpualign.parallel.retrieval import encode_keys

from test_parallel import numpy_oracle


def unit(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def make_clustered(rng, n=2048, d=32, g=16, noise=0.15):
    """g well-separated directions + per-point noise: k-means can find the
    structure, so small probe counts must retain high recall."""
    centers = unit(rng.normal(size=(g, d)).astype(np.float32))
    a = rng.integers(g, size=n)
    x = unit(centers[a] + noise * rng.normal(size=(n, d)).astype(np.float32))
    return x.astype(np.float32), a


def test_full_probe_matches_dense_oracle():
    """n_probes == n_lists scans every cluster + the spill tail: results
    must be bit-identical to the dense exact ranking incl. tie-breaks."""
    rng = np.random.default_rng(0)
    n, d = 300, 16
    c = unit(rng.normal(size=(n, d)).astype(np.float32))
    cman = [f"m{i % 3}" for i in range(n)]
    cpage = [1 + i % 4 for i in range(n)]
    index = IVFIndex(c, cman, cpage, n_lists=8, iters=4)
    q = c[:23]
    qman, qpage = cman[:23], cpage[:23]
    vals, idx = index.search(q, qman, qpage, k=10, n_probes=index.n_lists)
    vocab = {}
    ck, vocab = encode_keys(cman, cpage, vocab)
    qk, _ = encode_keys(qman, qpage, vocab)
    ovals, oidx = numpy_oracle(q, qk, c, ck, 10)
    np.testing.assert_array_equal(idx, oidx)
    np.testing.assert_allclose(vals, ovals, rtol=0, atol=1e-5)


def test_full_probe_exact_with_forced_spill():
    """A tiny capacity_factor forces rows into the spill tail; full-probe
    search must STILL be exact (spill is scanned by construction)."""
    rng = np.random.default_rng(1)
    # 4 true groups over 16 lists -> heavily skewed cluster sizes; the
    # tiny factor pins capacity at the 128 floor so the big lists spill
    c, _ = make_clustered(rng, n=2048, d=16, g=4)
    index = IVFIndex(c, n_lists=16, iters=4, capacity_factor=0.05)
    assert index.spill >= 8  # the skew genuinely spilled rows
    q = unit(rng.normal(size=(31, 16)).astype(np.float32))
    vals, idx = index.search(q, k=5, n_probes=index.n_lists)
    ck = np.zeros(len(c), np.int32)
    ovals, oidx = numpy_oracle(q, np.zeros(len(q), np.int32), c, ck, 5)
    np.testing.assert_array_equal(idx, oidx)
    np.testing.assert_allclose(vals, ovals, rtol=0, atol=1e-5)


def test_probed_recall_on_clustered_corpus():
    rng = np.random.default_rng(2)
    c, _ = make_clustered(rng, n=4096, d=32, g=16)
    index = IVFIndex(c, n_lists=16, n_probes=4, iters=8)
    q = unit(c[rng.integers(len(c), size=256)]
             + 0.05 * rng.normal(size=(256, 32)).astype(np.float32))
    vals, idx = index.search(q, k=10)
    ovals, oidx = numpy_oracle(
        q, np.zeros(len(q), np.int32), c, np.zeros(len(c), np.int32), 10
    )
    hits = np.mean([
        len(np.intersect1d(idx[r], oidx[r])) / 10 for r in range(len(q))
    ])
    assert hits >= 0.9, f"recall@10 {hits:.3f} < 0.9 on clusterable data"


def test_key_masking_respected():
    """Candidates must share (manual, page) exactly as the dense paths do
    — probing must never leak rows from other pages."""
    rng = np.random.default_rng(3)
    n, d = 400, 16
    c = unit(rng.normal(size=(n, d)).astype(np.float32))
    cman = [f"m{i % 2}" for i in range(n)]
    cpage = [1 + i % 5 for i in range(n)]
    index = IVFIndex(c, cman, cpage, n_lists=8, iters=4)
    q = c[:50]
    vals, idx = index.search(q, cman[:50], cpage[:50], k=8,
                             n_probes=index.n_lists)
    for r in range(50):
        for j in idx[r]:
            if j < 0:
                continue
            assert cman[j] == cman[r] and cpage[j] == cpage[r]
    # self-query ranks itself first within its page group
    np.testing.assert_array_equal(idx[:, 0], np.arange(50))


def test_no_candidate_rows_are_sentinel():
    rng = np.random.default_rng(4)
    c = unit(rng.normal(size=(64, 8)).astype(np.float32))
    index = IVFIndex(c, ["m0"] * 64, [1] * 64, n_lists=8, iters=2)
    vals, idx = index.search(c[:3], ["missing"] * 3, [9] * 3, k=4,
                             n_probes=index.n_lists)
    assert (idx == -1).all()
    assert (vals <= NEG_INF / 2).all()


def test_build_deterministic_and_batching_invariant():
    rng = np.random.default_rng(5)
    c, _ = make_clustered(rng, n=1024, d=16, g=8)
    a = IVFIndex(c, n_lists=8, iters=4)
    b = IVFIndex(c, n_lists=8, iters=4)
    q = unit(rng.normal(size=(70, 16)).astype(np.float32))
    va, ia = a.search(q, k=5)
    vb, ib = b.search(q, k=5)
    np.testing.assert_array_equal(ia, ib)
    # chunked dispatch (query_block) must not change results
    small = IVFIndex(c, n_lists=8, iters=4, query_block=16)
    vs, is_ = small.search(q, k=5)
    np.testing.assert_array_equal(ia, is_)
    np.testing.assert_allclose(va, vs, rtol=0, atol=1e-6)


def test_kernel_path_matches_xla_union_path():
    """The scalar-prefetch Pallas kernel (interpret mode on CPU) must
    return the same candidates as the XLA union path at the same probes
    — including spill rows and (manual, page) key masking."""
    rng = np.random.default_rng(7)
    c, _ = make_clustered(rng, n=2048, d=32, g=8)
    cman = [f"m{i % 2}" for i in range(2048)]
    cpage = [1 + i % 3 for i in range(2048)]
    # force spill so the kernel's spill blocks are exercised
    kern = IVFIndex(c, cman, cpage, n_lists=16, iters=4,
                    capacity_factor=0.05, use_kernel=True)
    xla = IVFIndex(c, cman, cpage, n_lists=16, iters=4,
                   capacity_factor=0.05, use_kernel=False)
    assert kern.spill >= 8
    q = unit(rng.normal(size=(50, 32)).astype(np.float32))
    for kwargs in (
        {"global_search": True},
        {"query_manuals": cman[:50], "query_pages": cpage[:50]},
    ):
        vk, ik = kern.search(q, k=7, n_probes=4, **kwargs)
        vx, ix = xla.search(q, k=7, n_probes=4, **kwargs)
        np.testing.assert_array_equal(ik, ix)
        np.testing.assert_allclose(vk, vx, rtol=0, atol=1e-5)


def test_kernel_path_full_union_matches_oracle():
    """Full probing (n_probes == n_lists) routes to the bit-exact XLA
    path even when the kernel is forced on — dense-oracle tie parity is
    part of the exact-mode contract."""
    rng = np.random.default_rng(8)
    n, d = 512, 16
    c = unit(rng.normal(size=(n, d)).astype(np.float32))
    index = IVFIndex(c, n_lists=8, iters=4, use_kernel=True)
    q = c[:17]
    vals, idx = index.search(q, k=6, n_probes=index.n_lists)
    ovals, oidx = numpy_oracle(
        q, np.zeros(17, np.int32), c, np.zeros(n, np.int32), 6
    )
    np.testing.assert_array_equal(idx, oidx)
    np.testing.assert_allclose(vals, ovals, rtol=0, atol=1e-5)


def test_int8_precision_recall():
    """int8 packed layout: 4x capacity with near-identical recall —
    quantization perturbs cosine scores by ~1e-3, so recall@10 vs the
    fp32 probed path stays high (both kernel and XLA paths)."""
    rng = np.random.default_rng(9)
    c, _ = make_clustered(rng, n=4096, d=32, g=16)
    q = unit(c[rng.integers(len(c), size=128)]
             + 0.05 * rng.normal(size=(128, 32)).astype(np.float32))
    fp = IVFIndex(c, n_lists=16, n_probes=4, iters=6, use_kernel=False)
    for use_kernel in (False, True):
        i8 = IVFIndex(c, n_lists=16, n_probes=4, iters=6,
                      precision="int8", use_kernel=use_kernel)
        assert i8.memory_bytes < fp.memory_bytes / 2
        _, fi = fp.search(q, k=10)
        _, qi = i8.search(q, k=10)
        hits = np.mean([
            len(np.intersect1d(qi[r], fi[r])) / 10 for r in range(len(q))
        ])
        assert hits >= 0.95, f"int8 recall {hits:.3f} (kernel={use_kernel})"


def test_prequantized_corpus_build_matches_quantize_at_build():
    """Building from an already-int8 corpus (+ per-row scales) must give
    the same results as quantizing at build time — the beyond-fp32-HBM
    capacity path never materializes an fp32 corpus."""
    rng = np.random.default_rng(10)
    c, _ = make_clustered(rng, n=1024, d=32, g=8)
    scale = np.maximum(np.abs(c).max(axis=1, keepdims=True) / 127.0, 1e-12)
    c_i8 = np.clip(np.rint(c / scale), -127, 127).astype(np.int8)
    a = IVFIndex(c, n_lists=8, iters=4, precision="int8")
    b = IVFIndex(c_i8, n_lists=8, iters=4,
                 corpus_scales=scale.astype(np.float32))
    assert b.precision == "int8"
    q = unit(rng.normal(size=(40, 32)).astype(np.float32))
    va, ia = a.search(q, k=5, n_probes=a.n_lists)
    vb, ib = b.search(q, k=5, n_probes=b.n_lists)
    # k-means sees (near-)identical dequantized data; rankings agree
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(va, vb, rtol=0, atol=1e-4)

    with pytest.raises(ValueError):
        IVFIndex(c_i8, n_lists=8)  # int8 corpus requires scales


def test_probe_sweep_monotone_recall():
    """More probes can only improve recall (candidate supersets)."""
    rng = np.random.default_rng(6)
    c, _ = make_clustered(rng, n=2048, d=32, g=32, noise=0.3)
    index = IVFIndex(c, n_lists=32, iters=6)
    q = unit(rng.normal(size=(128, 32)).astype(np.float32))
    _, oidx = numpy_oracle(
        q, np.zeros(len(q), np.int32), c, np.zeros(len(c), np.int32), 10
    )

    def recall(p):
        _, idx = index.search(q, k=10, n_probes=p)
        return np.mean([
            len(np.intersect1d(idx[r], oidx[r])) / 10 for r in range(len(q))
        ])

    r1, r4, rall = recall(1), recall(4), recall(32)
    assert r1 <= r4 + 1e-9 <= rall + 2e-9
    assert rall == 1.0


def test_save_load_roundtrip(tmp_path):
    """Persisted structure + same corpus must reproduce the index exactly
    (fp32 and int8), and loading guards corpus-shape mismatches."""
    rng = np.random.default_rng(11)
    c, _ = make_clustered(rng, n=1024, d=32, g=8)
    cman = [f"m{i % 2}" for i in range(1024)]
    cpage = [1 + i % 3 for i in range(1024)]
    q = unit(rng.normal(size=(40, 32)).astype(np.float32))
    for precision in ("fp32", "int8"):
        a = IVFIndex(c, cman, cpage, n_lists=8, iters=4,
                     precision=precision)
        path = tmp_path / f"ivf_{precision}.npz"
        a.save(path)
        b = IVFIndex.load(path, c)
        assert b.precision == precision and b.vocab == a.vocab
        va, ia = a.search(q, cman[:40], cpage[:40], k=5)
        vb, ib = b.search(q, cman[:40], cpage[:40], k=5)
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_allclose(va, vb, rtol=0, atol=1e-6)
    with pytest.raises(ValueError):
        IVFIndex.load(tmp_path / "ivf_fp32.npz", c[:100])


def test_load_rejects_same_size_changed_corpus(tmp_path):
    """Content fingerprint (pgvector's stale-index failure mode): a
    same-SIZE store whose rows changed since ``tpualign index`` must not
    serve the artifact's stale keys/clusters — load raises (and the
    build_index cache path therefore rebuilds). A post-mutation save
    drops the fingerprint (the layout no longer mirrors any store
    snapshot) and keeps shape-only validation."""
    rng = np.random.default_rng(21)
    c, _ = make_clustered(rng, n=512, d=16, g=8)
    cman = [f"m{i % 2}" for i in range(512)]
    cpage = [1] * 512
    a = IVFIndex(c, cman, cpage, n_lists=8, iters=4)
    path = tmp_path / "ivf.npz"
    a.save(path)
    IVFIndex.load(path, c)  # unchanged corpus: fine
    changed = c.copy()
    # same shape, different content (row 0 is always in the strided
    # fingerprint sample; like HNSW's, the hash is a cheap sample, not
    # a full-corpus digest)
    changed[0] = -changed[0]
    with pytest.raises(ValueError, match="fingerprint"):
        IVFIndex.load(path, changed)
    # save-after-load keeps the fingerprint verifiable
    b = IVFIndex.load(path, c)
    path2 = tmp_path / "ivf2.npz"
    b.save(path2)
    with pytest.raises(ValueError, match="fingerprint"):
        IVFIndex.load(path2, changed)
    # mutations clear it: the artifact validates by shape only
    extra = unit(rng.normal(size=(2, 16)).astype(np.float32))
    a.add(extra, ["m0", "m1"], [1, 1])
    assert a._corpus_fp is None
    path3 = tmp_path / "ivf3.npz"
    a.save(path3)
    grown = np.concatenate([changed, extra])
    IVFIndex.load(path3, grown)  # same shape as the mutated index: loads


def test_build_index_ivf_cache(tmp_path, caplog):
    """The IVF_CACHE path: first build saves, second build loads (same
    results, no second k-means), precision mismatch rebuilds."""
    from tpualign.parallel.retrieval import build_index
    import tpualign.parallel.ivf as ivf_mod

    rng = np.random.default_rng(12)
    c, _ = make_clustered(rng, n=512, d=16, g=8)
    man = ["m0"] * 512
    pages = [1 + i % 4 for i in range(512)]
    cache = str(tmp_path / "ivf.npz")
    a = build_index(c, man, pages, index_type="ivf", ivf_lists=8,
                    ivf_cache=cache)
    assert (tmp_path / "ivf.npz").exists()
    calls = []
    orig = ivf_mod._kmeans

    def spy(*args, **kw):
        calls.append(1)
        return orig(*args, **kw)

    ivf_mod._kmeans = spy
    try:
        b = build_index(c, man, pages, index_type="ivf", ivf_lists=8,
                        ivf_cache=cache)
        assert not calls, "cache hit must not re-run k-means"
        # precision mismatch: rebuild (k-means runs)
        d_ = build_index(c, man, pages, index_type="ivf", ivf_lists=8,
                         ivf_cache=cache, precision="int8")
        assert calls and d_.precision == "int8"
    finally:
        ivf_mod._kmeans = orig
    q = unit(rng.normal(size=(16, 16)).astype(np.float32))
    va, ia = a.search(q, k=5, n_probes=8)
    vb, ib = b.search(q, k=5, n_probes=8)
    np.testing.assert_array_equal(ia, ib)


def test_build_index_ivf_cache_sharded(tmp_path):
    """IVF_CACHE composes with the mesh: first sharded build saves, a
    second build on a same-size mesh loads (no second k-means, same
    results); a mesh-size mismatch falls back to a rebuild."""
    from tpualign.parallel.mesh import create_mesh
    from tpualign.parallel.retrieval import build_index
    import tpualign.parallel.ivf as ivf_mod

    rng = np.random.default_rng(94)
    c, _ = make_clustered(rng, n=1024, d=16, g=8)
    man = ["m0"] * 1024
    pages = [1 + i % 4 for i in range(1024)]
    cache = str(tmp_path / "sivf.npz")
    a = build_index(c, man, pages, index_type="ivf", ivf_lists=32,
                    ivf_cache=cache, mesh=_mesh8())
    assert a.mesh is not None and (tmp_path / "sivf.npz").exists()
    calls = []
    orig = ivf_mod._kmeans

    def spy(*args, **kw):
        calls.append(1)
        return orig(*args, **kw)

    ivf_mod._kmeans = spy
    try:
        b = build_index(c, man, pages, index_type="ivf", ivf_lists=32,
                        ivf_cache=cache, mesh=_mesh8())
        assert not calls, "sharded cache hit must not re-run k-means"
        assert b.mesh is not None
        # mesh-size mismatch: the load refuses, the factory rebuilds
        m4 = create_mesh(data=4)
        d_ = build_index(c, man, pages, index_type="ivf", ivf_lists=32,
                         ivf_cache=cache, mesh=m4)
        assert calls and dict(d_.mesh.shape)["data"] == 4
    finally:
        ivf_mod._kmeans = orig
    q = unit(rng.normal(size=(16, 16)).astype(np.float32))
    va, ia = a.search(q, k=5, n_probes=a.n_lists_local)
    vb, ib = b.search(q, k=5, n_probes=b.n_lists_local)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(va, vb, rtol=0, atol=1e-6)


def test_calibrate_picks_probes_meeting_target():
    """Analytic probe calibration: the chosen n_probes must actually
    deliver the target recall when searching (verified empirically
    against the exact ranking), and tighter targets need >= probes."""
    rng = np.random.default_rng(13)
    c, _ = make_clustered(rng, n=4096, d=32, g=32, noise=0.35)
    index = IVFIndex(c, n_lists=32, iters=6)
    p_low = index.calibrate(0.7, k=10)
    p_high = index.calibrate(0.99, k=10)
    assert 1 <= p_low <= p_high <= index.n_lists
    assert index.n_probes == p_high  # calibrate sets the default

    # empirical check: in-corpus sample queries reach the target
    sel = (np.arange(200) * len(c)) // 200
    q = c[sel]
    _, oidx = numpy_oracle(
        q, np.zeros(len(q), np.int32), c, np.zeros(len(c), np.int32), 10
    )
    _, idx = index.search(q, k=10)  # uses calibrated n_probes
    hits = np.mean([
        len(np.intersect1d(idx[r], oidx[r])) / 10 for r in range(len(q))
    ])
    assert hits >= 0.95, f"calibrated recall {hits:.3f} < target-ish 0.99"


def test_build_index_recall_target_calibrates_ivf():
    """RETRIEVAL_RECALL_TARGET + RETRIEVAL_INDEX=ivf = auto-probes; an
    explicit IVF_PROBES wins over calibration."""
    from tpualign.parallel.retrieval import build_index

    rng = np.random.default_rng(14)
    c, _ = make_clustered(rng, n=1024, d=16, g=8)
    man = ["m0"] * 1024
    pages = [1] * 1024
    auto = build_index(c, man, pages, index_type="ivf", ivf_lists=16,
                       recall_target=0.95)
    manual = build_index(c, man, pages, index_type="ivf", ivf_lists=16,
                         ivf_probes=2, recall_target=0.95)
    assert manual.n_probes == 2
    assert 1 <= auto.n_probes <= 16


def test_vmem_capacity_clamp():
    """Too-few lists must auto-bump so cluster blocks fit the kernel's
    VMEM budget (capacity 8256 int8 at d=512 measurably fails the AOT
    compile), and the capacity itself never exceeds the bound."""
    from tpualign.parallel.ivf import _max_capacity

    assert _max_capacity(512, 4) == 3072   # fp32: 12MB / (512*8)
    assert _max_capacity(512, 1) == 4096   # int8: 12MB / (512*6)
    # MXU variant: no fp32 dequant intermediate -> 12MB / (512*2 + 512);
    # capacity 8192 at d=512 compile-probed OK on v5e
    assert _max_capacity(512, 1, int8_mxu=True) == 8192
    assert _max_capacity(512, 4, int8_mxu=True) == 3072  # fp32 unaffected
    assert _max_capacity(64, 4) % 128 == 0

    rng = np.random.default_rng(15)
    # d=4096 makes the fp32 bound tiny (384 rows) so a small corpus
    # triggers the bump: 8 lists over 4096 rows -> implied cap 768 > 384
    c = rng.normal(size=(4096, 4096)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    index = IVFIndex(c, n_lists=8, iters=1)
    assert index.capacity <= _max_capacity(4096, 4)
    assert index.n_lists >= 16  # bumped past the requested 8


def test_int8_mxu_kernel_matches_dequant_path():
    """The s8xs8->s32 MXU kernel variant must agree with the VMEM-dequant
    int8 path up to query-side quantization noise (recall-level match on
    clusterable data, near-equal scores for the self-match)."""
    rng = np.random.default_rng(16)
    c, _ = make_clustered(rng, n=2048, d=32, g=8)
    deq = IVFIndex(c, n_lists=16, iters=4, precision="int8",
                   use_kernel=True)
    mxu = IVFIndex(c, n_lists=16, iters=4, precision="int8",
                   use_kernel=True, int8_mxu=True)
    q = unit(c[rng.integers(len(c), size=64)]
             + 0.05 * rng.normal(size=(64, 32)).astype(np.float32))
    vd, idd = deq.search(q, k=10, n_probes=4)
    vm, idm = mxu.search(q, k=10, n_probes=4)
    hits = np.mean([
        len(np.intersect1d(idm[r], idd[r])) / 10 for r in range(len(q))
    ])
    assert hits >= 0.95, f"mxu-vs-dequant overlap {hits:.3f}"
    # scores agree to quantization noise where the candidates agree
    both = idm == idd
    np.testing.assert_allclose(vm[both], vd[both], rtol=0, atol=2e-2)


def test_cache_recalibrates_on_target_change(tmp_path):
    """A cached index recalibrates (and refreshes the artifact) when
    RETRIEVAL_RECALL_TARGET changes; same target loads without work."""
    from tpualign.parallel.retrieval import build_index

    rng = np.random.default_rng(17)
    c, _ = make_clustered(rng, n=2048, d=32, g=32, noise=0.35)
    man = ["m0"] * 2048
    pages = [1] * 2048
    cache = str(tmp_path / "ivf.npz")
    a = build_index(c, man, pages, index_type="ivf", ivf_lists=32,
                    recall_target=0.7, ivf_cache=cache)
    b = build_index(c, man, pages, index_type="ivf", ivf_lists=32,
                    recall_target=0.99, ivf_cache=cache)
    assert b.calibrated_target == 0.99
    assert b.n_probes >= a.n_probes
    cda = build_index(c, man, pages, index_type="ivf", ivf_lists=32,
                      recall_target=0.99, ivf_cache=cache)
    assert cda.n_probes == b.n_probes and cda.calibrated_target == 0.99


# -- sharded (mesh) IVF -------------------------------------------------------


def _mesh8():
    from tpualign.parallel.mesh import create_mesh
    return create_mesh(data=8)


def test_sharded_full_probe_matches_dense_oracle():
    """Per-shard exhaustive probing + exact cross-shard merge must be
    bit-identical to the dense oracle, keys and ties included."""
    rng = np.random.default_rng(20)
    n, d = 1024, 32
    c = unit(rng.normal(size=(n, d)).astype(np.float32))
    cman = [f"m{i % 3}" for i in range(n)]
    cpage = [1 + i % 4 for i in range(n)]
    index = IVFIndex(c, cman, cpage, n_lists=32, iters=4, mesh=_mesh8())
    assert index.n_lists_local * 8 == index.n_lists
    q = c[:37]
    vals, idx = index.search(q, cman[:37], cpage[:37], k=9,
                             n_probes=index.n_lists_local)
    vocab = {}
    ck, vocab = encode_keys(cman, cpage, vocab)
    qk, _ = encode_keys(cman[:37], cpage[:37], vocab)
    ovals, oidx = numpy_oracle(q, qk, c, ck, 9)
    np.testing.assert_array_equal(idx, oidx)
    np.testing.assert_allclose(vals, ovals, rtol=0, atol=1e-5)


def test_sharded_probed_recall_and_int8():
    """Probed sharded search keeps recall on clusterable data; the int8
    sharded variant stays within quantization noise of it."""
    rng = np.random.default_rng(21)
    c, _ = make_clustered(rng, n=8192, d=32, g=32)
    q = unit(c[rng.integers(len(c), size=128)]
             + 0.05 * rng.normal(size=(128, 32)).astype(np.float32))
    _, oidx = numpy_oracle(
        q, np.zeros(len(q), np.int32), c, np.zeros(len(c), np.int32), 10
    )
    fp = IVFIndex(c, n_lists=64, n_probes=4, iters=6, mesh=_mesh8())
    _, idx = fp.search(q, k=10)
    rec = np.mean([
        len(np.intersect1d(idx[r], oidx[r])) / 10 for r in range(len(q))
    ])
    assert rec >= 0.9, f"sharded recall {rec:.3f}"

    i8 = IVFIndex(c, n_lists=64, n_probes=4, iters=6, precision="int8",
                  mesh=_mesh8())
    _, idx8 = i8.search(q, k=10)
    rec8 = np.mean([
        len(np.intersect1d(idx8[r], oidx[r])) / 10 for r in range(len(q))
    ])
    assert rec8 >= 0.85, f"sharded int8 recall {rec8:.3f}"


def test_sharded_kernel_interpret_matches_union():
    """The scalar-prefetch kernel under shard_map (interpret mode on the
    CPU mesh) must agree with the XLA union path shard-for-shard."""
    rng = np.random.default_rng(22)
    c, _ = make_clustered(rng, n=2048, d=32, g=16)
    q = unit(rng.normal(size=(40, 32)).astype(np.float32))
    kern = IVFIndex(c, n_lists=32, iters=4, mesh=_mesh8(),
                    use_kernel=True)
    xla = IVFIndex(c, n_lists=32, iters=4, mesh=_mesh8(),
                   use_kernel=False)
    vk, ik = kern.search(q, k=7, n_probes=2)
    vx, ix = xla.search(q, k=7, n_probes=2)
    np.testing.assert_array_equal(ik, ix)
    np.testing.assert_allclose(vk, vx, rtol=0, atol=1e-5)


def test_factory_builds_sharded_ivf_on_mesh():
    from tpualign.parallel.retrieval import build_index

    rng = np.random.default_rng(23)
    c, _ = make_clustered(rng, n=1024, d=16, g=8)
    ix = build_index(c, ["m0"] * 1024, [1] * 1024, mesh=_mesh8(),
                     index_type="ivf", ivf_lists=32, ivf_probes=2)
    assert isinstance(ix, IVFIndex) and ix.mesh is not None
    v, i = ix.search(c[:5], k=3)
    assert (i[:, 0] == np.arange(5)).all()


def test_sharded_calibrate():
    """Analytic calibration on the sharded index: tighter targets need
    >= per-shard probes, and the calibrated default reaches the target
    empirically vs the exact ranking."""
    rng = np.random.default_rng(24)
    c, _ = make_clustered(rng, n=8192, d=32, g=64, noise=0.35)
    index = IVFIndex(c, n_lists=64, iters=6, mesh=_mesh8())
    p_low = index.calibrate(0.7)
    p_high = index.calibrate(0.99)
    assert 1 <= p_low <= p_high <= index.n_lists_local
    sel = (np.arange(128) * len(c)) // 128
    q = c[sel]
    _, oidx = numpy_oracle(
        q, np.zeros(len(q), np.int32), c, np.zeros(len(c), np.int32), 10
    )
    _, idx = index.search(q, k=10)
    rec = np.mean([
        len(np.intersect1d(idx[r], oidx[r])) / 10 for r in range(len(q))
    ])
    assert rec >= 0.95, f"sharded calibrated recall {rec:.3f}"


def test_factory_empty_corpus_serves_exact():
    """RETRIEVAL_INDEX=ivf on an empty schema must not crash serve
    startup — it serves the (all-sentinel) exact index instead."""
    from tpualign.parallel.retrieval import build_index, RetrievalIndex

    ix = build_index(np.zeros((0, 16), np.float32), [], [],
                     index_type="ivf")
    assert isinstance(ix, RetrievalIndex)
    _, i = ix.search(np.ones((2, 16), np.float32), k=3,
                     global_search=True)
    assert (i == -1).all()


def test_mxu_capacity_index_falls_back_off_kernel(monkeypatch):
    """An index packed under the MXU clamp (capacity beyond the dequant
    kernel's VMEM bound) must NOT route to the dequant kernel on TPU —
    that compile measurably fails — but fall back to the XLA union path
    with a loud warning."""
    from tpualign.parallel import ivf as I

    rng = np.random.default_rng(21)
    c, _ = make_clustered(rng, n=512, d=32, g=4)
    index = IVFIndex(c, n_lists=8, iters=2, precision="int8",
                     use_kernel=None, int8_mxu=True)
    monkeypatch.setattr(I.jax, "default_backend", lambda: "tpu")
    assert index._kernel_path(False, 10) is True  # mxu: kernel fine

    index.int8_mxu = False
    index.capacity = I._max_capacity(index.dim, 1) + 128  # past the bound
    warned = []
    # the tpualign logger doesn't propagate (caplog can't see it) —
    # record the call itself
    monkeypatch.setattr(
        I.log, "warning", lambda msg, *a: warned.append(msg % a))
    assert index._kernel_path(False, 10) is False
    assert any("VMEM bound" in w for w in warned)


# -- int4 (packed-nibble) layouts ---------------------------------------------


def int4_dequant(packed: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """Host decode of the packed layout (low nibbles dims [0, D/2), high
    [D/2, D), offset-8): the value grid every int4 scoring path ranks."""
    lo = (packed.astype(np.int32) & 15) - 8
    hi = (packed.astype(np.int32) >> 4) - 8
    return (np.concatenate([lo, hi], axis=1).astype(np.float32)
            * scales[:, None])


def test_int4_full_probe_matches_dequant_oracle():
    """precision="int4" at full probes ranks exactly like a dense exact
    search over the DEQUANTIZED 4-bit corpus (fp32 queries, two-key
    ties) — the quantization is the only deviation from fp32."""
    from tpualign.parallel.retrieval import _quantize_rows_int4

    rng = np.random.default_rng(31)
    n, d = 512, 32
    c = unit(rng.normal(size=(n, d)).astype(np.float32))
    cman = [f"m{i % 3}" for i in range(n)]
    cpage = [1 + i % 4 for i in range(n)]
    index = IVFIndex(c, cman, cpage, n_lists=8, iters=4, precision="int4")
    assert index.precision == "int4"
    import jax.numpy as jnp
    assert index._emb.dtype == jnp.uint8
    assert index._emb.shape[1] == d // 2
    q = c[:23]
    vals, idx = index.search(q, cman[:23], cpage[:23], k=10,
                             n_probes=index.n_lists)
    pn, sn = _quantize_rows_int4(c)
    cd = int4_dequant(pn, sn)
    vocab = {}
    ck, vocab = encode_keys(cman, cpage, vocab)
    qk, _ = encode_keys(cman[:23], cpage[:23], vocab)
    ovals, oidx = numpy_oracle(q, qk, cd, ck, 10)
    np.testing.assert_array_equal(idx, oidx)
    has = oidx >= 0
    np.testing.assert_allclose(vals[has], ovals[has], rtol=0, atol=1e-5)


def test_int4_prepacked_build_matches_quantize_at_build():
    """Building from an already-packed (N, D/2) uint8 corpus (+ scales)
    equals quantizing at build time at full probes — the 8x-capacity
    path never materializes an fp32 corpus."""
    from tpualign.parallel.retrieval import _quantize_rows_int4

    rng = np.random.default_rng(33)
    c, _ = make_clustered(rng, n=1024, d=32, g=8)
    pn, sn = _quantize_rows_int4(c)
    a = IVFIndex(c, n_lists=8, iters=4, precision="int4")
    b = IVFIndex(pn, n_lists=8, iters=4, corpus_scales=sn)
    assert b.precision == "int4" and b.dim == 32
    q = unit(rng.normal(size=(40, 32)).astype(np.float32))
    va, ia = a.search(q, k=5, n_probes=a.n_lists)
    vb, ib = b.search(q, k=5, n_probes=b.n_lists)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(va, vb, rtol=0, atol=1e-5)
    with pytest.raises(ValueError):
        IVFIndex(pn, n_lists=8)  # packed corpus requires scales


def test_int4_kernel_recall_and_memory():
    """The probed int4 nibble kernel (interpret mode) keeps recall vs the
    fp32 index, and the layout really is ~8x smaller than fp32 / ~2x
    smaller than int8."""
    rng = np.random.default_rng(35)
    c, _ = make_clustered(rng, n=2048, d=32, g=16)
    q = unit(c[rng.integers(len(c), size=64)]
             + 0.05 * rng.normal(size=(64, 32)).astype(np.float32))
    fp = IVFIndex(c, n_lists=16, n_probes=4, iters=6)
    i8 = IVFIndex(c, n_lists=16, n_probes=4, iters=6, precision="int8")
    for use_kernel in (False, True):
        i4 = IVFIndex(c, n_lists=16, n_probes=4, iters=6,
                      precision="int4", use_kernel=use_kernel)
        assert i4.memory_bytes < i8.memory_bytes
        assert i4.memory_bytes < fp.memory_bytes / 3
        _, fi = fp.search(q, k=10)
        _, qi = i4.search(q, k=10)
        hits = np.mean([
            len(np.intersect1d(qi[r], fi[r])) / 10 for r in range(len(q))
        ])
        # d=32 is the WORST case for 4-bit rows (few dims -> coarse
        # grid); production d>=512 embeddings land far higher
        assert hits >= 0.8, f"int4 recall {hits:.3f} (kernel={use_kernel})"


def test_int4_save_load_roundtrip(tmp_path):
    """An int4 index persists/loads with an fp32 corpus (re-packed along
    the layout) or the packed corpus + scales — identical results."""
    from tpualign.parallel.retrieval import _quantize_rows_int4

    rng = np.random.default_rng(37)
    c, _ = make_clustered(rng, n=512, d=32, g=8)
    q = unit(rng.normal(size=(16, 32)).astype(np.float32))
    a = IVFIndex(c, n_lists=8, iters=4, precision="int4")
    va, ia = a.search(q, k=5, n_probes=a.n_lists)
    p = str(tmp_path / "ivf_int4.npz")
    a.save(p)
    b = IVFIndex.load(p, c)
    assert b.precision == "int4"
    vb, ib = b.search(q, k=5, n_probes=b.n_lists)
    np.testing.assert_array_equal(ib, ia)
    pn, sn = _quantize_rows_int4(c)
    d2 = IVFIndex.load(p, pn, corpus_scales=sn)
    vd, idd = d2.search(q, k=5, n_probes=d2.n_lists)
    np.testing.assert_array_equal(idd, ia)
    with pytest.raises(ValueError, match="scales"):
        IVFIndex.load(p, pn)


def test_sharded_int4_full_probe_matches_single_device():
    """int4 composes with the mesh: per-shard full probes + the exact
    merge equal the single-device full-probe ranking (both are exact
    over the same 4-bit value grid)."""
    rng = np.random.default_rng(39)
    c, _ = make_clustered(rng, n=1024, d=32, g=8)
    q = unit(rng.normal(size=(32, 32)).astype(np.float32))
    a = IVFIndex(c, n_lists=64, iters=4, precision="int4")
    va, ia = a.search(q, k=5, n_probes=a.n_lists)
    m = IVFIndex(c, n_lists=64, iters=4, precision="int4", mesh=_mesh8())
    vm, im = m.search(q, k=5, n_probes=m.n_lists_local)
    np.testing.assert_array_equal(im, ia)
    np.testing.assert_allclose(
        vm[im >= 0], va[ia >= 0], rtol=0, atol=1e-5)


def test_sharded_prequantized_scales_gather_per_shard():
    """Regression: a sharded build from a PRE-quantized corpus must
    gather each packed slot's scale from ITS OWN shard's rows — the old
    global gather fetched shard 0's scales for every shard (wrong for
    1792/2048 slots in this construction)."""
    rng = np.random.default_rng(41)
    n, d = 2048, 32
    c = rng.normal(size=(n, d)).astype(np.float32)
    # wildly different per-shard magnitudes make any cross-shard scale
    # mixup visible in the stored scales directly
    mult = np.repeat(np.logspace(-2, 2, 8), n // 8).astype(np.float32)
    c = c * mult[:, None]
    scale = np.maximum(np.abs(c).max(axis=1) / 127.0, 1e-12)
    c_i8 = np.clip(np.rint(c / scale[:, None]), -127, 127).astype(np.int8)
    ix = IVFIndex(c_i8, n_lists=64, iters=4, corpus_scales=scale,
                  mesh=_mesh8())
    ids = np.asarray(ix._ids)  # global corpus ids (r3 late)
    got = np.asarray(ix._scales)
    n_local = n // 8
    total_local = len(ids) // 8
    shard = np.arange(len(ids)) // total_local
    valid = ids >= 0
    # every packed id must belong to its own shard's row range
    assert (ids[valid] // n_local == shard[valid]).all()
    expect = scale[np.maximum(ids, 0)]
    np.testing.assert_allclose(got[valid], expect[valid], rtol=1e-6)


# -- incremental inserts --------------------------------------------------------


def test_ivf_add_full_probe_matches_fresh_rebuild():
    """IVFIndex.add (classic IVFFlat insert: nearest list, spill on
    overflow, no retraining): full-probe search after adds must equal a
    FRESH build over the combined corpus — full probing is
    assignment-independent and the per-row quantization grid is
    identical — for every precision."""
    rng = np.random.default_rng(81)
    n, extra, d = 600, 300, 32
    c = rng.normal(size=(n + extra, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    man = [f"m{i % 3}" for i in range(n + extra)]
    page = [1 + i % 4 for i in range(n + extra)]
    q, qm, qp = c[::11][:40], man[::11][:40], page[::11][:40]
    for prec in ("fp32", "int8", "int4"):
        ix = IVFIndex(c[:n], man[:n], page[:n], n_lists=8, iters=4,
                      precision=prec)
        ix.add(c[n:n + 100], man[n:n + 100], page[n:n + 100])
        ix.add(c[n + 100:], man[n + 100:], page[n + 100:])
        assert ix.n == n + extra
        fresh = IVFIndex(c, man, page, n_lists=8, iters=4, precision=prec)
        v1, i1 = ix.search(q, qm, qp, k=8, n_probes=ix.n_lists)
        v2, i2 = fresh.search(q, qm, qp, k=8, n_probes=fresh.n_lists)
        np.testing.assert_array_equal(i1, i2, err_msg=prec)
        has = i2 >= 0
        np.testing.assert_allclose(v1[has], v2[has], rtol=0, atol=2e-5,
                                   err_msg=prec)


def test_ivf_add_grows_spill_and_stays_exact():
    """Adds into full clusters overflow to the spill tail; a full tail
    grows by whole blocks. Full probes stay exact vs the dense oracle,
    probed search finds the added rows, and calibrate still runs."""
    rng = np.random.default_rng(83)
    c, _ = make_clustered(rng, n=2348, d=16, g=4)
    n = 2048
    small = IVFIndex(c[:n], n_lists=16, iters=4, capacity_factor=0.05)
    assert small.spill > 0  # genuinely overfull lists
    tot0 = small._ids.shape[0]
    small.add(c[n:])
    assert small._ids.shape[0] > tot0, "spill tail must have grown"
    assert small.n == len(c)
    q = c[::13][:40]
    from tpualign.parallel.retrieval import RetrievalIndex
    ex = RetrievalIndex(c, ["m"] * len(c), [1] * len(c))
    _, i1 = small.search(q, k=8, n_probes=small.n_lists,
                         global_search=True)
    _, i2 = ex.search(q, k=8, global_search=True)
    np.testing.assert_array_equal(i1, i2)
    # probed search (default probes) finds the freshly added rows
    small.calibrate(0.9, k=5, sample=64)
    _, iq = small.search(c[n:n + 16], k=1, global_search=True)
    assert (np.asarray(iq)[:, 0] == np.arange(n, n + 16)).mean() >= 0.9


def test_ivf_add_rejects_bad_shapes():
    rng = np.random.default_rng(87)
    c, _ = make_clustered(rng, n=512, d=16, g=4)
    sx = IVFIndex(c, n_lists=8, iters=2)
    with pytest.raises(ValueError, match="must be"):
        sx.add(np.zeros((2, 8), np.float32))
    sx.add(np.zeros((0, 16), np.float32))  # no-op
    assert sx.n == 512


def test_ivf_remove_and_readd():
    """IVF remove tombstones the packed slot (used-slot contiguity for
    later adds is preserved); a removed id re-added later serves the NEW
    copy while the old slot stays dead."""
    rng = np.random.default_rng(95)
    n, d = 400, 32
    c = unit(rng.normal(size=(n, d)).astype(np.float32))
    man = [f"m{i % 3}" for i in range(n)]
    page = [1 + i % 4 for i in range(n)]
    iv = IVFIndex(c, man, page, n_lists=8, iters=4)
    assert iv.remove([0, 1, 2, 999999, -5]) == 3
    assert iv.remove([0]) == 0
    _, i1 = iv.search(c[:3], man[:3], page[:3], k=3, n_probes=iv.n_lists)
    assert not np.isin(np.asarray(i1), [0, 1, 2]).any()
    iv.add(c[:1], man[:1], page[:1])
    _, i2 = iv.search(c[:1], man[:1], page[:1], k=2, n_probes=iv.n_lists)
    assert np.asarray(i2)[0, 0] == n  # the re-added copy's new id


def test_sharded_ivf_add_full_probe_matches_fresh_build():
    """Sharded IVFIndex.add (r3 late: globally-nearest shard+list
    routing): FULL per-shard probing after adds must equal a fresh
    sharded build over the combined corpus — full probes are
    assignment-independent and the per-row quantization grid is
    identical — keys and ties included."""
    rng = np.random.default_rng(90)
    n, extra, d = 1024, 512, 32
    c = unit(rng.normal(size=(n + extra, d)).astype(np.float32))
    man = [f"m{i % 3}" for i in range(n + extra)]
    page = [1 + i % 4 for i in range(n + extra)]
    q, qm, qp = c[::17][:40], man[::17][:40], page[::17][:40]
    for prec in ("fp32", "int8"):
        ix = IVFIndex(c[:n], man[:n], page[:n], n_lists=32, iters=4,
                      precision=prec, mesh=_mesh8())
        ix.add(c[n:n + 200], man[n:n + 200], page[n:n + 200])
        ix.add(c[n + 200:], man[n + 200:], page[n + 200:])
        assert ix.n == n + extra
        fresh = IVFIndex(c, man, page, n_lists=32, iters=4,
                         precision=prec, mesh=_mesh8())
        v1, i1 = ix.search(q, qm, qp, k=8, n_probes=ix.n_lists_local)
        v2, i2 = fresh.search(q, qm, qp, k=8,
                              n_probes=fresh.n_lists_local)
        np.testing.assert_array_equal(i1, i2, err_msg=prec)
        has = i2 >= 0
        np.testing.assert_allclose(v1[has], v2[has], rtol=0, atol=2e-5,
                                   err_msg=prec)


def test_sharded_ivf_add_grows_spill_and_probed_finds_new_rows():
    """Overfull sharded lists overflow to the OWNING shard's spill tail;
    a full tail grows by whole blocks ON EVERY SHARD (uniform geometry).
    Full probes stay exact vs the dense oracle and probed search finds
    the freshly added rows."""
    rng = np.random.default_rng(91)
    # per-shard capacity clamps at >=128 rows, so spill needs lists that
    # genuinely exceed 128 rows on their own shard: 1024 rows/shard into
    # 8 local lists over 4 natural clusters leaves ~256-row lists
    c, _ = make_clustered(rng, n=8492, d=16, g=4)
    n = 8192
    ix = IVFIndex(c[:n], n_lists=16, iters=4, capacity_factor=0.05,
                  mesh=_mesh8())
    assert ix.spill > 0  # genuinely overfull lists
    tot0 = ix._ids.shape[0]
    sb0 = ix.spill_blocks
    ix.add(c[n:])
    assert ix.n == len(c)
    if ix._ids.shape[0] > tot0:  # growth keeps shard-uniform geometry
        assert ix._ids.shape[0] == (
            (ix.n_lists_local + 1 + ix.spill_blocks)
            * ix.capacity * 8
        )
        assert ix.spill_blocks > sb0
    from tpualign.parallel.retrieval import RetrievalIndex

    q = c[::13][:40]
    ex = RetrievalIndex(c, ["m"] * len(c), [1] * len(c))
    _, i1 = ix.search(q, k=8, n_probes=ix.n_lists_local,
                      global_search=True)
    _, i2 = ex.search(q, k=8, global_search=True)
    np.testing.assert_array_equal(i1, i2)
    ix.calibrate(0.9, k=5, sample=64)
    _, iq = ix.search(c[n:n + 16], k=1, global_search=True)
    assert (np.asarray(iq)[:, 0] == np.arange(n, n + 16)).mean() >= 0.9


def test_ivf_compact_reclaims_and_reabsorbs_spill():
    """IVF compact (pgvector VACUUM parity, no k-means): tombstones
    drop, spill rows re-absorb into their nearest existing centroid's
    block, survivors renumber in ascending old-id order, and full-probe
    search equals the dense oracle over the survivors — fp32 and
    int8 (quantized rows move unrequantized)."""
    rng = np.random.default_rng(71)
    c, _ = make_clustered(rng, n=2348, d=16, g=4)
    n = 2048
    for prec in ("fp32", "int8"):
        ix = IVFIndex(c[:n], n_lists=16, iters=4, capacity_factor=0.05,
                      precision=prec)
        ix.add(c[n:])  # drives spill (growth covered elsewhere)
        assert ix.spill > 0
        gone = np.arange(0, len(c), 97)
        assert ix.remove(gone) == len(gone)
        tot0 = ix._ids.shape[0]
        live = ix.compact()
        expect_live = np.setdiff1d(np.arange(len(c)), gone)
        np.testing.assert_array_equal(live, expect_live, err_msg=prec)
        assert ix.n == len(expect_live)
        assert ix._ids.shape[0] <= tot0  # layout never grows on compact
        # full probes are cluster-assignment-independent, so a FRESH IVF
        # build over the survivors (fresh k-means, same quantization
        # grid and scoring family) must rank identically
        sub = c[expect_live]
        fresh = IVFIndex(sub, n_lists=16, iters=4, precision=prec)
        q = sub[::13][:40]
        _, i1 = ix.search(q, k=8, n_probes=ix.n_lists,
                          global_search=True)
        _, i2 = fresh.search(q, k=8, n_probes=fresh.n_lists,
                             global_search=True)
        np.testing.assert_array_equal(i1, i2, err_msg=prec)
        # probed search still finds rows and calibrate still runs
        ix.calibrate(0.9, k=5, sample=64)
        _, iq = ix.search(sub[:16], k=1, global_search=True)
        assert (np.asarray(iq)[:, 0] == np.arange(16)).mean() >= 0.85


def test_ivf_compact_empty_rejected():
    rng = np.random.default_rng(73)
    c, _ = make_clustered(rng, n=512, d=16, g=4)
    sx = IVFIndex(c[:16], n_lists=8, iters=2)
    sx.remove(range(16))
    with pytest.raises(ValueError, match="empty"):
        sx.compact()
    mx = IVFIndex(c, n_lists=8, iters=2, mesh=_mesh8())
    mx.remove(range(len(c)))
    with pytest.raises(ValueError, match="empty"):
        mx.compact()


def test_sharded_ivf_compact_reclaims_and_stays_exact():
    """Sharded compact (mesh VACUUM): tombstones drop, spill rows
    re-absorb into their GLOBALLY nearest centroid's shard+list,
    survivors renumber in ascending old-id order, geometry stays
    shard-uniform, and full-probe search equals a FRESH sharded build
    over the survivors (full probes are assignment-independent, the
    quantization grid is per-row) — fp32 and int8. Adds still work
    after the re-pack."""
    rng = np.random.default_rng(74)
    c, _ = make_clustered(rng, n=8692, d=16, g=4)
    n = 8192
    for prec in ("fp32", "int8"):
        ix = IVFIndex(c[:n], n_lists=16, iters=4, capacity_factor=0.05,
                      precision=prec, mesh=_mesh8())
        ix.add(c[n:n + 400])  # drives per-shard spill
        assert ix.spill > 0
        gone = np.arange(0, n + 400, 97)
        assert ix.remove(gone) == len(gone)
        assert ix.dead == len(gone)
        tot0 = ix._ids.shape[0]
        live = ix.compact()
        expect_live = np.setdiff1d(np.arange(n + 400), gone)
        np.testing.assert_array_equal(live, expect_live, err_msg=prec)
        assert ix.n == len(expect_live) and ix.dead == 0
        assert ix._ids.shape[0] <= tot0  # layout never grows on compact
        assert ix._ids.shape[0] == (    # shard-uniform geometry
            (ix.n_lists_local + 1 + ix.spill_blocks) * ix.capacity * 8
        )
        sub = c[expect_live]
        fresh = IVFIndex(sub, n_lists=16, iters=4, precision=prec,
                         mesh=_mesh8())
        q = sub[::13][:40]
        _, i1 = ix.search(q, k=8, n_probes=ix.n_lists_local,
                          global_search=True)
        _, i2 = fresh.search(q, k=8, n_probes=fresh.n_lists_local,
                             global_search=True)
        np.testing.assert_array_equal(i1, i2, err_msg=prec)
        # the re-packed layout still takes inserts (used-slot contiguity
        # survived the move) and serves them
        tail = c[n + 400:]
        ix.add(tail)
        _, iq = ix.search(tail[:16], k=1, n_probes=ix.n_lists_local,
                          global_search=True)
        first_new = ix.n - len(tail)
        hits = (np.asarray(iq)[:, 0]
                == np.arange(first_new, first_new + 16))
        # fp32 full-probe is exact; int8 tolerates quantization near-ties
        assert hits.all() if prec == "fp32" else hits.mean() >= 0.9, prec


def test_sharded_ivf_remove_and_readd():
    """Sharded remove tombstones the owning shard's packed slot; a
    removed id re-added later serves the NEW copy."""
    rng = np.random.default_rng(92)
    n, d = 1024, 32
    c = unit(rng.normal(size=(n, d)).astype(np.float32))
    man = [f"m{i % 3}" for i in range(n)]
    page = [1 + i % 4 for i in range(n)]
    iv = IVFIndex(c, man, page, n_lists=32, iters=4, mesh=_mesh8())
    assert iv.remove([0, 1, 2, 999999, -5]) == 3
    assert iv.remove([0]) == 0
    _, i1 = iv.search(c[:3], man[:3], page[:3], k=3,
                      n_probes=iv.n_lists_local)
    assert not np.isin(np.asarray(i1), [0, 1, 2]).any()
    iv.add(c[:1], man[:1], page[:1])
    _, i2 = iv.search(c[:1], man[:1], page[:1], k=2,
                      n_probes=iv.n_lists_local)
    assert np.asarray(i2)[0, 0] == n  # the re-added copy's new id


def test_sharded_save_load_roundtrip(tmp_path):
    """A sharded artifact reloads onto a same-size mesh and serves
    bit-identical results (fp32 + int8), including rows ADDED after the
    build (their packed ids cross shards — adds route to the globally
    nearest centroid) and tombstones. Mesh-size mismatches and
    single-device-artifact-with-mesh both refuse loudly."""
    rng = np.random.default_rng(93)
    c, _ = make_clustered(rng, n=2248, d=32, g=8)
    n = 2048
    man = [f"m{i % 2}" for i in range(len(c))]
    page = [1 + i % 3 for i in range(len(c))]
    q = unit(rng.normal(size=(40, 32)).astype(np.float32))
    for prec in ("fp32", "int8"):
        a = IVFIndex(c[:n], man[:n], page[:n], n_lists=32, iters=4,
                     precision=prec, mesh=_mesh8())
        a.add(c[n:], man[n:], page[n:])
        assert a.remove([5, 700]) == 2
        path = tmp_path / f"sivf_{prec}.npz"
        a.save(path)
        b = IVFIndex.load(path, c, mesh=_mesh8())
        assert b.mesh is not None
        assert b.n_lists_local == a.n_lists_local
        assert b.capacity == a.capacity and b.n == a.n
        assert b.dead == 2  # tombstones persist
        for p in (2, a.n_lists_local):
            va, ia = a.search(q, man[:40], page[:40], k=5, n_probes=p)
            vb, ib = b.search(q, man[:40], page[:40], k=5, n_probes=p)
            np.testing.assert_array_equal(ia, ib, err_msg=prec)
            np.testing.assert_allclose(va, vb, rtol=0, atol=1e-6,
                                       err_msg=prec)
        # the reloaded index stays mutable: an add routes to a shard
        # and full-probe search serves the new row
        extra = unit(rng.normal(size=(1, 32)).astype(np.float32))
        b.add(extra, ["m0"], [1])
        _, inew = b.search(extra, ["m0"], [1], k=1,
                           n_probes=b.n_lists_local)
        assert np.asarray(inew)[0, 0] == b.n - 1
    # a sharded artifact demands a mesh of the SAME data-axis size
    with pytest.raises(ValueError, match="sharded over 8"):
        IVFIndex.load(tmp_path / "sivf_fp32.npz", c)
    # a single-device artifact refuses a mesh
    s = IVFIndex(c[:256], man[:256], page[:256], n_lists=8, iters=2)
    s.save(tmp_path / "single.npz")
    with pytest.raises(ValueError, match="single-device"):
        IVFIndex.load(tmp_path / "single.npz", c[:256], mesh=_mesh8())
    # corpus shape mismatch still guards on the sharded artifact
    with pytest.raises(ValueError, match="does not match"):
        IVFIndex.load(tmp_path / "sivf_fp32.npz", c[:100], mesh=_mesh8())


# ---------------------------------------------------------------------------
# Refine stage over IVF (exact fp32 rescore of quantized probed candidates)
# ---------------------------------------------------------------------------


def test_ivf_refine_full_probe_matches_fp64_oracle():
    """int8 IVF at full probes + full-coverage refine returns the EXACT
    ranking: the probed sweep visits every row, refine rescores every
    candidate in fp64 — quantization noise cannot survive."""
    from test_parallel import near_tie_problem, oracle64

    rng = np.random.default_rng(31)
    q, c, man, page = near_tie_problem(rng, n=256)
    k = 8
    ix = IVFIndex(c, man, page, n_lists=8, iters=4, precision="int8",
                  refine=len(c) // k + 1)
    vals, idx = ix.search(q, ["m"] * len(q), [1] * len(q), k,
                          n_probes=ix.n_lists)
    ovals, oidx = oracle64(q, c, k)
    np.testing.assert_array_equal(idx, oidx)
    np.testing.assert_allclose(vals, ovals, rtol=0, atol=2e-6)


def test_ivf_refine_improves_probed_recall():
    from test_parallel import near_tie_problem

    rng = np.random.default_rng(37)
    q, c, man, page = near_tie_problem(rng, n=512)
    k = 10
    nq = len(q)
    exact = IVFIndex(c, man, page, n_lists=8, iters=4)
    _, ie = exact.search(q, ["m"] * nq, [1] * nq, k, n_probes=8)
    plain = IVFIndex(c, man, page, n_lists=8, iters=4, precision="int8")
    refined = IVFIndex(c, man, page, n_lists=8, iters=4, precision="int8",
                       refine=4)
    _, ip = plain.search(q, ["m"] * nq, [1] * nq, k, n_probes=8)
    _, ir = refined.search(q, ["m"] * nq, [1] * nq, k, n_probes=8)

    def recall(i):
        return np.mean([len(set(ie[r]) & set(i[r])) / k for r in range(nq)])

    assert recall(ir) >= recall(ip)
    assert recall(ir) >= 0.9, recall(ir)


def test_ivf_refine_rejects_prequantized():
    rng = np.random.default_rng(41)
    c, _ = make_clustered(rng, n=256, d=16, g=8)
    scale = np.abs(c).max(axis=1, keepdims=True) / 127.0
    qc = np.clip(np.rint(c / scale), -127, 127).astype(np.int8)
    with pytest.raises(ValueError, match="refine"):
        IVFIndex(qc, ["m"] * 256, [1] * 256, n_lists=8,
                 corpus_scales=scale[:, 0], refine=4)


def test_ivf_refine_save_load(tmp_path):
    """load(refine=...) re-arms the refine stage around the saved
    structure; results match the original refined index."""
    from test_parallel import near_tie_problem

    rng = np.random.default_rng(43)
    q, c, man, page = near_tie_problem(rng, n=256)
    k = 8
    ix = IVFIndex(c, man, page, n_lists=8, iters=4, precision="int8",
                  refine=4)
    path = str(tmp_path / "ivf_refine.npz")
    ix.save(path)
    back = IVFIndex.load(path, c, refine=4)
    assert back.refine == 4 and back._refine_corpus is not None
    v1, i1 = ix.search(q, ["m"] * len(q), [1] * len(q), k)
    v2, i2 = back.search(q, ["m"] * len(q), [1] * len(q), k)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2, rtol=0, atol=1e-6)


def test_ivf_refine_add_extends_host_copy():
    from test_parallel import near_tie_problem, oracle64

    rng = np.random.default_rng(47)
    q, c, man, page = near_tie_problem(rng, n=192)
    k = 6
    ix = IVFIndex(c[:160], man[:160], page[:160], n_lists=8, iters=4,
                  precision="int8", refine=192 // k + 1)
    ix.add(c[160:], man[160:], page[160:])
    assert len(ix._refine_corpus) == 192
    vals, idx = ix.search(q, ["m"] * len(q), [1] * len(q), k,
                          n_probes=ix.n_lists)
    ovals, oidx = oracle64(q, c, k)
    np.testing.assert_array_equal(idx, oidx)
    np.testing.assert_allclose(vals, ovals, rtol=0, atol=2e-6)


# ---------------------------------------------------------------------------
# Packed int2 layouts — the 16x-capacity IVF rung
# ---------------------------------------------------------------------------


def int2_dequant(packed: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """Host decode of the packed-int2 layout (plane p in bits [2p, 2p+1]
    holds dims [p*D/4, (p+1)*D/4), 4-level {-3,-1,1,3} * scale): the
    value grid every int2 scoring path ranks."""
    planes = [((packed.astype(np.int32) >> (2 * p)) & 3) for p in range(4)]
    code = np.concatenate(planes, axis=1)
    return (2 * code - 3).astype(np.float32) * scales[:, None]


def test_int2_full_probe_matches_dequant_oracle():
    """precision="int2" at full probes ranks exactly like a dense exact
    search over the DEQUANTIZED 2-bit corpus (fp32 queries, two-key
    ties)."""
    from tpualign.parallel.retrieval import _quantize_rows_int2

    rng = np.random.default_rng(131)
    n, d = 512, 32
    c = unit(rng.normal(size=(n, d)).astype(np.float32))
    cman = [f"m{i % 3}" for i in range(n)]
    cpage = [1 + i % 4 for i in range(n)]
    index = IVFIndex(c, cman, cpage, n_lists=8, iters=4, precision="int2")
    assert index.precision == "int2"
    import jax.numpy as jnp
    assert index._emb.dtype == jnp.uint8
    assert index._emb.shape[1] == d // 4
    q = c[:23]
    vals, idx = index.search(q, cman[:23], cpage[:23], k=10,
                             n_probes=index.n_lists)
    pn, sn = _quantize_rows_int2(c)
    cd = int2_dequant(pn, sn)
    vocab = {}
    ck, vocab = encode_keys(cman, cpage, vocab)
    qk, _ = encode_keys(cman[:23], cpage[:23], vocab)
    ovals, oidx = numpy_oracle(q, qk, cd, ck, 10)
    np.testing.assert_array_equal(idx, oidx)
    has = oidx >= 0
    np.testing.assert_allclose(vals[has], ovals[has], rtol=0, atol=1e-5)


def test_int2_prepacked_build_matches_quantize_at_build():
    """Building from an already-packed (N, D/4) uint8 corpus (+ scales +
    the precision="int2" hint — packed widths are ambiguous without it)
    equals quantizing at build time at full probes; the padding rows of
    the pre-quantized path carry scale 0 (int2 has no zero level)."""
    from tpualign.parallel.retrieval import _quantize_rows_int2

    rng = np.random.default_rng(133)
    c, _ = make_clustered(rng, n=1000, d=32, g=8)  # non-multiple: pads
    pn, sn = _quantize_rows_int2(c)
    a = IVFIndex(c, n_lists=8, iters=4, precision="int2")
    b = IVFIndex(pn, n_lists=8, iters=4, corpus_scales=sn,
                 precision="int2")
    assert b.precision == "int2" and b.dim == 32
    q = unit(rng.normal(size=(40, 32)).astype(np.float32))
    va, ia = a.search(q, k=5, n_probes=a.n_lists)
    vb, ib = b.search(q, k=5, n_probes=b.n_lists)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(va, vb, rtol=0, atol=1e-5)


def test_int2_kernel_matches_union_path():
    """The scalar-prefetch kernel's int2 variant (4-plane unpack + four
    quarter-width integer dots, interpret mode here) agrees with the
    XLA union path on probed searches."""
    rng = np.random.default_rng(137)
    c, _ = make_clustered(rng, n=1024, d=32, g=8)
    man = ["m0"] * 1024
    pages = [1 + i % 4 for i in range(1024)]
    kern = IVFIndex(c, man, pages, n_lists=8, iters=4, precision="int2",
                    use_kernel=True)
    xla = IVFIndex(c, man, pages, n_lists=8, iters=4, precision="int2",
                   use_kernel=False)
    q = unit(rng.normal(size=(16, 32)).astype(np.float32))
    for p in (2, 4):
        vk, ik = kern.search(q, k=5, n_probes=p)
        vx, ix = xla.search(q, k=5, n_probes=p)
        # probed candidate sets are identical; integer-dot vs dequant
        # fp32-dot scores may differ at fp32 noise level on near-ties
        assert np.mean([len(np.intersect1d(ik[r], ix[r])) / 5
                        for r in range(16)]) >= 0.9
        np.testing.assert_allclose(np.sort(vk, axis=1),
                                   np.sort(vx, axis=1), atol=1e-2)


def test_int2_ivf_with_refine_recovers_recall():
    """The intended 16x configuration: int2 IVF + refine — probed
    candidates rescore to exact fp32, recovering usable recall."""
    rng = np.random.default_rng(139)
    c, _ = make_clustered(rng, n=1024, d=32, g=8)
    man = ["m0"] * 1024
    pages = [1] * 1024
    exact = IVFIndex(c, man, pages, n_lists=8, iters=4)
    # d=32 makes 2-bit noise relatively coarse; a deeper over-fetch
    # (kf=60) recovers — at production dims (512) smaller factors do
    refined = IVFIndex(c, man, pages, n_lists=8, iters=4,
                       precision="int2", refine=12)
    q = unit(c[:16] + 0.05 * rng.normal(size=(16, 32)).astype(np.float32))
    _, ie = exact.search(q, k=5, n_probes=8)
    _, ir = refined.search(q, k=5, n_probes=8)
    rec = np.mean([len(np.intersect1d(ie[r], ir[r])) / 5
                   for r in range(16)])
    assert rec >= 0.9, rec


def test_int2_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(141)
    c, _ = make_clustered(rng, n=512, d=32, g=8)
    man = ["m0"] * 512
    pages = [1 + i % 4 for i in range(512)]
    ix = IVFIndex(c, man, pages, n_lists=8, iters=4, precision="int2")
    path = str(tmp_path / "ivf2.npz")
    ix.save(path)
    back = IVFIndex.load(path, c)
    assert back.precision == "int2" and back.dim == 32
    q = unit(rng.normal(size=(16, 32)).astype(np.float32))
    v1, i1 = ix.search(q, k=5)
    v2, i2 = back.search(q, k=5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2, rtol=0, atol=1e-6)


def test_int2_sharded_full_probe_matches_single_device():
    import jax
    from tpualign.parallel.mesh import create_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = create_mesh(8, 1)
    rng = np.random.default_rng(143)
    c, _ = make_clustered(rng, n=1024, d=32, g=16)
    man = ["m0"] * 1024
    pages = [1 + i % 4 for i in range(1024)]
    single = IVFIndex(c, man, pages, n_lists=16, iters=4, precision="int2")
    sharded = IVFIndex(c, man, pages, n_lists=16, iters=4,
                       precision="int2", mesh=mesh)
    q = unit(rng.normal(size=(16, 32)).astype(np.float32))
    vs, is_ = single.search(q, k=5, n_probes=single.n_lists)
    vm, im = sharded.search(q, k=5, n_probes=sharded.n_lists_local)
    # both are exact over the same dequant grid (per-row quantization is
    # row-local, shard-invariant): identical results incl. ties
    np.testing.assert_array_equal(is_, im)
    np.testing.assert_allclose(vs, vm, rtol=0, atol=1e-5)


def test_int2_ivf_add():
    rng = np.random.default_rng(149)
    c, _ = make_clustered(rng, n=640, d=32, g=8)
    man = ["m0"] * 640
    pages = [1 + i % 4 for i in range(640)]
    grown = IVFIndex(c[:512], man[:512], pages[:512], n_lists=8, iters=4,
                     precision="int2")
    grown.add(c[512:], man[512:], pages[512:])
    assert grown.n == 640
    q = unit(c[512:520])
    vals, idx = grown.search(q, man[512:520], pages[512:520], k=3,
                             n_probes=grown.n_lists)
    # full probes find the newly added self-rows
    assert all(512 + r in idx[r] for r in range(8))


def test_cross_precision_load_warns_fingerprint_inactive(
        tmp_path, monkeypatch):
    """A cross-precision load (fp32-built artifact served over a
    pre-quantized store) can't compare fingerprints — the stale-corpus
    guard is INACTIVE and must SAY so (ADVICE r3 #2), while shape
    validation still applies and content mismatches in the matching
    dtype still raise."""
    import tpualign.parallel.ivf as I

    rng = np.random.default_rng(33)
    c, _ = make_clustered(rng, n=256, d=16, g=8)
    a = IVFIndex(c, [f"m{i % 2}" for i in range(256)], [1] * 256,
                 n_lists=8, iters=4, precision="int8")
    path = tmp_path / "ivf.npz"
    a.save(path)
    # serve the int8 artifact over a PRE-QUANTIZED int8 corpus of the
    # same shape: the build fingerprinted fp32 rows, so dtypes differ
    q8 = np.clip(np.rint(c * 127), -127, 127).astype(np.int8)
    scales = np.full(256, 1 / 127, np.float32)
    warned = []
    monkeypatch.setattr(
        I.log, "warning", lambda msg, *args: warned.append(msg % args))
    IVFIndex.load(path, q8, corpus_scales=scales)
    assert any("fingerprint skipped" in w for w in warned), warned

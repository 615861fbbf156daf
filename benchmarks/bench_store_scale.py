"""Store-scale benchmark: a >=10M-row EmbeddingStore save/load
round-trip with bounded RSS (VERDICT r3 #1's "done" criterion).

The v2 columnar layout keeps embeddings in one raw ``.npy`` per table,
memory-mapped read-only on load, with metadata in Parquet read lazily —
so a fresh serving process resolves ``embedding_matrix`` on a 10M x 512
corpus (20 GB on disk) without materializing it in RSS. This script
measures exactly that:

  phase 1 (this process): batch-insert N rows + save; report wall time
           and peak RSS;
  phase 2 (a FRESH subprocess — cold page cache for the .npy is not
           guaranteed, but RSS accounting is): open the store, resolve
           (ids, matrix), touch a strided sample of rows, report open
           time and RSS. The RSS bound (default 4 GB) fails the run if
           the matrix was ever materialized.

  phase 3 (r5, a FRESH subprocess): upsert a 10k-row delta (plus 1k
           embedding updates to existing rows) into the saved 10M-row
           store and save — the `tpualign ingest`-into-big-store regime
           (VERDICT r4 weak #2). Reports RssAnon (bound: 1 GB — the
           19 GB base must never materialize) and the bytes written to
           disk (bound: proportional to the delta, not the corpus).

Usage: python benchmarks/bench_store_scale.py [N_millions] [D]
       (internal: --load <root> <n> <d> runs phase 2,
                  --delta <root> <n> <d> runs phase 3)

Prints one JSON line per phase.
"""

from __future__ import annotations

import json
import os
import resource
import subprocess
import sys
import tempfile
import time


def mem_gb() -> dict:
    # Process memory from /proc/self/status (all GiB). RssAnon is the
    # honest "did we materialize it?" metric: a copied matrix lands in
    # anonymous memory, while pages of the memmapped .npy show up under
    # RssFile as CLEAN, RECLAIMABLE page cache — and on this kernel the
    # cache holds the file in 2 MB folios, so touching 2 KB of a row
    # charges the whole folio to RssFile (4097 sampled rows "cost" 8 GB
    # of RssFile while RssAnon stays ~0.1). VmHWM is reported too, but
    # note ru_maxrss survives exec and lies for subprocesses.
    out = {}
    try:
        with open("/proc/self/status") as f:
            for line in f:
                k = line.split(":")[0]
                if k in ("VmHWM", "RssAnon", "RssFile"):
                    out[k] = round(int(line.split()[1]) / 2**20, 2)
    except OSError:
        out["VmHWM"] = round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20, 2
        )
    return out


def load_phase(root: str, n: int, d: int) -> None:
    import numpy as np

    from tpualign.store import EmbeddingStore

    t0 = time.perf_counter()
    store = EmbeddingStore(root, embed_dim=d)
    counts = store.counts("vanilla_clip")
    ids, mat = store.embedding_matrix("vanilla_clip", "text_chunks")
    open_s = time.perf_counter() - t0
    assert counts["text_chunks"] == n, counts
    assert mat.shape == (n, d) and len(ids) == n
    # touch a strided row sample (the serving feed's access shape)
    t1 = time.perf_counter()
    sample = np.asarray(mat[:: max(1, n // 4096)])
    touch_s = time.perf_counter() - t1
    checksum = float(sample.sum())
    m = mem_gb()
    print(json.dumps({
        "metric": "store_v2_load",
        "rows": n, "dim": d,
        "open_s": round(open_s, 3),
        "sample_touch_s": round(touch_s, 3),
        "rss_anon_gb": m.get("RssAnon"),
        "mapped_file_cache_gb": m.get("RssFile"),
        "peak_rss_gb": m.get("VmHWM"),
        "matrix_gb": round(n * d * 4 / 2**30, 2),
        "memmap": bool(isinstance(mat, np.memmap)),
        "checksum_finite": bool(np.isfinite(checksum)),
    }), flush=True)


def delta_phase(root: str, n: int, d: int) -> None:
    import numpy as np

    from tpualign.store import EmbeddingStore

    sdir = os.path.join(root, "vanilla_clip")
    files_before = {
        f: os.stat(os.path.join(sdir, f))
        for f in os.listdir(sdir)
    }
    add_n, upd_n = 10_000, 1_000
    rng = np.random.default_rng(5)
    t0 = time.perf_counter()
    store = EmbeddingStore(root, embed_dim=d)
    recs = [
        {"chunk_id": f"delta{i}", "manual_id": "mD", "page": 1,
         "bbox": None, "text": None}
        for i in range(add_n)
    ] + [
        {"chunk_id": f"c{int(i)}", "manual_id": "mD", "page": 1,
         "bbox": None, "text": None}
        for i in rng.integers(0, n, upd_n)
    ]
    emb = rng.standard_normal((len(recs), d), dtype=np.float32)
    store.insert_chunks("vanilla_clip", recs, emb)
    upsert_s = time.perf_counter() - t0
    t1 = time.perf_counter()
    store.save(["vanilla_clip"])
    save_s = time.perf_counter() - t1

    emb_path = os.path.join(sdir, "text_chunks.emb.npy")
    emb_after = os.stat(emb_path)
    base_kept = (
        emb_after.st_ino == files_before["text_chunks.emb.npy"].st_ino
    )
    meta_after = os.stat(os.path.join(sdir, "text_chunks.parquet"))
    meta_kept = (
        meta_after.st_mtime_ns
        == files_before["text_chunks.parquet"].st_mtime_ns
    )
    grew = emb_after.st_size - files_before["text_chunks.emb.npy"].st_size
    sidecar_bytes = sum(
        os.path.getsize(os.path.join(sdir, f))
        for f in os.listdir(sdir)
        if ".delta." in f or ".overlay." in f
    )
    m = mem_gb()
    store2 = EmbeddingStore(root, embed_dim=d)
    counts = store2.counts("vanilla_clip")
    print(json.dumps({
        "metric": "store_delta_upsert",
        "base_rows": n, "added": add_n, "updated": upd_n, "dim": d,
        "upsert_s": round(upsert_s, 2),
        "save_s": round(save_s, 2),
        "rss_anon_gb": m.get("RssAnon"),
        "peak_rss_gb": m.get("VmHWM"),
        "base_matrix_inode_kept": bool(base_kept),
        "base_parquet_untouched": bool(meta_kept),
        "matrix_growth_mb": round(grew / 2**20, 1),
        "delta_rows_mb": round(add_n * d * 4 / 2**20, 1),
        "sidecar_mb": round(sidecar_bytes / 2**20, 1),
        "reopen_rows": counts["text_chunks"],
    }), flush=True)
    assert counts["text_chunks"] == n + add_n, counts


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--load":
        load_phase(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--delta":
        delta_phase(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
        return

    import numpy as np

    from tpualign.store import EmbeddingStore

    n = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 10_000_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    batch = 250_000

    root = tempfile.mkdtemp(prefix="tpualign_store_scale_")
    store = EmbeddingStore(root, embed_dim=d)
    store.setup(["vanilla_clip"])
    rng = np.random.default_rng(0)

    t0 = time.perf_counter()
    for s0 in range(0, n, batch):
        m = min(batch, n - s0)
        recs = [
            {"chunk_id": f"c{i}", "manual_id": f"m{i % 97}",
             "page": i % 311, "bbox": None, "text": None}
            for i in range(s0, s0 + m)
        ]
        emb = rng.standard_normal((m, d), dtype=np.float32)
        store.insert_chunks("vanilla_clip", recs, emb)
    insert_s = time.perf_counter() - t0
    store.insert_images("vanilla_clip", [{
        "image_id": "i0", "manual_id": "m0", "page": 0, "bbox": None,
        "bbox_source": None, "caption": None, "filename": None,
        "image_type": None,
    }], np.zeros((1, d), np.float32))

    t0 = time.perf_counter()
    store.save(["vanilla_clip"])
    save_s = time.perf_counter() - t0
    emb_file = os.path.join(root, "vanilla_clip", "text_chunks.emb.npy")
    print(json.dumps({
        "metric": "store_v2_insert_save",
        "rows": n, "dim": d,
        "insert_s": round(insert_s, 1),
        "save_s": round(save_s, 1),
        "rows_per_s_insert": round(n / insert_s),
        "peak_rss_gb": mem_gb().get("VmHWM"),
        "emb_file_gb": round(os.path.getsize(emb_file) / 2**30, 2),
    }), flush=True)

    del store  # free the writable matrix before phase 2 measures
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--load", root,
         str(n + 0), str(d)],
        capture_output=True, text=True,
    )
    sys.stdout.write(out.stdout)
    if out.returncode != 0:
        sys.stderr.write(out.stderr)
        raise SystemExit("load phase failed")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    bound_gb = float(os.environ.get("STORE_SCALE_RSS_BOUND_GB", "4"))
    if rec["rss_anon_gb"] > bound_gb:
        raise SystemExit(
            f"load anonymous RSS {rec['rss_anon_gb']} GB exceeds the "
            f"{bound_gb} GB bound — the matrix was materialized"
        )

    # phase 3: the O(delta) mutation regime, in its own process so RSS
    # accounting starts clean
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--delta", root,
         str(n), str(d)],
        capture_output=True, text=True,
    )
    sys.stdout.write(out.stdout)
    if out.returncode != 0:
        sys.stderr.write(out.stderr)
        raise SystemExit("delta phase failed")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    delta_bound_gb = float(
        os.environ.get("STORE_DELTA_RSS_BOUND_GB", "1")
    )
    if rec["rss_anon_gb"] > delta_bound_gb:
        raise SystemExit(
            f"delta upsert RSS {rec['rss_anon_gb']} GB exceeds the "
            f"{delta_bound_gb} GB bound — the base was materialized"
        )
    if not rec["base_matrix_inode_kept"]:
        raise SystemExit("delta save rewrote the base matrix")
    import shutil

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

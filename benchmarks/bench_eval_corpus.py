"""Corpus-scale end-to-end evaluation (BASELINE config 5: 100k pairs).

Builds a synthetic 100k-pair store (5000 pages x 4 images x 5 chunks),
runs the FULL Evaluator (retrieval through RetrievalIndex on the current
mesh + all metrics) and prints one JSON line with wall-clock and the
headline numbers. Runs on any backend; use the 8-virtual-CPU mesh via
  XLA_FLAGS=--xla_force_host_platform_device_count=8 (pinned to cpu)
or the real chip directly.

Usage: python benchmarks/bench_eval_corpus.py [pages] [imgs_per_page] [chunks_per_page]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time


def main() -> None:
    import jax
    import numpy as np

    from tpualign.evaluation.metrics import Evaluator
    from tpualign.parallel.mesh import create_mesh
    from tpualign.store import EmbeddingStore

    pages = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    ipp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cpp = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    d = 512
    n_img, n_chunk = pages * ipp, pages * cpp
    n_pairs = pages * ipp * cpp

    rng = np.random.default_rng(0)

    def rows(prefix, per_page):
        out = []
        for p in range(pages):
            for i in range(per_page):
                out.append({
                    f"{prefix}_id": f"m{p % 37}_p{p}_{prefix}{i}",
                    "manual_id": f"m{p % 37}", "page": p,
                    "bbox": [0, 0, 10, 10],
                    **({"bbox_source": "native", "caption": None,
                        "filename": None, "image_type": "raster_image"}
                       if prefix == "image" else {"text": f"chunk {p}/{i}"}),
                })
        return out

    t_build = time.perf_counter()
    img_rows = rows("image", ipp)
    chunk_rows = rows("chunk", cpp)
    img_emb = rng.normal(size=(n_img, d)).astype(np.float32)
    img_emb /= np.linalg.norm(img_emb, axis=1, keepdims=True)
    chunk_emb = rng.normal(size=(n_chunk, d)).astype(np.float32)
    chunk_emb /= np.linalg.norm(chunk_emb, axis=1, keepdims=True)

    with tempfile.TemporaryDirectory() as tmp:
        store = EmbeddingStore(tmp, embed_dim=d)
        store.setup(["vanilla_clip"])
        store.insert_images("vanilla_clip", img_rows, img_emb)
        store.insert_chunks("vanilla_clip", chunk_rows, chunk_emb)
        build_s = time.perf_counter() - t_build

        n_dev = len(jax.devices())
        mesh = create_mesh(n_dev, 1) if n_dev > 1 else None
        ev = Evaluator(store, mesh=mesh)
        t0 = time.perf_counter()
        m = ev.evaluate_schema("vanilla_clip")
        eval_s = time.perf_counter() - t0

    print(json.dumps({
        "metric": "corpus_eval_wallclock",
        "value": round(eval_s, 2),
        "unit": "s",
        "pairs": n_pairs, "images": n_img, "chunks": n_chunk,
        "devices": n_dev, "store_build_s": round(build_s, 2),
        "mrr": round(m["mrr"], 4), "top1": round(m["top_k"][1], 4),
        "num_pairs": m["num_pairs"],
    }))


if __name__ == "__main__":
    main()

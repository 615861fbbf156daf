"""One integrative at-scale pipeline run (VERDICT r4 #5): the
``tpualign run`` path — process -> lexical filter -> store setup ->
embed (production device feed) -> weak supervision -> store save ->
evaluate — on a synthetic ~1M-pair corpus, with per-stage wall-clock.

This is ref:src/run_pipeline.py:292-346 at ~10,000x the reference's
corpus: every stage is the PRODUCTION code path (real synthdoc backend,
real EmbedEngine on the current jax backend, real Evaluator), composed
in one process, so a hidden O(N^2) or RSS cliff between stages shows up
here and nowhere else.

Corpus shape (defaults): 10,000 pages x 2 images x 50 text lines over
50 manuals = 20k images, 500k chunks, 1,000,000 image-text pairs per
schema. Corpus PREP (writing synthdoc fixtures) is reported separately
and not a pipeline stage.

Usage: python benchmarks/bench_pipeline_scale.py [pages] [ipp] [cpp] [manuals]
Env:   PIPE_SCALE_DIR — workdir (default: a temp dir, removed after).
"""

from __future__ import annotations

import io
import json
import os
import shutil
import sys
import tempfile
import time


def mem_gb() -> dict:
    out = {}
    try:
        with open("/proc/self/status") as f:
            for line in f:
                k = line.split(":")[0]
                if k in ("VmHWM", "RssAnon"):
                    out[k] = round(int(line.split()[1]) / 2**20, 2)
    except OSError:
        pass
    return out


def main() -> None:
    pages = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    ipp = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpp = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    manuals = int(sys.argv[4]) if len(sys.argv) > 4 else 50
    per_manual = max(1, pages // manuals)

    from PIL import Image

    from tpualign.config import load_config
    from tpualign.data.backends import write_synthetic_document
    from tpualign.pipeline import Pipeline

    workdir = os.environ.get("PIPE_SCALE_DIR")
    cleanup = workdir is None
    if workdir is None:
        workdir = tempfile.mkdtemp(prefix="tpualign_pipe_scale_")
    raw = os.path.join(workdir, "raw")
    os.makedirs(raw, exist_ok=True)

    # -- corpus prep (NOT a pipeline stage) ---------------------------------
    # one shared tiny PNG: the pipeline still writes/decodes one file per
    # image record through the production path; pixel diversity buys
    # nothing for stage-composition timing
    t0 = time.perf_counter()
    buf = io.BytesIO()
    Image.new("RGB", (32, 32), (200, 30, 60)).save(buf, format="PNG")
    png = buf.getvalue()
    page_no = 0
    for m in range(manuals):
        doc_pages = []
        for _ in range(per_manual):
            lines = "\n".join(
                f"verwijder de filter {page_no} onderdeel {li} en monteer"
                f" de pomp" for li in range(cpp)
            )
            doc_pages.append({
                "width": 612, "height": 792,
                "images": [
                    {"data": png, "ext": "png",
                     "rects": [[100 + 60 * i, 100, 160 + 60 * i, 160]]}
                    for i in range(ipp)
                ],
                "drawings": [],
                "words": [],
                "plain_text": lines,
            })
            page_no += 1
        write_synthetic_document(
            os.path.join(raw, f"manual{m:03d}.synthdoc.json"), doc_pages
        )
    prep_s = time.perf_counter() - t0

    cfg = load_config(env_file=None, overrides={
        "INPUT_DIR": raw,
        "OUTPUT_DIR": os.path.join(workdir, "processed"),
        "STORE_DIR": os.path.join(workdir, "store"),
        "EVAL_OUTPUT_DIR": os.path.join(workdir, "eval"),
        "LANGUAGE": "nl",
    })
    pipe = Pipeline(cfg)

    stages = {}

    def stage(name, fn):
        t = time.perf_counter()
        out = fn()
        stages[name] = round(time.perf_counter() - t, 1)
        print(json.dumps({"stage": name, "seconds": stages[name],
                          **mem_gb()}), flush=True)
        return out

    stage("process", pipe.step_document_processing)
    stage("lexical_filter",
          lambda: pipe.step_lexical_filtering(non_interactive=True))
    stage("store_setup", pipe.step_store_setup)
    stage("embed_weaksup_insert_save", pipe.step_insert_embeddings)
    metrics = stage("evaluate", pipe.step_evaluation)

    counts = pipe.store.counts("vanilla_clip")
    n_pairs = pages * ipp * cpp
    result = {
        "metric": "pipeline_scale_e2e",
        "pages": pages, "images": counts["images"],
        "chunks": counts["text_chunks"],
        "pairs_per_schema": n_pairs,
        "corpus_prep_s": round(prep_s, 1),
        "stages_s": stages,
        "total_s": round(sum(stages.values()), 1),
        **mem_gb(),
    }
    if metrics:
        van = metrics.get("vanilla_clip", {})
        result["eval_top1"] = van.get("top_k", {}).get(1)
        result["eval_pairs"] = van.get("num_pairs")
    print(json.dumps(result), flush=True)
    if cleanup:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()

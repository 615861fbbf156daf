"""Pipeline orchestrator.

Rebuild of ref:src/run_pipeline.py with the same five stages, completion
checks, skip/force semantics and operator-in-the-loop pause:

1. document processing — done iff the 3 JSONs exist and images/ is non-empty
   (ref:src/run_pipeline.py:48-56);
2. lexical filtering — done iff the filtered file exists (:58-60); the
   operator edits a plain exclusion-list file instead of Python source;
3. store setup — done iff all 4 schemas exist (:62-96);
4. embedding insertion — per schema, done iff images+chunks counts > 0
   (:98-129);
5. evaluation — metrics.json + 3 charts.

Architectural differences (pure wins, same outputs):
- stages run in-process (no subprocess-per-stage, no model reload per
  schema);
- embeddings are computed ONCE and shared across all four schemas — the
  reference recomputed identical embeddings 4x in separate processes
  (SURVEY.md §3.1);
- stage failures keep the reference's policy: document processing and store
  setup are fatal, filtering/embedding/eval continue with a warning
  (ref:src/run_pipeline.py:153-156,203-206,267-269,286-289).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
from typing import Dict, List, Optional, Sequence


from tpualign import SCHEMAS
from tpualign.config import PipelineConfig
from tpualign.data.filtering import filter_lexical_components, load_exclude_terms
from tpualign.data.processor import DocumentProcessor
from tpualign.store import EmbeddingStore
from tpualign.utils.logging import get_logger
from tpualign.weaksup import compute_alignments

log = get_logger("pipeline")


def notify_sync(base_url: str, timeout: float = 60.0,
                token: Optional[str] = None) -> Optional[dict]:
    """POST ``/sync`` to a running ``tpualign serve`` so it picks up the
    store delta incrementally (no rebuild). Failures log and return
    None — ingestion must never die because the server is down.
    ``token``: the daemon's ``SERVE_TOKEN``, when it requires one
    (defaults to this process's own config, so an ingest and a serve
    sharing one .env just work)."""
    import json as _json
    import urllib.request

    url = base_url.rstrip("/") + "/sync"
    headers = {"Content-Type": "application/json"}
    if token:
        headers["Authorization"] = f"Bearer {token}"
    try:
        req = urllib.request.Request(url, b"{}", headers)
        with urllib.request.urlopen(req, timeout=timeout) as r:
            out = _json.loads(r.read())
        log.info("serve sync: +%s -%s (corpus %s)", out.get("added"),
                 out.get("removed"), out.get("corpus_size"))
        return out
    except Exception as e:
        log.warning("serve sync against %s failed: %s", url, e)
        return None

SCHEMA_FLAGS: Dict[str, tuple] = {
    # schema -> (use_lexical, use_positional)  (ref:src/insert_clip_embeddings.py:444-471)
    "vanilla_clip": (False, False),
    "clip_lexical": (True, False),
    "clip_positional": (False, True),
    "clip_combined": (True, True),
}


class Pipeline:
    """End-to-end orchestrator over a config."""

    def __init__(
        self,
        config: PipelineConfig,
        mesh=None,
        engine=None,
        store: Optional[EmbeddingStore] = None,
        nlp="auto",
        lexical_fallback: str = "heuristic",
    ):
        self.config = config
        self.mesh = mesh
        self._engine = engine
        self.store = store or EmbeddingStore(
            config.store.root, embed_dim=config.model.embed_dim
        )
        self._nlp = nlp
        self._lexical_fallback = lexical_fallback

        out = Path(config.data.output_dir)
        self.image_metadata_file = out / "image_metadata.json"
        self.text_chunks_file = out / "text_chunks.json"
        self.lexical_file = out / "lexical_components.json"
        self.filtered_lexical_file = out / "filtered_lexical_components.json"
        self.images_dir = Path(config.data.images_dir)

    # -- lazily built embedding engine (model load is expensive) ---------------

    @property
    def engine(self):
        if self._engine is None:
            from tpualign.parallel.embed import EmbedEngine

            self._engine = EmbedEngine(
                self.config.model,
                mesh=self.mesh,
                batch_size=self.config.batch_size,
                seed=self.config.seed,
                preprocess=self.config.image_preprocess,
                preprocess_bucket=self.config.image_preprocess_bucket,
                text_buckets=self.config.text_buckets,
            )
        return self._engine

    # -- step manifest -------------------------------------------------------------
    #
    # The reference resumes on bare file existence / row counts
    # (ref:src/run_pipeline.py:48-129); tpualign adds a manifest with a
    # fingerprint of the raw inputs, so editing/adding a manual re-triggers
    # document processing without --force (SURVEY.md §5 checkpoint/resume).

    @property
    def _manifest_file(self) -> Path:
        return Path(self.config.data.output_dir) / ".tpualign_manifest.json"

    def _inputs_fingerprint(self) -> str:
        import hashlib

        raw = Path(self.config.data.input_dir)
        h = hashlib.sha256()
        if raw.exists():
            for p in sorted(raw.glob("*")):
                st = p.stat()
                h.update(f"{p.name}:{st.st_size}:{st.st_mtime_ns}".encode())
        return h.hexdigest()

    def _read_manifest(self) -> dict:
        if self._manifest_file.exists():
            try:
                return json.loads(self._manifest_file.read_text())
            except (OSError, json.JSONDecodeError):
                return {}
        return {}

    def _record_step(self, step: str, **extra) -> None:
        import time

        manifest = self._read_manifest()
        manifest[step] = {"completed_at": time.time(), **extra}
        self._manifest_file.parent.mkdir(parents=True, exist_ok=True)
        self._manifest_file.write_text(json.dumps(manifest, indent=2))

    # -- completion checks -------------------------------------------------------

    def check_document_processing(self) -> bool:
        files_ok = (
            self.image_metadata_file.exists()
            and self.text_chunks_file.exists()
            and self.lexical_file.exists()
            and self.images_dir.exists()
            and any(self.images_dir.glob("*"))
        )
        if not files_ok:
            return False
        # inputs changed since the recorded run -> not complete
        recorded = self._read_manifest().get("document_processing", {})
        fingerprint = recorded.get("inputs_fingerprint")
        if fingerprint is not None and fingerprint != self._inputs_fingerprint():
            log.info("Raw inputs changed since last processing; re-running")
            return False
        return True

    def check_lexical_filtering(self) -> bool:
        return self.filtered_lexical_file.exists()

    def check_store_setup(self) -> bool:
        return all(self.store.schema_exists(s) for s in SCHEMAS)

    def check_embeddings_inserted(self, schema: str) -> bool:
        return self.store.has_embeddings(schema)

    # -- steps ----------------------------------------------------------------------

    def step_document_processing(self, force: bool = False) -> None:
        if not force and self.check_document_processing():
            log.info("Document processing already completed. Skipping...")
            return
        raw = Path(self.config.data.input_dir)
        if not raw.exists() or not any(raw.glob("*")):
            log.error("No files found in %s", raw)
            raise SystemExit(1)
        proc = DocumentProcessor(
            self.config.data, nlp=self._nlp, lexical_fallback=self._lexical_fallback
        )
        summary = proc.process_all_documents()
        if summary["images"] == 0 and summary["chunks"] == 0:
            log.error("Document processing produced no data")
            raise SystemExit(1)
        self._record_step(
            "document_processing",
            inputs_fingerprint=self._inputs_fingerprint(),
            **summary,
        )

    def step_lexical_filtering(
        self, force: bool = False, non_interactive: bool = False
    ) -> None:
        if not force and self.check_lexical_filtering():
            log.info("Lexical components already filtered. Skipping...")
            return
        if not self.lexical_file.exists():
            log.error("Lexical components not found. Run document processing first.")
            raise SystemExit(1)

        with open(self.lexical_file) as f:
            lexical_data = json.load(f)
        print(f"\nFound {lexical_data['total_components']} unique lexical components")
        print("Top 20 most frequent terms:")
        for i, comp in enumerate(lexical_data["components"][:20], 1):
            print(f"  {i:2d}. {comp['term']:30s} (count: {comp['count']})")

        if not non_interactive:
            exclude_path = self.config.data.exclude_terms_file or "exclude_terms.txt"
            print(
                f"\nTo filter non-relevant terms, add them to {exclude_path} "
                "(one per line), then press Enter to continue — or type 'skip' "
                "to use all components."
            )
            try:
                response = input().strip().lower()
            except EOFError:
                response = ""
            if response == "skip":
                log.warning("Skipping lexical filtering. Using all components.")
                return

        exclude = load_exclude_terms(self.config.data.exclude_terms_file)
        filter_lexical_components(
            self.lexical_file, self.filtered_lexical_file, exclude
        )

    def step_store_setup(self, force: bool = False) -> None:
        if not force and self.check_store_setup():
            log.info("Store schemas already set up. Skipping...")
            return
        self.store.setup(SCHEMAS, force=force)
        log.info("Store setup completed at %s", self.store.root)

    def _load_processed(self):
        with open(self.image_metadata_file) as f:
            images = json.load(f)
        with open(self.text_chunks_file) as f:
            chunks = json.load(f)
        lexical_terms: List[str] = []
        src = (
            self.filtered_lexical_file
            if self.filtered_lexical_file.exists()
            else self.lexical_file  # unfiltered fallback (ref:src/insert_clip_embeddings.py:240-248)
        )
        if src.exists():
            with open(src) as f:
                lexical_terms = [c["term"] for c in json.load(f).get("components", [])]
        return images, chunks, lexical_terms

    def step_insert_embeddings(
        self, force: bool = False, schemas: Optional[Sequence[str]] = None
    ) -> None:
        schemas = list(schemas or SCHEMAS)
        todo = [
            s for s in schemas if force or not self.check_embeddings_inserted(s)
        ]
        for s in schemas:
            if s not in todo:
                log.info("%s already has embeddings. Skipping...", s)
        if not todo:
            return

        images, chunks, lexical_terms = self._load_processed()

        # Compute embeddings ONCE; identical across schemas.
        log.info("Embedding %d images and %d chunks...", len(images), len(chunks))
        img_embs = self.engine.embed_image_records(images, self.images_dir)
        chunk_embs = self.engine.embed_chunk_records(chunks)

        for schema in todo:
            try:
                use_lex, use_pos = SCHEMA_FLAGS[schema]
                self.store.insert_images(schema, images, img_embs)
                self.store.insert_chunks(schema, chunks, chunk_embs)
                records = compute_alignments(
                    images, chunks, lexical_terms, use_lex, use_pos
                )
                if records:
                    self.store.insert_alignments(schema, records)
                log.info(
                    "Populated %s: %d images, %d chunks, %d alignments",
                    schema, len(images), len(chunks), len(records),
                )
            except Exception as e:  # continue to next schema (ref:src/run_pipeline.py:267-269)
                log.error("Failed to insert embeddings into %s: %s", schema, e)
                continue
        self.store.save(todo)

    def step_evaluation(self) -> Optional[dict]:
        from tpualign.evaluation import (
            Evaluator,
            plot_similarity_distributions,
            plot_top_k_comparison,
            plot_weak_supervision_scores,
        )

        out = self.config.eval_output_dir
        try:
            ev = Evaluator(self.store, mesh=self.mesh, output_dir=out)
            metrics = ev.print_metrics_report(list(SCHEMAS))
            plot_similarity_distributions(ev, list(SCHEMAS), out)
            plot_top_k_comparison(ev, list(SCHEMAS), out)
            plot_weak_supervision_scores(ev, out)
            log.info("Evaluation complete; results in %s/", out)
            return metrics
        except Exception as e:
            log.warning("Evaluation completed with warnings: %s", e)
            return None

    # -- streaming ingestion -------------------------------------------------------

    def ingest_cycle(self, evaluate: bool = False) -> dict:
        """One incremental ingestion pass: process new/changed input files
        (content-hash dedup), re-filter the vocabulary non-interactively,
        re-embed, and optionally re-evaluate. Returns the processor summary;
        ``summary["ingested"]`` is empty when nothing changed.

        Beyond-reference capability (the reference always reprocesses the
        whole corpus, ref:src/pdf_processor.py:243-267). Embedding re-runs
        over the merged corpus with store upserts, so it is idempotent; the
        vocabulary is rebuilt over the merged chunks.
        """
        proc = DocumentProcessor(
            self.config.data, nlp=self._nlp, lexical_fallback=self._lexical_fallback
        )
        summary = proc.process_incremental()
        if not summary.get("ingested"):
            if self._store_in_sync():
                return summary
            # a previous cycle was interrupted between writing the ingest
            # manifest and finishing the embed: heal by re-running the
            # downstream stages over the (already merged) outputs
            log.warning(
                "Store out of sync with processed outputs "
                "(interrupted ingest?); re-embedding"
            )
        self._record_step(
            "document_processing",
            inputs_fingerprint=self._inputs_fingerprint(),
            **{k: v for k, v in summary.items()
               if k in ("images", "chunks", "lexical_terms")},
        )
        self.step_lexical_filtering(force=True, non_interactive=True)
        self.step_store_setup(force=False)
        self.step_insert_embeddings(force=True)
        if evaluate:
            self.step_evaluation()
        return summary

    def _store_in_sync(self) -> bool:
        """True when every schema's row counts match the processed JSONs."""
        try:
            images, chunks, _ = self._load_processed()
        except Exception:
            return True  # nothing processed yet; nothing to heal
        for schema in SCHEMAS:
            if not self.store.schema_exists(schema):
                return False
            counts = self.store.counts(schema)
            if counts["images"] != len(images) or counts["text_chunks"] != len(chunks):
                return False
        return True

    def watch(
        self, interval_seconds: float = 30.0, evaluate: bool = False,
        max_cycles: Optional[int] = None, notify: Optional[str] = None,
    ) -> None:
        """Watchdog mode: poll the input directory and ingest on change.

        Polling (not inotify) keeps this dependency-free and NFS-safe.
        ``max_cycles`` bounds the loop for tests/one-shot use. ``notify``
        (a serving base URL) POSTs ``/sync`` after each cycle that
        ingested something, so a running ``tpualign serve`` picks up new
        chunks incrementally without a rebuild.
        """
        import time as _time

        cycles = 0
        log.info(
            "Watching %s every %.0fs (Ctrl-C to stop)",
            self.config.data.input_dir, interval_seconds,
        )
        while max_cycles is None or cycles < max_cycles:
            try:
                summary = self.ingest_cycle(evaluate=evaluate)
                if summary.get("ingested"):
                    log.info("Ingested: %s", ", ".join(summary["ingested"]))
                    if notify:
                        notify_sync(notify, token=getattr(
                            self.config, "serve_token", None))
            except KeyboardInterrupt:
                raise
            except Exception as e:
                log.error("Ingest cycle failed: %s", e)
            cycles += 1
            if max_cycles is None or cycles < max_cycles:
                _time.sleep(interval_seconds)

    # -- run ---------------------------------------------------------------------------

    def run(
        self,
        skip_pdf: bool = False,
        skip_lexical: bool = False,
        skip_db: bool = False,
        skip_embeddings: bool = False,
        skip_eval: bool = False,
        force: bool = False,
        non_interactive: bool = False,
    ) -> None:
        """Full pipeline with per-step skipping (ref:src/run_pipeline.py:292-346)."""
        print("\n" + "=" * 80)
        print("MULTIMODAL ALIGNMENT PIPELINE (tpualign)")
        print("=" * 80 + "\n")
        try:
            if not skip_pdf:
                self.step_document_processing(force=force)
            else:
                log.info("Skipping document processing")
            if not skip_lexical:
                self.step_lexical_filtering(
                    force=force, non_interactive=non_interactive
                )
            else:
                log.info("Skipping lexical filtering")
            if not skip_db:
                self.step_store_setup(force=force)
            else:
                log.info("Skipping store setup")
            if not skip_embeddings:
                self.step_insert_embeddings(force=force)
            else:
                log.info("Skipping embedding insertion")
            if not skip_eval:
                self.step_evaluation()
            else:
                log.info("Skipping evaluation")
            print("\n" + "=" * 80)
            print("PIPELINE COMPLETE!")
            print("=" * 80)
        except KeyboardInterrupt:
            log.error("Pipeline interrupted by user")
            sys.exit(1)

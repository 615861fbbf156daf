"""Command-line interface: ``python -m tpualign <command>``.

``run`` mirrors the reference orchestrator's flags
(--skip-pdf/--skip-lexical/--skip-db/--skip-embeddings/--skip-eval/--force,
ref:src/run_pipeline.py:349-387); the per-stage commands mirror the
independently-runnable stage scripts (SURVEY.md §1); ``check`` replaces the
utils/ diagnostics.
"""

from __future__ import annotations

import argparse
import sys
from typing import Optional, Sequence

from tpualign import SCHEMAS
from tpualign.config import load_config


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--env-file", default=".env", help="env file with configuration")
    p.add_argument("--input-dir", default=None)
    p.add_argument("--output-dir", default=None)
    p.add_argument("--store-dir", default=None)
    p.add_argument("--model", default=None, help="CLIP model name (e.g. ViT-B-32)")
    p.add_argument("--language", default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--mesh-data", type=int, default=None)
    p.add_argument("--mesh-model", type=int, default=None)


def _config_from(args) -> "PipelineConfig":
    overrides = {}
    mapping = {
        "input_dir": "INPUT_DIR",
        "output_dir": "OUTPUT_DIR",
        "store_dir": "STORE_DIR",
        "model": "CLIP_MODEL",
        "language": "LANGUAGE",
        "batch_size": "BATCH_SIZE",
        "mesh_data": "MESH_DATA",
        "mesh_model": "MESH_MODEL",
        "lora_rank": "LORA_RANK",
        "lora_alpha": "LORA_ALPHA",
        "distill_from": "DISTILL_CHECKPOINT",
        "distill_model": "DISTILL_MODEL",
        "distill_weight": "DISTILL_WEIGHT",
    }
    for attr, env in mapping.items():
        v = getattr(args, attr, None)
        if v is not None:
            overrides[env] = str(v)
    return load_config(env_file=args.env_file, overrides=overrides)


def _build_pipeline(args):
    from tpualign.pipeline import Pipeline

    config = _config_from(args)
    mesh = None
    if config.mesh.num_devices > 1:
        from tpualign.parallel.mesh import default_mesh

        mesh = default_mesh(config.mesh)
    return Pipeline(config, mesh=mesh)


def main(argv: Optional[Sequence[str]] = None) -> int:
    parser = argparse.ArgumentParser(
        prog="tpualign",
        description="TPU-native multimodal alignment of noisy image-text pairs",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p_run = sub.add_parser("run", help="run the complete pipeline")
    _add_common(p_run)
    p_run.add_argument("--skip-pdf", action="store_true", help="skip document processing")
    p_run.add_argument("--skip-lexical", action="store_true", help="skip lexical filtering")
    p_run.add_argument("--skip-db", action="store_true", help="skip store setup")
    p_run.add_argument("--skip-embeddings", action="store_true", help="skip embedding insertion")
    p_run.add_argument("--skip-eval", action="store_true", help="skip evaluation")
    p_run.add_argument("--force", action="store_true", help="re-run all steps")
    p_run.add_argument(
        "--non-interactive", action="store_true",
        help="no operator pause during lexical filtering",
    )

    p_proc = sub.add_parser("process", help="stage 1: document processing only")
    _add_common(p_proc)

    p_filter = sub.add_parser("filter", help="stage 2: lexical filtering only")
    _add_common(p_filter)
    p_filter.add_argument("--exclude-file", default=None,
                          help="operator exclusion list (one term per line)")

    p_setup = sub.add_parser("setup-db", help="stage 3: create store schemas")
    _add_common(p_setup)
    p_setup.add_argument("--force", action="store_true")

    p_embed = sub.add_parser("embed", help="stage 4: embed + weak supervision")
    _add_common(p_embed)
    p_embed.add_argument(
        "schema", nargs="?", default=None,
        help=f"one of {', '.join(SCHEMAS)}; omit for all",
    )
    p_embed.add_argument("--force", action="store_true")

    p_eval = sub.add_parser("evaluate", help="stage 5: metrics + charts")
    _add_common(p_eval)

    p_check = sub.add_parser("check", help="installation/store diagnostics")
    _add_common(p_check)

    p_train = sub.add_parser(
        "train", help="weak-supervision-weighted contrastive fine-tuning"
    )
    _add_common(p_train)
    p_train.add_argument("--schema", default="clip_combined", choices=list(SCHEMAS))
    p_train.add_argument("--steps", type=int, default=100)
    p_train.add_argument("--train-batch-size", type=int, default=None)
    p_train.add_argument("--ckpt-dir", default=None)
    p_train.add_argument("--lora-rank", type=int, default=None,
                         help="LoRA rank (>0: freeze base, train adapters)")
    p_train.add_argument("--lora-alpha", type=float, default=None,
                         help="LoRA merge strength (scale = alpha/rank)")
    p_train.add_argument("--distill-from", default=None,
                         help="teacher checkpoint: train the (smaller) "
                              "student to match its retrieval structure")
    p_train.add_argument("--distill-model", default=None,
                         help="teacher model name (default: the student's)")
    p_train.add_argument("--distill-weight", type=float, default=None,
                         help="KD mix weight in [0,1]; 1.0 = pure distill")
    p_train.add_argument("--eval-every", type=int, default=0,
                         help="held-out retrieval eval every N steps")
    p_train.add_argument("--metrics-file", default=None,
                         help="append one JSON line per log interval "
                              "(training history for dashboards)")
    p_train.add_argument("--log-every", type=int, default=10,
                         help="steps between progress logs / metric lines")
    p_train.add_argument("--eval-fraction", type=float, default=0.0,
                         help="fraction of pairs held out for validation")

    p_ingest = sub.add_parser(
        "ingest", help="incremental ingestion: process new/changed files only"
    )
    _add_common(p_ingest)
    p_ingest.add_argument("--evaluate", action="store_true",
                          help="re-run evaluation after ingesting")
    p_ingest.add_argument("--notify", metavar="URL", default=None,
                          help="POST /sync to a running tpualign serve "
                               "after ingesting (incremental pickup)")

    p_watch = sub.add_parser(
        "watch", help="watchdog: poll the input dir and ingest on change"
    )
    _add_common(p_watch)
    p_watch.add_argument("--interval", type=float, default=30.0,
                         help="poll interval in seconds")
    p_watch.add_argument("--evaluate", action="store_true")
    p_watch.add_argument("--notify", metavar="URL", default=None,
                         help="POST /sync to a running tpualign serve "
                              "after each ingesting cycle")
    p_watch.add_argument("--max-cycles", type=int, default=None,
                         help="stop after N cycles (default: run forever)")

    p_serve = sub.add_parser(
        "serve", help="retrieval daemon: device-resident index over HTTP/JSON"
    )
    _add_common(p_serve)
    p_serve.add_argument(
        "--schema", default="vanilla_clip",
        help="schema to serve; a comma list or 'all' serves several "
        "schemas from one endpoint (requests route by their 'schema' "
        "field; the first listed — or vanilla_clip for 'all' — is the "
        "default), sharing one text tower",
    )
    p_serve.add_argument("--host", default="127.0.0.1")
    p_serve.add_argument("--port", type=int, default=8321)
    p_serve.add_argument(
        "--no-text-tower", action="store_true",
        help="skip loading the text tower (embedding-only queries)",
    )

    p_cal = sub.add_parser(
        "calibrate",
        help="calibrate weak-supervision scores onto the tower cosine scale",
    )
    _add_common(p_cal)
    p_cal.add_argument("--schema", default="clip_combined", choices=list(SCHEMAS))
    p_cal.add_argument("--write", action="store_true",
                       help="upsert calibrated scores back into the store")

    p_index = sub.add_parser(
        "index",
        help="build + persist the IVF retrieval index offline (the "
             "reference built its ANN index at setup time)",
    )
    _add_common(p_index)
    p_index.add_argument("--schema", default="vanilla_clip",
                         choices=list(SCHEMAS))
    p_index.add_argument("--cache", default=None,
                         help="artifact path (default: IVF_CACHE from the "
                              "config, else <store>/<schema>.ivf.npz)")

    p_query = sub.add_parser("query", help="similarity search over the store")
    _add_common(p_query)
    p_query.add_argument("--schema", default="vanilla_clip", choices=list(SCHEMAS))
    p_query.add_argument("--image-id", default=None,
                         help="rank text chunks for this stored image")
    p_query.add_argument("--text", default=None,
                         help="rank stored images for this text query")
    p_query.add_argument("-k", type=int, default=10)
    p_query.add_argument("--global", dest="global_search", action="store_true",
                         help="search the whole corpus instead of the "
                              "reference's same-manual+page candidate set")
    p_query.add_argument("--rerank", type=float, default=None, metavar="ALPHA",
                         help="blend weak-supervision scores into the ranking: "
                              "(1-ALPHA)*cosine + ALPHA*weak_score")

    args = parser.parse_args(argv)

    if args.command == "run":
        pipe = _build_pipeline(args)
        pipe.run(
            skip_pdf=args.skip_pdf,
            skip_lexical=args.skip_lexical,
            skip_db=args.skip_db,
            skip_embeddings=args.skip_embeddings,
            skip_eval=args.skip_eval,
            force=args.force,
            non_interactive=args.non_interactive,
        )
        return 0

    if args.command == "process":
        pipe = _build_pipeline(args)
        pipe.step_document_processing(force=True)
        return 0

    if args.command == "filter":
        pipe = _build_pipeline(args)
        if args.exclude_file:
            from dataclasses import replace

            pipe.config = pipe.config.replace(
                data=replace(pipe.config.data, exclude_terms_file=args.exclude_file)
            )
        pipe.step_lexical_filtering(force=True, non_interactive=True)
        return 0

    if args.command == "setup-db":
        pipe = _build_pipeline(args)
        pipe.step_store_setup(force=args.force)
        return 0

    if args.command == "embed":
        pipe = _build_pipeline(args)
        if args.schema is not None and args.schema not in SCHEMAS:
            print(f"Unknown schema: {args.schema}")
            print(f"Available schemas: {', '.join(SCHEMAS)}")
            return 1
        schemas = [args.schema] if args.schema else None
        pipe.step_insert_embeddings(force=args.force, schemas=schemas)
        return 0

    if args.command == "evaluate":
        pipe = _build_pipeline(args)
        pipe.step_evaluation()
        return 0

    if args.command == "check":
        from tpualign.utils.checks import run_checks

        config = _config_from(args)
        return run_checks(config)

    if args.command == "train":
        from tpualign.train.trainer import Trainer

        config = _config_from(args)
        mesh = None
        if config.mesh.num_devices > 1:
            from tpualign.parallel.mesh import default_mesh

            mesh = default_mesh(config.mesh)
        trainer = Trainer(config, mesh=mesh)
        metrics = trainer.train(
            schema=args.schema,
            steps=args.steps,
            batch_size=args.train_batch_size,
            ckpt_dir=args.ckpt_dir,
            eval_every=args.eval_every,
            eval_fraction=args.eval_fraction,
            metrics_file=args.metrics_file,
            log_every=args.log_every,
        )
        print({k: (round(v, 4) if isinstance(v, float) else v)
               for k, v in metrics.items()})
        return 0

    if args.command == "ingest":
        pipe = _build_pipeline(args)
        summary = pipe.ingest_cycle(evaluate=args.evaluate)
        ingested = summary.get("ingested", [])
        if ingested and args.notify:
            from tpualign.pipeline import notify_sync

            notify_sync(args.notify,
                        token=getattr(pipe.config, "serve_token", None))
        print(f"ingested {len(ingested)} file(s); "
              f"{summary.get('skipped_unchanged', 0)} unchanged")
        return 0

    if args.command == "watch":
        pipe = _build_pipeline(args)
        try:
            pipe.watch(interval_seconds=args.interval, evaluate=args.evaluate,
                       max_cycles=args.max_cycles, notify=args.notify)
        except KeyboardInterrupt:
            pass
        return 0

    if args.command == "index":
        import os

        from tpualign.serving import build_index_artifact
        from tpualign.serving.server import schema_cache_path

        config = _config_from(args)
        kind = getattr(config, "retrieval_index", "exact")
        if kind == "exact":
            kind = "ivf"  # exact search has no offline artifact
        cache = schema_cache_path(args.cache or (
            getattr(config, "hnsw_cache", None) if kind == "hnsw"
            else getattr(config, "ivf_cache", None)
        ) or os.path.join(config.store.root, f"{args.schema}.{kind}.npz"),
            args.schema)
        index = build_index_artifact(config, args.schema, cache)
        import json as _json

        info = {"schema": args.schema, "index": kind, "cache": cache,
                "n": index.n, "precision": index.precision}
        if kind == "hnsw":
            info.update({
                "m": index.m, "ef_construction": index.ef_construction,
                "ef_search": index.ef_search,
                "memory_bytes": index.memory_bytes(),
            })
        else:
            info.update({
                "n_lists": index.n_lists, "n_probes": index.n_probes,
                "capacity": index.capacity, "spill": index.spill,
                "calibrated_target": getattr(index, "calibrated_target",
                                             None),
            })
        print(_json.dumps(info))
        return 0

    if args.command == "serve":
        from tpualign.serving import build_service
        from tpualign.serving.server import (
            _ServiceBox, fetch_snapshot, serve_schemas,
        )

        config = _config_from(args)
        mesh = None
        if config.mesh.data * config.mesh.model > 1:
            from tpualign.parallel.mesh import default_mesh

            mesh = default_mesh(config.mesh)
        if args.schema == "all":
            schemas = list(SCHEMAS)
        else:
            schemas = [s.strip() for s in args.schema.split(",") if s.strip()]
            bad = [s for s in schemas if s not in SCHEMAS]
            if bad:
                print(f"unknown schema(s) {bad}; choose from {list(SCHEMAS)}")
                return 1
        # Check the store BEFORE paying the tower load (minutes on a
        # relay-attached chip): a serve that would exit with "no
        # embeddings" must exit before EmbedEngine, not after.
        from tpualign.store import EmbeddingStore

        probe = EmbeddingStore(config.store.root,
                               embed_dim=config.model.embed_dim)
        missing = [s for s in schemas if not probe.has_embeddings(s)]
        if missing and args.schema != "all":
            print(f"error: schema(s) {missing} have no embeddings in "
                  f"{config.store.root}")
            return 1
        for s in missing:
            print(f"skipping {s}: no embeddings in {config.store.root}")
        schemas = [s for s in schemas if s not in missing]
        if not schemas:
            print(f"no schema has embeddings in {config.store.root}")
            return 1

        encoder = img_encoder = None
        if not args.no_text_tower:
            from tpualign.parallel.embed import EmbedEngine
            from tpualign.serving.server import make_image_bytes_encoder

            engine = EmbedEngine(
                config.model, mesh=mesh, batch_size=64,
                text_buckets=getattr(config, "text_buckets", (16, 32, 77)),
            )
            encoder = engine.encode_text_batch
            img_encoder = make_image_bytes_encoder(engine)

        boxes = {}
        for schema in schemas:
            try:
                service = build_service(config, schema, mesh=mesh,
                                        encoder=encoder,
                                        image_encoder=img_encoder,
                                        text_tower=not args.no_text_tower)
            except ValueError as e:
                # configuration errors (bad precision/index/recall
                # combos) exit cleanly, not with a traceback
                print(f"error building {schema}: {e}")
                return 1
            boxes[schema] = _ServiceBox(
                service,
                rebuild=lambda s=schema: build_service(
                    config, s, mesh=mesh, encoder=encoder,
                    image_encoder=img_encoder,
                    text_tower=not args.no_text_tower,
                ),
                # /sync rides incremental add — supported by every index
                # type, sharded included (exact r3 late; sharded IVF
                # r3 late too, via per-shard list routing)
                fetch=lambda s=schema: fetch_snapshot(config, s),
            )
        default = schemas[0] if schemas[0] in boxes else sorted(boxes)[0]
        httpd = serve_schemas(boxes, default, host=args.host, port=args.port,
                              token=getattr(config, "serve_token", None),
                              idle_timeout=getattr(
                                  config, "serve_idle_timeout", 60.0),
                              max_body_bytes=getattr(
                                  config, "serve_max_body_bytes", 64 * 2**20),
                              max_connections=getattr(
                                  config, "serve_max_connections", 128),
                              request_deadline=getattr(
                                  config, "serve_request_deadline", 30.0))
        print(f"tpualign serve [{', '.join(sorted(boxes))}; default "
              f"{default}]: {boxes[default].service.stats()} on "
              f"http://{args.host}:{httpd.server_address[1]}")
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        return 0

    if args.command == "calibrate":
        from tpualign.store import EmbeddingStore
        from tpualign.weaksup.calibration import calibrate_schema

        config = _config_from(args)
        store = EmbeddingStore(config.store.root, embed_dim=config.model.embed_dim)
        out = calibrate_schema(store, args.schema, write=args.write)
        if out["n_pairs"] == 0:
            print(f"no alignments in schema {args.schema}")
            return 1
        print(f"calibrated {out['n_pairs']} pairs: "
              f"raw {out['raw_range'][0]:.3f}..{out['raw_range'][1]:.3f} -> "
              f"cosine {out['calibrated_range'][0]:.3f}.."
              f"{out['calibrated_range'][1]:.3f}"
              + (" (written)" if args.write else " (dry run; --write to persist)"))
        return 0

    if args.command == "query":
        return _run_query(args)

    return 1


def _run_query(args) -> int:

    from tpualign.parallel.retrieval import RetrievalIndex, build_index
    from tpualign.store import EmbeddingStore

    config = _config_from(args)
    store = EmbeddingStore(config.store.root, embed_dim=config.model.embed_dim)
    schema = args.schema
    if not store.has_embeddings(schema):
        print(f"schema {schema} has no embeddings (run `tpualign embed` first)")
        return 1

    if args.image_id:
        # reference query semantics: top chunks for an image, candidates
        # restricted to the image's manual+page unless --global
        # (ref:src/evaluate_alignments.py:109-143)
        images = store.images(schema)
        img_ids, img_emb = store.embedding_matrix(schema, "images")
        chunk_ids, chunk_emb = store.embedding_matrix(schema, "text_chunks")
        chunks = store.chunks(schema)
        try:
            pos = img_ids.index(args.image_id)
        except ValueError:
            print(f"unknown image_id {args.image_id}")
            return 1
        img = images[pos]
        # honor the configured index for the chunk corpus ONLY when a
        # prebuilt artifact exists (tpualign index + HNSW_CACHE/
        # IVF_CACHE): a one-shot query must never pay a from-scratch
        # graph/k-means build it cannot even persist — exact is the
        # right default otherwise
        import os as _os

        from tpualign.serving.server import index_kwargs

        kw = index_kwargs(config, schema)
        has_artifact = (
            (kw["index_type"] == "hnsw" and kw["hnsw_cache"]
             and _os.path.exists(kw["hnsw_cache"]))
            or (kw["index_type"] == "ivf" and kw["ivf_cache"]
                and _os.path.exists(kw["ivf_cache"]))
        )
        if kw["index_type"] != "exact" and not has_artifact:
            print(f"(no prebuilt {kw['index_type']} artifact — run "
                  f"`tpualign index` to create one; using exact search)")
            kw["index_type"] = "exact"
            if kw["precision"] == "fp16":  # the hnsw-only rung
                kw["precision"] = "fp32"
        index = build_index(
            chunk_emb,
            [c["manual_id"] for c in chunks],
            [c.get("page") for c in chunks],
            **kw,
        )
        vals, idx = index.search(
            img_emb[pos:pos + 1], [img["manual_id"]], [img.get("page")], args.k,
            global_search=args.global_search,
        )
        label = "sim"
        if args.rerank is not None:
            from tpualign.weaksup.rerank import build_weak_lookup, rerank_with_weak_scores

            lookup = build_weak_lookup(store.alignments(schema))
            vals, idx = rerank_with_weak_scores(
                vals, idx, [args.image_id], chunk_ids, lookup, alpha=args.rerank
            )
            label = f"blend(a={args.rerank})"
        print(f"top-{args.k} chunks for {args.image_id}:")
        for rank, (v, j) in enumerate(zip(vals[0], idx[0]), 1):
            if j < 0:
                break
            print(f"  {rank:2d}. {chunk_ids[j]}  {label}={v:.4f}  {chunks[j]['text'][:70]!r}")
        return 0

    if args.text:
        # new capability: text -> images over the whole corpus.
        # Always exact: this searches the IMAGE corpus, and offline
        # artifacts (tpualign index) cover the chunk corpus only.
        from tpualign.parallel.embed import EmbedEngine

        images = store.images(schema)
        img_ids, img_emb = store.embedding_matrix(schema, "images")
        engine = EmbedEngine(config.model, batch_size=8)
        q = engine.encode_text_batch([args.text])
        index = RetrievalIndex(
            img_emb, [i["manual_id"] for i in images],
            [i.get("page") for i in images],
        )
        vals, idx = index.search(q, k=args.k, global_search=True)
        print(f"top-{args.k} images for {args.text!r}:")
        for rank, (v, j) in enumerate(zip(vals[0], idx[0]), 1):
            if j < 0:
                break
            meta = images[j]
            print(f"  {rank:2d}. {img_ids[j]}  sim={v:.4f}  "
                  f"page={meta.get('page')} caption={meta.get('caption')!r}")
        return 0

    print("query requires --image-id or --text")
    return 1


if __name__ == "__main__":
    sys.exit(main())

"""Training loop: weak-supervision-weighted contrastive fine-tuning over the
embedding store's aligned pairs.

Closes the loop the reference leaves open (frozen embeddings + heuristic
scores only): pairs come from a schema's alignment table — (image, chunk,
weak_score) — or, for vanilla_clip, the same-page cartesian pairs with
uniform weight; images decode host-side (background-friendly, same parity
preprocess as embedding), texts tokenize to the 77-token context; the step
runs SPMD over the mesh; checkpoints via orbax.
"""

from __future__ import annotations

import threading
import time
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpualign.config import PipelineConfig
from tpualign.models.clip import build_clip, init_clip_params
from tpualign.models.loader import load_checkpoint_params
from tpualign.ops.preprocess import preprocess_host
from tpualign.store import EmbeddingStore
from tpualign.tokenizer import ClipTokenizer
from tpualign.train.step import (
    create_train_state,
    make_sharded_train_step,
    sample_patch_indices,
    train_step,
)
from tpualign.utils.logging import get_logger
from tpualign.utils.profiling import ThroughputMeter

log = get_logger("train.trainer")

__all__ = ["Trainer", "build_pair_dataset"]


def build_pair_dataset(
    store: EmbeddingStore, schema: str, images_dir: str | Path
) -> List[Tuple[Optional[str], str, float]]:
    """(image_path, chunk_text, weak_score) triples for one schema.

    Uses the alignment table when populated (lexical/positional/combined
    schemas); falls back to same-page cartesian pairs with weight 1.0
    (vanilla_clip — mirrors the evaluation ground truth,
    ref:src/evaluate_alignments.py:48-69).
    """
    images_dir = Path(images_dir)
    images = {r["image_id"]: r for r in store.images(schema)}
    chunks = {r["chunk_id"]: r for r in store.chunks(schema)}

    triples: List[Tuple[Optional[str], str, float]] = []
    alignments = store.alignments(schema)
    if alignments:
        for image_id, chunk_id, score, _ in alignments:
            img = images.get(image_id)
            chunk = chunks.get(chunk_id)
            if img is None or chunk is None:
                continue
            fname = img.get("filename")
            path = str(images_dir / fname) if fname else None
            triples.append((path, chunk["text"], float(score)))
    else:
        from tpualign.evaluation.metrics import get_image_text_pairs

        for image_id, chunk_id, _, _ in get_image_text_pairs(
            list(images.values()), list(chunks.values())
        ):
            img = images[image_id]
            fname = img.get("filename")
            path = str(images_dir / fname) if fname else None
            triples.append((path, chunks[chunk_id]["text"], 1.0))
    # only trainable rows: a decodable image file is required
    triples = [t for t in triples if t[0] and Path(t[0]).exists()]
    return triples


class Trainer:
    """Fine-tunes the CLIP towers on store pairs."""

    def __init__(
        self,
        config: PipelineConfig,
        store: Optional[EmbeddingStore] = None,
        mesh=None,
        params=None,
    ):
        self.config = config
        self.mesh = mesh
        self.store = store or EmbeddingStore(
            config.store.root, embed_dim=config.model.embed_dim
        )
        self.model = build_clip(config.model)
        self.variant = config.model.variant
        self.tokenizer = ClipTokenizer(context_length=self.variant.context_length)

        if params is None:
            if config.model.checkpoint_path:
                params = load_checkpoint_params(config.model)
            else:
                log.warning("training from seeded random init (no checkpoint)")
                params = init_clip_params(self.model, seed=config.seed)
        self.state = create_train_state(self.model, params, config.train)

        if mesh is not None:
            self._step, shard_state = make_sharded_train_step(
                self.model, mesh, config.train
            )
            self.state = shard_state(self.state)
        else:
            model, tc = self.model, config.train

            from functools import partial as _partial

            @_partial(jax.jit, donate_argnums=(0,))
            def _single_step(state, images, token_ids, weak_scores,
                             patch_indices=None, teacher=None):
                return train_step(state, model, images, token_ids,
                                  weak_scores, tc, patch_indices, teacher)

            self._step = _single_step

    @property
    def export_params(self):
        """Params to embed/serve with after training: the EMA tree when
        ``TrainConfig.ema_decay`` > 0, else the live params."""
        from tpualign.train.step import export_params

        return export_params(self.state)

    # -- data -----------------------------------------------------------------

    def batches(
        self, triples, batch_size: int, seed: int = 0,
        epochs: Optional[int] = None, prefetch: int = 2,
        extras: Optional[Tuple[np.ndarray, ...]] = None,
    ) -> Iterator[Tuple[np.ndarray, ...]]:
        """Shuffled, decoded, fixed-shape batches, cycling over the dataset.

        The feed runs AHEAD of the training loop (the reference decoded
        one image per model call inline, ref:src/insert_clip_embeddings.py
        :107-108; round 2 fixed that for embedding, this is the trainer's
        turn — a synchronous single-thread decode caps a few-core host at
        ~210 img/s while the B-32 device step consumes ~2,400 pairs/s):

        - a decode POOL (``TRAIN_FEED_WORKERS``, 0 = auto; PIL releases
          the GIL during JPEG/PNG decode) fills each batch in parallel;
        - a background producer assembles + tokenizes ``prefetch``
          batches ahead, so host decode overlaps the (async-dispatched)
          device step;
        - decoded+preprocessed images CACHE across epochs up to
          ``TRAIN_FEED_CACHE_MB`` (fine-tuning sets are small and epochs
          repeat — after epoch 1 the feed is pure memory; decode
          failures stay uncached so transient errors retry per epoch,
          preserving the zero-image skip-and-continue semantics).

        Batch order, shapes, failure handling, and text bucketing are
        identical to the previous synchronous implementation (same RNG
        stream).

        ``extras``: optional per-triple arrays (first dim == len(triples))
        sliced with the same shuffled selection and appended to every
        yielded tuple — the distillation teacher bank rides here.
        """
        import os
        import queue as _queue
        from concurrent.futures import ThreadPoolExecutor

        from PIL import Image

        if extras is not None:
            for e in extras:
                if len(e) != len(triples):
                    raise ValueError(
                        f"extras rows ({len(e)}) must match triples "
                        f"({len(triples)})"
                    )

        size = self.variant.image_size
        tcfg = self.config.train
        # TRAIN_IMAGE_FEED=device: host does DECODE ONLY — batches carry
        # (uint8 bucket, true_hw) pairs and the parity-grade bicubic
        # resize/crop/normalize runs fused on device inside the train
        # step (same design as the embed engine's device feed): ~3x less
        # host->device traffic than fp32 pixels, 2.45x the per-core host
        # feed rate, and the uint8 cache holds ~3x more images per byte.
        device_feed = getattr(tcfg, "image_feed", "host") == "device"
        bucket = int(getattr(self.config, "image_preprocess_bucket", 256))
        item_bytes = (bucket * bucket * 3 + 8 if device_feed
                      else size * size * 3 * 4)
        workers = int(getattr(tcfg, "feed_workers", 0)) or min(
            8, os.cpu_count() or 1)
        cache_budget = int(getattr(tcfg, "feed_cache_mb", 2048)) * 2**20
        cache: dict = {}

        def load_one(j: int):
            path, text, w = triples[j]
            arr = cache.get(path)
            if arr is None:
                try:
                    with Image.open(path) as im:
                        if device_feed:
                            from tpualign.ops.preprocess import (
                                pad_to_bucket,
                            )

                            decoded = np.asarray(
                                im.convert("RGB"), np.uint8)
                            padded, hw = pad_to_bucket(decoded, bucket)
                            arr = (padded, np.asarray(hw, np.int32))
                        else:
                            arr = preprocess_host(im, size)
                    # budget check is racy across pool threads by at most
                    # workers-1 items — bounded, and correctness-neutral
                    if (len(cache) + 1) * item_bytes <= cache_budget:
                        cache[path] = arr
                except Exception:
                    arr = None  # zero image; weight still applies
            return arr, text, w

        buckets = self.config.text_buckets
        ctx = self.variant.context_length
        out_q: "_queue.Queue" = _queue.Queue(maxsize=max(1, prefetch))
        stop = threading.Event()

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.2)
                    return True
                except _queue.Full:
                    continue
            return False

        def producer():
            rng = np.random.default_rng(seed)
            epoch = 0
            with ThreadPoolExecutor(max_workers=workers) as pool:
                while not stop.is_set() and (epochs is None
                                             or epoch < epochs):
                    order = rng.permutation(len(triples))
                    for start in range(0, len(order) - batch_size + 1,
                                       batch_size):
                        if stop.is_set():
                            return
                        sel = order[start: start + batch_size]
                        if device_feed:
                            imgs = np.zeros(
                                (batch_size, bucket, bucket, 3), np.uint8)
                            # failed decodes keep a full-bucket "size" so
                            # the device resize maps zeros -> zeros
                            hws = np.full((batch_size, 2), bucket,
                                          np.int32)
                        else:
                            imgs = np.zeros(
                                (batch_size, size, size, 3), np.float32)
                            hws = None
                        texts = [""] * batch_size
                        weights = np.zeros(batch_size, np.float32)
                        for i, (arr, text, w) in enumerate(
                                pool.map(load_one, sel)):
                            if arr is not None:
                                if device_feed:
                                    imgs[i], hws[i] = arr
                                else:
                                    imgs[i] = arr
                            texts[i] = text
                            weights[i] = w
                        tokens = self.tokenizer(texts)
                        # exact pad-tail truncation (causal attention;
                        # zero grads through pad positions) — same
                        # TEXT_BUCKETS knob the embed engine honors
                        if buckets:
                            from tpualign.parallel.embed import (
                                truncate_to_bucket,
                            )

                            tokens = truncate_to_bucket(
                                tokens,
                                tuple(sorted(
                                    {min(int(b), ctx) for b in buckets}
                                    | {ctx})),
                            )
                        batch_imgs = ((imgs, hws) if device_feed
                                      else imgs)
                        item = (batch_imgs, tokens, weights)
                        if extras is not None:
                            item = item + tuple(e[sel] for e in extras)
                        if not put(item):
                            return
                    epoch += 1
            put(None)

        def producer_guard():
            # per-image decode failures are handled inside load_one
            # (zero image, skip-and-continue); anything that escapes —
            # a malformed triple, a tokenizer error, pool construction —
            # must surface in the TRAINING thread, not die silently and
            # leave the consumer blocked on an empty queue forever
            try:
                producer()
            except BaseException as exc:  # noqa: BLE001 — re-raised below
                put(("__feed_error__", exc))

        t = threading.Thread(target=producer_guard, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if (isinstance(item, tuple) and len(item) == 2
                        and item[0] == "__feed_error__"):
                    raise RuntimeError(
                        "training feed producer failed"
                    ) from item[1]
                yield item
        finally:
            stop.set()

    # -- distillation ----------------------------------------------------------

    def set_teacher(self, model, params) -> None:
        """Install a distillation teacher directly (any CLIP module +
        params — the variant/embed_dim may differ from the student's).
        The config path (``DISTILL_CHECKPOINT``/``DISTILL_MODEL``) builds
        one automatically; this is the programmatic hook (and the test
        seam)."""
        self._teacher = (model, params)

    def _teacher_from_config(self):
        if getattr(self, "_teacher", None) is not None:
            return self._teacher
        tc = self.config.train
        if not tc.distill_checkpoint:
            return None
        from dataclasses import replace

        mcfg = replace(
            self.config.model,
            model_name=tc.distill_model or self.config.model.model_name,
            checkpoint_path=tc.distill_checkpoint,
        )
        log.info(
            "distillation teacher: %s from %s",
            mcfg.model_name, tc.distill_checkpoint,
        )
        teacher_model = build_clip(mcfg)
        teacher_params = load_checkpoint_params(mcfg)
        self._teacher = (teacher_model, teacher_params)
        return self._teacher

    def _teacher_bank(
        self, triples, batch_size: int = 64,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Per-triple teacher embeddings, computed ONCE before the loop
        (fixed-teacher distillation: the train step pays zero teacher
        FLOPs — the standard trade when the dataset is enumerable, and
        the same 4x-recompute fix the embed engine made for the
        reference's per-schema re-embedding,
        ref:src/insert_clip_embeddings.py:281-353). Unique images and
        texts embed once and scatter to their triples. Returns
        ``(t_img (N, Dt), t_txt (N, Dt), t_scale ())`` numpy arrays."""
        from PIL import Image

        teacher_model, teacher_params = self._teacher_from_config()
        tv = teacher_model.variant
        tok = (self.tokenizer
               if tv.context_length == self.variant.context_length
               else ClipTokenizer(context_length=tv.context_length))

        paths = sorted({t[0] for t in triples})
        texts = sorted({t[1] for t in triples})
        path_pos = {p: i for i, p in enumerate(paths)}
        text_pos = {t: i for i, t in enumerate(texts)}
        # don't pad a tiny fine-tuning set up to a full device batch
        batch_size = max(1, min(batch_size, max(len(paths), len(texts))))

        def pad_rows(n: int) -> int:
            return -(-n // batch_size) * batch_size

        imgs = np.zeros(
            (pad_rows(len(paths)), tv.image_size, tv.image_size, 3),
            np.float32,
        )
        for i, p in enumerate(paths):
            try:
                with Image.open(p) as im:
                    imgs[i] = preprocess_host(im, tv.image_size)
            except Exception:
                pass  # zero image — the teacher scores it like the student sees it
        tokens = np.asarray(tok(texts))
        tokens_p = np.zeros(
            (pad_rows(len(tokens)), tokens.shape[1]), tokens.dtype)
        tokens_p[: len(tokens)] = tokens

        from tpualign.models.clip import encode_image_fn, encode_text_fn

        img_fn = jax.jit(encode_image_fn(teacher_model))
        txt_fn = jax.jit(encode_text_fn(teacher_model))

        def embed(fn, arr, n_real):
            out = []
            for s0 in range(0, len(arr), batch_size):
                out.append(np.asarray(
                    fn(teacher_params, arr[s0: s0 + batch_size])))
            return np.concatenate(out)[:n_real]

        uimg = embed(img_fn, imgs, len(paths))
        utxt = embed(txt_fn, tokens_p, len(texts))

        t_img = uimg[[path_pos[t[0]] for t in triples]]
        t_txt = utxt[[text_pos[t[1]] for t in triples]]
        scale = float(np.exp(np.asarray(
            jax.device_get(teacher_params["logit_scale"]), np.float32)))
        t_scale = np.asarray(min(scale, 100.0), np.float32)
        log.info(
            "teacher bank: %d images + %d texts embedded (dim %d)",
            len(paths), len(texts), uimg.shape[1],
        )
        return t_img, t_txt, t_scale

    # -- held-out evaluation ---------------------------------------------------

    def _prepare_heldout(self, triples, batch_size: int = 64):
        """Params-independent half of :meth:`evaluate_heldout` — decode,
        preprocess, and tokenize once; every eval call over the same
        held-out set reuses the tensors (keyed on the triple ids, so a
        different set re-prepares). Images pad to a multiple of
        ``batch_size`` so the jitted encoders compile exactly once."""
        from PIL import Image

        key = (tuple(id(t) for t in triples), batch_size)
        cached = getattr(self, "_heldout_prepared", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        size = self.variant.image_size

        texts = sorted({t[1] for t in triples})
        text_pos = {t: i for i, t in enumerate(texts)}
        tokens = np.asarray(self.tokenizer(texts))

        def pad_rows(n: int) -> int:
            return -(-n // batch_size) * batch_size

        imgs = np.zeros(
            (pad_rows(len(triples)), size, size, 3), np.float32)
        gt = np.zeros(len(triples), np.int64)
        for i, (path, text, _w) in enumerate(triples):
            gt[i] = text_pos[text]
            try:
                with Image.open(path) as im:
                    imgs[i] = preprocess_host(im, size)
            except Exception:
                pass  # zero image, counted like any other query
        tokens_p = np.zeros(
            (pad_rows(len(tokens)), tokens.shape[1]), tokens.dtype)
        tokens_p[: len(tokens)] = tokens
        prepared = (imgs, tokens_p, gt, len(triples), len(texts))
        self._heldout_prepared = (key, prepared)
        return prepared

    def evaluate_heldout(
        self, triples, k=(1, 5), batch_size: int = 64,
    ) -> dict:
        """Retrieval metrics of the CURRENT export params over held-out
        (image_path, text, weight) triples: each image queries the set
        of DISTINCT held-out texts; its own text is the ground truth
        (the alignment-GT semantics — the reference's cartesian ground
        truth is model-independent and cannot measure training, see
        tpualign/evaluation/metrics.py). Returns
        ``{"top1": ..., "top{k}": ..., "mrr": ..., "pairs": N}``.

        Rebuild extension: the reference has no training and therefore
        no during-training validation; this is the standard held-out
        retrieval probe CLIP fine-tunes monitor. Decode/tokenize are
        cached across calls (:meth:`_prepare_heldout`) and the encoders
        are jitted once, so repeated evals cost only the forward passes.
        """
        from tpualign.models.clip import encode_image_fn, encode_text_fn
        from tpualign.train.step import export_params

        params = export_params(self.state)
        imgs, tokens, gt, n_pairs, n_texts = self._prepare_heldout(
            triples, batch_size)

        if not hasattr(self, "_heldout_encoders"):
            self._heldout_encoders = (
                jax.jit(encode_image_fn(self.model)),
                jax.jit(encode_text_fn(self.model)),
            )
        img_fn, txt_fn = self._heldout_encoders

        def embed(fn, arr, n_real):
            out = []
            for s0 in range(0, len(arr), batch_size):
                out.append(np.asarray(fn(params, arr[s0: s0 + batch_size])))
            return np.concatenate(out)[:n_real]

        ie = embed(img_fn, imgs, n_pairs)
        te = embed(txt_fn, tokens, n_texts)
        sims = ie @ te.T  # (P, T)
        # rank of the true text per image (ties: ascending index, the
        # repo-wide deterministic order)
        order = np.argsort(-sims, axis=1, kind="stable")
        ranks = np.argmax(order == gt[:, None], axis=1) + 1
        out = {"pairs": len(triples), "mrr": float(np.mean(1.0 / ranks))}
        for kk in k:
            out[f"top{kk}"] = float(np.mean(ranks <= kk))
        return out

    # -- loop -----------------------------------------------------------------

    def train(
        self,
        schema: str = "clip_combined",
        steps: int = 100,
        batch_size: Optional[int] = None,
        ckpt_dir: Optional[str] = None,
        ckpt_every: int = 100,
        log_every: int = 10,
        eval_every: int = 0,
        eval_fraction: float = 0.0,
        metrics_file: Optional[str] = None,
    ) -> dict:
        """Run ``steps`` optimization steps; returns final metrics.

        ``eval_fraction`` > 0 holds out a deterministic fraction of the
        pairs (excluded from every training batch) and, every
        ``eval_every`` steps (plus at the start and end), logs held-out
        retrieval metrics via :meth:`evaluate_heldout`; the returned
        dict carries the trajectory under ``"heldout"``.

        ``metrics_file``: append one JSON line per ``log_every`` interval
        (and per held-out eval) — machine-readable training history for
        dashboards/regression tracking (the reference's only
        observability was the final evaluation stage,
        ref:src/evaluate_alignments.py:430-432).
        """
        batch_size = batch_size or self.config.train.batch_size
        triples = build_pair_dataset(
            self.store, schema, self.config.data.images_dir
        )
        if not triples:
            raise ValueError(
                f"no trainable pairs in schema {schema} (need image files)"
            )
        heldout = []
        heldout_history = []
        if (eval_fraction > 0.0) != (eval_every > 0):
            # half-configured validation would either silently shrink the
            # training set without ever evaluating (fraction, no interval)
            # or silently never run (interval, no held-out pairs)
            raise ValueError(
                "--eval-fraction and --eval-every must be set together "
                f"(got eval_fraction={eval_fraction}, "
                f"eval_every={eval_every})"
            )
        if eval_fraction > 0.0:
            if not 0.0 < eval_fraction < 1.0:
                raise ValueError(
                    f"eval_fraction must be in (0, 1), got {eval_fraction}"
                )
            # deterministic split, independent of the shuffle stream
            ho_rng = np.random.default_rng(self.config.seed + 3)
            n_ho = max(1, int(round(len(triples) * eval_fraction)))
            if n_ho >= len(triples):
                raise ValueError(
                    f"eval_fraction={eval_fraction} leaves no training "
                    f"pairs ({len(triples)} total)"
                )
            sel = ho_rng.permutation(len(triples))[:n_ho]
            ho_set = set(int(i) for i in sel)
            heldout = [t for i, t in enumerate(triples) if i in ho_set]
            triples = [t for i, t in enumerate(triples)
                       if i not in ho_set]
            log.info("held out %d/%d pairs for validation",
                     len(heldout), len(heldout) + len(triples))
        if batch_size > len(triples):
            batch_size = max(2, len(triples))
        log.info(
            "training on %d pairs from %s (batch=%d, steps=%d)",
            len(triples), schema, batch_size, steps,
        )

        if ckpt_dir:
            from tpualign.train.checkpoint import restore_checkpoint

            restored = restore_checkpoint(ckpt_dir, self.state)
            if restored is not None:
                self.state = restored

        meter = ThroughputMeter()
        metrics = {}
        # distillation: precompute the teacher bank over the TRAINING
        # pairs (post-holdout — the teacher never sees the eval split's
        # role; its embeddings are input-only constants anyway)
        t_scale = None
        extras = None
        if (self.config.train.distill_checkpoint
                or getattr(self, "_teacher", None) is not None):
            t_img, t_txt, t_scale = self._teacher_bank(triples)
            t_scale = jnp.asarray(t_scale)
            extras = (t_img, t_txt)
        it = self.batches(triples, batch_size, seed=self.config.seed,
                          extras=extras)
        import numpy as _np

        mask_rng = _np.random.default_rng(self.config.seed + 1)
        start_step = int(jax.device_get(self.state.step))

        if metrics_file:
            Path(metrics_file).parent.mkdir(parents=True, exist_ok=True)

        def emit(record: dict) -> None:
            # open-append-close per record: log_every granularity makes
            # the cost negligible and a crash never loses flushed lines
            if metrics_file:
                import json as _json

                with open(metrics_file, "a", encoding="utf-8") as fh:
                    fh.write(_json.dumps(record) + "\n")

        def run_eval(step_i):
            m = self.evaluate_heldout(heldout)
            heldout_history.append({"step": step_i, **m})
            log.info(
                "heldout@%d: top1=%.3f mrr=%.3f (%d pairs)",
                step_i, m.get("top1", 0.0), m["mrr"], m["pairs"],
            )
            emit({"kind": "heldout", "step": step_i, **m})

        if heldout and eval_every > 0:
            run_eval(start_step)
        t0 = time.perf_counter()
        augment = getattr(self.config.train, "augment", "none")
        if augment not in ("none", "rrc"):
            raise ValueError(f"TRAIN_AUGMENT must be none|rrc, got {augment}")
        if (augment == "rrc"
                and getattr(self.config.train, "image_feed", "host")
                != "device"):
            raise ValueError(
                "TRAIN_AUGMENT=rrc needs TRAIN_IMAGE_FEED=device (crops "
                "fold into the on-device resize weights)"
            )
        aug_rng = _np.random.default_rng(self.config.seed + 2)
        for step_i in range(start_step, steps):
            imgs, tokens, weights, *extra = next(it)
            if isinstance(imgs, tuple):  # device feed: (u8, hw)
                if augment == "rrc":
                    from tpualign.ops.preprocess import sample_crop_boxes

                    boxes, flips = sample_crop_boxes(aug_rng, imgs[1])
                    imgs = imgs + (boxes, flips)
                imgs = tuple(jnp.asarray(x) for x in imgs)
            else:
                imgs = jnp.asarray(imgs)
            teacher = None
            if extra:
                teacher = (jnp.asarray(extra[0]), jnp.asarray(extra[1]),
                           t_scale)
            patch_idx = sample_patch_indices(
                mask_rng, batch_size,
                (self.variant.image_size // self.variant.patch_size) ** 2,
                self.config.train.patch_mask_ratio,
            )
            with meter.measure("train_pairs", batch_size):
                step_args = [self.state, imgs, jnp.asarray(tokens),
                             jnp.asarray(weights)]
                if patch_idx is not None or teacher is not None:
                    step_args.append(
                        None if patch_idx is None else jnp.asarray(patch_idx)
                    )
                if teacher is not None:
                    step_args.append(teacher)
                self.state, metrics = self._step(*step_args)
            if (step_i + 1) % log_every == 0:
                kd = ("" if "distill_kl" not in metrics else
                      " distill_kl=%.4f" % float(metrics["distill_kl"]))
                log.info(
                    "step %d: loss=%.4f acc_i2t=%.3f grad_norm=%.3f%s",
                    step_i + 1, float(metrics["loss"]),
                    float(metrics["acc_i2t"]), float(metrics["grad_norm"]),
                    kd,
                )
                emit({"kind": "train", "step": step_i + 1,
                      **{k: float(jax.device_get(v))
                         for k, v in metrics.items()}})
            if (heldout and eval_every > 0
                    and (step_i + 1) % eval_every == 0
                    and step_i + 1 != steps):
                run_eval(step_i + 1)
            if ckpt_dir and (step_i + 1) % ckpt_every == 0:
                from tpualign.train.checkpoint import save_checkpoint

                save_checkpoint(ckpt_dir, self.state)
        if ckpt_dir:
            from tpualign.train.checkpoint import save_checkpoint

            save_checkpoint(ckpt_dir, self.state)
        meter.report()
        out = {k: float(jax.device_get(v)) for k, v in metrics.items()}
        out["wall_seconds"] = time.perf_counter() - t0
        if heldout and eval_every > 0:
            run_eval(steps)
            out["heldout"] = heldout_history
        # always write a final record — short runs below log_every would
        # otherwise produce an empty history file
        emit({"kind": "final", "step": steps,
              **{k: v for k, v in out.items()
                 if isinstance(v, (int, float))}})
        return out

"""Data-parallel batched embedding engine.

Replaces the reference's one-at-a-time embedding loops
(ref:src/insert_clip_embeddings.py:281-311 images, :328-353 chunks) with a
fixed-shape, jit-once, mesh-sharded batch pipeline:

- inputs are padded to a static global batch (one XLA program, no
  recompiles), batch dim sharded over the ``data`` mesh axis;
- params live on the mesh under the TP specs (replicated on a (N, 1) mesh);
- host work (decode, tokenize) overlaps device compute via a background
  prefetch thread — JAX dispatch is async, so the feed thread keeps the
  MXU busy;
- items that cannot be embedded (vector figures with ``filename=None``,
  missing/corrupt files) get deterministic seeded placeholder embeddings —
  the testable version of the reference's ``np.random.rand`` degradation
  ladder (ref:src/insert_clip_embeddings.py:286-297). Placeholders are
  L2-normalized here because the on-TPU retrieval matmul assumes unit
  vectors (pgvector's cosine operator normalized internally).
"""

from __future__ import annotations

import hashlib
import queue
import threading
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpualign.config import ModelConfig
from tpualign.models.clip import CLIP, build_clip, init_clip_params
from tpualign.models.loader import load_checkpoint_params
from tpualign.ops.preprocess import preprocess_host
from tpualign.tokenizer import ClipTokenizer
from tpualign.utils.logging import get_logger

log = get_logger("parallel.embed")

__all__ = ["EmbedEngine", "placeholder_embedding", "truncate_to_bucket"]


def truncate_to_bucket(tokens: np.ndarray, buckets: Sequence[int]) -> np.ndarray:
    """Truncate a zero-padded token batch to the smallest bucket holding
    every row's EOT (EOT has the largest id, so length = argmax + 1).

    Exact under causal attention (see TextTransformer.__call__) for both
    inference and training — gradients through pad positions are zero
    because only the EOT feature is consumed. Static bucket sizes bound
    jit recompiles to len(buckets).
    """
    tokens = np.asarray(tokens)
    if tokens.shape[0] == 0:
        return tokens
    max_len = int(tokens.argmax(axis=1).max()) + 1
    for b in sorted(int(b) for b in buckets):
        if b >= max_len:
            return tokens[:, :b]
    return tokens


def placeholder_embedding(item_id: str, dim: int) -> np.ndarray:
    """Deterministic unit-norm placeholder derived from the item id."""
    seed = int.from_bytes(hashlib.sha256(item_id.encode()).digest()[:8], "little")
    v = np.random.default_rng(seed).random(dim, dtype=np.float32)
    return v / np.linalg.norm(v)


class EmbedEngine:
    """Mesh-sharded CLIP embedding engine."""

    def __init__(
        self,
        model_config: ModelConfig,
        mesh: Optional[Mesh] = None,
        batch_size: int = 256,
        params=None,
        tokenizer: Optional[ClipTokenizer] = None,
        seed: int = 0,
        decode_workers: int = 8,
        text_buckets: Optional[Sequence[int]] = (16, 32, 77),
        preprocess: str = "host",
        preprocess_bucket: int = 256,
    ):
        self.decode_workers = decode_workers
        # Image feed mode. "host": PIL bicubic preprocess per image — the
        # torchvision-parity path. "device": the host only DECODES (2.45x
        # the per-core rate, docs/PERFORMANCE.md host feed) and pads into
        # uint8 buckets; resize/crop/normalize run fused on device
        # (ops/preprocess.preprocess_device) and the host->device transfer
        # is uint8 (4x smaller). The device resize reproduces PIL's
        # bicubic+antialias uint8 pipeline to <=2 uint8 steps worst-case
        # (mean ~1e-6) — BOTH feeds are parity-grade; "device" is the
        # throughput choice.
        if preprocess not in ("host", "device"):
            raise ValueError(f"preprocess must be host|device, got {preprocess!r}")
        self.preprocess = preprocess
        self.preprocess_bucket = int(preprocess_bucket)
        # Length buckets for the text tower: causal attention makes
        # truncating the pad tail EXACT (see TextTransformer.__call__), so
        # short chunks run at ~T/77 of the full-context compute. None or ()
        # disables (always full context). The full context is always an
        # implicit last bucket.
        if text_buckets:
            ctx = model_config.variant.context_length
            self.text_buckets = tuple(sorted(
                {min(int(b), ctx) for b in text_buckets} | {ctx}
            ))
        else:
            self.text_buckets = None
        self.config = model_config
        self.model: CLIP = build_clip(model_config)
        self.variant = model_config.variant
        self.mesh = mesh
        self.tokenizer = tokenizer or ClipTokenizer(
            context_length=self.variant.context_length
        )

        if params is None:
            if model_config.checkpoint_path:
                params = load_checkpoint_params(model_config)
            else:
                log.warning(
                    "No checkpoint configured — using seeded random weights "
                    "(deterministic placeholder-tower mode)"
                )
                params = init_clip_params(self.model, seed=seed)

        if mesh is not None:
            from tpualign.parallel.sharding import clip_param_specs

            specs = clip_param_specs(params)
            self.params = jax.tree.map(
                lambda x, s: jax.device_put(np.asarray(x), NamedSharding(mesh, s)),
                params, specs,
            )
            self._img_shard = NamedSharding(mesh, P("data", None, None, None))
            self._txt_shard = NamedSharding(mesh, P("data", None))
            self._dp = int(mesh.shape["data"])
        else:
            self.params = jax.tree.map(jnp.asarray, params)
            self._img_shard = None
            self._txt_shard = None
            self._dp = 1

        # global batch must divide evenly across the data axis
        self.batch_size = max(self._dp, (batch_size // self._dp) * self._dp)

        model = self.model

        def _encode_image(p, x):
            return model.apply({"params": p}, x, normalize=True,
                               method=model.encode_image)

        def _encode_text(p, t):
            return model.apply({"params": p}, t, normalize=True,
                               method=model.encode_text)

        size = self.variant.image_size

        def _encode_image_u8(p, u8, hw):
            from tpualign.ops.preprocess import preprocess_device

            x = preprocess_device(u8, hw, size)
            return model.apply({"params": p}, x, normalize=True,
                               method=model.encode_image)

        if mesh is not None:
            self._encode_image = jax.jit(
                _encode_image, in_shardings=(None, self._img_shard),
                out_shardings=NamedSharding(mesh, P()),
            )
            self._encode_text = jax.jit(
                _encode_text, in_shardings=(None, self._txt_shard),
                out_shardings=NamedSharding(mesh, P()),
            )
            self._encode_image_u8 = jax.jit(
                _encode_image_u8,
                in_shardings=(None, self._img_shard,
                              NamedSharding(mesh, P("data", None))),
                out_shardings=NamedSharding(mesh, P()),
            )
        else:
            self._encode_image = jax.jit(_encode_image)
            self._encode_text = jax.jit(_encode_text)
            self._encode_image_u8 = jax.jit(_encode_image_u8)

    # -- batching helpers ------------------------------------------------------

    def _run_batched(self, fn, data: np.ndarray, pad_value=0) -> np.ndarray:
        """Run a fixed-shape jitted fn over data in static batches."""
        n = len(data)
        if n == 0:
            return np.zeros((0, self.variant.embed_dim), np.float32)
        bs = self.batch_size
        outs = []
        for start in range(0, n, bs):
            batch = data[start : start + bs]
            if len(batch) < bs:
                pad = np.full((bs - len(batch),) + batch.shape[1:], pad_value,
                              dtype=batch.dtype)
                batch = np.concatenate([batch, pad], axis=0)
            outs.append(fn(self.params, batch))
        # device->host once at the end; slices stay on device meanwhile
        return np.concatenate([np.asarray(o) for o in outs], axis=0)[:n]

    # -- public API --------------------------------------------------------------

    def encode_text_batch(self, texts: Sequence[str]) -> np.ndarray:
        """Tokenize + encode texts -> (N, D) unit-norm float32.

        With ``text_buckets`` set, rows are grouped by token length into
        the smallest bucket that holds them (EOT inclusive) and each group
        runs at that static sequence length — numerically identical to the
        full-context pass (causal attention; pinned by test), jit-cached
        per bucket shape."""
        if not len(texts):
            return np.zeros((0, self.variant.embed_dim), np.float32)
        tokens = np.asarray(self.tokenizer(list(texts)))
        if not self.text_buckets or len(self.text_buckets) == 1:
            return self._run_batched(self._encode_text, tokens)

        # token rows are zero-padded after EOT, and EOT has the largest id,
        # so length = argmax + 1 (the same rule the model's feature-gather
        # uses)
        lengths = np.argmax(tokens, axis=1) + 1
        buckets = np.asarray(self.text_buckets)
        # smallest bucket >= length
        which = np.searchsorted(buckets, lengths)
        out = np.empty((len(tokens), self.variant.embed_dim), np.float32)
        for bi in np.unique(which):
            rows = np.flatnonzero(which == bi)
            t = int(buckets[bi])
            out[rows] = self._run_batched(
                self._encode_text, tokens[rows, :t]
            )
        return out

    def encode_image_batch(self, images_nhwc: np.ndarray) -> np.ndarray:
        """Preprocessed (N, S, S, 3) float32 -> (N, D) unit-norm float32."""
        return self._run_batched(self._encode_image, images_nhwc.astype(np.float32))

    def embed_image_records(
        self,
        records: Sequence[dict],
        images_dir: str | Path,
        prefetch: int = 2,
    ) -> np.ndarray:
        """Embed image records (decode on host, encode on device, overlap).

        Records lacking a decodable file get deterministic placeholders —
        the skip-and-continue semantics of the reference loop
        (ref:src/insert_clip_embeddings.py:281-297).
        """
        images_dir = Path(images_dir)
        n = len(records)
        dim = self.variant.embed_dim
        out = np.zeros((n, dim), np.float32)
        size = self.variant.image_size

        # Partition into decodable / placeholder items.
        decode_idx: List[int] = []
        for i, rec in enumerate(records):
            fname = rec.get("filename")
            if fname and (images_dir / fname).exists():
                decode_idx.append(i)
            else:
                out[i] = placeholder_embedding(rec["image_id"], dim)

        if not decode_idx:
            return out

        bs = self.batch_size
        batches: "queue.Queue" = queue.Queue(maxsize=prefetch)

        device_mode = self.preprocess == "device"
        bucket = self.preprocess_bucket

        def decode_one(i: int):
            from PIL import Image

            rec = records[i]
            try:
                with Image.open(images_dir / rec["filename"]) as im:
                    if device_mode:
                        from tpualign.ops.preprocess import pad_to_bucket

                        decoded = np.asarray(im.convert("RGB"), np.uint8)
                        padded, hw = pad_to_bucket(decoded, bucket)
                        return i, padded, np.asarray(hw, np.int32)
                    return i, preprocess_host(im, size)
            except Exception as e:  # corrupt file -> placeholder
                log.warning("decode failed for %s: %s", rec.get("filename"), e)
                out[i] = placeholder_embedding(rec["image_id"], dim)
                return None

        def producer():
            # Parallel decode: PIL releases the GIL during JPEG/PNG decode,
            # so a pool keeps the feed ahead of the TPU (the reference
            # decoded serially one image per embed call,
            # ref:src/insert_clip_embeddings.py:107-108).
            from concurrent.futures import ThreadPoolExecutor

            buf: List[Tuple[int, np.ndarray]] = []
            with ThreadPoolExecutor(max_workers=self.decode_workers) as pool:
                for item in pool.map(decode_one, decode_idx, chunksize=8):
                    if item is None:
                        continue
                    buf.append(item)
                    if len(buf) == bs:
                        batches.put(buf)
                        buf = []
            if buf:
                batches.put(buf)
            batches.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()

        while True:
            item = batches.get()
            if item is None:
                break
            idxs = [it[0] for it in item]
            arrs = np.stack([it[1] for it in item])
            if len(arrs) < bs:
                pad = np.zeros((bs - len(arrs),) + arrs.shape[1:], arrs.dtype)
                arrs = np.concatenate([arrs, pad], axis=0)
            if device_mode:
                hws = np.stack([it[2] for it in item])
                if len(hws) < bs:
                    # pad rows claim a 1x1 valid region (never divides by 0)
                    hws = np.concatenate(
                        [hws, np.ones((bs - len(hws), 2), np.int32)], axis=0
                    )
                embs = np.asarray(
                    self._encode_image_u8(self.params, arrs, hws)
                )[: len(idxs)]
            else:
                embs = np.asarray(
                    self._encode_image(self.params, arrs)
                )[: len(idxs)]
            out[idxs] = embs
        t.join()
        return out

    def embed_chunk_records(self, records: Sequence[dict]) -> np.ndarray:
        """Embed text chunks; failures fall back to placeholders
        (ref:src/insert_clip_embeddings.py:328-342)."""
        texts = []
        fallback_idx = []
        for i, rec in enumerate(records):
            text = rec.get("text")
            if isinstance(text, str) and text:
                texts.append(text)
            else:
                texts.append("")
                fallback_idx.append(i)
        embs = self.encode_text_batch(texts)
        for i in fallback_idx:
            embs[i] = placeholder_embedding(records[i]["chunk_id"], embs.shape[1])
        return embs

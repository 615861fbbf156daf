"""Corpus-sharded similarity search with distributed top-k.

This is the component that replaces pgvector's HNSW/IVFFlat indexes and
per-query SQL (ref:src/setup_vector_db.py:155-190,
ref:src/evaluate_alignments.py:109-143). Design (SURVEY.md §2.3/§7):

- the chunk corpus (N, D) is sharded along N over the ``data`` mesh axis;
  embeddings stay resident in device HBM between queries;
- a query block (Q, D) is replicated; each shard computes its local
  (Q, N/shards) similarity on the MXU, applies the same-manual+same-page
  candidate mask (metadata pre-encoded as int32 codes so masking is pure
  device arithmetic), and takes a local ``lax.top_k``;
- local winners are ``all_gather``-ed over ICI — (shards * k) candidates
  per query, tiny compared to N — and reduced with one final top-k.

Exactness: pgvector's HNSW approximates the same cosine ranking; this
search is exact, so recall can only improve (SURVEY.md §2.2). Ties break by
ascending global corpus index (deterministic, pinned by tests).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from tpualign.ops.similarity import NEG_INF
from tpualign.utils.logging import get_logger

log = get_logger("parallel.retrieval")

__all__ = ["RetrievalIndex", "sharded_topk_search", "encode_keys"]


def encode_keys(
    manual_ids: Sequence[str], pages: Sequence[Optional[int]],
    vocab: Optional[Dict[str, int]] = None,
) -> Tuple[np.ndarray, Dict[str, int]]:
    """Encode (manual_id, page) into one int32 key per row.

    ``vocab`` maps manual ids to small ints; pass the same vocab for images
    and chunks so keys compare equal exactly when manual AND page match
    (the reference's JOIN condition, ref:src/evaluate_alignments.py:59-62).
    Pages are None-safe (None -> -1, which still matches None on the other
    side — the reference's SQL JOIN would drop NULL pages; metadata always
    has pages in practice).
    """
    if vocab is None:
        vocab = {}
    keys = np.empty(len(manual_ids), np.int32)
    for i, (m, p) in enumerate(zip(manual_ids, pages)):
        if m not in vocab:
            vocab[m] = len(vocab)
        page = -1 if p is None else int(p)
        key = vocab[m] * 100_000 + page
        if key > np.iinfo(np.int32).max:
            raise ValueError(
                f"(manual, page) key space overflow: {len(vocab)} manuals x "
                f"100k pages exceeds int32; shard the corpus by manual group"
            )
        keys[i] = key
    return keys, vocab


def _local_topk_kernel(q, qk, c, ck, *, k_local: int, axis: str):
    """shard_map body: local masked similarity + local top-k.

    q: (Q, D) replicated; qk: (Q,) query keys; c: (Nl, D) local corpus
    shard; ck: (Nl,) local corpus keys (-1 padding never matches).
    Returns (1, Q, k_local) local winners (values, global indices), stacked
    over the data axis by the out_specs — the cross-shard merge happens in
    the caller where XLA inserts the gather over ICI (shards*k candidates
    per query, tiny next to N).
    """
    sims = jnp.dot(q, c.T, preferred_element_type=jnp.float32)
    mask = (qk[:, None] == ck[None, :]) & (ck[None, :] >= 0)
    sims = jnp.where(mask, sims, NEG_INF)
    vals, idx = jax.lax.top_k(sims, k_local)  # (Q, k_local)
    n_local = c.shape[0]
    offset = jax.lax.axis_index(axis) * n_local
    gidx = idx + offset
    return vals[None], gidx[None]


def _final_topk(merged_vals, merged_idx, k: int):
    """Reduce merged candidates to global top-k with index tie-break.

    lax.top_k is stable on equal values only by position; to pin ties by
    ascending global index we subtract a tiny index-based epsilon — safe
    because real similarities differ by far more than 1e-12 per index step.
    """
    keyed = merged_vals - merged_idx.astype(jnp.float32) * 1e-12
    _, order = jax.lax.top_k(keyed, k)
    vals = jnp.take_along_axis(merged_vals, order, axis=1)
    idx = jnp.take_along_axis(merged_idx, order, axis=1)
    return vals, idx


def sharded_topk_search(
    queries: np.ndarray,
    query_keys: np.ndarray,
    corpus: np.ndarray,
    corpus_keys: np.ndarray,
    k: int,
    mesh: Optional[Mesh] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k search; sharded over ``mesh``'s data axis when provided.

    Returns (values, indices) with shape (Q, k); indices are positions in
    the original corpus (padding rows are impossible winners); rows with
    fewer than k candidates pad with (NEG_INF, -1).
    """
    queries = np.asarray(queries, np.float32)
    corpus = np.asarray(corpus, np.float32)
    nq, nd = queries.shape
    n = len(corpus)
    if nq == 0 or n == 0:
        return (
            np.full((nq, k), NEG_INF, np.float32),
            np.full((nq, k), -1, np.int64),
        )

    if mesh is None or mesh.shape["data"] == 1:
        # Strategy choice (measured on v5e, N=100k, Q=1024, k=10): XLA's
        # matmul + lax.top_k wins while the (Q, N) fp32 similarity matrix
        # fits HBM (8.1ms vs 18.3ms for the streaming kernel). The Pallas
        # kernel exists for the regime where that matrix does NOT fit —
        # it streams corpus blocks with O(Q*k) state instead of O(Q*N).
        sim_bytes = 4 * nq * n
        if k <= 16 and sim_bytes > 4 * 1024**3:
            from tpualign.ops.pallas_kernels import masked_sim_topk

            vals, idx = masked_sim_topk(
                jnp.asarray(queries), jnp.asarray(query_keys, jnp.int32),
                jnp.asarray(corpus), jnp.asarray(corpus_keys, jnp.int32), k,
            )
            vals = np.asarray(vals)
            idx = np.where(np.asarray(idx) >= n, -1, np.asarray(idx))
            return _sentinel(vals, idx)
        sims = queries @ corpus.T
        mask = query_keys[:, None] == corpus_keys[None, :]
        sims = np.where(mask, sims, NEG_INF)
        kk = min(k, n)
        vals, idx = jax.lax.top_k(jnp.asarray(sims), kk)
        vals, idx = _pad_results(np.asarray(vals), np.asarray(idx), k)
        return _sentinel(vals, idx)

    shards = mesh.shape["data"]
    # pad corpus to a multiple of shards, at least k per shard
    n_local = max(-(-n // shards), min(k, n))
    n_pad = n_local * shards
    if n_pad > n:
        corpus = np.concatenate(
            [corpus, np.zeros((n_pad - n, nd), np.float32)], axis=0
        )
        corpus_keys = np.concatenate(
            [corpus_keys, np.full(n_pad - n, -1, np.int32)]
        )
    k_local = min(k, n_local)

    kernel = partial(_local_topk_kernel, k_local=k_local, axis="data")
    mapped = jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(), P(), P("data", None), P("data")),
        out_specs=(P("data", None, None), P("data", None, None)),
    )

    @jax.jit
    def run(q, qk, c, ck):
        lv, li = mapped(q, qk, c, ck)  # (shards, Q, k_local)
        qn = q.shape[0]
        merged_vals = jnp.moveaxis(lv, 0, 1).reshape(qn, -1)
        merged_idx = jnp.moveaxis(li, 0, 1).reshape(qn, -1)
        return _final_topk(merged_vals, merged_idx, min(k, merged_vals.shape[1]))

    vals, idx = run(
        jnp.asarray(queries),
        jnp.asarray(query_keys, jnp.int32),
        jnp.asarray(corpus),
        jnp.asarray(corpus_keys, jnp.int32),
    )
    vals, idx = _pad_results(np.asarray(vals), np.asarray(idx), k)
    return _sentinel(vals, idx)


def _pad_results(vals: np.ndarray, idx: np.ndarray, k: int):
    if vals.shape[1] < k:
        pad = k - vals.shape[1]
        vals = np.pad(vals, ((0, 0), (0, pad)), constant_values=NEG_INF)
        idx = np.pad(idx, ((0, 0), (0, pad)), constant_values=-1)
    return vals, idx


def _sentinel(vals: np.ndarray, idx: np.ndarray):
    """Mark no-candidate slots (masked-out winners) as (-inf, -1)."""
    bad = vals <= NEG_INF / 2
    idx = np.where(bad, -1, idx).astype(np.int64)
    return vals, idx


class RetrievalIndex:
    """Resident sharded index over a chunk corpus.

    The store-level API used by evaluation: build once per schema, then
    ``search(query_embs, query_manuals, query_pages, k)`` — the equivalent
    of the reference's per-image SQL query
    (ref:src/evaluate_alignments.py:109-143) for whole query blocks at once.
    """

    def __init__(
        self,
        corpus_embeddings: np.ndarray,
        corpus_manuals: Sequence[str],
        corpus_pages: Sequence[Optional[int]],
        mesh: Optional[Mesh] = None,
    ):
        self.corpus = np.asarray(corpus_embeddings, np.float32)
        self.vocab: Dict[str, int] = {}
        self.corpus_keys, self.vocab = encode_keys(
            corpus_manuals, corpus_pages, self.vocab
        )
        self.mesh = mesh

    def search(
        self,
        query_embeddings: np.ndarray,
        query_manuals: Sequence[str],
        query_pages: Sequence[Optional[int]],
        k: int,
    ) -> Tuple[np.ndarray, np.ndarray]:
        qk, _ = encode_keys(query_manuals, query_pages, self.vocab)
        return sharded_topk_search(
            np.asarray(query_embeddings, np.float32),
            qk,
            self.corpus,
            self.corpus_keys,
            k,
            self.mesh,
        )

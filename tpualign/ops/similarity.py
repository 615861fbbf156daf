"""Cosine similarity and masked top-k — the on-TPU pgvector replacement.

The reference computes cosine similarity inside PostgreSQL with the pgvector
``<=>`` operator and per-query SQL (ref:src/evaluate_alignments.py:95-99,
126-135), restricted to candidates sharing the query image's manual and
page. Here the whole corpus similarity is one MXU matmul and candidate
restriction is a -inf mask, so ragged candidate sets stay dense and
XLA-friendly (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["l2_normalize", "cosine_similarity_matrix", "masked_topk"]

NEG_INF = -1e30  # large-finite: avoids NaN from (-inf) - (-inf) in top-k compares

# Query-side wildcard key: matches every real (>= 0) corpus key — the
# unrestricted/global search mode. Single source of truth for every masked
# path (XLA dense, ring, Pallas streaming); tpualign.parallel.retrieval
# re-exports it and documents the full key encoding.
WILDCARD_KEY = -3


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Unit-normalize along ``axis`` (ref L2 normalize:
    ref:src/insert_clip_embeddings.py:114,140)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def cosine_similarity_matrix(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    normalized: bool = True,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """(Q, D) x (N, D) -> (Q, N) cosine similarity on the MXU.

    With ``normalized=True`` (embeddings already unit-norm, as stored) this
    is a plain matmul — identical to pgvector's ``1 - (a <=> b)`` for unit
    vectors.
    """
    if not normalized:
        queries = l2_normalize(queries)
        corpus = l2_normalize(corpus)
    return jnp.dot(
        queries.astype(compute_dtype),
        corpus.astype(compute_dtype).T,
        preferred_element_type=jnp.float32,
    )


def masked_topk(
    sims: jnp.ndarray,
    mask: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k per row with a boolean candidate mask.

    Matches the reference query semantics (ORDER BY similarity DESC LIMIT k
    over the candidate JOIN, ref:src/evaluate_alignments.py:126-135) with a
    deterministic tie-break: equal similarities rank by ascending corpus
    index (jax.lax.top_k is stable), where pgvector's ordering of ties is
    unspecified — SURVEY.md §7 calls for pinning this.

    Returns (values, indices), both (Q, k). Rows with fewer than k
    candidates pad with NEG_INF values (callers treat value <= NEG_INF/2 as
    "no candidate").
    """
    masked = jnp.where(mask, sims, NEG_INF)
    return jax.lax.top_k(masked, k)


def topk_similarity_search(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    mask: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused similarity + masked top-k (single-device path)."""
    sims = cosine_similarity_matrix(queries, corpus)
    return masked_topk(sims, mask, k)

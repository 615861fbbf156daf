"""TPU-native IVF (inverted-file) approximate retrieval index.

The reference creates an IVFFlat index (``lists=100``) whenever pgvector's
HNSW build is unavailable (ref:src/setup_vector_db.py:171-190): corpus
vectors are partitioned into ``lists`` clusters by k-means and a query
scans only the ``probes`` nearest clusters. This module is that index
rebuilt TPU-first — everything from k-means training to the probed search
runs on device with static shapes:

- **Training**: spherical k-means (Lloyd's) over the device-resident
  corpus. The assignment step is a blockwise ``lax.scan`` whose inner ops
  are two MXU matmuls per block — scores ``(block, L) = X_b @ C^T`` and
  the centroid update accumulated as ``one_hot(assign)^T @ X_b`` — so the
  whole build is matmul-bound, not scatter-bound.
- **Packed layout**: clusters are padded to a fixed capacity ``C`` and
  packed into one ``(L*C + S, D)`` array by a device sort + scatter (no
  ragged shapes, no host round-trip of per-row assignments — only the
  ``(L,)`` cluster-size vector is fetched to size the layout). Rows beyond
  a cluster's capacity go to a flat **spill tail** of length ``S`` that
  every query scans exactly; capacity overflow therefore degrades compute,
  never recall.
- **Search**: probe selection is one ``(B, L)`` centroid matmul +
  ``lax.top_k``; scoring scans the deduplicated UNION of the batch's
  probed clusters in whole-cluster chunks, one dense MXU matmul per chunk
  shared by every query (per-query gathers have zero corpus-read reuse
  and measured 0.43x EXACT brute force — see ``_ivf_search``). A
  membership mask keeps each query's candidates exactly its own probed
  clusters (classic IVFFlat semantics, batch-invariant), composed with
  the same (manual, page) key masking as the exact paths in
  :mod:`tpualign.parallel.retrieval`; the spill tail is scored densely by
  every query.

Recall semantics match IVFFlat's: a query's true neighbors are found iff
their clusters are probed (or they spilled). ``n_probes = n_lists`` is
exhaustively exact and is pinned against the dense oracle in tests; the
reference never measured its index's recall at all.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpualign.ops.similarity import NEG_INF, WILDCARD_KEY
from tpualign.parallel.retrieval import (
    _pad_results,
    _sentinel,
    _two_key_topk,
    encode_keys,
)
from tpualign.utils.logging import get_logger

log = get_logger("parallel.ivf")

__all__ = ["IVFIndex"]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@partial(jax.jit, static_argnames=("iters", "block"))
def _kmeans(corpus, centroids, iters: int, block: int):
    """Spherical k-means on device. Returns (centroids, assignment, sizes).

    ``corpus`` is ``(N, D)`` with N % block == 0 (caller pads); padding
    rows must be all-zero — they get weight 0 via their zero norm and
    cannot perturb centroids. ``centroids`` is the (L, D) init (caller
    picks real rows, deterministically — build must be reproducible).
    Empty clusters keep their previous centroid.
    """
    n, d = corpus.shape
    n_lists = centroids.shape[0]
    n_blocks = n // block
    blocks = corpus.reshape(n_blocks, block, d)
    valid = jnp.sum(corpus * corpus, axis=1) > 0.0
    valid_blocks = valid.reshape(n_blocks, block)

    def assign_block(cent, xb, vb):
        scores = jnp.dot(xb, cent.T, preferred_element_type=jnp.float32)
        a = jnp.argmax(scores, axis=1)
        return jnp.where(vb, a, n_lists)  # padding rows -> one-past-end

    def step(cent, _):
        def scan_body(carry, xs):
            sums, counts = carry
            xb, vb = xs
            a = assign_block(cent, xb, vb)
            onehot = jax.nn.one_hot(a, n_lists, dtype=jnp.float32)
            sums = sums + jnp.dot(onehot.T, xb,
                                  preferred_element_type=jnp.float32)
            counts = counts + jnp.sum(onehot, axis=0)
            return (sums, counts), None

        (sums, counts), _ = jax.lax.scan(
            scan_body,
            (jnp.zeros((n_lists, d), jnp.float32),
             jnp.zeros((n_lists,), jnp.float32)),
            (blocks, valid_blocks),
        )
        new = sums / jnp.maximum(counts[:, None], 1.0)
        norm = jnp.linalg.norm(new, axis=1, keepdims=True)
        new = new / jnp.maximum(norm, 1e-12)
        keep = counts[:, None] > 0.0
        return jnp.where(keep, new, cent), None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iters)

    def final_block(_, xs):
        xb, vb = xs
        return None, assign_block(centroids, xb, vb)

    _, assign = jax.lax.scan(final_block, None, (blocks, valid_blocks))
    assign = assign.reshape(n)
    # scatter-add histogram — padding rows carry index n_lists and drop
    sizes = jnp.zeros((n_lists,), jnp.int32).at[assign].add(1, mode="drop")
    return centroids, assign, sizes


@partial(jax.jit, static_argnames=("n_lists", "capacity", "spill"))
def _pack(corpus, keys, assign, n_lists: int, capacity: int, spill: int):
    """Sort-by-cluster, then GATHER into the padded block layout.

    Returns the FINAL shaped arrays — ``(L, C, D)`` main blocks plus the
    ``(S, D)`` spill tail (with keys/ids) — straight out of one jit. Row
    order inside a cluster is ascending original index (stable sort), so
    the layout preserves the information the two-key tie-break needs.
    Unused slots carry key -1 (matches nothing) and id -1.

    Memory: only int32 arrays are permuted by scatter; the float layout
    is produced by gathers on the final id arrays, so the peak is corpus
    + layout — never corpus + corpus[order] + packed + post-hoc slice
    copies, which OOMs a 16 GB chip at N>=2M x 512-d. ``corpus`` may
    carry zero padding rows (assign == n_lists): they sort to the tail,
    their dest falls beyond ``total`` and drops. Unused slots gather row
    0 harmlessly — every scoring path masks them via key -1.
    """
    n, d = corpus.shape
    order = jnp.argsort(assign, stable=True)
    sa = assign[order]
    starts = jnp.searchsorted(sa, jnp.arange(n_lists), side="left")
    rank = jnp.arange(n) - starts[jnp.clip(sa, 0, n_lists - 1)]
    in_main = (rank < capacity) & (sa < n_lists)
    main_dest = jnp.clip(sa, 0, n_lists - 1) * capacity + rank
    spill_rank = jnp.cumsum(jnp.where(in_main, 0, 1)) - 1
    total = n_lists * capacity + spill
    dest = jnp.where(in_main, main_dest, n_lists * capacity + spill_rank)
    # padding rows (assign == n_lists) must NEVER land in a slot — not
    # even the rounded-up spill tail — so force them out of range
    dest = jnp.where(sa < n_lists, dest, total)
    pids = jnp.full((total,), -1, jnp.int32).at[dest].set(
        order.astype(jnp.int32), mode="drop"
    )
    pkeys = jnp.full((total,), -1, jnp.int32).at[dest].set(
        keys[order], mode="drop"
    )
    lc = n_lists * capacity
    main_ids = pids[:lc].reshape(n_lists, capacity)
    spill_ids = pids[lc:]
    main_emb = corpus[jnp.maximum(main_ids, 0)]
    spill_emb = corpus[jnp.maximum(spill_ids, 0)]
    return (main_emb, pkeys[:lc].reshape(n_lists, capacity), main_ids,
            spill_emb, pkeys[lc:], spill_ids)


@partial(jax.jit, static_argnames=("k", "n_probes", "chunk", "exact_ties"))
def _ivf_search(q, qk, centroids, main_emb, main_keys, main_ids,
                spill_emb, spill_keys, spill_ids, k: int, n_probes: int,
                chunk: int = 8, exact_ties: bool = False):
    """UNION-probed search: centroid top-P per query, then one dense MXU
    matmul per CHUNK of the deduplicated union of all probed clusters.

    Per-query cluster gathers are the classic IVF schedule and they are
    hostile to the MXU: ``emb[probe[b]]`` gives every query a private
    operand, so the systolic array gets zero corpus-read reuse, and the
    batched matvec runs on the VPU (measured 0.43x the EXACT brute-force
    matmul at N=2M, Q=256 on v5e). The TPU-first schedule instead:

    - builds the sorted deduplicated UNION of the batch's probed clusters
      (``U = |union| <= min(L, B*P)`` slots, device-side sort/compact);
    - scans the union in chunks of ``chunk`` whole cluster blocks —
      gather ``(chunk, C, D)`` contiguous rows, ONE dense ``(B, chunk*C)``
      matmul shared by every query (full MXU operand reuse);
    - masks each query to ITS OWN probed clusters (a ``(B, chunk)``
      membership test), so results are exactly classic per-query IVFFlat
      probing — batch-composition- and query_block-invariant;
    - folds per-chunk ``lax.top_k`` winners into a running top-k with the
      two-key (value desc, id asc) merge. With ``exact_ties`` (used when
      n_probes == n_lists) every stage uses the full two-key sort so the
      ranking is bit-identical to the dense oracle even among equal
      scores; the probed path accepts packed-order ties on the (already
      approximate) candidate set to stay cheap.

    The spill tail is scored with one dense matmul (every query scans it
    exactly). Compute scales with the union size, so the win over exact
    search is largest when ``B * P << L`` (big corpora, modest batches —
    the serving regime).
    """
    b = q.shape[0]
    n_lists, capacity, d = main_emb.shape
    spill = spill_emb.shape[0]
    cs = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
    _, probe = jax.lax.top_k(cs, n_probes)  # (B, P)

    # sorted deduplicated union, padded to a chunk multiple with n_lists
    u = min(n_lists, b * n_probes)
    u_pad = _round_up(u, chunk)
    flat = jnp.sort(probe.reshape(-1))
    first = jnp.concatenate(
        [jnp.ones((1,), bool), flat[1:] != flat[:-1]]
    )
    uids = jnp.sort(jnp.where(first, flat, n_lists))[:u]
    if u_pad > u:
        uids = jnp.concatenate(
            [uids, jnp.full((u_pad - u,), n_lists, jnp.int32)]
        )

    def stage_topk(s, ids):
        """Top-k of one scored stage, padded to width k with (-inf, -1)."""
        m = s.shape[1]
        kk = min(k, m)
        if exact_ties:
            v, i = _two_key_topk(s, jnp.broadcast_to(ids[None], (b, m)), kk)
        else:
            v, p = jax.lax.top_k(s, kk)
            i = ids[p]
        if kk < k:
            v = jnp.concatenate(
                [v, jnp.full((b, k - kk), NEG_INF, jnp.float32)], axis=1)
            i = jnp.concatenate(
                [i, jnp.full((b, k - kk), -1, jnp.int32)], axis=1)
        return v, i

    def key_mask(s, row_keys):
        m = ((qk[:, None] == row_keys[None]) |
             (qk[:, None] == WILDCARD_KEY)) & (row_keys[None] >= 0)
        return jnp.where(m, s, NEG_INF)

    # spill first: one dense matmul over the (S, D) tail
    s_spill = key_mask(
        jnp.dot(q, spill_emb.T, preferred_element_type=jnp.float32),
        spill_keys,
    )
    bv, bi = stage_topk(s_spill, spill_ids)

    def merge(carry, cid):
        bv, bi = carry
        valid = cid < n_lists  # padding slots mask out entirely
        cidc = jnp.minimum(cid, n_lists - 1)
        emb = main_emb[cidc]  # (chunk, C, D) contiguous cluster blocks
        keysc = jnp.where(valid[:, None], main_keys[cidc], -1).reshape(-1)
        idsc = main_ids[cidc].reshape(-1)
        s = jnp.dot(q, emb.reshape(chunk * capacity, d).T,
                    preferred_element_type=jnp.float32)  # (B, chunk*C)
        s = key_mask(s, keysc)
        # classic IVFFlat candidate restriction: a query only accepts rows
        # from clusters IT probed, keeping results batch-invariant
        member = jnp.any(probe[:, :, None] == cid[None, None, :], axis=1)
        s = jnp.where(jnp.repeat(member, capacity, axis=1), s, NEG_INF)
        cv, ci = stage_topk(s, idsc)
        return _two_key_topk(
            jnp.concatenate([bv, cv], axis=1),
            jnp.concatenate([bi, ci], axis=1), k,
        ), None

    (bv, bi), _ = jax.lax.scan(merge, (bv, bi), uids.reshape(-1, chunk))
    return bv, bi


class IVFIndex:
    """Cluster-probed approximate index (pgvector IVFFlat equivalent).

    Build: ``IVFIndex(corpus, manuals, pages, n_lists=..., n_probes=...)``.
    Search mirrors :class:`~tpualign.parallel.retrieval.RetrievalIndex`:
    ``search(queries, manuals, pages, k)`` with the same (manual, page)
    candidate restriction, wildcard global mode, and (-inf, -1) sentinel
    rows. Single-device by design — IVF is the *single-chip* capacity/QPS
    lever; beyond-HBM corpora shard through the exact streaming mesh path.

    Defaults follow IVFFlat practice: ``n_lists ~ sqrt(N)`` (the reference
    hard-codes ``lists=100``, tuned for nothing in particular —
    ref:src/setup_vector_db.py:181) and ``n_probes = max(1, n_lists//8)``.
    """

    def __init__(
        self,
        corpus_embeddings,
        corpus_manuals: Optional[Sequence[str]] = None,
        corpus_pages: Optional[Sequence[Optional[int]]] = None,
        n_lists: Optional[int] = None,
        n_probes: Optional[int] = None,
        iters: int = 10,
        capacity_factor: float = 1.5,
        keys: Optional[np.ndarray] = None,
        query_block: int = 64,
        cluster_chunk: int = 8,
    ):
        self.vocab: Dict[str, int] = {}
        self.mesh = None  # single-device by design (serving /stats parity)
        corpus = jnp.asarray(corpus_embeddings, jnp.float32)
        self.n, self.dim = corpus.shape
        if self.n == 0:
            raise ValueError("IVFIndex needs a non-empty corpus")
        if keys is not None:
            keys = jnp.asarray(keys, jnp.int32)
        elif corpus_manuals is not None:
            hk, self.vocab = encode_keys(
                corpus_manuals, corpus_pages, self.vocab
            )
            keys = jnp.asarray(hk)
        else:
            keys = jnp.zeros((self.n,), jnp.int32)

        if n_lists is None:
            n_lists = max(8, min(_round_up(int(self.n ** 0.5), 8), self.n))
        self.n_lists = int(n_lists)
        self.n_probes = (
            max(1, self.n_lists // 8) if n_probes is None
            else min(int(n_probes), self.n_lists)
        )
        self.query_block = int(query_block)
        self.cluster_chunk = max(1, int(cluster_chunk))

        # ---- build: k-means (blockwise), then size + pack the layout ----
        # padded arrays flow end-to-end (k-means AND pack) so no slice
        # copy of the corpus is ever made; padding rows carry assign ==
        # n_lists and key -1 and drop out inside _pack
        # prefer a block that DIVIDES n (no padded corpus copy at all);
        # fall back to 2^14 with zero padding
        block = 1 << 14
        while block > self.n:
            block //= 2
        block = max(block, 8)
        if self.n % block:
            for b in range(min(1 << 14, self.n), 1023, -1):
                if b % 8 == 0 and self.n % b == 0:
                    block = b
                    break
        n_pad = _round_up(self.n, block)
        if n_pad > self.n:
            corpus_p = jnp.concatenate(
                [corpus, jnp.zeros((n_pad - self.n, self.dim), jnp.float32)]
            )
            keys_p = jnp.concatenate(
                [keys, jnp.full((n_pad - self.n,), -1, jnp.int32)]
            )
        else:
            corpus_p = corpus
            keys_p = keys
        del corpus  # the padded buffer is the only live float copy
        # deterministic strided init over REAL rows (padding is all-zero
        # and must never seed a centroid)
        init_idx = (np.arange(self.n_lists, dtype=np.int64) * self.n
                    ) // self.n_lists
        centroids, assign, sizes = _kmeans(
            corpus_p, corpus_p[jnp.asarray(init_idx)], int(iters), block
        )
        sizes = np.asarray(sizes)  # (L,) — the only host fetch at build
        avg = self.n / self.n_lists
        cap = _round_up(max(1, int(np.ceil(capacity_factor * avg))), 8)
        cap = min(cap, _round_up(int(sizes.max()), 8))
        overflow = int(np.maximum(sizes - cap, 0).sum())
        self.capacity = cap
        self.spill = _round_up(max(overflow, 1), 8)
        if overflow:
            log.info(
                "IVF build: %d/%d rows spilled past cluster capacity %d "
                "(scanned exactly by every query)", overflow, self.n, cap
            )
        self.centroids = centroids
        # block layout: whole-cluster gathers read contiguous (C*D)-float
        # rows; the spill tail stays flat for its dense matmul
        (self._main_emb, self._main_keys, self._main_ids,
         self._spill_emb, self._spill_keys, self._spill_ids) = _pack(
            corpus_p, keys_p, assign, self.n_lists, cap, self.spill,
        )
        del corpus_p, keys_p, assign

    # -- search ----------------------------------------------------------------

    def search(
        self,
        query_embeddings,
        query_manuals: Optional[Sequence[str]] = None,
        query_pages: Optional[Sequence[Optional[int]]] = None,
        k: int = 10,
        n_probes: Optional[int] = None,
        global_search: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k per query as host arrays (values, corpus indices; -1 =
        no candidate). ``n_probes`` overrides the build-time default —
        ``n_probes=self.n_lists`` scans everything (exact)."""
        queries = np.asarray(query_embeddings, np.float32)
        if global_search or query_manuals is None:
            qk = np.full(len(queries), WILDCARD_KEY, np.int32)
        else:
            qk, _ = encode_keys(query_manuals, query_pages, dict(self.vocab))
        return self.search_encoded(queries, qk, k, n_probes)

    def search_encoded(
        self, queries: np.ndarray, qk: np.ndarray, k: int,
        n_probes: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        nq = len(queries)
        if nq == 0:
            return (np.full((0, k), NEG_INF, np.float32),
                    np.full((0, k), -1, np.int64))
        p = self.n_probes if n_probes is None else min(int(n_probes),
                                                       self.n_lists)
        # pad the query block to a fixed size so the jitted executable is
        # reused (remote compiles cost minutes); large batches chunk at
        # query_block per dispatch to bound the (B, M, D) gather
        qb = self.query_block
        out_v, out_i = [], []
        for s in range(0, nq, qb):
            qc = queries[s: s + qb]
            kc = qk[s: s + qb]
            if len(qc) < qb:
                pad = qb - len(qc)
                qc = np.concatenate(
                    [qc, np.zeros((pad, self.dim), np.float32)]
                )
                kc = np.concatenate([kc, np.full(pad, -2, np.int32)])
            vals, idx = _ivf_search(
                jnp.asarray(qc), jnp.asarray(kc, jnp.int32),
                self.centroids, self._main_emb, self._main_keys,
                self._main_ids, self._spill_emb, self._spill_keys,
                self._spill_ids, k, p, chunk=self.cluster_chunk,
                exact_ties=(p == self.n_lists),
            )
            out_v.append(np.asarray(vals))
            out_i.append(np.asarray(idx, np.int64))
        vals = np.concatenate(out_v)[:nq]
        idx = np.concatenate(out_i)[:nq]
        vals, idx = _pad_results(vals, idx, k)
        return _sentinel(vals, idx)

    def search_device(self, query_embeddings, query_keys, k: int,
                      n_probes: Optional[int] = None):
        """Device-resident probed search (bench/serving path): one jitted
        dispatch, no host round-trip. Query count should match a warmed
        shape (pad on the caller side)."""
        p = self.n_probes if n_probes is None else min(int(n_probes),
                                                       self.n_lists)
        return _ivf_search(
            query_embeddings, query_keys, self.centroids, self._main_emb,
            self._main_keys, self._main_ids, self._spill_emb,
            self._spill_keys, self._spill_ids, k, p,
            chunk=self.cluster_chunk, exact_ties=(p == self.n_lists),
        )

    @property
    def memory_bytes(self) -> int:
        """Resident bytes: packed corpus + keys + ids + centroids."""
        total = self.n_lists * self.capacity + self.spill
        return total * (self.dim * 4 + 8) + self.n_lists * self.dim * 4

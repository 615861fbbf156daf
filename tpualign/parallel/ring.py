"""Ring-scheduled corpus-scale retrieval.

For corpus-scale search (BASELINE config 5: 100k pairs on a v5e-16 mesh) the
default strategy in tpualign.parallel.retrieval — replicate the query block,
all-gather per-shard winners — is ideal for small Q. When Q is also large,
replicating queries wastes HBM and the winner gather grows with Q. This
module implements the ring schedule (SURVEY.md §5's "sequence parallelism
analogue": the blockwise ring-attention pattern applied to retrieval):

- corpus shards stay resident, one per device along ``data``;
- the QUERY set is also sharded; at each of the D ring steps every device
  scores its resident corpus shard against the query block it currently
  holds, merges into that block's running top-k, then passes block+state to
  its ring neighbor with ``ppermute`` (compute overlaps the permute);
- after D hops every query block has met every corpus shard exactly once
  and is back home with its global top-k — no all-gather, O(Q/D + N/D)
  memory per device, all traffic on ICI neighbor links.

Results are bit-identical to the gather strategy (same mask semantics, same
ascending-index tie-break) — pinned by tests against the numpy oracle.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from tpualign.ops.similarity import NEG_INF
from tpualign.parallel.retrieval import WILDCARD_KEY as _WILDCARD

__all__ = ["ring_topk_search", "ring_search_fn"]


def _merge_topk(run_vals, run_idx, vals, idx, k: int):
    """Merge (Qb, k) running state with (Qb, m) candidates -> new (Qb, k).

    Exact tie-break by ascending global index: lexicographic two-key
    lax.sort on (-value, index) — bit-exact at any corpus scale (same
    scheme as tpualign.parallel.retrieval._two_key_topk)."""
    cv = jnp.concatenate([run_vals, vals], axis=1)
    ci = jnp.concatenate([run_idx, idx], axis=1)
    neg, si = jax.lax.sort((-cv, ci), num_keys=2)
    return -neg[:, :k], si[:, :k]


def _ring_kernel(q, qk, c, ck, *, k: int, axis: str):
    """shard_map body. q: (Qb, D) local query block; qk: (Qb,) keys;
    c: (Nl, D) resident corpus shard; ck: (Nl,) corpus keys."""
    n_dev = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    n_local = c.shape[0]
    k_local = min(k, n_local)

    def score_merge(carry_q, carry_qk, run_v, run_i):
        # global corpus offset for MY resident shard is me * n_local
        sims = jnp.dot(carry_q, c.T, preferred_element_type=jnp.float32)
        mask = (
            (carry_qk[:, None] == ck[None, :])
            | (carry_qk[:, None] == _WILDCARD)
        ) & (ck[None, :] >= 0)
        sims = jnp.where(mask, sims, NEG_INF)
        vals, idx = jax.lax.top_k(sims, k_local)
        gidx = idx + me * n_local
        return _merge_topk(run_v, run_i, vals, gidx, k)

    qb = q.shape[0]
    from tpualign.ops.pallas_kernels import SENTINEL_IDX

    run_v = jnp.full((qb, k), NEG_INF, jnp.float32)
    run_i = jnp.full((qb, k), jnp.int32(SENTINEL_IDX))

    # D steps: score, then rotate (query block + keys + running state) to the
    # next device. Unrolled python loop — n_dev is static.
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    for step in range(n_dev):
        run_v, run_i = score_merge(q, qk, run_v, run_i)
        if step != n_dev - 1:
            q = jax.lax.ppermute(q, axis, perm)
            qk = jax.lax.ppermute(qk, axis, perm)
            run_v = jax.lax.ppermute(run_v, axis, perm)
            run_i = jax.lax.ppermute(run_i, axis, perm)
    # one final rotation brings every block home to its source shard
    q_home_v = jax.lax.ppermute(run_v, axis, perm)
    q_home_i = jax.lax.ppermute(run_i, axis, perm)
    return q_home_v, q_home_i


@lru_cache(maxsize=32)
def ring_search_fn(mesh: Mesh, k: int):
    """Compiled ring search over ``mesh``'s data axis (cached executable).

    Takes device arrays: queries (Q, D) and query keys (Q,) sharded
    ``P("data", ...)``, corpus (N, D) and corpus keys (N,) resident with
    the same sharding (the :class:`~tpualign.parallel.retrieval.RetrievalIndex`
    layout). Q and N must be multiples of the data-axis size.
    """
    kernel = partial(_ring_kernel, k=k, axis="data")
    mapped = jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P("data", None), P("data"), P("data", None), P("data")),
        out_specs=(P("data", None), P("data", None)),
    )
    return jax.jit(mapped)


def ring_topk_search(
    queries: np.ndarray,
    query_keys: np.ndarray,
    corpus: np.ndarray,
    corpus_keys: np.ndarray,
    k: int,
    mesh: Mesh,
) -> Tuple[np.ndarray, np.ndarray]:
    """Ring-scheduled top-k search over a (data,) or (data, model) mesh.

    Same contract as tpualign.parallel.retrieval.sharded_topk_search:
    (values, indices) of shape (Q, k), -1/-inf padding for missing
    candidates.
    """
    queries = np.asarray(queries, np.float32)
    corpus = np.asarray(corpus, np.float32)
    nq, nd = queries.shape
    n = len(corpus)
    shards = mesh.shape["data"]
    if nq == 0 or n == 0:
        return (
            np.full((nq, k), NEG_INF, np.float32),
            np.full((nq, k), -1, np.int64),
        )

    # pad corpus per shard (>= 1 row so top_k is valid)
    n_local = max(-(-n // shards), 1)
    n_pad = n_local * shards
    corpus = np.concatenate(
        [corpus, np.zeros((n_pad - n, nd), np.float32)], axis=0
    ) if n_pad > n else corpus
    corpus_keys = np.concatenate(
        [np.asarray(corpus_keys, np.int32), np.full(n_pad - n, -1, np.int32)]
    ) if n_pad > n else np.asarray(corpus_keys, np.int32)

    # pad queries to a multiple of shards (key -2 never matches)
    q_local = max(-(-nq // shards), 1)
    q_pad = q_local * shards
    if q_pad > nq:
        queries = np.concatenate(
            [queries, np.zeros((q_pad - nq, nd), np.float32)], axis=0
        )
        query_keys = np.concatenate(
            [np.asarray(query_keys, np.int32), np.full(q_pad - nq, -2, np.int32)]
        )
    else:
        query_keys = np.asarray(query_keys, np.int32)

    run = ring_search_fn(mesh, k)
    vals, idx = run(
        jnp.asarray(queries), jnp.asarray(query_keys, jnp.int32),
        jnp.asarray(corpus), jnp.asarray(corpus_keys, jnp.int32),
    )
    vals = np.asarray(vals)[:nq]
    idx = np.asarray(idx)[:nq]
    bad = (vals <= NEG_INF / 2) | (idx >= n)
    idx = np.where(bad, -1, idx).astype(np.int64)
    vals = np.where(bad, NEG_INF, vals)
    return vals, idx

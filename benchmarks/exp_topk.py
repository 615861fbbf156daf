"""EXPERIMENT: exact lax.top_k vs TPU-native lax.approx_max_k for retrieval.

The retrieval batch (Q=1024, N=100k, k=10) spends most of its time in the
top-k scan over the (Q, N) fp32 similarity matrix (bf16 sims only bought
+3%, docs/PERFORMANCE.md). TPU has a hardware-shaped alternative: the
PartialReduce approx top-k (arXiv:2206.14286 — the op behind ScaNN-on-TPU),
exposed as jax.lax.approx_max_k. pgvector's HNSW index was itself
approximate, so an approximate mode is faithful to the reference's
semantics, not a relaxation of them.

Measures end-to-end search QPS (matmul + mask + top-k) and the recall@k of
the approx path vs the exact path at several recall_target settings.

Usage: python benchmarks/exp_topk.py [N] [Q] [k]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    q_n = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    d = 512
    iters = 10

    @jax.jit
    def make(key):
        kc, kq = jax.random.split(key)
        c = jax.random.normal(kc, (n, d), jnp.float32)
        c = c / jnp.linalg.norm(c, axis=1, keepdims=True)
        q = jax.random.normal(kq, (q_n, d), jnp.float32)
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        ck = jax.random.randint(kc, (n,), 0, 50)
        qk = jax.random.randint(kq, (q_n,), 0, 50)
        return q, qk, c, ck

    q, qk, c, ck = make(jax.random.PRNGKey(0))

    def sims_masked(q, qk, c, ck):
        sims = jnp.dot(q, c.T, preferred_element_type=jnp.float32)
        return jnp.where(qk[:, None] == ck[None, :], sims, NEG_INF)

    @jax.jit
    def exact(q, qk, c, ck):
        return jax.lax.top_k(sims_masked(q, qk, c, ck), k)

    @functools.partial(jax.jit, static_argnums=(4,))
    def approx(q, qk, c, ck, recall_target):
        return jax.lax.approx_max_k(
            sims_masked(q, qk, c, ck), k, recall_target=recall_target)

    def timed(fn, label):
        v, i = fn()
        float(jnp.sum(jnp.where(v > NEG_INF / 2, v, 0.0)))
        t0 = time.perf_counter()
        for _ in range(iters):
            v, i = fn()
        float(jnp.sum(jnp.where(v > NEG_INF / 2, v, 0.0)))
        dt = time.perf_counter() - t0
        print(json.dumps({"kernel": label,
                          "qps": round(q_n * iters / dt, 1)}))
        return np.asarray(jax.device_get(i))

    i_exact = timed(lambda: exact(q, qk, c, ck), "exact_topk")
    for rt in (0.99, 0.95, 0.9):
        i_apx = timed(lambda: approx(q, qk, c, ck, rt), f"approx_rt{rt}")
        hits = np.mean([
            len(set(i_exact[r]) & set(i_apx[r])) / k for r in range(q_n)])
        print(json.dumps({"kernel": f"approx_rt{rt}",
                          "recall_at_k_vs_exact": round(float(hits), 4)}))


if __name__ == "__main__":
    main()

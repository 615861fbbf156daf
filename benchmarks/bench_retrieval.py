"""Retrieval QPS benchmark (the pgvector-replacement headline).

N-corpus masked top-k on the current default device. Prints one JSON line
per strategy. Usage: python benchmarks/bench_retrieval.py [N] [Q] [k]

Methodology notes in bench.py apply (on-device data, scalar-readback sync).
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpualign.ops.similarity import NEG_INF

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

    @jax.jit
    def xla_path(q, qk, c, ck):
        sims = jnp.dot(q, c.T, preferred_element_type=jnp.float32)
        sims = jnp.where(qk[:, None] == ck[None, :], sims, NEG_INF)
        return jax.lax.top_k(sims, k)

    def timed(fn, label):
        v, i = fn(q, qk, c, ck)
        float(jnp.sum(jnp.where(v > NEG_INF / 2, v, 0.0)))  # sync
        t0 = time.perf_counter()
        for _ in range(iters):
            v, i = fn(q, qk, c, ck)
        float(jnp.sum(jnp.where(v > NEG_INF / 2, v, 0.0)))
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": f"retrieval_qps_{label}",
            "value": round(q_n * iters / dt, 1),
            "unit": "queries/s",
            "corpus": n, "k": k,
        }))

    timed(xla_path, "xla_masked_topk")

    from tpualign.ops.pallas_kernels import masked_sim_topk

    @jax.jit
    def pallas_path(q, qk, c, ck):
        return masked_sim_topk(q, qk, c, ck, k)

    timed(pallas_path, "pallas_streaming_topk")


if __name__ == "__main__":
    main()

"""Retrieval QPS benchmark (the pgvector-replacement headline).

Drives the PRODUCTION path — ``RetrievalIndex.search_device`` — so the
number measures exactly what the Evaluator and the CLI ``query`` command
use, plus the raw strategy kernels for comparison. Prints one JSON line per
strategy. Usage: python benchmarks/bench_retrieval.py [N] [Q] [k]

Methodology notes in bench.py apply (on-device data, scalar-readback sync:
``block_until_ready`` does not wait through the axon relay).
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpualign.ops.similarity import NEG_INF
    from tpualign.parallel.mesh import create_mesh
    from tpualign.parallel.retrieval import RetrievalIndex

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

    # Production index: corpus resident in HBM. Metadata keys are generated
    # on device above, so build the index around them directly instead of
    # re-encoding strings.
    n_dev = len(jax.devices())
    mesh = create_mesh(n_dev, 1) if n_dev > 1 else None
    index = RetrievalIndex.__new__(RetrievalIndex)
    index.vocab = {}
    index._init_from_arrays(d, np.asarray(c), np.asarray(ck, np.int32), mesh)

    def timed(fn, label, extra=None):
        v, i = fn()
        float(jnp.sum(jnp.where(v > NEG_INF / 2, v, 0.0)))  # sync
        t0 = time.perf_counter()
        for _ in range(iters):
            v, i = fn()
        float(jnp.sum(jnp.where(v > NEG_INF / 2, v, 0.0)))
        dt = time.perf_counter() - t0
        rec = {
            "metric": f"retrieval_qps_{label}",
            "value": round(q_n * iters / dt, 1),
            "unit": "queries/s",
            "corpus": n, "k": k, "devices": n_dev,
        }
        rec.update(extra or {})
        print(json.dumps(rec))

    timed(lambda: index.search_device(q, qk, k, strategy="gather"),
          "index_gather")

    if mesh is None:
        index_apx = RetrievalIndex.__new__(RetrievalIndex)
        index_apx.vocab = {}
        index_apx._init_from_arrays(
            d, np.asarray(c), np.asarray(ck, np.int32), None,
            "fp32", 0.99,
        )
        timed(lambda: index_apx.search_device(q, qk, k),
              "index_approx_rt0.99", {"recall_target": 0.99})
    if mesh is None:
        index8 = RetrievalIndex.__new__(RetrievalIndex)
        index8.vocab = {}
        index8._init_from_arrays(
            d, np.asarray(c), np.asarray(ck, np.int32), None, "int8"
        )
        timed(lambda: index8.search_device(q, qk, k), "index_int8")
    if mesh is not None and q_n % mesh.shape["data"] == 0:
        timed(lambda: index.search_device(q, qk, k, strategy="ring"),
              "index_ring")

    from tpualign.ops.pallas_kernels import masked_sim_topk

    # arrays must be jit ARGUMENTS: a closure would capture the corpus as
    # a lowering CONSTANT and ship it to the remote compiler (measured:
    # GB-scale constant fetches through the relay wedge the backend)
    raw = jax.jit(
        lambda q, qk, c, ck: masked_sim_topk(q, qk, c, ck, k)
    )
    timed(lambda: raw(q, qk, c, ck), "pallas_streaming_topk")


if __name__ == "__main__":
    main()

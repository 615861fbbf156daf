"""Single-chip capacity benchmark: int8 streaming retrieval at corpus
sizes far beyond what an fp32 dense search could hold.

The fp32 dense path needs the (N, D) corpus AND a (Q, N) similarity
matrix in HBM; the fused Pallas streaming kernel holds only the int8
corpus (N bytes at D=512... N*D bytes) plus O(Q*k) running state, so a
16 GB v5e fits ~20M+ 512-d vectors where fp32 dense tops out around 4-6M
(ref pgvector capacity was bounded by server RAM + HNSW index size,
ref:src/setup_vector_db.py:155-190).

Data is generated ON DEVICE (the relay uploads at ~64 KB/s — a 4 GB
corpus can never cross it) in int8 directly; values are irrelevant for
throughput. Prints one JSON line per corpus size.

Usage: python benchmarks/bench_capacity.py [Q] [k] [sizes_millions...]

Env: CAPACITY_DEQUANT=1 pins the legacy VMEM-dequant kernel (default is
the s8 x s8 -> s32 MXU variant, the TPU production route).
CAPACITY_PRECISION=int4 benches the packed-nibble corpus instead
(two 4-bit values per byte, D/2 bytes per row — 2x the int8 row
capacity; the kernel unpacks per VMEM block and scores with two
half-width s8 MXU dots).
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpualign.ops.pallas_kernels import masked_sim_topk

    q_n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    sizes = [float(s) for s in sys.argv[3:]] or [1.0, 2.0, 4.0, 8.0]
    d = 512
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        sizes = [0.05]  # CPU smoke

    from functools import partial as _partial

    import os

    prec = os.environ.get("CAPACITY_PRECISION", "int8")
    int4 = prec == "int4"
    int2 = prec == "int2"

    @_partial(jax.jit, static_argnames=("n",))
    def _make_seg(key, n):
        # generate quantized rows DIRECTLY — an int32 intermediate would
        # be 4x the corpus (24 GB at 12M x 512) and OOM before the corpus
        # exists. int4 rows are (n, d/2) packed bytes; nibble values in
        # [1, 15] mirror the offset-8 encoding (throughput is value-blind
        # but keep the decode in-range anyway).
        if int2:
            # four 2-bit codes per byte (any byte decodes to valid
            # {-3,-1,1,3} plane values)
            return jax.random.randint(key, (n, d // 4), 0, 256, jnp.uint8)
        if int4:
            b = jax.random.randint(key, (n, d // 2, 2), 1, 16, jnp.uint8)
            return b[..., 0] | (b[..., 1] << 4)
        return jax.random.randint(key, (n, d), -127, 128, jnp.int8)

    SEG = 4_000_000

    def make_corpus(key, n):
        # segment the GENERATION too (a single randint program beyond
        # ~16M x 512 fails the remote compile) and KEEP the segments —
        # concatenating would transiently double HBM use. The search
        # sweeps segments like RetrievalIndex's segmented kernel does.
        parts = []
        for s0 in range(0, n, SEG):
            key, sub = jax.random.split(key)
            parts.append(_make_seg(sub, min(SEG, n - s0)))
        inv = 3.0 if int2 else (7.0 if int4 else 127.0)
        seg_meta = [
            (jnp.full((len(p),), 1.0 / inv, jnp.float32),
             jnp.zeros((len(p),), jnp.int32))
            for p in parts
        ]
        return parts, seg_meta

    @jax.jit
    def make_queries(key):
        q = jax.random.normal(key, (q_n, d), jnp.float32)
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        return q, jnp.zeros((q_n,), jnp.int32)

    mxu = os.environ.get("CAPACITY_DEQUANT", "") != "1"

    @_partial(jax.jit, static_argnames=("kk",))
    def search_seg(q, qk, c, ck, cs, kk):
        return masked_sim_topk(q, qk, c, ck, kk, corpus_scales=cs,
                               int8_mxu=mxu)

    def search(q, qk, parts, meta, kk):
        """Sweep every resident segment, merge winners by the two-key
        sort (the same scheme masked_sim_topk uses internally)."""
        vs, is_ = [], []
        off = 0
        for p, (cs, ck) in zip(parts, meta):
            v, i = search_seg(q, qk, p, ck, cs, kk)
            vs.append(v)
            is_.append(i + off)
            off += len(p)
        if len(vs) == 1:
            return vs[0], is_[0]
        cv = jnp.concatenate(vs, axis=1)
        ci = jnp.concatenate(is_, axis=1)
        neg, si = jax.lax.sort((-cv, ci), num_keys=2)
        return -neg[:, :kk], si[:, :kk]

    qs, qk = make_queries(jax.random.PRNGKey(0))
    for m in sizes:
        n = int(m * 1e6)
        try:
            parts, meta = make_corpus(jax.random.PRNGKey(1), n)
            vals, idx = search(qs, qk, parts, meta, k)
            s = float(jnp.sum(vals)) + int(idx[0, 0])  # sync + sanity
            iters = 3 if n > 4_000_000 else 6
            t0 = time.perf_counter()
            for _ in range(iters):
                vals, idx = search(qs, qk, parts, meta, k)
            _ = float(jnp.sum(vals))  # scalar sync
            dt = time.perf_counter() - t0
            qps = q_n * iters / dt
            print(json.dumps({
                "metric": prec + "_streaming_qps",
                "corpus_millions": m,
                "corpus_gb": round(n * d // (8 if int2 else (4 if int4 else 2)) * 2 / 2**30, 2),
                "q": q_n, "k": k, "int8_mxu": mxu,
                "value": round(qps, 1),
                "unit": "queries/s",
                "checksum_finite": bool(np.isfinite(s)),
            }), flush=True)
            del parts, meta
        except Exception as e:  # OOM boundary is part of the result
            print(json.dumps({
                "metric": prec + "_streaming_qps",
                "corpus_millions": m,
                "error": str(e)[:200],
            }), flush=True)
            break


if __name__ == "__main__":
    main()

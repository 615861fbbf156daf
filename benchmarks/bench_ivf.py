"""IVF probed search vs exact retrieval on the real chip.

Builds an IVFIndex over a DEVICE-GENERATED clustered corpus (the relay
cannot upload hundreds of MB), measures build time, probed-search QPS at
several probe counts, recall@10 vs the exact ranking, and the exact
baseline QPS through RetrievalIndex for the same (N, Q, k).

With ``precision=int8`` the corpus is generated AND quantized on device
in segments (an fp32 copy of the whole corpus never exists — matching
the production beyond-fp32-HBM build path), and the exact baseline runs
the int8 streaming kernel. ``precision=int8_mxu`` is the same int8
layout served through the s8 x s8 -> s32 MXU kernel variant (queries
quantized per dispatch, no fp32 dequant intermediate in VMEM) — the
A/B for the dequant-vs-MXU int8 serving path. ``precision=int4`` packs
two offset-8 nibbles per byte on device (8x fp32 capacity) and serves
through the nibble-unpack MXU kernel.

Usage: python benchmarks/bench_ivf.py [n] [n_lists] [d] [n_queries]
                                      [precision] [probes,csv]
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpualign.parallel.ivf import IVFIndex
    from tpualign.parallel.retrieval import RetrievalIndex

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_lists = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    d = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    g = 4096  # latent directions: clusterable, like real page embeddings
    nq = int(sys.argv[4]) if len(sys.argv) > 4 else 1024
    precision = sys.argv[5] if len(sys.argv) > 5 else "fp32"
    int8_mxu = precision == "int8_mxu"
    if int8_mxu:
        precision = "int8"
    probe_list = (tuple(int(x) for x in sys.argv[6].split(","))
                  if len(sys.argv) > 6 else (1, 8, 32, 64))
    k = 10
    seg = min(n, 1_000_000)
    assert n % seg == 0

    @jax.jit
    def make_seg(key, qkey):
        # noise scales with 1/sqrt(d) so the latent direction keeps a
        # fixed share of each vector's norm — per-coordinate sigma=0.25 in
        # 512-d would swamp the unit direction entirely (noise norm ~5.7)
        # and no index could beat random scanning on such isotropic data
        kc, ka, kn = jax.random.split(key, 3)
        centers = jax.random.normal(kc, (g, d), jnp.float32)
        centers /= jnp.linalg.norm(centers, axis=1, keepdims=True)
        a = jax.random.randint(ka, (seg,), 0, g)
        sig = 0.35 / (d ** 0.5)
        x = centers[a] + sig * jax.random.normal(kn, (seg, d), jnp.float32)
        x /= jnp.linalg.norm(x, axis=1, keepdims=True)
        q = None
        if qkey is not None:
            qi = jax.random.randint(qkey, (nq,), 0, seg)
            q = x[qi] + sig * jax.random.normal(qkey, (nq, d), jnp.float32)
            q /= jnp.linalg.norm(q, axis=1, keepdims=True)
        if precision == "int8":
            s = jnp.maximum(
                jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0, 1e-12
            )
            x = jnp.clip(jnp.rint(x / s), -127, 127).astype(jnp.int8)
            return x, s[:, 0], q
        if precision == "int4":
            s = jnp.maximum(
                jnp.max(jnp.abs(x), axis=1, keepdims=True) / 7.0, 1e-12
            )
            qv = jnp.clip(jnp.rint(x / s), -7, 7).astype(jnp.int32) + 8
            x = (qv[:, : d // 2] | (qv[:, d // 2:] << 4)).astype(jnp.uint8)
            return x, s[:, 0], q
        return x, None, q

    # root key is split per segment; queries come from segment 0
    segs, scales, queries = [], [], None
    for si in range(n // seg):
        key = jax.random.fold_in(jax.random.PRNGKey(0), si)
        x, s, q = make_seg(key, jax.random.PRNGKey(7) if si == 0 else None)
        segs.append(x)
        if s is not None:
            scales.append(s)
        if q is not None:
            queries = q
        float(jnp.sum(x[0].astype(jnp.float32)))  # sync before next seg
    corpus = segs[0] if len(segs) == 1 else jnp.concatenate(segs)
    del segs
    cscales = (None if precision not in ("int8", "int4")
               else (scales[0] if len(scales) == 1
                     else jnp.concatenate(scales)))
    del scales
    float(jnp.sum(queries[0]))  # sync data generation

    t0 = time.perf_counter()
    # pin the variant even on TPU where int8_mxu now defaults on: the
    # plain "int8" arm must stay the dequant path for A/Bs
    index = IVFIndex(corpus, n_lists=n_lists, iters=10,
                     query_block=min(nq, 256), corpus_scales=cscales,
                     int8_mxu=int8_mxu if precision == "int8" else None)
    # sync: fetch one packed scalar
    float(jnp.sum(index.centroids[0]))
    build_s = time.perf_counter() - t0

    qk = jnp.full((nq,), -3, jnp.int32)  # wildcard (global search)

    # exact baseline through the production index (fused streaming kernel)
    exact = RetrievalIndex.__new__(RetrievalIndex)
    exact.n = n
    exact.dim = d
    exact.mesh = None
    exact.precision = precision
    exact.recall_target = None
    exact.vocab = {}
    exact._corpus_scales = cscales
    exact._approx_warned = set()
    exact._n_local = n
    exact._corpus = corpus
    exact._keys = jnp.zeros((n,), jnp.int32)

    def timed(fn, reps=10):
        out = fn()  # warm/compile
        float(jnp.sum(out[0][:, 0]))  # drain the queue before timing
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        # sync via scalar fetch (relay ignores block_until_ready)
        float(jnp.sum(out[0][:, 0]))
        return (time.perf_counter() - t0) / reps

    ev, ei = exact.search_device(queries, qk, k)
    oidx = np.asarray(ei)
    t_exact = timed(lambda: exact.search_device(queries, qk, k))
    print(json.dumps({
        "metric": "ivf_baseline_exact", "n": n, "d": d, "q": nq, "k": k,
        "precision": precision, "qps": round(nq / t_exact, 1),
    }), flush=True)
    # free the exact index's corpus before the probed phase: at capacity-
    # limit N the raw corpus (the exact baseline's operand) + the packed
    # layout (~1.5x) cannot BOTH stay resident alongside search temps
    del exact, corpus, cscales

    for probes in probe_list:
        if probes > n_lists:
            continue
        pv, pi = index.search_device(queries, qk, k, n_probes=probes)
        pidx = np.asarray(pi)
        recall = float(np.mean([
            len(np.intersect1d(pidx[r], oidx[r])) / k for r in range(nq)
        ]))
        t = timed(lambda: index.search_device(queries, qk, k,
                                              n_probes=probes))
        print(json.dumps({
            "metric": "ivf_probed_search", "n": n, "d": d, "q": nq, "k": k,
            "n_lists": n_lists, "n_probes": probes, "precision": precision,
            "int8_mxu": int8_mxu,
            "capacity": index.capacity, "spill": index.spill,
            "build_s": round(build_s, 1),
            "memory_gb": round(index.memory_bytes / 2**30, 2),
            "recall_at_10": round(recall, 4),
            "qps": round(nq / t, 1),
            "speedup_vs_exact": round(t_exact / t, 2),
        }), flush=True)


if __name__ == "__main__":
    main()

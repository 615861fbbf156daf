"""Same-process A/B: IVF int8 dequant path vs int8_mxu MXU path.

Cross-process QPS comparisons are unreliable on a throttling host (the
two bench_ivf runs of an identical workload measured exact baselines
25% apart), so this builds ONE int8 IVFIndex and times both kernel
variants in the same process, interleaved, against the same exact
oracle. Also reports the direct overlap between the two variants'
top-k sets (the query-quantization noise int8_mxu adds) and recall
monotonicity in probes.

Usage: python benchmarks/ab_ivf_int8.py [n] [n_lists] [d] [q] [probes,csv]
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

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_lists = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    d = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    nq = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    probe_list = (tuple(int(x) for x in sys.argv[5].split(","))
                  if len(sys.argv) > 5 else (1, 8, 32))
    g, k = 4096, 10
    seg = min(n, 1_000_000)
    assert n % seg == 0

    @jax.jit
    def make_seg(key, qkey):
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
        s = jnp.maximum(
            jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0, 1e-12
        )
        x = jnp.clip(jnp.rint(x / s), -127, 127).astype(jnp.int8)
        return x, s[:, 0], q

    segs, scales, queries = [], [], None
    for si in range(n // seg):
        key = jax.random.fold_in(jax.random.PRNGKey(0), si)
        x, s, q = make_seg(key, jax.random.PRNGKey(7) if si == 0 else None)
        segs.append(x)
        scales.append(s)
        if q is not None:
            queries = q
        float(jnp.sum(x[0].astype(jnp.float32)))
    corpus = segs[0] if len(segs) == 1 else jnp.concatenate(segs)
    cscales = scales[0] if len(scales) == 1 else jnp.concatenate(scales)
    del segs, scales
    float(jnp.sum(queries[0]))

    index = IVFIndex(corpus, n_lists=n_lists, iters=10,
                     query_block=min(nq, 256), corpus_scales=cscales)
    float(jnp.sum(index.centroids[0]))

    qk = jnp.full((nq,), -3, jnp.int32)

    exact = RetrievalIndex.__new__(RetrievalIndex)
    exact.n, exact.dim, exact.mesh = n, d, None
    exact.precision, exact.recall_target = "int8", None
    exact.vocab, exact._approx_warned = {}, set()
    exact._corpus_scales, exact._n_local = cscales, n
    exact._corpus = corpus
    exact._keys = jnp.zeros((n,), jnp.int32)
    ev, ei = exact.search_device(queries, qk, k)
    oidx = np.asarray(ei)
    del exact, corpus, cscales

    def timed(fn, reps=20):
        out = fn()
        float(jnp.sum(out[0][:, 0]))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        float(jnp.sum(out[0][:, 0]))
        return (time.perf_counter() - t0) / reps

    for probes in probe_list:
        if probes > n_lists:
            continue
        row = {"metric": "ab_ivf_int8", "n": n, "d": d, "q": nq, "k": k,
               "n_lists": n_lists, "n_probes": probes}
        res = {}
        # interleave: dequant, mxu, dequant, mxu — so throttle drift
        # hits both arms equally; keep the faster of the two timings
        for arm in ("dequant", "mxu", "dequant2", "mxu2"):
            index.int8_mxu = arm.startswith("mxu")
            pv, pi = index.search_device(queries, qk, k, n_probes=probes)
            pidx = np.asarray(pi)
            t = timed(lambda: index.search_device(queries, qk, k,
                                                  n_probes=probes))
            base = arm.rstrip("2")
            if base in res:
                res[base]["t"] = min(res[base]["t"], t)
            else:
                recall = float(np.mean([
                    len(np.intersect1d(pidx[r], oidx[r])) / k
                    for r in range(nq)
                ]))
                res[base] = {"t": t, "recall": recall, "idx": pidx}
        agree = float(np.mean([
            len(np.intersect1d(res["dequant"]["idx"][r],
                               res["mxu"]["idx"][r])) / k
            for r in range(nq)
        ]))
        row.update({
            "qps_dequant": round(nq / res["dequant"]["t"], 1),
            "qps_mxu": round(nq / res["mxu"]["t"], 1),
            "mxu_speedup": round(res["dequant"]["t"] / res["mxu"]["t"], 2),
            "recall_dequant": round(res["dequant"]["recall"], 4),
            "recall_mxu": round(res["mxu"]["recall"], 4),
            "dequant_mxu_overlap": round(agree, 4),
        })
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()

"""Same-process A/B for exact int8 search: dense XLA vs streaming kernel
(dequant) vs streaming kernel (int8_mxu).

Decides the production routing for `RetrievalIndex.search_device` with
``precision="int8"`` on TPU: the dense path materializes the (Q, N) fp32
similarity matrix (HBM wall long before the corpus limit), the dequant
sweep sits on a VPU compute floor, and the MXU sweep is the candidate
default. Interleaved timings (throttle-safe), all arms checked against
the same run's outputs.

Usage: python benchmarks/ab_exact_int8.py [n] [d] [q] [k]
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpualign.parallel.retrieval import (
        _device_masked_topk_int8,
        _device_streaming_topk_int8,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    nq = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    g = 4096
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
    ck = jnp.zeros((n,), jnp.int32)
    qk = jnp.full((nq,), -3, jnp.int32)
    float(jnp.sum(queries[0]))

    arms = {
        "dense": lambda: _device_masked_topk_int8(
            queries, qk, corpus, cscales, ck, k),
        "stream_dequant": lambda: _device_streaming_topk_int8(
            queries, qk, corpus, cscales, ck, k, int8_mxu=False),
        "stream_mxu": lambda: _device_streaming_topk_int8(
            queries, qk, corpus, cscales, ck, k, int8_mxu=True),
    }

    def timed(fn, reps=15):
        out = fn()
        float(jnp.sum(out[0][:, 0]))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        float(jnp.sum(out[0][:, 0]))
        return (time.perf_counter() - t0) / reps

    res, idxs = {}, {}
    for rnd in (1, 2):  # interleaved rounds; keep the faster timing
        for name, fn in arms.items():
            try:
                if rnd == 1:
                    v, i = fn()
                    idxs[name] = np.asarray(i)
                t = timed(fn)
                res[name] = min(res.get(name, t), t)
            except Exception as e:
                res[name] = None
                print(json.dumps({"arm": name, "error": str(e)[:160]}),
                      flush=True)
    base = idxs.get("dense")
    overlaps = {
        f"overlap_{name}_vs_dense": round(float(np.mean([
            len(np.intersect1d(idxs[name][r], base[r])) / k
            for r in range(nq)
        ])), 4)
        for name in idxs if name != "dense" and base is not None
    }
    print(json.dumps({
        "metric": "ab_exact_int8", "n": n, "d": d, "q": nq, "k": k,
        **{f"qps_{m}": (round(nq / t, 1) if t else None)
           for m, t in res.items()},
        **overlaps,
    }), flush=True)


if __name__ == "__main__":
    main()

"""A/B the r5 large-k threshold-skip in the EXACT streaming kernel
(VERDICT r4 weak #4: the refine over-fetch merge was the device cost —
kk=40 measured ~5.2x the kk=10 baseline at 24M int8, 1,265 -> 243 QPS).

Device-only: the refine rescore corpus is irrelevant to the merge cost,
so this generates the SAME 24M x 512 int8 corpus shape on-chip (threefry)
and times the sweep at kk in {10, 40, 64} with the skip OFF (r4
behavior) vs ON (r5 default past EXACT_SKIP_MIN_K), plus a bit-identity
check between the arms at every kk.

Usage: python benchmarks/ab_exact_skip.py [millions] [Q] [kk...]
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tpualign.ops.pallas_kernels as pk
    from tpualign.ops.pallas_kernels import masked_sim_topk

    millions = float(sys.argv[1]) if len(sys.argv) > 1 else 24.0
    q_n = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    kks = [int(x) for x in sys.argv[3:]] or [10, 40, 64]
    d = 512
    n = int(millions * 1e6)
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        n = 100_000  # CPU smoke
    SEG = 4_000_000
    seg_sizes = [min(SEG, n - s0) for s0 in range(0, n, SEG)]

    key = jax.random.PRNGKey(1)
    seg_keys = []
    for _ in seg_sizes:
        key, sub = jax.random.split(key)
        seg_keys.append(sub)

    @partial(jax.jit, static_argnames=("m",))
    def make_seg(k_, m):
        return jax.random.randint(k_, (m, d), -127, 128, jnp.int8)

    parts = [make_seg(sk, m) for sk, m in zip(seg_keys, seg_sizes)]
    seg_meta = [
        (jnp.full((m,), 1.0 / 127.0, jnp.float32),
         jnp.zeros((m,), jnp.int32))
        for m in seg_sizes
    ]

    @jax.jit
    def make_queries(key):
        q = jax.random.normal(key, (q_n, d), jnp.float32)
        return q / jnp.linalg.norm(q, axis=1, keepdims=True)

    qs = make_queries(jax.random.PRNGKey(7))
    qk = jnp.zeros((q_n,), jnp.int32)

    # one jitted executable per (kk, skip-arm): eager dispatch through
    # the relay costs ~100x (measured the hard way)
    from functools import lru_cache

    @lru_cache(maxsize=None)
    def seg_fn(kk, skip):
        @partial(jax.jit, static_argnames=())
        def f(q, qk_, c, ck, cs):
            pk._exact_skip_override = skip  # trace-time constant
            try:
                return masked_sim_topk(q, qk_, c, ck, kk,
                                       corpus_scales=cs, int8_mxu=True)
            finally:
                pk._exact_skip_override = None
        return f

    def sweep(kk, skip):
        vs, is_ = [], []
        off = 0
        f = seg_fn(kk, skip)
        for p, (cs, ck) in zip(parts, seg_meta):
            v, i = f(qs, qk, p, ck, cs)
            vs.append(v)
            is_.append(i + off)
            off += len(p)
        if len(vs) == 1:
            return vs[0], is_[0]
        cv = jnp.concatenate(vs, axis=1)
        ci = jnp.concatenate(is_, axis=1)
        neg, si = jax.lax.sort((-cv, ci), num_keys=2)
        return -neg[:, :kk], si[:, :kk]

    results = {"metric": "ab_exact_threshold_skip",
               "corpus_millions": round(n / 1e6, 2), "q": q_n, "d": d,
               "points": []}
    iters = 3
    for kk in kks:
        point = {"k": kk}
        ref = {}
        for arm, override in (("skip_off", False), ("skip_on", True)):
            v, i = sweep(kk, override)
            _ = float(jnp.sum(v))  # scalar sync through the relay
            t0 = time.perf_counter()
            for _ in range(iters):
                v, i = sweep(kk, override)
            _ = float(jnp.sum(v))
            dt = time.perf_counter() - t0
            point[arm + "_qps"] = round(q_n * iters / dt, 1)
            ref[arm] = (np.asarray(v), np.asarray(i))
        point["bit_identical"] = bool(
            np.array_equal(ref["skip_off"][0], ref["skip_on"][0])
            and np.array_equal(ref["skip_off"][1], ref["skip_on"][1])
        )
        point["speedup"] = round(
            point["skip_on_qps"] / point["skip_off_qps"], 3
        )
        results["points"].append(point)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()

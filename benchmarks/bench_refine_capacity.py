"""Measured refined search at the beyond-HBM int8 capacity point
(VERDICT r3 #1's second "done" criterion: a MEASURED, not extrapolated,
refined-search number at the 24M x 512 int8 point).

Why this is now runnable at all: the refine rescore corpus is a
``_RefineCorpus`` in **memmap** mode — 49 GB of fp32 rows on DISK with
~0 resident RSS — instead of the round-3 host-RAM fp32 copy that could
not exist on this machine next to everything else.

Why the host rows are GENUINE: the device corpus is generated on-chip
(the relay moves ~64 KB/s — 12 GB of int8 can never cross it), with
``jax.random.randint`` under threefry2x32, which is bit-deterministic
across backends. The host regenerates the SAME segments on the CPU
backend from the SAME keys, dequantizes (row/127), and streams them
into the memmap — then verifies a row sample from every segment against
the device bytes before timing anything. The rescore therefore runs
over exactly the rows the chip scored.

Transport note: each refined search must fetch the (Q, k*R) candidate
ids to host. On a PCIe-attached chip that is microseconds; through this
relay it is the dominant cost, so the output reports the device sweep,
fetch, and host rescore components separately as well as the honest
end-to-end number.

Usage: python benchmarks/bench_refine_capacity.py [millions] [Q] [k] [R...]
Env:   REFINE_BENCH_DIR — where the 49 GB memmap lands (default /root).
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial


def main() -> None:
    os.environ.setdefault("RETRIEVAL_REFINE_DIR",
                          os.environ.get("REFINE_BENCH_DIR", "/root"))
    import jax

    if os.environ.get("REFINE_BENCH_CPU") == "1":
        # the axon sitecustomize ignores JAX_PLATFORMS; this is the
        # supported way to force the CPU smoke path
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from tpualign.ops.pallas_kernels import masked_sim_topk
    from tpualign.parallel.retrieval import (
        REFINE_MAX_STREAM_K,
        _RefineCorpus,
        _refine_rescore,
        _write_refine_memmap,
    )

    prec = os.environ.get("REFINE_BENCH_PRECISION", "int8")
    int4 = prec == "int4"
    store_mode = os.environ.get("REFINE_BENCH_STORE",
                                "memmap16" if int4 else "memmap")
    store_dt = np.float16 if store_mode == "memmap16" else np.float32
    millions = float(sys.argv[1]) if len(sys.argv) > 1 else 24.0
    q_n = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    factors = [int(r) for r in sys.argv[4:]] or [4, 8]
    d = 512
    n = int(millions * 1e6)
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        n = 50_000  # CPU smoke
    SEG = 4_000_000
    seg_sizes = [min(SEG, n - s0) for s0 in range(0, n, SEG)]

    cpu = jax.devices("cpu")[0]

    # per-segment threefry keys, computed once on host so the device and
    # host generators consume IDENTICAL key material
    with jax.default_device(cpu):
        key = jax.random.PRNGKey(1)
        seg_keys = []
        for _ in seg_sizes:
            key, sub = jax.random.split(key)
            seg_keys.append(np.asarray(sub))

    @partial(jax.jit, static_argnames=("m",))
    def make_seg(k_, m):
        if int4:
            # packed nibble pairs, values in [1, 15] (offset-8 in-range)
            b = jax.random.randint(k_, (m, d // 2, 2), 1, 16, jnp.uint8)
            return b[..., 0] | (b[..., 1] << 4)
        return jax.random.randint(k_, (m, d), -127, 128, jnp.int8)

    # device-resident int8 segments (threefry on the TPU)
    parts = [make_seg(jnp.asarray(sk), m)
             for sk, m in zip(seg_keys, seg_sizes)]
    inv = 7.0 if int4 else 127.0
    seg_meta = [
        (jnp.full((m,), 1.0 / inv, jnp.float32),
         jnp.zeros((m,), jnp.int32))
        for m in seg_sizes
    ]

    # host regeneration of the SAME segments on the CPU backend,
    # streamed into the memmap refine corpus (one segment resident at a
    # time; dequantized fp32 row = int8_row / 127)
    host_cache = {"i": -1, "rows": None}
    head_rows: dict = {}  # first raw rows per segment, captured in-stream

    def host_segment(i: int) -> np.ndarray:
        if host_cache["i"] != i:
            with jax.default_device(cpu):
                raw = make_seg(jnp.asarray(seg_keys[i]), seg_sizes[i])
                host_cache["rows"] = np.asarray(raw)
                host_cache["i"] = i
            head_rows.setdefault(i, host_cache["rows"][:2].copy())
        return host_cache["rows"]

    seg_starts = np.cumsum([0] + seg_sizes)

    def dequant(raw: np.ndarray) -> np.ndarray:
        if int4:
            b = raw.astype(np.int32)
            lo = ((b & 15) - 8).astype(np.float32)   # dims [0, D/2)
            hi = ((b >> 4) - 8).astype(np.float32)   # dims [D/2, D)
            return np.concatenate([lo, hi], axis=1) / 7.0
        return raw.astype(np.float32) / 127.0

    def get_rows(s: int, e: int) -> np.ndarray:
        out = np.empty((e - s, d), np.float32)
        pos = s
        while pos < e:
            i = int(np.searchsorted(seg_starts, pos, "right") - 1)
            lo = pos - seg_starts[i]
            hi = min(e - seg_starts[i], seg_sizes[i])
            out[pos - s: pos - s + (hi - lo)] = dequant(
                host_segment(i)[lo:hi]
            )
            pos = seg_starts[i] + hi
        return out

    t0 = time.perf_counter()
    f = _write_refine_memmap(n, d, get_rows, dtype=store_dt)
    corpus = _RefineCorpus(store_mode, f.arr, None, f)
    build_s = time.perf_counter() - t0

    # genuineness gate: device bytes == host bytes, per segment (head
    # rows were captured DURING the streaming build — no re-generation)
    for i, p in enumerate(parts):
        dev_rows = np.asarray(p[:2])  # tiny fetch through the relay
        if not np.array_equal(dev_rows, head_rows[i]):
            raise SystemExit(
                f"segment {i}: device and host threefry rows DIVERGE — "
                "the rescore corpus would not match the chip"
            )
    host_cache["rows"] = None  # free the 2 GB segment buffer

    @jax.jit
    def make_queries(key):
        q = jax.random.normal(key, (q_n, d), jnp.float32)
        return q / jnp.linalg.norm(q, axis=1, keepdims=True)

    @partial(jax.jit, static_argnames=("kk",))
    def search_seg(q, qk, c, ck, cs, kk):
        return masked_sim_topk(q, qk, c, ck, kk, corpus_scales=cs,
                               int8_mxu=not int4)

    def sweep(q, qk, kk):
        vs, is_ = [], []
        off = 0
        for p, (cs, ck) in zip(parts, seg_meta):
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

    qs = make_queries(jax.random.PRNGKey(7))
    qk = jnp.zeros((q_n,), jnp.int32)
    q_np = np.asarray(qs)

    results = {"metric": "refined_search_capacity",
               "precision": prec, "refine_store": store_mode,
               "corpus_millions": round(n / 1e6, 2),
               "q": q_n, "k": k, "d": d,
               "corpus_build_s": round(build_s, 1),
               "refine_disk_gb": round(
                   n * d * np.dtype(store_dt).itemsize / 2**30, 1),
               "points": []}

    # baseline: plain int8 search at kk=k (scalar-sync, matching
    # bench_capacity's measurement discipline)
    v, i = sweep(qs, qk, k)
    _ = float(jnp.sum(v))
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        v, i = sweep(qs, qk, k)
    _ = float(jnp.sum(v))
    base_qps = q_n * iters / (time.perf_counter() - t0)
    results["baseline_unrefined_qps"] = round(base_qps, 1)

    for R in factors:
        kk = min(k * R, REFINE_MAX_STREAM_K, n)
        # warm the executables
        vd, idd = sweep(qs, qk, kk)
        _ = float(jnp.sum(vd))

        # END-TO-END refined search: device sweep -> candidate fetch ->
        # exact host rescore (the production search() sequence)
        t0 = time.perf_counter()
        dev_s = fetch_s = rescore_s = 0.0
        for _ in range(iters):
            t1 = time.perf_counter()
            vd, idd = sweep(qs, qk, kk)
            _ = float(jnp.sum(vd))  # scalar sync: device work done
            t2 = time.perf_counter()
            idx = np.asarray(idd)
            vals = np.asarray(vd)
            t3 = time.perf_counter()
            rv, ri = _refine_rescore(q_np, vals, idx, corpus, k)
            t4 = time.perf_counter()
            dev_s += t2 - t1
            fetch_s += t3 - t2
            rescore_s += t4 - t3
        total = time.perf_counter() - t0
        checks = bool(np.isfinite(rv).all()) and bool((ri >= 0).all())
        results["points"].append({
            "refine": R, "overfetch_k": kk,
            "end_to_end_qps": round(q_n * iters / total, 1),
            "device_sweep_qps": round(q_n * iters / dev_s, 1),
            "candidate_fetch_s_per_iter": round(fetch_s / iters, 3),
            "host_rescore_s_per_iter": round(rescore_s / iters, 4),
            "sane": checks,
        })

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()

"""Per-step HBM bandwidth matrix for the IVF probed-search kernel.

Round-3 on-chip sweeps showed the int8 DEQUANT path streaming packed
blocks at ~27 GB/s/step while the fp32 path streams at ~170 GB/s — an
anomaly worth isolating before trusting the int8 capacity story. This
drives :func:`ivf_probe_topk` raw (no IVFIndex build) over a full-union
sweep and times each cell of the matrix

    dtype in {fp32, int8 (dequant), int8_mxu}  x  uids in {seq, shuffled}

so the two candidate causes separate:
  * if int8-seq is as slow as int8-shuffled, the scalar-prefetch DMA
    pattern is innocent and the VPU dequant (C x D int8->fp32 convert +
    multiply per step, serialized before the MXU matmul) is the cost;
  * if only shuffled is slow, the dynamic index_map defeats the DMA
    pipeline for narrow int8 blocks.

Every operand is device-generated and passed as a jit argument (relay
discipline: no captured constants). Per-step GB/s = block bytes x
num_union / dispatch time.

Usage: python benchmarks/prof_ivf_bw.py [n_lists] [capacity] [d] [reps]
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpualign.ops.pallas_kernels import ivf_probe_topk

    n_lists = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    capacity = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    d = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    block_q = 32
    k = 10
    rows = (n_lists + 1) * capacity  # +1: the trailing padding block

    @jax.jit
    def make(key):
        kq, kc = jax.random.split(key)
        queries = jax.random.normal(kq, (block_q, d), jnp.float32)
        queries /= jnp.linalg.norm(queries, axis=1, keepdims=True)
        emb = jax.random.normal(kc, (rows, d), jnp.float32)
        emb /= jnp.linalg.norm(emb, axis=1, keepdims=True)
        s = jnp.maximum(
            jnp.max(jnp.abs(emb), axis=1, keepdims=True) / 127.0, 1e-12
        )
        emb8 = jnp.clip(jnp.rint(emb / s), -127, 127).astype(jnp.int8)
        keys = jnp.zeros((1, rows), jnp.int32)
        return queries, emb, emb8, s[:, 0], keys

    queries, emb, emb8, scales, pkeys = make(jax.random.PRNGKey(0))
    qk = jnp.full((block_q, 1), -3, jnp.int32)  # wildcard
    probes = jnp.tile(jnp.arange(n_lists, dtype=jnp.int32)[None, :],
                      (block_q, 1))
    uids_seq = np.arange(n_lists, dtype=np.int32)
    uids_shuf = np.random.default_rng(0).permutation(uids_seq)
    float(jnp.sum(queries[0]))  # sync generation

    def run_fn(int8: bool, mxu: bool):
        @jax.jit
        def go(uids, queries, probes, emb, emb8, scales, pkeys, qk):
            return ivf_probe_topk(
                queries, qk, probes, uids,
                emb8 if int8 else emb, pkeys, k, capacity, n_lists,
                block_q=block_q,
                packed_scales=scales if int8 else None,
                int8_mxu=mxu,
            )
        return go

    step_bytes = capacity * d  # int8; x4 for fp32
    for name, int8, mxu in (("fp32", False, False),
                            ("int8_dequant", True, False),
                            ("int8_mxu", True, True)):
        go = run_fn(int8, mxu)
        for order, uids_np in (("seq", uids_seq), ("shuffled", uids_shuf)):
            uids = jnp.asarray(uids_np)
            out = go(uids, queries, probes, emb, emb8, scales, pkeys, qk)
            float(jnp.sum(out[0][:, 0]))  # compile + drain
            t0 = time.perf_counter()
            for _ in range(reps):
                out = go(uids, queries, probes, emb, emb8, scales,
                         pkeys, qk)
            float(jnp.sum(out[0][:, 0]))  # scalar-fetch sync
            dt = (time.perf_counter() - t0) / reps
            bytes_total = step_bytes * (4 if not int8 else 1) * n_lists
            print(json.dumps({
                "metric": "ivf_step_bw", "path": name, "uids": order,
                "n_lists": n_lists, "capacity": capacity, "d": d,
                "dispatch_ms": round(dt * 1e3, 3),
                "gb_per_s": round(bytes_total / dt / 1e9, 1),
                "us_per_step": round(dt / n_lists * 1e6, 1),
            }), flush=True)


if __name__ == "__main__":
    main()

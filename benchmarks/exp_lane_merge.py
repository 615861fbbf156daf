"""REJECTED experiment: per-lane running top-k merge for the streaming
sweep kernels.

Hypothesis: `_merge_running_topk` extracts winners with k argmax passes
ALONG THE LANE AXIS (block_n sits on lanes), i.e. cross-lane shuffle
trees, and the corpus-scale sweep measures merge-bound (~8% of both MXU
and HBM peak; block_n 4096 -> 6144 scaled us/step linearly, so per-step
fixed cost is NOT the bound). Keeping a (Qb, k, 128) PER-LANE top-k —
lane l owns columns congruent to l mod 128 — moves every merge
reduction onto the slot/row axis (sublanes, no lane shuffles) and is
still EXACT: a global top-k element has at most k-1 elements above it
anywhere, hence at most k-1 in its own lane, so the once-per-query-block
cross-lane extraction at emit recovers the exact two-key
(value desc, index asc) ranking.

Measured on v5e (2026-08-18, k=10, d=512, bit-identical outputs in
every regime — the math is right, the speed is not):

| regime                      | classic QPS | lane QPS | lane/classic |
|-----------------------------|------------|----------|--------------|
| fp32  N=100k  Q=1024        | 89,104     | 64,791   | 0.73x        |
| fp32  N=2M    Q=256         | 7,781      | 4,389    | 0.56x        |
| int8mxu N=2M  Q=256         | 10,734     | 6,862    | 0.64x        |
| int4  N=2M    Q=256         | 11,722     | 6,982    | 0.60x        |

Verdict: REJECTED — Mosaic's lane-axis argmax/max reductions are
evidently well-optimized, and the 3D (Qb, k+G, 128) candidate tensors
(concats + relayouts + sublane-axis min/max emulating argmax) cost more
than the shuffle trees they replace. The classic merge stays.

This script re-runs the exactness property test (pure JAX, adversarial
ties) and a standalone fp32 kernel A/B so the result can be re-checked
on future Mosaic versions without re-wiring the production kernels.
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpualign.ops.pallas_kernels import (
    NEG_INF, SENTINEL_IDX, WILDCARD_KEY, _interpret, _merge_running_topk,
)

LANES = 128
_IDX_BIG = 2**31 - 1


def _merge_lanes(run_vals, run_idx, sims, col0, k: int):
    qb, nb = sims.shape
    g = nb // LANES
    sims3 = sims.reshape(qb, g, LANES)
    idx3 = (col0
            + jax.lax.broadcasted_iota(jnp.int32, (qb, g, LANES), 1) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (qb, g, LANES), 2))
    cand_v = jnp.concatenate([run_vals, sims3], axis=1)
    cand_i = jnp.concatenate([run_idx, idx3], axis=1)
    rows = k + g
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (qb, rows, LANES), 1)
    out_v, out_i = [], []
    for _ in range(k):
        m = jnp.max(cand_v, axis=1)
        eq = cand_v == m[:, None, :]
        first = jnp.min(jnp.where(eq, row_iota, _IDX_BIG), axis=1)
        sel = eq & (row_iota == first[:, None, :])
        out_v.append(m[:, None, :])
        out_i.append(jnp.min(jnp.where(sel, cand_i, _IDX_BIG),
                             axis=1)[:, None, :])
        cand_v = jnp.where(sel, NEG_INF, cand_v)
    return jnp.concatenate(out_v, axis=1), jnp.concatenate(out_i, axis=1)


def _emit_lanes(run_vals, run_idx, k: int):
    qb = run_vals.shape[0]
    cv = run_vals.reshape(qb, k * LANES)
    ci = run_idx.reshape(qb, k * LANES)
    out_v, out_i = [], []
    for _ in range(k):
        m = jnp.max(cv, axis=1)
        eq = cv == m[:, None]
        best_i = jnp.min(jnp.where(eq, ci, _IDX_BIG), axis=1)
        sel = eq & (ci == best_i[:, None])
        out_v.append(m[:, None])
        out_i.append(best_i[:, None])
        cv = jnp.where(sel, NEG_INF, cv)
    return jnp.concatenate(out_v, axis=1), jnp.concatenate(out_i, axis=1)


def _kernel(q_ref, qk_ref, c_ref, ck_ref, vals_ref, idx_ref,
            run_vals, run_idx, *, k, block_n, num_n, lane):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _reset():
        run_vals[:] = jnp.full_like(run_vals, NEG_INF)
        run_idx[:] = jnp.full_like(run_idx, jnp.int32(SENTINEL_IDX))

    sims = jnp.dot(q_ref[:], c_ref[:].T, preferred_element_type=jnp.float32)
    mask = ((qk_ref[:] == ck_ref[:]) | (qk_ref[:] == WILDCARD_KEY)) \
        & (ck_ref[:] >= 0)
    sims = jnp.where(mask, sims, NEG_INF)
    qb = sims.shape[0]
    if lane:
        nv, ni = _merge_lanes(run_vals[:], run_idx[:], sims,
                              j * block_n, k)
    else:
        col = (jax.lax.broadcasted_iota(jnp.int32, (qb, block_n), 1)
               + j * block_n)
        nv, ni = _merge_running_topk(run_vals[:], run_idx[:], sims, col, k)
    run_vals[:] = nv
    run_idx[:] = ni

    @pl.when(j == num_n - 1)
    def _emit():
        if lane:
            v, i = _emit_lanes(run_vals[:], run_idx[:], k)
            vals_ref[:] = v
            idx_ref[:] = i
        else:
            vals_ref[:] = run_vals[:]
            idx_ref[:] = run_idx[:]


def sweep(q, qk, c, ck, k, block_q=128, block_n=2048, lane=False):
    nq, d = q.shape
    n = c.shape[0]
    num_q, num_n = nq // block_q, n // block_n
    scratch = ([pltpu.VMEM((block_q, k, LANES), jnp.float32),
                pltpu.VMEM((block_q, k, LANES), jnp.int32)] if lane else
               [pltpu.VMEM((block_q, k), jnp.float32),
                pltpu.VMEM((block_q, k), jnp.int32)])
    return pl.pallas_call(
        functools.partial(_kernel, k=k, block_n=block_n, num_n=num_n,
                          lane=lane),
        grid=(num_q, num_n),
        in_specs=[
            pl.BlockSpec((block_q, d), lambda i, j: (i, 0)),
            pl.BlockSpec((block_q, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((block_n, d), lambda i, j: (j, 0)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
        ],
        out_specs=[pl.BlockSpec((block_q, k), lambda i, j: (i, 0)),
                   pl.BlockSpec((block_q, k), lambda i, j: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((nq, k), jnp.float32),
                   jax.ShapeDtypeStruct((nq, k), jnp.int32)],
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(q, qk[:, None], c, ck[None, :])


def main():
    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() == "tpu"
    # exactness (adversarial ties), interpret or compiled
    nq, n, d, k = 128, 8192, 64, 10
    q = rng.normal(size=(nq, d)).astype(np.float32)
    c = np.round(rng.normal(size=(n, d)) * 2).astype(np.float32) / 2
    qk = np.full(nq, -3, np.int32)
    ck = np.zeros(n, np.int32)
    a = sweep(jnp.asarray(q), jnp.asarray(qk), jnp.asarray(c),
              jnp.asarray(ck), k, lane=False)
    b = sweep(jnp.asarray(q), jnp.asarray(qk), jnp.asarray(c),
              jnp.asarray(ck), k, lane=True)
    assert (np.asarray(a[1]) == np.asarray(b[1])).all()
    assert (np.asarray(a[0]) == np.asarray(b[0])).all()
    print("exactness: lane == classic (bit-identical)")
    if not on_tpu:
        return

    n = 2_000_000
    c = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.float32)
    ck = jnp.zeros((n,), jnp.int32)
    qj = jnp.asarray(q)
    qkj = jnp.asarray(qk)
    run = jax.jit(functools.partial(sweep, k=k), static_argnames=("lane",))
    for lane in (False, True):
        v, i = run(qj, qkj, c, ck, lane=lane)
        _ = float(jnp.sum(v))
        t0 = time.perf_counter()
        for _ in range(5):
            v, i = run(qj, qkj, c, ck, lane=lane)
        _ = float(jnp.sum(v))
        dt = (time.perf_counter() - t0) / 5
        print(json.dumps({"lane": lane, "n": n, "q": nq,
                          "qps": round(nq / dt, 1)}))


if __name__ == "__main__":
    main()

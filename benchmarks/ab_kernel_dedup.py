"""Same-process A/B: the pre-dedup per-precision kernel bodies vs the
template-generated kernels (r4 dedup, VERDICT r3 weak #5).

The old ops/pallas_kernels.py is materialized from git (default: the
dedup commit's parent) and imported as a shadow module, so both
generations compile and run interleaved in ONE process on the same
device arrays — throttle-safe relative timings plus bit-identity
checks on every arm.

Arms (PERFORMANCE.md benchmark points):
  exact fp32      N=100k  Q=1024 k=10   (the block_n sweep point)
  exact int8 MXU  N=2M    Q=256  k=10   (the s8xs8 routing point)
  exact int4      N=2M    Q=256  k=10
  IVF  int8 MXU   2M packed rows, Q=32 P=8 (the serving regime)

Usage: python benchmarks/ab_kernel_dedup.py [old_git_ref]
"""

from __future__ import annotations

import importlib.util
import json
import subprocess
import sys
import tempfile
import time


def load_old(ref: str):
    src = subprocess.run(
        ["git", "show", f"{ref}:tpualign/ops/pallas_kernels.py"],
        capture_output=True, text=True, check=True, cwd="/root/repo",
    ).stdout
    with tempfile.NamedTemporaryFile(
        "w", suffix="_old_kernels.py", delete=False
    ) as f:
        f.write(src)
        path = f.name
    spec = importlib.util.spec_from_file_location("old_pallas_kernels", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def timed(fn, sync, iters=3):
    """Relay-safe timing: block_until_ready does not wait through the
    axon relay, so the clock stops only after a SCALAR data fetch that
    depends on the last result (the repo-wide measurement discipline)."""
    out = fn()  # warm/compile
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters, out


def main() -> None:
    ref = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
    old = load_old(ref)

    import jax
    import jax.numpy as jnp
    import numpy as np

    import tpualign.ops.pallas_kernels as new

    d = 512
    results = []

    def sync(out):
        return float(jnp.sum(out[0]))

    def run_pair(name, make_fn):
        """make_fn(mod) -> zero-arg jitted closure returning (vals, idx)."""
        f_old, f_new = make_fn(old), make_fn(new)
        # interleave: old, new, old, new — throttle lands on both
        t_old1, out_old = timed(f_old, sync)
        t_new1, out_new = timed(f_new, sync)
        t_old2, _ = timed(f_old, sync)
        t_new2, _ = timed(f_new, sync)
        identical = (np.array_equal(np.asarray(out_old[0]),
                                    np.asarray(out_new[0]))
                     and np.array_equal(np.asarray(out_old[1]),
                                        np.asarray(out_new[1])))
        t_old = min(t_old1, t_old2)
        t_new = min(t_new1, t_new2)
        results.append({
            "arm": name,
            "old_s": round(t_old, 4), "new_s": round(t_new, 4),
            "new_vs_old": round(t_old / t_new, 3),
            "bit_identical": bool(identical),
        })
        print(json.dumps(results[-1]), flush=True)

    key = jax.random.PRNGKey(0)
    on_tpu = jax.default_backend() == "tpu"

    # ---- exact fp32: N=100k, Q=1024 --------------------------------------
    n, q_n, k = (100_000, 1024, 10) if on_tpu else (5_000, 64, 10)
    c = jax.random.normal(key, (n, d), jnp.float32)
    c = c / jnp.linalg.norm(c, axis=1, keepdims=True)
    q = jax.random.normal(jax.random.PRNGKey(1), (q_n, d), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    qk = jnp.zeros((q_n,), jnp.int32)
    ck = jnp.zeros((n,), jnp.int32)

    def mk_fp32(mod):
        fn = jax.jit(lambda a, b, cc, dd: mod.masked_sim_topk(a, b, cc, dd, k))
        return lambda: fn(q, qk, c, ck)

    run_pair("exact_fp32_100k_q1024", mk_fp32)
    del c

    # ---- exact int8 MXU + int4: N=2M, Q=256 ------------------------------
    n, q_n = (2_000_000, 256) if on_tpu else (10_000, 32)
    c8 = jax.random.randint(key, (n, d), -127, 128, jnp.int8)
    cs = jnp.full((n,), 1.0 / 127.0, jnp.float32)
    ck = jnp.zeros((n,), jnp.int32)
    q = jax.random.normal(jax.random.PRNGKey(2), (q_n, d), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    qk = jnp.zeros((q_n,), jnp.int32)

    def mk_int8(mod):
        fn = jax.jit(lambda a, b, cc, dd, ss: mod.masked_sim_topk(
            a, b, cc, dd, k, corpus_scales=ss, int8_mxu=True))
        return lambda: fn(q, qk, c8, ck, cs)

    run_pair("exact_int8mxu_2m_q256", mk_int8)
    del c8

    b4 = jax.random.randint(key, (n, d // 2, 2), 1, 16, jnp.uint8)
    c4 = b4[..., 0] | (b4[..., 1] << 4)
    del b4

    def mk_int4(mod):
        fn = jax.jit(lambda a, b, cc, dd, ss: mod.masked_sim_topk(
            a, b, cc, dd, k, corpus_scales=ss))
        return lambda: fn(q, qk, c4, ck, cs)

    run_pair("exact_int4_2m_q256", mk_int4)
    del c4, ck, cs

    # ---- IVF int8 MXU: 2M packed rows, Q=32, P=8 -------------------------
    n_lists, capacity, q_n, probes_n = (
        (512, 4096, 32, 8) if on_tpu else (16, 128, 32, 4))
    rows = (n_lists + 1) * capacity  # + trailing zero/pad block
    pe = jax.random.randint(key, (rows, d), -127, 128, jnp.int8)
    pk = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, rows), 1)
        < n_lists * capacity, 0, -1)
    ps = jnp.full((rows,), 1.0 / 127.0, jnp.float32)
    q = jax.random.normal(jax.random.PRNGKey(3), (64, d), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    qkeys = jnp.concatenate([
        jnp.full((q_n, 1), -3, jnp.int32),
        jnp.full((64 - q_n, 1), -2, jnp.int32)])
    pr = jax.random.randint(
        jax.random.PRNGKey(4), (64, probes_n), 0, n_lists, jnp.int32)
    uids_np = np.unique(np.asarray(pr[:q_n]).ravel())
    pad = 8 * ((len(uids_np) + 7) // 8) - len(uids_np)
    uids = jnp.asarray(
        np.concatenate([uids_np, np.full(pad, n_lists, np.int64)])
        .astype(np.int32))

    def mk_ivf(mod):
        fn = jax.jit(lambda qq, qks, prr, uu, em, km, ss: mod.ivf_probe_topk(
            qq, qks, prr, uu, em, km, k, capacity, n_lists,
            packed_scales=ss, int8_mxu=True))
        return lambda: fn(q, qkeys, pr, uids, pe, pk, ps)

    run_pair("ivf_int8mxu_2m_q32_p8", mk_ivf)

    print(json.dumps({"metric": "kernel_dedup_ab", "old_ref": ref,
                      "arms": results}), flush=True)


if __name__ == "__main__":
    main()

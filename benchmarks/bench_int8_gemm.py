"""Microbenchmark: int8 vs bf16 MLP-stack throughput at CLIP tower shapes.

Decides whether an int8 serving path for the towers is worth building:
v5e's MXU rates int8 at 2x bf16 (394 vs 197 TOP/s peak), but only if XLA
lowers the int8 ``dot_general`` onto it AND the dynamic-quantization
overhead (per-row activation absmax, rounding, dequant scaling) doesn't
eat the gain.

Methodology: isolated GEMMs are useless to time here — the relay adds a
~25 ms scalar-readback roundtrip and XLA dead-code-eliminates any GEMM
whose output is only partially consumed. So this measures the real
pattern: a REPEAT-deep chained MLP stack (fc: d->4d, gelu, proj: 4d->d,
output feeds the next repeat), one scalar fetch at the end. Per repeat =
2 GEMMs = 2*2*M*d*4d FLOPs, exactly the tower's MLP workload.

Run on the real chip: ``python benchmarks/bench_int8_gemm.py [M] [d]``.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

REPEAT = 16
ITERS = 10


def main() -> None:
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 25600  # B=512, T=50
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 768    # ViT-B-32 vision
    h = 4 * d

    x0 = jax.random.normal(jax.random.PRNGKey(0), (m, d), jnp.float32)
    w_fc = jax.random.normal(jax.random.PRNGKey(1), (d, h), jnp.float32) * 0.02
    w_pr = jax.random.normal(jax.random.PRNGKey(2), (h, d), jnp.float32) * 0.02

    def gelu(x):
        return x * jax.nn.sigmoid(1.702 * x)

    @jax.jit
    def mlp_bf16(x, w_fc, w_pr):
        a, b = w_fc.astype(jnp.bfloat16), w_pr.astype(jnp.bfloat16)
        for _ in range(REPEAT):
            y = jnp.dot(x.astype(jnp.bfloat16), a, preferred_element_type=jnp.float32)
            y = gelu(y)
            x = jnp.dot(y.astype(jnp.bfloat16), b, preferred_element_type=jnp.float32)
        return jnp.sum(x[0, :8])

    def quant_w(w):
        s = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
        return jnp.round(w / s).astype(jnp.int8), s

    def qdot(x, wq, w_s):
        x_s = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0, 1e-8)
        xq = jnp.round(x / x_s).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return acc.astype(jnp.float32) * (x_s * w_s)

    @jax.jit
    def mlp_int8(x, w_fc, w_pr):
        qa, sa = quant_w(w_fc)
        qb, sb = quant_w(w_pr)
        for _ in range(REPEAT):
            y = gelu(qdot(x, qa, sa))
            x = qdot(y, qb, sb)
        return jnp.sum(x[0, :8])

    def timed(fn, *args) -> float:
        float(fn(*args))  # compile + sync
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(ITERS)]
        acc = outs[0]
        for o in outs[1:]:
            acc = acc + o
        float(acc)  # one barrier
        return (time.perf_counter() - t0) / (ITERS * REPEAT)

    flops = 2 * (2.0 * m * d * h)  # two GEMMs per repeat
    t_bf = timed(mlp_bf16, x0, w_fc, w_pr)
    t_i8 = timed(mlp_int8, x0, w_fc, w_pr)
    print(
        f"MLP stack M={m} d={d}: bf16 {t_bf * 1e6:7.1f}us/block "
        f"({flops / t_bf / 1e12:6.1f} TF/s) | int8 dyn {t_i8 * 1e6:7.1f}us/block "
        f"({flops / t_i8 / 1e12:6.1f} TOP/s) | speedup {t_bf / t_i8:4.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()

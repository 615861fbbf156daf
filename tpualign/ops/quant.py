"""Dynamic int8 quantized matmul for the tower serving path.

v5e's MXU rates int8 at 2x bf16 (394 vs 197 TOP/s peak); measured on the
chained ViT-B-32 MLP stack the full dynamically-quantized pipeline (this
module) runs 1.61x over the bf16 path (benchmarks/bench_int8_gemm.py).

Scheme — the standard dynamic W8A8 recipe (LLM.int8()/SmoothQuant family,
see PAPERS.md):

- weights: symmetric per-OUTPUT-channel absmax scales, quantized in-jit
  from the canonical fp32 params (one elementwise pass per forward —
  amortized noise vs the GEMM; keeping params fp32 means the checkpoint
  loader, TP sharding rules, and orbax checkpoints are untouched);
- activations: symmetric per-ROW (per-token) absmax scales, computed
  dynamically — robust to the per-sample dynamic range of LayerNormed
  transformer activations;
- GEMM: int8 x int8 -> int32 accumulate (``preferred_element_type``), then
  a rank-1 dequant ``acc * (row_scale x col_scale)`` that XLA fuses into
  the epilogue.

``int8_dot`` is inference-only: ``jnp.round`` has zero gradient, so the
training step refuses ``quant="int8"`` models rather than silently
producing dead gradients. ``int8_dot_qat`` is the trainable surrogate —
quantization-aware training (QAT) with the straight-through estimator:
the forward pass rounds on the same int8 grid, the backward pass treats
both quantizers as identity, so a fine-tune under ``quant="int8_qat"``
adapts the weights to the quantization noise they will serve under
(``CLIP_QUANT=int8``).

This is the reference-free part of the design: the reference serves fp32
torch towers one item at a time (ref:src/insert_clip_embeddings.py:91-141)
and has no quantization story.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["quantize_weight", "int8_dot", "int8_dot_qat"]


def _ste(real: jnp.ndarray, quantized: jnp.ndarray) -> jnp.ndarray:
    """Straight-through estimator: forward = ``quantized``, backward =
    identity on ``real`` (the whole quantize-dequantize residual is
    stop-gradient'd)."""
    return real + jax.lax.stop_gradient(quantized - real)


def int8_dot_qat(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """QAT surrogate of :func:`int8_dot`: same rounding grid forward,
    straight-through gradients backward.

    The forward value matches ``int8_dot`` up to fp32-accumulation
    rounding (the integer products are exactly representable in fp32;
    only the summation order differs — pinned ~1e-3 relative by test).
    Speed is NOT the point here: QAT runs at fp32-dot cost during
    training so the exported weights serve faster and closer to the fp32
    ranking under ``quant="int8"``.
    """
    w = kernel.astype(jnp.float32)
    w_s = jnp.maximum(
        jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0, 1e-12)
    w_fq = _ste(w, jnp.round(w / w_s) * w_s)
    xf = x.astype(jnp.float32)
    x_s = jnp.maximum(
        jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-12)
    x_fq = _ste(xf, jnp.round(xf / x_s) * x_s)
    out = jax.lax.dot_general(
        x_fq,
        w_fq,
        (((x_fq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias
    out_dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    return out.astype(out_dtype)


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8 quantization of a (K, N) kernel.

    Returns ``(w_q int8 (K, N), scales fp32 (1, N))`` with
    ``w ~= w_q * scales``.
    """
    w = w.astype(jnp.float32)
    scales = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    scales = jnp.maximum(scales, 1e-12)  # all-zero columns
    w_q = jnp.round(w / scales).astype(jnp.int8)
    return w_q, scales


def int8_dot(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """``x @ kernel (+ bias)`` on the int8 MXU path, fp32 in/out.

    ``x``: (..., K) activations (any float dtype); ``kernel``: (K, N) fp32
    canonical weights, quantized here (in-jit, per call — cheap relative to
    the GEMM and keeps one source of truth for the params).
    """
    w_q, w_s = quantize_weight(kernel)
    # absmax on the input's own dtype (half the read bytes for bf16
    # residual streams); the scale itself is fp32.
    x_s = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32) / 127.0
    x_s = jnp.maximum(x_s, 1e-12)  # all-zero rows (e.g. padding tokens)
    x_q = jnp.round(x.astype(jnp.float32) / x_s).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q,
        w_q,
        (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (x_s * w_s)  # rank-1 epilogue dequant
    if bias is not None:
        out = out + bias
    # hand back the caller's stream dtype so XLA writes the (large)
    # activation once at stream width instead of materializing fp32
    out_dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    return out.astype(out_dtype)

"""Fused short-sequence multi-head attention (Pallas TPU kernel).

CLIP's sequences are tiny (50 vision tokens, 77 text tokens), so the XLA
attention path — per-head batched (T, hd, T) einsums with fp32 (B, H, T, T)
logits materialized in HBM plus layout transposes — costs ~6x its FLOP share
on v5e (measured: 213 ms vs the 34 ms GEMM floor at B=2048, see
bench notes). This kernel keeps a whole batch block's QKV in VMEM and runs
scores -> softmax -> context per head without touching HBM in between: HBM
traffic is one read of QKV and one write of the context block.

Supports an optional additive attention mask (the text tower's causal mask).
Numerics match the XLA path: fp32 logits/softmax, bf16 context matmul.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_mha"]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _mha_kernel(qkv_ref, mask_ref, out_ref, *, num_heads: int, head_dim: int,
                width: int, scale: float):
    mask = mask_ref[0] if mask_ref is not None else None  # (T, T) additive
    for h in range(num_heads):
        q = qkv_ref[:, :, h * head_dim:(h + 1) * head_dim]
        k = qkv_ref[:, :, width + h * head_dim: width + (h + 1) * head_dim]
        v = qkv_ref[:, :, 2 * width + h * head_dim: 2 * width + (h + 1) * head_dim]
        # (bb, T, T) fp32 scores, batched over the block dim
        scores = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        if mask is not None:
            scores = scores + mask[None]
        probs = jax.nn.softmax(scores, axis=-1).astype(qkv_ref.dtype)
        ctx = jax.lax.dot_general(
            probs, v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        out_ref[:, :, h * head_dim:(h + 1) * head_dim] = ctx.astype(out_ref.dtype)


def _auto_block_b(t: int, d: int, itemsize: int = 2,
                  budget: int = 12 * 2**20) -> int:
    """Largest batch block whose VMEM working set fits the scoped budget.

    Per batch row the kernel holds: the QKV input block and the context
    output block (both double-buffered by the pipeline) plus the fp32
    per-head score matrix. v5e's scoped-vmem limit is 16 MB; a 12 MB
    budget keeps the measured-fastest block_b=16 at ViT-B shapes while
    sizing down for the long-sequence/wide towers (ViT-L/H-14: T=257,
    D>=1024 — block_b=16 there allocates 66 MB and fails the compile)."""
    per_row = t * 3 * d * itemsize * 2   # qkv in, double-buffered
    per_row += t * d * itemsize * 2      # ctx out, double-buffered
    per_row += t * t * 4                 # fp32 scores temporary
    return max(1, min(16, budget // per_row))


def _fused_mha_impl(
    qkv: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    block_b: Optional[int] = None,
) -> jnp.ndarray:
    """Fused attention over packed QKV (forward implementation).

    Args:
      qkv: (B, T, 3*D) packed query/key/value (the fused in_proj output).
      num_heads: number of heads H; D must divide evenly.
      mask: optional additive (T, T) mask (e.g. causal -inf upper triangle),
        or (1, 1, T, T) which is squeezed.
      block_b: batch rows kept in VMEM per grid step; None (default)
        auto-sizes to the VMEM budget (16 at CLIP-B shapes — measured
        fastest on v5e — scaling down for the L/H towers).

    Returns (B, T, D) attention context (pre-out-projection).
    """
    b, t, three_d = qkv.shape
    d = three_d // 3
    hd = d // num_heads
    assert hd * num_heads == d, "width must divide heads"
    scale = 1.0 / (hd ** 0.5)

    if block_b is None:
        block_b = _auto_block_b(t, d, qkv.dtype.itemsize)
    block_b = max(1, min(block_b, b))
    pad_b = (-b) % block_b
    if pad_b:
        qkv = jnp.pad(qkv, ((0, pad_b), (0, 0), (0, 0)))
    bp = qkv.shape[0]

    if mask is not None:
        mask = mask.reshape(t, t)[None].astype(jnp.float32)  # (1, T, T)

    kernel = functools.partial(
        _mha_kernel if mask is not None else _mha_kernel_nomask,
        num_heads=num_heads, head_dim=hd, width=d, scale=scale,
    )
    in_specs = [
        pl.BlockSpec((block_b, t, three_d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qkv]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec((1, t, t), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
        )
        args.append(mask)

    out = pl.pallas_call(
        kernel,
        grid=(bp // block_b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, t, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, t, d), qkv.dtype),
        interpret=_interpret(),
    )(*args)
    return out[:b]


def _mha_kernel_nomask(qkv_ref, out_ref, *, num_heads: int, head_dim: int,
                       width: int, scale: float):
    _mha_kernel(qkv_ref, None, out_ref, num_heads=num_heads,
                head_dim=head_dim, width=width, scale=scale)


def _xla_reference_mha(qkv, num_heads, mask):
    """Plain-XLA attention with identical numerics — the backward path."""
    b, t, three_d = qkv.shape
    d = three_d // 3
    hd = d // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    rs = lambda x: x.reshape(b, t, num_heads, hd)
    q, k, v = rs(q), rs(k), rs(v)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (1.0 / (hd ** 0.5))
    if mask is not None:
        scores = scores + mask.reshape(t, t)[None, None].astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(qkv.dtype)
    ctx = jnp.einsum(
        "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
    )
    return ctx.reshape(b, t, d).astype(qkv.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 3))
def fused_mha(qkv, num_heads: int, mask=None, block_b: Optional[int] = None):
    """Differentiable fused attention: Pallas kernel forward, XLA-recompute
    backward (training runs through the plain-XLA VJP; inference — the
    throughput-critical path — gets the fused kernel)."""
    return _fused_mha_impl(qkv, num_heads, mask, block_b)


def _fused_mha_fwd(qkv, num_heads, mask, block_b):
    return _fused_mha_impl(qkv, num_heads, mask, block_b), (qkv, mask)


def _fused_mha_bwd(num_heads, block_b, residuals, g):
    qkv, mask = residuals
    if mask is None:
        _, vjp = jax.vjp(lambda q: _xla_reference_mha(q, num_heads, None), qkv)
        (dqkv,) = vjp(g)
        return dqkv, None
    _, vjp = jax.vjp(lambda q, m: _xla_reference_mha(q, num_heads, m), qkv, mask)
    dqkv, dmask = vjp(g)
    return dqkv, dmask


fused_mha.defvjp(_fused_mha_fwd, _fused_mha_bwd)

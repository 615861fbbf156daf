"""Shared transformer building blocks for the CLIP towers.

Design notes (TPU-first):

- All matmuls run in ``compute_dtype`` (bfloat16 by default) with fp32
  accumulation via ``preferred_element_type`` so they tile onto the MXU;
  LayerNorm statistics are always fp32 for stability.
- Attention is written as explicit einsums over a ``heads`` axis so tensor
  parallelism can shard heads/MLP-hidden across the ``model`` mesh axis
  (see tpualign.parallel.sharding for the partitioning rules).
- No data-dependent Python control flow: everything is trace-once/jit-safe.

Architecture matches OpenAI CLIP / OpenCLIP (the model family behind
ref:src/insert_clip_embeddings.py:37-88): pre-LN residual blocks, fused QKV
projection, GELU or QuickGELU MLP.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """QuickGELU: x * sigmoid(1.702 x) — used by OpenAI CLIP checkpoints."""
    return x * jax.nn.sigmoid(1.702 * x)


def get_activation(use_quick_gelu: bool) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if use_quick_gelu:
        return quick_gelu
    return lambda x: jax.nn.gelu(x, approximate=False)


class LayerNorm(nn.Module):
    """LayerNorm computed in fp32 regardless of compute dtype."""

    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(orig_dtype)


class MultiHeadAttention(nn.Module):
    """Fused-QKV multi-head attention (torch ``nn.MultiheadAttention`` layout).

    Parameters are stored as the fused ``in_proj`` kernel/bias plus
    ``out_proj``, mirroring the checkpoint layout of OpenCLIP so loading is a
    transpose, and keeping one large matmul for the MXU instead of three.
    """

    num_heads: int
    compute_dtype: Dtype = jnp.bfloat16
    use_fused_attention: bool = False
    quant: str = "none"  # "int8": in/out projections on the int8 MXU path

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        # x: (B, T, D)
        d = x.shape[-1]
        h = self.num_heads
        hd = d // h
        assert hd * h == d, "width must divide heads"

        in_kernel = self.param(
            "in_proj_kernel", nn.initializers.xavier_uniform(), (d, 3 * d), jnp.float32
        )
        in_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,), jnp.float32)
        out_kernel = self.param(
            "out_proj_kernel", nn.initializers.xavier_uniform(), (d, d), jnp.float32
        )
        out_bias = self.param("out_proj_bias", nn.initializers.zeros, (d,), jnp.float32)

        cdt = self.compute_dtype

        def proj(t, kernel, bias):
            if self.quant == "int8":
                from tpualign.ops.quant import int8_dot

                return int8_dot(t, kernel, bias)
            if self.quant == "int8_qat":
                from tpualign.ops.quant import int8_dot_qat

                return int8_dot_qat(t, kernel, bias)
            return (
                jnp.dot(t.astype(cdt), kernel.astype(cdt),
                        preferred_element_type=jnp.float32)
                + bias
            )

        qkv = proj(x, in_kernel, in_bias)

        if self.use_fused_attention:
            # Pallas fused kernel: scores/softmax/context stay in VMEM
            # (see tpualign.ops.pallas_attention; ~3x over the XLA path on
            # v5e at CLIP sequence lengths).
            from tpualign.ops.pallas_attention import fused_mha

            ctx = fused_mha(qkv.astype(cdt), h, mask)
            out = proj(ctx, out_kernel, out_bias)
            return out.astype(x.dtype)

        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(t.shape[0], t.shape[1], h, hd)

        q, k, v = heads(q), heads(k), heads(v)
        scale = 1.0 / jnp.sqrt(jnp.asarray(hd, jnp.float32))
        # (B, h, Tq, Tk) — accumulate logits in fp32.
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk",
            q.astype(cdt),
            k.astype(cdt),
            preferred_element_type=jnp.float32,
        ) * scale
        if mask is not None:
            logits = logits + mask
        probs = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum(
            "bhqk,bkhd->bqhd",
            probs.astype(cdt),
            v.astype(cdt),
            preferred_element_type=jnp.float32,
        )
        ctx = ctx.reshape(ctx.shape[0], ctx.shape[1], d)
        out = proj(ctx, out_kernel, out_bias)
        return out.astype(x.dtype)


class MLP(nn.Module):
    """CLIP MLP: c_fc (4x width by default) -> activation -> c_proj.

    ``hidden_dim`` overrides the 4x rule for the OpenCLIP variants whose
    MLP ratio is not 4 (ViT-g-14: 6144/1408, ViT-bigG-14: 8192/1664).
    """

    hidden_mult: int = 4
    hidden_dim: Optional[int] = None
    use_quick_gelu: bool = True
    compute_dtype: Dtype = jnp.bfloat16
    quant: str = "none"  # "int8": both GEMMs on the int8 MXU path

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        hidden = self.hidden_dim or d * self.hidden_mult
        fc_kernel = self.param(
            "c_fc_kernel", nn.initializers.xavier_uniform(), (d, hidden), jnp.float32
        )
        fc_bias = self.param("c_fc_bias", nn.initializers.zeros, (hidden,), jnp.float32)
        proj_kernel = self.param(
            "c_proj_kernel", nn.initializers.xavier_uniform(), (hidden, d), jnp.float32
        )
        proj_bias = self.param("c_proj_bias", nn.initializers.zeros, (d,), jnp.float32)

        cdt = self.compute_dtype
        act = get_activation(self.use_quick_gelu)

        def dense(t, kernel, bias):
            if self.quant == "int8":
                from tpualign.ops.quant import int8_dot

                return int8_dot(t, kernel, bias)
            if self.quant == "int8_qat":
                from tpualign.ops.quant import int8_dot_qat

                return int8_dot_qat(t, kernel, bias)
            return (
                jnp.dot(t.astype(cdt), kernel.astype(cdt),
                        preferred_element_type=jnp.float32)
                + bias
            )

        y = act(dense(x, fc_kernel, fc_bias))
        y = dense(y, proj_kernel, proj_bias)
        return y.astype(x.dtype)


class ResidualBlock(nn.Module):
    """Pre-LN transformer block: x + attn(ln_1(x)); x + mlp(ln_2(x))."""

    num_heads: int
    use_quick_gelu: bool = True
    compute_dtype: Dtype = jnp.bfloat16
    use_fused_attention: bool = False
    quant: str = "none"
    mlp_hidden: Optional[int] = None  # None = 4x width

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        x = x + MultiHeadAttention(
            num_heads=self.num_heads, compute_dtype=self.compute_dtype,
            use_fused_attention=self.use_fused_attention, quant=self.quant,
            name="attn"
        )(LayerNorm(name="ln_1")(x), mask)
        x = x + MLP(
            hidden_dim=self.mlp_hidden,
            use_quick_gelu=self.use_quick_gelu,
            compute_dtype=self.compute_dtype,
            quant=self.quant,
            name="mlp",
        )(LayerNorm(name="ln_2")(x))
        return x


class Transformer(nn.Module):
    """Stack of residual blocks with optional rematerialization.

    ``remat=True`` wraps each block in ``jax.checkpoint`` to trade FLOPs for
    HBM during fine-tuning of the large towers.
    """

    num_layers: int
    num_heads: int
    use_quick_gelu: bool = True
    compute_dtype: Dtype = jnp.bfloat16
    remat: bool = False
    use_fused_attention: bool = False
    quant: str = "none"
    mlp_hidden: Optional[int] = None  # None = 4x width

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        block_cls = ResidualBlock
        if self.remat:
            block_cls = nn.remat(ResidualBlock, static_argnums=())
        for i in range(self.num_layers):
            x = block_cls(
                num_heads=self.num_heads,
                use_quick_gelu=self.use_quick_gelu,
                compute_dtype=self.compute_dtype,
                use_fused_attention=self.use_fused_attention,
                quant=self.quant,
                mlp_hidden=self.mlp_hidden,
                name=f"resblock_{i}",
            )(x, mask)
        return x

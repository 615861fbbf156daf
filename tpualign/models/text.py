"""CLIP text tower in Flax.

Replaces ``model.encode_text`` of the reference's OpenCLIP model
(ref:src/insert_clip_embeddings.py:136-137). Fixed 77-token context, causal
attention, features taken at the EOT position (argmax of token ids, since
``<|endoftext|>`` has the largest id), then projected to ``embed_dim``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from tpualign.models.layers import LayerNorm, Transformer

Dtype = Any


def causal_mask(length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Additive (1, 1, T, T) causal mask with -inf above the diagonal."""
    mask = jnp.full((length, length), -jnp.inf, dtype=dtype)
    mask = jnp.triu(mask, k=1)
    return mask[None, None, :, :]


class TextTransformer(nn.Module):
    """CLIP text encoder producing an ``embed_dim`` projection."""

    context_length: int
    vocab_size: int
    width: int
    num_layers: int
    num_heads: int
    embed_dim: int
    use_quick_gelu: bool = True
    compute_dtype: Dtype = jnp.bfloat16
    remat: bool = False
    use_fused_attention: bool = False
    quant: str = "none"
    mlp_hidden: int | None = None  # None = 4x width

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        """token_ids: (B, T) int32, zero-padded after EOT, T <= context_length.

        T may be SHORTER than the full 77-token context: with causal
        attention, positions after EOT never influence the EOT feature, so
        truncating the pad tail produces mathematically identical
        embeddings at ~T/77 of the compute (pinned by test). The embed
        engine exploits this with length-bucketed batches.
        """
        t = token_ids.shape[1]
        if t > self.context_length:
            raise ValueError(
                f"sequence length {t} exceeds context_length="
                f"{self.context_length}"
            )
        token_embedding = self.param(
            "token_embedding",
            nn.initializers.normal(stddev=0.02),
            (self.vocab_size, self.width),
            jnp.float32,
        )
        positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=0.01),
            (self.context_length, self.width),
            jnp.float32,
        )

        x = token_embedding[token_ids].astype(self.compute_dtype)
        x = x + positional_embedding.astype(x.dtype)[None, :t]

        mask = causal_mask(t)
        x = Transformer(
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            use_quick_gelu=self.use_quick_gelu,
            compute_dtype=self.compute_dtype,
            remat=self.remat,
            use_fused_attention=self.use_fused_attention,
            quant=self.quant,
            mlp_hidden=self.mlp_hidden,
            name="transformer",
        )(x, mask)
        x = LayerNorm(name="ln_final")(x)

        # Features at the EOT token: argmax over ids. Static-shape gather,
        # jit-friendly (no dynamic control flow).
        eot_pos = jnp.argmax(token_ids, axis=-1)
        x = jnp.take_along_axis(x, eot_pos[:, None, None], axis=1)[:, 0, :]

        text_projection = self.param(
            "text_projection",
            nn.initializers.normal(stddev=self.width**-0.5),
            (self.width, self.embed_dim),
            jnp.float32,
        )
        out = jnp.dot(
            x.astype(self.compute_dtype),
            text_projection.astype(self.compute_dtype),
            preferred_element_type=jnp.float32,
        )
        return out.astype(jnp.float32)

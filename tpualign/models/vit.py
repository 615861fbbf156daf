"""CLIP vision tower (ViT) in Flax.

Replaces ``model.encode_image`` of the reference's OpenCLIP model
(ref:src/insert_clip_embeddings.py:110-111). Layout is NHWC end-to-end —
the patch embedding is a strided conv that XLA maps onto the MXU.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from tpualign.models.layers import LayerNorm, Transformer

Dtype = Any


class VisionTransformer(nn.Module):
    """ViT image encoder producing an ``embed_dim`` projection.

    Structure (OpenAI CLIP): conv patch embed (no bias) -> prepend class
    token -> add positional embedding -> ln_pre -> transformer -> ln_post on
    the class token -> linear projection (no bias).
    """

    image_size: int
    patch_size: int
    width: int
    num_layers: int
    num_heads: int
    embed_dim: int
    use_quick_gelu: bool = True
    compute_dtype: Dtype = jnp.bfloat16
    remat: bool = False
    use_fused_attention: bool = False
    quant: str = "none"
    mlp_hidden: int | None = None  # None = 4x width (g/bigG use more)

    @nn.compact
    def __call__(
        self, images: jnp.ndarray, patch_indices: jnp.ndarray | None = None
    ) -> jnp.ndarray:
        """images: (B, H, W, 3) float, already preprocessed/normalized.

        ``patch_indices``: optional (B, K) int32 indices of VISIBLE patches
        (FLIP-style masking, arXiv:2212.00794 — see PAPERS.md): the
        transformer runs on CLS + the K selected patches only, cutting
        training FLOPs ~(K/P)x while keeping shapes static for XLA.
        Inference passes None (all patches).
        """
        b = images.shape[0]
        grid = self.image_size // self.patch_size
        num_tokens = grid * grid + 1

        x = nn.Conv(
            features=self.width,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            use_bias=False,
            padding="VALID",
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            name="conv1",
        )(images.astype(self.compute_dtype))
        x = x.reshape(b, grid * grid, self.width)

        class_embedding = self.param(
            "class_embedding",
            nn.initializers.normal(stddev=self.width**-0.5),
            (self.width,),
            jnp.float32,
        )
        positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=self.width**-0.5),
            (num_tokens, self.width),
            jnp.float32,
        )
        pos = positional_embedding.astype(x.dtype)
        if patch_indices is not None:
            # gather visible patches and their positional rows (row 0 is CLS)
            x = jnp.take_along_axis(x, patch_indices[..., None], axis=1)
            patch_pos = jnp.take(pos[1:], patch_indices, axis=0)  # (B, K, W)
            cls = jnp.broadcast_to(
                class_embedding.astype(x.dtype)[None, None, :],
                (b, 1, self.width),
            ) + pos[None, :1]
            x = jnp.concatenate([cls, x + patch_pos], axis=1)
        else:
            cls = jnp.broadcast_to(
                class_embedding.astype(x.dtype)[None, None, :], (b, 1, self.width)
            )
            x = jnp.concatenate([cls, x], axis=1)
            x = x + pos[None]

        x = LayerNorm(name="ln_pre")(x)
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
        )(x)
        x = LayerNorm(name="ln_post")(x[:, 0, :])

        proj = self.param(
            "proj",
            nn.initializers.normal(stddev=self.width**-0.5),
            (self.width, self.embed_dim),
            jnp.float32,
        )
        out = jnp.dot(
            x.astype(self.compute_dtype),
            proj.astype(self.compute_dtype),
            preferred_element_type=jnp.float32,
        )
        return out.astype(jnp.float32)

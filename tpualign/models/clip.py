"""Combined CLIP model and builders.

The TPU-native counterpart of the reference's ``load_clip_model``
(ref:src/insert_clip_embeddings.py:37-88): builds the requested variant
(ViT-B-32 / ViT-L-14 / ViT-H-14, normalized names, QuickGELU iff OpenAI
pretrained), but as a pure-functional Flax module whose apply functions jit
onto TPU and batch trivially — the reference embedded one item at a time
(ref:src/insert_clip_embeddings.py:108,134); here batching is the default.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.core import FrozenDict

from tpualign.config import ClipVariant, ModelConfig
from tpualign.models.text import TextTransformer
from tpualign.models.vit import VisionTransformer

Dtype = Any


class CLIP(nn.Module):
    """Two-tower CLIP: ``encode_image`` / ``encode_text`` / joint apply."""

    variant: ClipVariant
    use_quick_gelu: bool = True
    compute_dtype: Dtype = jnp.bfloat16
    remat: bool = False
    use_fused_attention: bool = False
    quant: str = "none"  # "int8": serving-only quantized GEMMs (see ops.quant)

    def setup(self):
        v = self.variant
        self.visual = VisionTransformer(
            image_size=v.image_size,
            patch_size=v.patch_size,
            width=v.vision_width,
            num_layers=v.vision_layers,
            num_heads=v.vision_heads,
            embed_dim=v.embed_dim,
            use_quick_gelu=self.use_quick_gelu,
            compute_dtype=self.compute_dtype,
            remat=self.remat,
            use_fused_attention=self.use_fused_attention,
            quant=self.quant,
            mlp_hidden=v.vision_mlp_dim,
        )
        self.text = TextTransformer(
            context_length=v.context_length,
            vocab_size=v.vocab_size,
            width=v.text_width,
            num_layers=v.text_layers,
            num_heads=v.text_heads,
            embed_dim=v.embed_dim,
            use_quick_gelu=self.use_quick_gelu,
            compute_dtype=self.compute_dtype,
            remat=self.remat,
            use_fused_attention=self.use_fused_attention,
            quant=self.quant,
            mlp_hidden=v.text_mlp_dim,
        )
        self.logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, np.log(1.0 / 0.07), jnp.float32),
            (),
        )

    def encode_image(
        self, images: jnp.ndarray, normalize: bool = False,
        patch_indices: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        feats = self.visual(images, patch_indices)
        if normalize:
            feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return feats

    def encode_text(self, token_ids: jnp.ndarray, normalize: bool = False) -> jnp.ndarray:
        feats = self.text(token_ids)
        if normalize:
            feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return feats

    def __call__(
        self, images: jnp.ndarray, token_ids: jnp.ndarray,
        patch_indices: jnp.ndarray | None = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        img = self.encode_image(images, normalize=True, patch_indices=patch_indices)
        txt = self.encode_text(token_ids, normalize=True)
        return img, txt, jnp.exp(self.logit_scale)


def build_clip(config: ModelConfig) -> CLIP:
    """Construct the CLIP module described by a :class:`ModelConfig`.

    ``fused_attention=None`` auto-enables the Pallas fused attention kernel
    on TPU backends (it also runs, interpreted, on CPU — but slowly, so the
    XLA path is the CPU default); parity mode keeps the plain XLA path.
    """
    compute_dtype = (
        jnp.float32 if config.parity_mode else jnp.dtype(config.compute_dtype)
    )
    fused = config.fused_attention
    if fused is None:
        fused = (not config.parity_mode) and jax.default_backend() == "tpu"
    quant = "none" if config.parity_mode else config.quant
    if quant not in ("none", "int8", "int8_qat"):
        raise ValueError(f"Unknown CLIP_QUANT mode {config.quant!r}; "
                         "expected 'none', 'int8' or 'int8_qat' "
                         "(QAT: trainable straight-through surrogate)")
    return CLIP(
        variant=config.variant,
        use_quick_gelu=config.use_quick_gelu,
        compute_dtype=compute_dtype,
        remat=config.remat,
        use_fused_attention=fused,
        quant=quant,
    )


def init_clip_params(
    model: CLIP, seed: int = 0, image_batch: int = 1, text_batch: int = 1
) -> FrozenDict:
    """Random-initialize params (the deterministic 'fake tower' — replaces the
    reference's np.random.rand placeholder ladder with a seeded, testable
    no-checkpoint mode, ref:src/insert_clip_embeddings.py:250-267)."""
    v = model.variant
    images = jnp.zeros((image_batch, v.image_size, v.image_size, 3), jnp.float32)
    tokens = jnp.zeros((text_batch, v.context_length), jnp.int32)
    return model.init(jax.random.PRNGKey(seed), images, tokens)["params"]


def encode_image_fn(model: CLIP):
    """Returns a jittable (params, images) -> normalized embeddings fn."""

    def fn(params, images):
        return model.apply({"params": params}, images, normalize=True,
                           method=model.encode_image)

    return fn


def encode_text_fn(model: CLIP):
    """Returns a jittable (params, token_ids) -> normalized embeddings fn."""

    def fn(params, token_ids):
        return model.apply({"params": params}, token_ids, normalize=True,
                           method=model.encode_text)

    return fn

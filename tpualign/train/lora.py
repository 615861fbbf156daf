"""LoRA adapters for contrastive fine-tuning (arXiv:2106.09685).

Fine-tunes the CLIP towers through low-rank deltas instead of full
parameter updates: every attention/MLP kernel W (d_in, d_out) gains a
trainable pair A (d_in, r), B (r, d_out) applied as
``W + (alpha/r) * A @ B``; the base tree stays frozen. The trainable
state drops from ~1B params (H-14) to a few million — AdamW moments and
EMA shrink with it, so large-tower fine-tuning fits wherever the frozen
forward pass does. The learned temperature (``logit_scale``) stays
trainable: it rides in the adapter tree as a plain leaf that overrides
the frozen value.

Rebuild extension — the reference performs no training at all
(SURVEY.md §2; ref:src/insert_clip_embeddings.py:80-82 only loads frozen
OpenCLIP weights). TPU notes: the merge is a rank-r matmul per kernel
per step (negligible next to the tower FLOPs) and the adapter trees are
tiny, so they replicate over the mesh while the frozen base keeps the
full TP/FSDP layout.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

__all__ = ["lora_init", "lora_apply", "lora_param_count",
           "LORA_TARGET_SUFFIXES"]

# the kernels that receive adapters: every transformer block matmul
LORA_TARGET_SUFFIXES = (
    "attn/in_proj_kernel",
    "attn/out_proj_kernel",
    "mlp/c_fc_kernel",
    "mlp/c_proj_kernel",
)


def _is_target(path: str, leaf) -> bool:
    return (
        getattr(leaf, "ndim", 0) == 2
        and any(path.endswith(s) for s in LORA_TARGET_SUFFIXES)
    )


def lora_init(
    params: Dict[str, Any], rank: int, seed: int = 0
) -> Dict[str, Any]:
    """Build the trainable adapter tree for a CLIP param tree.

    Returns a sparse mirror of ``params``: each targeted kernel maps to
    ``{"a": N(0, 1/r) (d_in, r), "b": zeros (r, d_out)}`` (B=0 makes the
    initial merged model exactly the base model), plus ``logit_scale``
    copied in as a directly-trainable leaf.
    """
    if rank <= 0:
        raise ValueError(f"lora rank must be positive, got {rank}")
    # adapters are generated ON DEVICE (jax.random, one fold_in per
    # kernel): at H-14 scale the A tree is ~34 MB, which host-side numpy
    # would push through the relay at ~64 KB/s (minutes of dead time)
    key = jax.random.PRNGKey(seed)
    counter = [0]

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                sub = walk(v, f"{prefix}/{k}")
                if sub is not None:
                    out[k] = sub
            return out or None
        if _is_target(prefix, tree):
            d_in, d_out = tree.shape
            counter[0] += 1
            a = jax.random.normal(
                jax.random.fold_in(key, counter[0]), (d_in, rank),
                jnp.float32,
            ) / rank
            return {
                "a": a,
                "b": jnp.zeros((rank, d_out), jnp.float32),
            }
        return None

    lora = walk(params) or {}
    # a REAL copy, not jnp.asarray (a no-op on device arrays): the scale
    # must not alias the frozen tree's buffer, or a donated train step
    # donates the same buffer twice (TPU runtime INVALID_ARGUMENT)
    lora["logit_scale"] = jnp.array(params["logit_scale"], copy=True)
    return lora


def lora_apply(
    params: Dict[str, Any], lora: Dict[str, Any], scale: float
) -> Dict[str, Any]:
    """Merge adapters into the frozen tree: ``W + scale * A @ B``.

    Plain (non-``{a, b}``) leaves in ``lora`` — the trainable
    ``logit_scale`` — override the frozen value outright. Differentiable
    in ``lora``; the returned tree has the base tree's structure, so it
    drops into ``model.apply`` / embed / serve unchanged.
    """

    def walk(p, l):
        if isinstance(p, dict):
            return {
                k: (walk(v, l[k]) if isinstance(l, dict) and k in l else v)
                for k, v in p.items()
            }
        if isinstance(l, dict):  # {"a","b"} adapter on a kernel leaf
            return (p + scale * (l["a"] @ l["b"])).astype(p.dtype)
        return l  # direct override (logit_scale)

    return walk(params, lora)


def lora_param_count(lora: Dict[str, Any]) -> int:
    """Total trainable elements in an adapter tree."""
    return int(sum(x.size for x in jax.tree.leaves(lora)))

"""Compile checks for the large-tower configs under tensor parallelism.

Full L-14/H-14 don't fit CPU test budgets, so reduced-DEPTH variants with
the REAL widths/heads/patches exercise the same sharding rules (specs are
per-layer, so validity transfers — same rationale as
__graft_entry__.dryrun_multichip).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpualign.config import CLIP_VARIANTS, ClipVariant, TrainConfig
from tpualign.models.clip import CLIP, init_clip_params
from tpualign.parallel.mesh import create_mesh
from tpualign.train.step import create_train_state, make_sharded_train_step


def shallow(name: str, layers: int = 2) -> ClipVariant:
    v = CLIP_VARIANTS[name]
    return ClipVariant(
        name=f"{name}-shallow", embed_dim=v.embed_dim,
        image_size=56, patch_size=v.patch_size,  # 56/14=4, 56/32 != int ->
        vision_width=v.vision_width, vision_layers=layers,
        vision_heads=v.vision_heads,
        context_length=16, vocab_size=512,
        text_width=v.text_width, text_layers=layers, text_heads=v.text_heads,
    )


@pytest.mark.parametrize("name,image_size", [("ViT-L-14", 56), ("ViT-H-14", 56)])
def test_large_width_tp_step(name, image_size):
    """One sharded training step with the real L/H widths on a (2, 4) mesh
    (tp=4: H-14's 1280 width / 16 heads / 5120 MLP all divide by 4)."""
    import dataclasses

    v = dataclasses.replace(shallow(name), image_size=image_size)
    model = CLIP(variant=v, use_quick_gelu=False, compute_dtype=jnp.float32)
    params = init_clip_params(model, seed=0)

    mesh = create_mesh(2, 4)
    config = TrainConfig(batch_size=4, warmup_steps=1, total_steps=2)
    state = create_train_state(model, params, config)
    step_fn, shard_state = make_sharded_train_step(model, mesh, config)
    state = shard_state(state)

    rng = np.random.default_rng(0)
    images = rng.normal(size=(4, image_size, image_size, 3)).astype(np.float32)
    tokens = np.zeros((4, 16), np.int32)
    tokens[:, 0] = 510
    tokens[:, 1] = 511
    weak = rng.random(4).astype(np.float32)

    new_state, metrics = step_fn(state, images, tokens, weak)
    assert np.isfinite(float(metrics["loss"]))
    assert int(jax.device_get(new_state.step)) == 1


def test_all_variants_init_shapes():
    """Every registered variant initializes with consistent shapes."""
    for name, v in CLIP_VARIANTS.items():
        assert v.vision_width % v.vision_heads == 0, name
        assert v.text_width % v.text_heads == 0, name
        assert v.image_size % v.patch_size == 0, name

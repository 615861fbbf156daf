"""LoRA fine-tuning tests: adapter construction, exact-identity init,
frozen-base training, sharded parity, and self-contained checkpoints.

Rebuild extension (the reference has no training; SURVEY.md §2) —
arXiv:2106.09685 low-rank adaptation over the CLIP towers.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpualign.config import TrainConfig
from tpualign.train.lora import (
    LORA_TARGET_SUFFIXES, lora_apply, lora_init, lora_param_count,
)
from tpualign.train.step import (
    create_train_state, export_params, make_sharded_train_step, train_step,
)


@pytest.fixture()
def tiny_setup():
    from tests.test_models import tiny_model
    from tpualign.models.clip import init_clip_params

    model = tiny_model()
    return model, init_clip_params(model, seed=0)


def _batch(variant, n, rng):
    images = rng.normal(
        size=(n, variant.image_size, variant.image_size, 3)
    ).astype(np.float32)
    tokens = np.zeros((n, variant.context_length), np.int32)
    tokens[:, 0] = variant.vocab_size - 2
    tokens[:, 1] = rng.integers(1, variant.vocab_size - 2, size=n)
    tokens[:, 2] = variant.vocab_size - 1
    weak = rng.random(n).astype(np.float32)
    return images, tokens, weak


def test_lora_init_structure(tiny_setup):
    model, params = tiny_setup
    lora = lora_init(params, rank=4)
    blk = lora["visual"]["transformer"]["resblock_0"]
    # every block matmul gets an adapter
    assert set(blk) == {"attn", "mlp"}
    assert blk["attn"]["in_proj_kernel"]["a"].shape == (64, 4)
    assert blk["attn"]["in_proj_kernel"]["b"].shape == (4, 192)
    assert blk["mlp"]["c_proj_kernel"]["a"].shape == (256, 4)
    np.testing.assert_array_equal(
        np.asarray(blk["attn"]["in_proj_kernel"]["b"]), 0.0
    )
    # logit_scale rides along as a plain trainable leaf
    assert lora["logit_scale"].shape == ()
    # nothing else leaks in (no layernorms/embeddings/biases)
    n_kernels = sum(
        1 for _ in jax.tree.leaves(lora)
    )
    # 4 towers-blocks x 4 kernels x 2 (a,b) + logit_scale
    assert n_kernels == 4 * 4 * 2 + 1
    # trainable fraction is small even on the tiny model
    base_count = sum(x.size for x in jax.tree.leaves(params))
    assert lora_param_count(lora) < 0.25 * base_count


def test_lora_logit_scale_does_not_alias_base(tiny_setup):
    """The adapter tree's logit_scale must be a fresh buffer: if it
    aliases params (jnp.asarray is a no-op on device arrays), a donated
    train step donates the same buffer via BOTH state.params and
    state.frozen_params — a TPU-runtime INVALID_ARGUMENT (r3 regression,
    reproduced on chip)."""
    model, params = tiny_setup
    lora = lora_init(params, rank=4)
    assert lora["logit_scale"] is not params["logit_scale"]
    # and the donated jit actually runs
    config = TrainConfig(warmup_steps=0, total_steps=10, lora_rank=4)
    state = create_train_state(model, params, config)
    import jax as _jax

    f = _jax.jit(
        lambda s, i, t, w: train_step(s, model, i, t, w, config),
        donate_argnums=(0,),
    )
    from tests.test_models import TINY

    images, tokens, weak = _batch(TINY, 4, np.random.default_rng(9))
    _, m = f(state, jnp.asarray(images), jnp.asarray(tokens),
             jnp.asarray(weak))
    assert np.isfinite(float(m["loss"]))


def test_ema_tree_does_not_alias_params(tiny_setup):
    """Same aliasing hazard for the EMA tree (created from params at
    state init): every leaf must be a distinct buffer."""
    model, params = tiny_setup
    config = TrainConfig(warmup_steps=0, total_steps=10, ema_decay=0.99)
    state = create_train_state(model, params, config)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(state.ema_params)):
        assert a is not b


def test_zero_b_merge_is_identity(tiny_setup):
    model, params = tiny_setup
    lora = lora_init(params, rank=4)
    merged = lora_apply(params, lora, scale=4.0)
    # B = 0 => merged tree is bitwise the base (logit_scale copied in)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lora_training_decreases_loss_base_frozen(tiny_setup):
    from tests.test_models import TINY

    model, params = tiny_setup
    config = TrainConfig(learning_rate=1e-2, warmup_steps=0, total_steps=50,
                         lora_rank=4, lora_alpha=8.0)
    state = create_train_state(model, params, config)
    assert state.frozen_params is not None
    assert state.lora_scale == pytest.approx(2.0)
    # optimizer state is adapter-sized, not base-sized
    base_count = sum(x.size for x in jax.tree.leaves(params))
    opt_count = sum(
        x.size for x in jax.tree.leaves(state.opt_state)
        if hasattr(x, "size")
    )
    assert opt_count < 0.6 * base_count  # ~2 moments x adapter params

    rng = np.random.default_rng(0)
    images, tokens, weak = _batch(TINY, 8, rng)
    losses = []
    for _ in range(5):
        state, metrics = train_step(
            state, model, jnp.asarray(images), jnp.asarray(tokens),
            jnp.asarray(weak), config,
        )
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    # the frozen base never moves
    for a, b in zip(jax.tree.leaves(params),
                    jax.tree.leaves(state.frozen_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # export merges adapters into the base: differs from base, same shapes
    merged = export_params(state)
    kb = params["visual"]["transformer"]["resblock_0"]["attn"]["in_proj_kernel"]
    km = merged["visual"]["transformer"]["resblock_0"]["attn"]["in_proj_kernel"]
    assert kb.shape == km.shape
    assert np.abs(np.asarray(km) - np.asarray(kb)).max() > 0
    # merged tree runs the forward pass directly (embed/serve drop-in)
    img, txt, _ = model.apply(
        {"params": merged}, jnp.asarray(images), jnp.asarray(tokens)
    )
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(img), axis=-1), 1.0, atol=1e-5
    )


def test_lora_sharded_matches_single_device(tiny_setup):
    from tests.test_models import TINY
    from tpualign.parallel.mesh import create_mesh

    model, params = tiny_setup
    config = TrainConfig(learning_rate=1e-3, warmup_steps=0, total_steps=10,
                         lora_rank=4, lora_alpha=8.0)
    rng = np.random.default_rng(1)
    images, tokens, weak = _batch(TINY, 8, rng)

    s1 = create_train_state(model, params, config)
    s1, m1 = train_step(
        s1, model, jnp.asarray(images), jnp.asarray(tokens),
        jnp.asarray(weak), config,
    )

    mesh = create_mesh(4, 2)
    s2 = create_train_state(model, params, config)
    step_fn, shard_state = make_sharded_train_step(model, mesh, config)
    s2 = shard_state(s2)
    # frozen base takes the TP layout; adapters replicate
    fk = (s2.frozen_params["visual"]["transformer"]["resblock_0"]["attn"]
          ["in_proj_kernel"])
    assert fk.sharding.spec[1] == "model"
    ak = (s2.params["visual"]["transformer"]["resblock_0"]["attn"]
          ["in_proj_kernel"]["a"])
    assert ak.sharding.shard_shape(ak.shape) == ak.shape
    s2, m2 = step_fn(s2, images, tokens, weak)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    b1 = (s1.params["visual"]["transformer"]["resblock_0"]["attn"]
          ["in_proj_kernel"]["b"])
    b2 = (s2.params["visual"]["transformer"]["resblock_0"]["attn"]
          ["in_proj_kernel"]["b"])
    np.testing.assert_allclose(
        jax.device_get(b1), jax.device_get(b2), atol=2e-6
    )


def test_lora_checkpoint_roundtrip_and_params_load(tiny_setup, tmp_path):
    from tests.test_models import TINY
    from tpualign.train.checkpoint import (
        load_trained_params, restore_checkpoint, save_checkpoint,
    )
    from tpualign.models.clip import init_clip_params

    model, params = tiny_setup
    config = TrainConfig(learning_rate=1e-2, warmup_steps=0, total_steps=10,
                         lora_rank=4, lora_alpha=8.0)
    state = create_train_state(model, params, config)
    rng = np.random.default_rng(2)
    images, tokens, weak = _batch(TINY, 8, rng)
    state, _ = train_step(
        state, model, jnp.asarray(images), jnp.asarray(tokens),
        jnp.asarray(weak), config,
    )
    save_checkpoint(tmp_path / "ckpt", state)

    # resume restores adapters AND the frozen base
    fresh = create_train_state(
        model, init_clip_params(model, seed=9), config
    )
    restored = restore_checkpoint(tmp_path / "ckpt", fresh)
    assert restored is not None
    np.testing.assert_array_equal(
        np.asarray(restored.frozen_params["visual"]["proj"]),
        np.asarray(params["visual"]["proj"]),
    )
    b = (restored.params["visual"]["transformer"]["resblock_0"]["attn"]
         ["in_proj_kernel"]["b"])
    np.testing.assert_array_equal(
        np.asarray(b),
        np.asarray(state.params["visual"]["transformer"]["resblock_0"]
                   ["attn"]["in_proj_kernel"]["b"]),
    )

    # params-only load (embed/serve path) returns the MERGED full tree
    loaded = load_trained_params(tmp_path / "ckpt")
    merged = export_params(state)
    np.testing.assert_allclose(
        np.asarray(loaded["visual"]["transformer"]["resblock_0"]["attn"]
                   ["in_proj_kernel"]),
        np.asarray(merged["visual"]["transformer"]["resblock_0"]["attn"]
                   ["in_proj_kernel"]),
        atol=1e-7,
    )
    assert set(loaded) == set(params)


def test_lora_bf16_base(tiny_setup):
    """LORA_BASE_DTYPE=bfloat16 stores the frozen kernels/embeddings in
    bf16 (halving the dominant memory term) while vectors/scalars stay
    fp32; training still runs and the loss tracks the fp32-base arm."""
    from tests.test_models import TINY

    model, params = tiny_setup
    cfg32 = TrainConfig(learning_rate=1e-3, warmup_steps=0, total_steps=10,
                        lora_rank=4, lora_alpha=8.0)
    cfg16 = TrainConfig(learning_rate=1e-3, warmup_steps=0, total_steps=10,
                        lora_rank=4, lora_alpha=8.0,
                        lora_base_dtype="bfloat16")
    s16 = create_train_state(model, params, cfg16)
    k = (s16.frozen_params["visual"]["transformer"]["resblock_0"]["attn"]
         ["in_proj_kernel"])
    assert k.dtype == jnp.bfloat16
    assert s16.frozen_params["logit_scale"].dtype == jnp.float32
    ln = (s16.frozen_params["visual"]["transformer"]["resblock_0"]["ln_1"]
          ["scale"])
    assert ln.dtype == jnp.float32
    # adapters themselves stay fp32 (they DO take updates)
    a = (s16.params["visual"]["transformer"]["resblock_0"]["attn"]
         ["in_proj_kernel"]["a"])
    assert a.dtype == jnp.float32

    rng = np.random.default_rng(4)
    images, tokens, weak = _batch(TINY, 8, rng)
    s32 = create_train_state(model, params, cfg32)
    s32, m32 = train_step(s32, model, jnp.asarray(images),
                          jnp.asarray(tokens), jnp.asarray(weak), cfg32)
    s16, m16 = train_step(s16, model, jnp.asarray(images),
                          jnp.asarray(tokens), jnp.asarray(weak), cfg16)
    assert np.isfinite(float(m16["loss"]))
    # bf16 base rounds the frozen weights (~1e-2 relative); the losses
    # must agree to that order, not bitwise
    assert abs(float(m16["loss"]) - float(m32["loss"])) < 0.05
    # export stays drop-in: merged kernels come back in the base dtype
    merged = export_params(s16)
    km = merged["visual"]["transformer"]["resblock_0"]["attn"]["in_proj_kernel"]
    assert km.dtype == jnp.bfloat16


def test_lora_base_dtype_rejects_unknown(tiny_setup):
    model, params = tiny_setup
    cfg = TrainConfig(lora_rank=4, lora_base_dtype="int8")
    with pytest.raises(ValueError, match="LORA_BASE_DTYPE"):
        create_train_state(model, params, cfg)


def test_lora_composes_with_grad_accum(tiny_setup):
    from tests.test_models import TINY

    model, params = tiny_setup
    rng = np.random.default_rng(3)
    images, tokens, weak = _batch(TINY, 8, rng)

    def one(accum):
        cfg = TrainConfig(learning_rate=1e-3, warmup_steps=0,
                          total_steps=10, lora_rank=4, lora_alpha=8.0,
                          grad_accum_steps=accum)
        st = create_train_state(model, params, cfg)
        st, m = train_step(
            st, model, jnp.asarray(images), jnp.asarray(tokens),
            jnp.asarray(weak), cfg,
        )
        return st, m

    s1, m1 = one(1)
    s2, m2 = one(2)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    b1 = (s1.params["visual"]["transformer"]["resblock_0"]["mlp"]
          ["c_fc_kernel"]["b"])
    b2 = (s2.params["visual"]["transformer"]["resblock_0"]["mlp"]
          ["c_fc_kernel"]["b"])
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-6)

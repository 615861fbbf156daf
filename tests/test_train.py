"""Training tests: loss math, weighting, one sharded step on the CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpualign.config import TrainConfig
from tpualign.train.loss import clip_contrastive_loss
from tpualign.train.step import (
    MAX_LOGIT_SCALE,
    create_train_state,
    make_sharded_train_step,
    train_step,
)


def unit(rng, shape):
    x = rng.normal(size=shape).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_loss_perfect_alignment_low():
    rng = np.random.default_rng(0)
    e = unit(rng, (8, 16))
    loss_aligned, m = clip_contrastive_loss(
        jnp.asarray(e), jnp.asarray(e), jnp.asarray(100.0)
    )
    shuffled = e[np.random.default_rng(1).permutation(8)]
    loss_rand, _ = clip_contrastive_loss(
        jnp.asarray(e), jnp.asarray(shuffled), jnp.asarray(100.0)
    )
    assert float(loss_aligned) < 0.01
    assert float(loss_rand) > float(loss_aligned)
    assert float(m["acc_i2t"]) == 1.0


def test_loss_matches_manual_ce():
    rng = np.random.default_rng(2)
    img, txt = unit(rng, (4, 8)), unit(rng, (4, 8))
    scale = 10.0
    loss, _ = clip_contrastive_loss(jnp.asarray(img), jnp.asarray(txt), jnp.asarray(scale))
    logits = scale * img @ txt.T
    def ce(lg):
        lg = lg - lg.max(axis=-1, keepdims=True)
        logp = lg - np.log(np.exp(lg).sum(-1, keepdims=True))
        return -logp[np.arange(4), np.arange(4)]
    want = 0.5 * (ce(logits) + ce(logits.T))
    np.testing.assert_allclose(float(loss), want.mean(), rtol=1e-5)


def test_weak_weighting_shifts_loss():
    rng = np.random.default_rng(3)
    img, txt = unit(rng, (6, 8)), unit(rng, (6, 8))
    base, _ = clip_contrastive_loss(jnp.asarray(img), jnp.asarray(txt), jnp.asarray(5.0))
    # weight mass onto the single worst pair -> loss differs from uniform
    logits = 5.0 * img @ txt.T
    per_pair_proxy = -np.diag(logits)
    w = np.zeros(6, np.float32)
    w[np.argmax(per_pair_proxy)] = 1.0
    weighted, _ = clip_contrastive_loss(
        jnp.asarray(img), jnp.asarray(txt), jnp.asarray(5.0),
        weak_scores=jnp.asarray(w), weight_temperature=0.05,
    )
    assert not np.isclose(float(weighted), float(base))
    # uniform scores = unweighted (softmax of constant = uniform)
    uniform, _ = clip_contrastive_loss(
        jnp.asarray(img), jnp.asarray(txt), jnp.asarray(5.0),
        weak_scores=jnp.full((6,), 0.7), weight_temperature=0.5,
    )
    np.testing.assert_allclose(float(uniform), float(base), rtol=1e-5)


@pytest.fixture(scope="module")
def tiny_setup():
    from tests.test_models import TINY, tiny_model
    from tpualign.models.clip import init_clip_params

    model = tiny_model()
    params = init_clip_params(model, seed=0)
    return model, params


def batch_for(variant, n, rng):
    images = rng.normal(size=(n, variant.image_size, variant.image_size, 3)).astype(np.float32)
    tokens = np.zeros((n, variant.context_length), np.int32)
    tokens[:, 0] = variant.vocab_size - 2
    tokens[:, 1] = rng.integers(1, 100, size=n)
    tokens[:, 2] = variant.vocab_size - 1
    weak = rng.random(n).astype(np.float32)
    return images, tokens, weak


def test_single_device_step_decreases_loss(tiny_setup):
    from tests.test_models import TINY

    model, params = tiny_setup
    config = TrainConfig(learning_rate=1e-3, warmup_steps=0, total_steps=100)
    state = create_train_state(model, params, config)
    rng = np.random.default_rng(0)
    images, tokens, weak = batch_for(TINY, 8, rng)

    losses = []
    for _ in range(5):
        state, metrics = train_step(
            state, model, jnp.asarray(images), jnp.asarray(tokens),
            jnp.asarray(weak), config,
        )
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()
    assert float(state.params["logit_scale"]) <= MAX_LOGIT_SCALE + 1e-6


def test_sharded_step_matches_single_device(tiny_setup):
    from tests.test_models import TINY
    from tpualign.parallel.mesh import create_mesh

    model, params = tiny_setup
    config = TrainConfig(learning_rate=1e-3, warmup_steps=0, total_steps=100)
    rng = np.random.default_rng(1)
    images, tokens, weak = batch_for(TINY, 8, rng)

    # single device
    s1 = create_train_state(model, params, config)
    s1, m1 = train_step(
        s1, model, jnp.asarray(images), jnp.asarray(tokens), jnp.asarray(weak), config
    )

    # 4x2 mesh (dp=4, tp=2)
    mesh = create_mesh(4, 2)
    s2 = create_train_state(model, params, config)
    step_fn, shard_state = make_sharded_train_step(model, mesh, config)
    s2 = shard_state(s2)
    s2, m2 = step_fn(s2, images, tokens, weak)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-3
    )
    # parameters agree after one step
    p1 = jax.device_get(s1.params["text"]["text_projection"])
    p2 = jax.device_get(s2.params["text"]["text_projection"])
    np.testing.assert_allclose(p1, p2, atol=1e-5)


class TestGradAccum:
    """Cached-feature gradient accumulation must reproduce the FULL-batch
    update exactly — not the naive microbatch-negatives loss."""

    def _one_step(self, model, params, config, images, tokens, weak,
                  patch_indices=None):
        state = create_train_state(model, params, config)
        state, metrics = train_step(
            state, model, jnp.asarray(images), jnp.asarray(tokens),
            jnp.asarray(weak), config,
            patch_indices=None if patch_indices is None
            else jnp.asarray(patch_indices),
        )
        return state, metrics

    @pytest.mark.parametrize("accum", [2, 4])
    @pytest.mark.parametrize("loss_type", ["clip", "siglip"])
    def test_matches_full_batch_update(self, tiny_setup, accum, loss_type):
        from tests.test_models import TINY

        model, params = tiny_setup
        rng = np.random.default_rng(7)
        images, tokens, weak = batch_for(TINY, 8, rng)

        base = TrainConfig(learning_rate=1e-3, warmup_steps=0,
                           total_steps=100, loss_type=loss_type)
        s_full, m_full = self._one_step(model, params, base, images, tokens, weak)
        cfg_a = TrainConfig(learning_rate=1e-3, warmup_steps=0,
                            total_steps=100, loss_type=loss_type,
                            grad_accum_steps=accum)
        s_acc, m_acc = self._one_step(model, params, cfg_a, images, tokens, weak)

        # full-batch loss (same negatives), full-batch gradient
        np.testing.assert_allclose(
            float(m_acc["loss"]), float(m_full["loss"]), rtol=1e-5)
        np.testing.assert_allclose(
            float(m_acc["grad_norm"]), float(m_full["grad_norm"]), rtol=1e-4)
        for key in ("logit_scale",):
            np.testing.assert_allclose(
                float(s_acc.params[key]), float(s_full.params[key]), atol=1e-6)
        p1 = jax.device_get(s_full.params["text"]["text_projection"])
        p2 = jax.device_get(s_acc.params["text"]["text_projection"])
        np.testing.assert_allclose(p1, p2, atol=1e-5)
        blk1 = s_full.params["visual"]["transformer"]["resblock_0"]["mlp"]
        blk2 = s_acc.params["visual"]["transformer"]["resblock_0"]["mlp"]
        for a, b in zip(jax.tree.leaves(blk1), jax.tree.leaves(blk2)):
            np.testing.assert_allclose(
                jax.device_get(a), jax.device_get(b), atol=1e-5)

    def test_with_patch_masking(self, tiny_setup):
        from tests.test_models import TINY
        from tpualign.train.step import sample_patch_indices

        model, params = tiny_setup
        rng = np.random.default_rng(9)
        images, tokens, weak = batch_for(TINY, 8, rng)
        idx = sample_patch_indices(rng, 8, TINY.num_patches, 0.5)

        base = TrainConfig(learning_rate=1e-3, warmup_steps=0, total_steps=100)
        s_full, m_full = self._one_step(
            model, params, base, images, tokens, weak, idx)
        cfg_a = TrainConfig(learning_rate=1e-3, warmup_steps=0,
                            total_steps=100, grad_accum_steps=2)
        s_acc, m_acc = self._one_step(
            model, params, cfg_a, images, tokens, weak, idx)
        np.testing.assert_allclose(
            float(m_acc["loss"]), float(m_full["loss"]), rtol=1e-5)
        p1 = jax.device_get(s_full.params["text"]["text_projection"])
        p2 = jax.device_get(s_acc.params["text"]["text_projection"])
        np.testing.assert_allclose(p1, p2, atol=1e-5)

    def test_sharded_accum_matches(self, tiny_setup):
        """Accumulation under the mesh: same update as the unsharded step."""
        from tests.test_models import TINY
        from tpualign.parallel.mesh import create_mesh

        model, params = tiny_setup
        rng = np.random.default_rng(11)
        images, tokens, weak = batch_for(TINY, 8, rng)
        cfg = TrainConfig(learning_rate=1e-3, warmup_steps=0,
                          total_steps=100, grad_accum_steps=2)
        s1, m1 = self._one_step(model, params, cfg, images, tokens, weak)

        mesh = create_mesh(4, 2)
        s2 = create_train_state(model, params, cfg)
        step_fn, shard_state = make_sharded_train_step(model, mesh, cfg)
        s2 = shard_state(s2)
        s2, m2 = step_fn(s2, images, tokens, weak)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-4)
        p1 = jax.device_get(s1.params["text"]["text_projection"])
        p2 = jax.device_get(s2.params["text"]["text_projection"])
        np.testing.assert_allclose(p1, p2, atol=1e-5)

    def test_indivisible_batch_raises(self, tiny_setup):
        from tests.test_models import TINY

        model, params = tiny_setup
        rng = np.random.default_rng(13)
        images, tokens, weak = batch_for(TINY, 6, rng)
        cfg = TrainConfig(grad_accum_steps=4)
        state = create_train_state(model, params, cfg)
        with pytest.raises(ValueError, match="divisible"):
            train_step(state, model, jnp.asarray(images),
                       jnp.asarray(tokens), jnp.asarray(weak), cfg)


class TestEmaAndMoments:
    def test_ema_tracks_params(self, tiny_setup):
        from tests.test_models import TINY
        from tpualign.train.step import export_params

        model, params = tiny_setup
        cfg = TrainConfig(learning_rate=1e-3, warmup_steps=0,
                          total_steps=100, ema_decay=0.9)
        state = create_train_state(model, params, cfg)
        rng = np.random.default_rng(21)
        images, tokens, weak = batch_for(TINY, 8, rng)
        p0 = jax.device_get(state.params["text"]["text_projection"])
        new_state, _ = train_step(
            state, model, jnp.asarray(images), jnp.asarray(tokens),
            jnp.asarray(weak), cfg,
        )
        p1 = jax.device_get(new_state.params["text"]["text_projection"])
        ema = jax.device_get(new_state.ema_params["text"]["text_projection"])
        np.testing.assert_allclose(ema, 0.9 * p0 + 0.1 * p1,
                                   rtol=1e-5, atol=1e-7)
        # export prefers EMA; without decay it is the live params
        np.testing.assert_allclose(
            jax.device_get(
                export_params(new_state)["text"]["text_projection"]),
            ema)
        cfg_off = TrainConfig(learning_rate=1e-3, warmup_steps=0,
                              total_steps=100)
        s_off = create_train_state(model, params, cfg_off)
        assert s_off.ema_params is None
        assert export_params(s_off) is s_off.params

    def test_ema_checkpoint_roundtrip(self, tiny_setup, tmp_path):
        from tests.test_models import TINY
        from tpualign.train.checkpoint import (restore_checkpoint,
                                               save_checkpoint)

        model, params = tiny_setup
        cfg = TrainConfig(learning_rate=1e-3, warmup_steps=0,
                          total_steps=100, ema_decay=0.5)
        state = create_train_state(model, params, cfg)
        rng = np.random.default_rng(23)
        images, tokens, weak = batch_for(TINY, 8, rng)
        state, _ = train_step(
            state, model, jnp.asarray(images), jnp.asarray(tokens),
            jnp.asarray(weak), cfg,
        )
        save_checkpoint(tmp_path / "ck", state)
        fresh = create_train_state(model, params, cfg)
        restored = restore_checkpoint(tmp_path / "ck", fresh)
        a = jax.device_get(state.ema_params["text"]["text_projection"])
        b = jax.device_get(restored.ema_params["text"]["text_projection"])
        np.testing.assert_array_equal(a, b)

    def test_restore_pre_ema_checkpoint(self, tiny_setup, tmp_path):
        """A checkpoint written without EMA restores into an EMA-tracking
        state, restarting the average from the restored params."""
        from tests.test_models import TINY
        from tpualign.train.checkpoint import (restore_checkpoint,
                                               save_checkpoint)

        model, params = tiny_setup
        old_cfg = TrainConfig(learning_rate=1e-3, warmup_steps=0,
                              total_steps=100)
        state = create_train_state(model, params, old_cfg)
        rng = np.random.default_rng(25)
        images, tokens, weak = batch_for(TINY, 8, rng)
        state, _ = train_step(
            state, model, jnp.asarray(images), jnp.asarray(tokens),
            jnp.asarray(weak), old_cfg,
        )
        save_checkpoint(tmp_path / "ck", state)
        new_cfg = TrainConfig(learning_rate=1e-3, warmup_steps=0,
                              total_steps=100, ema_decay=0.9)
        fresh = create_train_state(model, params, new_cfg)
        restored = restore_checkpoint(tmp_path / "ck", fresh)
        np.testing.assert_array_equal(
            jax.device_get(restored.ema_params["text"]["text_projection"]),
            jax.device_get(restored.params["text"]["text_projection"]))

    def test_bf16_moments_dtype_and_memory(self, tiny_setup):
        from tests.test_models import TINY

        model, params = tiny_setup
        cfg = TrainConfig(learning_rate=1e-3, warmup_steps=0,
                          total_steps=100, moments_dtype="bfloat16")
        state = create_train_state(model, params, cfg)
        mu = state.opt_state[1][0].mu
        nu = state.opt_state[1][0].nu
        assert all(x.dtype == jnp.bfloat16 for x in jax.tree.leaves(mu))
        # second moment keeps fp32 (needs the range)
        assert all(x.dtype == jnp.float32 for x in jax.tree.leaves(nu))
        # and the step still trains
        rng = np.random.default_rng(27)
        images, tokens, weak = batch_for(TINY, 8, rng)
        losses = []
        for _ in range(3):
            state, metrics = train_step(
                state, model, jnp.asarray(images), jnp.asarray(tokens),
                jnp.asarray(weak), cfg,
            )
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_bad_moments_dtype_raises(self, tiny_setup):
        model, params = tiny_setup
        cfg = TrainConfig(moments_dtype="float16")
        with pytest.raises(ValueError, match="moments_dtype"):
            create_train_state(model, params, cfg)

    def test_sharded_ema_placement(self, tiny_setup):
        from tests.test_models import TINY
        from tpualign.parallel.mesh import create_mesh

        model, params = tiny_setup
        cfg = TrainConfig(learning_rate=1e-3, warmup_steps=0,
                          total_steps=100, ema_decay=0.9)
        mesh = create_mesh(4, 2)
        state = create_train_state(model, params, cfg)
        step_fn, shard_state = make_sharded_train_step(model, mesh, cfg)
        state = shard_state(state)
        rng = np.random.default_rng(29)
        images, tokens, weak = batch_for(TINY, 8, rng)
        state, m = step_fn(state, images, tokens, weak)
        assert np.isfinite(float(m["loss"]))
        # EMA shards like the params (no replication blow-up)
        p_spec = state.params["text"]["text_projection"].sharding
        e_spec = state.ema_params["text"]["text_projection"].sharding
        assert p_spec == e_spec


def test_opt_state_moments_tp_sharded():
    """AdamW mu/nu must shard with the TP param layout, not replicate
    (round-1 advisor finding: replicated moments defeat TP memory savings)."""
    from tpualign.config import ClipVariant, TrainConfig
    from tpualign.models.clip import CLIP, init_clip_params
    from tpualign.parallel.mesh import create_mesh
    from tpualign.train.step import create_train_state, make_sharded_train_step

    variant = ClipVariant(
        name="d", embed_dim=64, image_size=32, patch_size=8,
        vision_width=128, vision_layers=2, vision_heads=4, context_length=16,
        vocab_size=512, text_width=128, text_layers=2, text_heads=4,
    )
    model = CLIP(variant=variant, use_quick_gelu=True, compute_dtype=jnp.float32)
    params = init_clip_params(model, seed=0)
    mesh = create_mesh(4, 2)
    cfg = TrainConfig(batch_size=8, warmup_steps=1, total_steps=4)
    state = create_train_state(model, params, cfg)
    step_fn, shard_state = make_sharded_train_step(model, mesh, cfg)
    state = shard_state(state)

    def find_mu(t):
        if hasattr(t, "mu"):
            return t.mu
        if isinstance(t, (tuple, list)):
            for x in t:
                r = find_mu(x)
                if r is not None:
                    return r
        return None

    mu = find_mu(state.opt_state)
    blk = mu["visual"]["transformer"]["resblock_0"]["mlp"]
    assert blk["c_fc_kernel"].sharding.spec[1] == "model"
    assert blk["c_proj_kernel"].sharding.spec[0] == "model"

    rng = np.random.default_rng(0)
    images = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
    tokens = np.zeros((8, 16), np.int32)
    tokens[:, 0] = 510
    tokens[:, 2] = 511
    state2, m = step_fn(state, images, tokens, rng.random(8).astype(np.float32))
    assert np.isfinite(float(m["loss"]))
    mu2 = find_mu(state2.opt_state)
    assert (
        mu2["visual"]["transformer"]["resblock_0"]["mlp"]["c_fc_kernel"]
        .sharding.spec[1] == "model"
    )


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_odd():
    import __graft_entry__ as ge

    ge.dryrun_multichip(5)


def test_dryrun_multichip_clean_subprocess():
    """The driver's exact call pattern, with NO pre-set test environment.

    Round-1 regression: the conftest pre-sets XLA_FLAGS/JAX_PLATFORMS, which
    masked dryrun_multichip's missing bootstrap (MULTICHIP_r01 ok=false).
    This test strips those vars and imports the module cold in a subprocess,
    exactly like the driver does.
    """
    import os
    import subprocess
    import sys

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "_TPUALIGN_DRYRUN_CHILD")
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        # generous: the dryrun jit-compiles ~10 programs on ONE throttled
        # CPU core, and competing processes have pushed it past 600 s
        cwd=repo, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip ok" in proc.stdout


def test_dryrun_multichip_after_backend_init_subprocess():
    """dryrun must survive being called AFTER jax backends initialize with
    the wrong device count (driver may compile entry() on a real chip
    first) — exercises the clean-subprocess fallback."""
    import os
    import subprocess
    import sys

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "_TPUALIGN_DRYRUN_CHILD")
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import jax; jax.devices(); "  # initialize backends with 1 CPU device
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        # jax.devices() here initializes the REAL axon backend, which can
        # stall for minutes when another process holds the chip; plus the
        # dryrun's compile cost on one throttled core (flaked at 600 s)
        cwd=repo, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip ok" in proc.stdout


def test_sharded_checkpoint_roundtrip(tmp_path):
    """Orbax save/restore of a TP-sharded state keeps the mesh sharding:
    no host gather on save, restore lands directly in the TP layout."""
    from tpualign.config import ClipVariant, TrainConfig
    from tpualign.models.clip import CLIP, init_clip_params
    from tpualign.parallel.mesh import create_mesh
    from tpualign.train.checkpoint import restore_checkpoint, save_checkpoint
    from tpualign.train.step import create_train_state, make_sharded_train_step

    variant = ClipVariant(
        name="ck", embed_dim=64, image_size=32, patch_size=8,
        vision_width=128, vision_layers=2, vision_heads=4, context_length=16,
        vocab_size=512, text_width=128, text_layers=2, text_heads=4,
    )
    model = CLIP(variant=variant, use_quick_gelu=True, compute_dtype=jnp.float32)
    mesh = create_mesh(4, 2)
    cfg = TrainConfig(batch_size=8, warmup_steps=1, total_steps=4)
    step_fn, shard_state = make_sharded_train_step(model, mesh, cfg)

    state = shard_state(create_train_state(
        model, init_clip_params(model, seed=3), cfg))
    rng = np.random.default_rng(0)
    images = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
    tokens = np.zeros((8, 16), np.int32)
    tokens[:, 0] = 510
    tokens[:, 2] = 511
    state, _ = step_fn(state, images, tokens, rng.random(8).astype(np.float32))

    save_checkpoint(tmp_path / "ckpt", state)

    fresh = shard_state(create_train_state(
        model, init_clip_params(model, seed=99), cfg))
    restored = restore_checkpoint(tmp_path / "ckpt", fresh)
    assert restored is not None
    assert int(jax.device_get(restored.step)) == 1
    kern = restored.params["visual"]["transformer"]["resblock_0"]["mlp"]["c_fc_kernel"]
    assert kern.sharding.spec[1] == "model"  # restored INTO the TP layout
    np.testing.assert_allclose(
        jax.device_get(kern),
        jax.device_get(
            state.params["visual"]["transformer"]["resblock_0"]["mlp"]["c_fc_kernel"]
        ),
        atol=0,
    )


class TestPatchMasking:
    """FLIP-style visible-patch masking (arXiv:2212.00794, PAPERS.md)."""

    def _model(self):
        from tests.test_models import TINY, tiny_model
        from tpualign.models.clip import init_clip_params

        model = tiny_model()
        return TINY, model, init_clip_params(model, seed=0)

    def test_full_permutation_equals_unmasked(self):
        """K = P with a permutation must reproduce the unmasked embedding
        (attention is permutation-equivariant once positions are gathered)."""
        variant, model, params = self._model()
        rng = np.random.default_rng(0)
        images = rng.normal(size=(3, 32, 32, 3)).astype(np.float32)
        p = variant.num_patches
        idx = np.stack([rng.permutation(p) for _ in range(3)]).astype(np.int32)
        base = model.apply({"params": params}, jnp.asarray(images),
                           method=model.encode_image)
        perm = model.apply({"params": params}, jnp.asarray(images),
                           patch_indices=jnp.asarray(idx),
                           method=model.encode_image)
        np.testing.assert_allclose(np.asarray(base), np.asarray(perm),
                                   atol=1e-4)

    def test_masked_step_trains(self):
        from tests.test_models import TINY
        from tpualign.train.step import sample_patch_indices

        variant, model, params = self._model()
        config = TrainConfig(learning_rate=1e-3, warmup_steps=0,
                             total_steps=100, patch_mask_ratio=0.5)
        state = create_train_state(model, params, config)
        rng = np.random.default_rng(0)
        images, tokens, weak = batch_for(TINY, 8, rng)
        losses = []
        for _ in range(5):
            idx = sample_patch_indices(rng, 8, variant.num_patches, 0.5)
            assert idx.shape == (8, variant.num_patches // 2)
            state, metrics = train_step(
                state, model, jnp.asarray(images), jnp.asarray(tokens),
                jnp.asarray(weak), config, jnp.asarray(idx),
            )
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses

    def test_ratio_zero_is_none(self):
        from tpualign.train.step import sample_patch_indices

        assert sample_patch_indices(np.random.default_rng(0), 4, 16, 0.0) is None

    def test_sharded_step_with_masking(self):
        from tests.test_models import TINY
        from tpualign.parallel.mesh import create_mesh
        from tpualign.train.step import sample_patch_indices

        variant, model, params = self._model()
        config = TrainConfig(learning_rate=1e-3, warmup_steps=0,
                             total_steps=100, patch_mask_ratio=0.5)
        mesh = create_mesh(4, 2)
        step_fn, shard_state = make_sharded_train_step(model, mesh, config)
        state = shard_state(create_train_state(model, params, config))
        rng = np.random.default_rng(1)
        images, tokens, weak = batch_for(TINY, 8, rng)
        idx = sample_patch_indices(rng, 8, variant.num_patches, 0.5)
        state, metrics = step_fn(state, images, tokens, weak, idx)
        assert np.isfinite(float(metrics["loss"]))


def test_siglip_loss_math():
    """Pairwise sigmoid loss: perfect alignment beats shuffled; matches a
    hand-computed softplus formula; uniform weak scores = unweighted."""
    from tpualign.train.loss import siglip_loss

    rng = np.random.default_rng(4)
    e = unit(rng, (6, 16))
    bias = jnp.asarray(-2.0)
    aligned, m = siglip_loss(jnp.asarray(e), jnp.asarray(e), jnp.asarray(20.0), bias)
    shuffled = e[np.random.default_rng(5).permutation(6)]
    rand, _ = siglip_loss(jnp.asarray(e), jnp.asarray(shuffled), jnp.asarray(20.0), bias)
    assert float(aligned) < float(rand)
    assert float(m["acc_i2t"]) == 1.0

    # hand formula
    img, txt = unit(rng, (4, 8)), unit(rng, (4, 8))
    logits = 10.0 * img @ txt.T - 2.0
    signs = 2 * np.eye(4) - 1
    want = np.logaddexp(0.0, -signs * logits).sum() / 4
    got, _ = siglip_loss(jnp.asarray(img), jnp.asarray(txt),
                         jnp.asarray(10.0), jnp.asarray(-2.0))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)

    # uniform weak scores reduce to unweighted
    uw, _ = siglip_loss(jnp.asarray(img), jnp.asarray(txt), jnp.asarray(10.0),
                        jnp.asarray(-2.0), weak_scores=jnp.full((4,), 0.3))
    np.testing.assert_allclose(float(uw), want, rtol=1e-5)


def test_siglip_training_decreases_loss(tiny_setup):
    from tests.test_models import TINY

    model, params = tiny_setup
    config = TrainConfig(learning_rate=1e-3, warmup_steps=0, total_steps=100,
                         loss_type="siglip", siglip_bias=-5.0)
    state = create_train_state(model, params, config)
    rng = np.random.default_rng(0)
    images, tokens, weak = batch_for(TINY, 8, rng)
    losses = []
    for _ in range(5):
        state, metrics = train_step(
            state, model, jnp.asarray(images), jnp.asarray(tokens),
            jnp.asarray(weak), config,
        )
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_truncated_tokens_give_identical_update(tiny_setup):
    """Training with pad-tail-truncated tokens is EXACT: only the EOT
    feature is consumed, so gradients through pad positions are zero and
    the parameter update matches the full-context step."""
    from tests.test_models import TINY

    model, params = tiny_setup
    cfg = TrainConfig(learning_rate=1e-3, warmup_steps=0, total_steps=100)
    rng = np.random.default_rng(41)
    images, tokens, weak = batch_for(TINY, 8, rng)
    # EOT sits at position 2 -> truncation to 8 keeps every row's EOT

    s_full = create_train_state(model, params, cfg)
    s_full, m_full = train_step(
        s_full, model, jnp.asarray(images), jnp.asarray(tokens),
        jnp.asarray(weak), cfg)
    s_cut = create_train_state(model, params, cfg)
    s_cut, m_cut = train_step(
        s_cut, model, jnp.asarray(images), jnp.asarray(tokens[:, :8]),
        jnp.asarray(weak), cfg)

    np.testing.assert_allclose(float(m_cut["loss"]), float(m_full["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_full.params),
                    jax.tree.leaves(s_cut.params)):
        np.testing.assert_allclose(jax.device_get(a), jax.device_get(b),
                                   atol=1e-6)


def test_truncate_to_bucket_helper():
    from tpualign.parallel.embed import truncate_to_bucket

    toks = np.zeros((3, 77), np.int32)
    toks[:, 0] = 49406
    toks[0, 5] = 49407   # len 6
    toks[1, 12] = 49407  # len 13
    toks[2, 3] = 49407   # len 4
    out = truncate_to_bucket(toks, (16, 32, 77))
    assert out.shape == (3, 16)
    toks[1, 12] = 0
    toks[1, 40] = 49407  # len 41 -> full context
    assert truncate_to_bucket(toks, (16, 32, 77)).shape == (3, 77)
    toks[1, 40] = 0
    toks[1, 30] = 49407  # len 31 -> 32 bucket
    assert truncate_to_bucket(toks, (16, 32, 77)).shape == (3, 32)
    assert truncate_to_bucket(np.zeros((0, 77), np.int32), (16,)).shape == (0, 77)


class TestFSDP:
    """ZeRO-3 fully-sharded data parallelism: params/moments/EMA shard over
    the ``data`` axis too; the update itself must be the replicated step's."""

    def _mesh_model(self):
        from tpualign.config import ClipVariant
        from tpualign.models.clip import CLIP, init_clip_params
        from tpualign.parallel.mesh import create_mesh

        variant = ClipVariant(
            name="fs", embed_dim=64, image_size=32, patch_size=8,
            vision_width=128, vision_layers=2, vision_heads=4,
            context_length=16, vocab_size=512, text_width=128,
            text_layers=2, text_heads=4,
        )
        model = CLIP(variant=variant, use_quick_gelu=True,
                     compute_dtype=jnp.float32)
        return create_mesh(4, 2), model, init_clip_params(model, seed=3)

    def test_fsdp_param_specs(self):
        """Every >=2-D param gains a ``data`` dim on a TP-free, divisible
        axis; scalars/vectors keep their TP spec."""
        from jax.sharding import PartitionSpec as P
        from tests.test_models import tiny_model
        from tpualign.models.clip import init_clip_params
        from tpualign.parallel.sharding import clip_param_specs

        params = init_clip_params(tiny_model(), seed=0)
        specs = clip_param_specs(params, fsdp=4)
        blk = specs["visual"]["transformer"]["resblock_0"]
        assert blk["attn"]["in_proj_kernel"] == P("data", "model")
        assert blk["mlp"]["c_proj_kernel"] == P("model", "data")
        assert blk["attn"]["in_proj_bias"] == P("model")  # 1-D: TP only
        assert blk["ln_1"]["scale"] == P()
        assert specs["logit_scale"] == P()
        # token_embedding (1000, 64): largest divisible dim shards
        assert specs["text"]["token_embedding"] == P("data", None)
        # visual positional_embedding (17, 64): dim0 indivisible by 4 ->
        # the other dim takes the axis
        assert specs["visual"]["positional_embedding"] == P(None, "data")
        # fsdp=1 collapses to the plain TP specs
        plain = clip_param_specs(params, fsdp=1)
        assert (plain["visual"]["transformer"]["resblock_0"]["attn"]
                ["in_proj_kernel"] == P(None, "model"))

    def test_fsdp_step_matches_replicated(self):
        """One FSDP step == one replicated-param sharded step (same batch),
        with params AND AdamW moments materially sharded over ``data``."""
        from tpualign.config import TrainConfig
        from tpualign.train.step import (
            create_train_state, make_sharded_train_step,
        )

        mesh, model, params = self._mesh_model()
        rng = np.random.default_rng(7)
        images = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
        tokens = np.zeros((8, 16), np.int32)
        tokens[:, 0] = 510
        tokens[:, 1] = rng.integers(1, 500, size=8).astype(np.int32)
        tokens[:, 2] = 511
        weak = rng.random(8).astype(np.float32)

        def run(fsdp):
            cfg = TrainConfig(learning_rate=1e-3, warmup_steps=0,
                              total_steps=10, ema_decay=0.9, fsdp=fsdp)
            step_fn, shard_state = make_sharded_train_step(model, mesh, cfg)
            state = shard_state(create_train_state(model, params, cfg))
            for _ in range(2):
                state, metrics = step_fn(state, images, tokens, weak)
            return state, metrics

        s_rep, m_rep = run(False)
        s_fs, m_fs = run(True)

        np.testing.assert_allclose(
            float(m_rep["loss"]), float(m_fs["loss"]), rtol=1e-5
        )
        kern_path = lambda p: (p["visual"]["transformer"]["resblock_0"]
                               ["attn"]["in_proj_kernel"])
        k_rep, k_fs = kern_path(s_rep.params), kern_path(s_fs.params)
        np.testing.assert_allclose(
            jax.device_get(k_rep), jax.device_get(k_fs), atol=2e-6
        )
        # layout: (128, 384) kernel shards 4x over data on dim0 AND 2x over
        # model on dim1 -> per-device shard is 1/8 of the param
        assert k_fs.sharding.shard_shape(k_fs.shape) == (32, 192)
        assert k_rep.sharding.shard_shape(k_rep.shape) == (128, 192)

        def find_mu(t):
            if hasattr(t, "mu"):
                return t.mu
            if isinstance(t, (tuple, list)):
                for x in t:
                    r = find_mu(x)
                    if r is not None:
                        return r
            return None

        mu = kern_path(find_mu(s_fs.opt_state))
        assert mu.sharding.shard_shape(mu.shape) == (32, 192)
        ema = kern_path(s_fs.ema_params)
        assert ema.sharding.shard_shape(ema.shape) == (32, 192)

    def test_fsdp_checkpoint_roundtrip(self, tmp_path):
        """Orbax save/restore lands directly in the FSDP layout."""
        from tpualign.config import TrainConfig
        from tpualign.train.checkpoint import (
            restore_checkpoint, save_checkpoint,
        )
        from tpualign.models.clip import init_clip_params
        from tpualign.train.step import (
            create_train_state, make_sharded_train_step,
        )

        mesh, model, params = self._mesh_model()
        cfg = TrainConfig(batch_size=8, warmup_steps=1, total_steps=4,
                          fsdp=True)
        step_fn, shard_state = make_sharded_train_step(model, mesh, cfg)
        state = shard_state(create_train_state(model, params, cfg))
        rng = np.random.default_rng(0)
        images = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
        tokens = np.zeros((8, 16), np.int32)
        tokens[:, 0] = 510
        tokens[:, 2] = 511
        state, _ = step_fn(state, images, tokens,
                           rng.random(8).astype(np.float32))

        save_checkpoint(tmp_path / "ckpt", state)
        fresh = shard_state(create_train_state(
            model, init_clip_params(model, seed=99), cfg))
        restored = restore_checkpoint(tmp_path / "ckpt", fresh)
        assert restored is not None
        kern = (restored.params["visual"]["transformer"]["resblock_0"]
                ["attn"]["in_proj_kernel"])
        assert kern.sharding.shard_shape(kern.shape) == (32, 192)
        np.testing.assert_allclose(
            jax.device_get(kern),
            jax.device_get(state.params["visual"]["transformer"]
                           ["resblock_0"]["attn"]["in_proj_kernel"]),
            atol=0,
        )


# ---------------------------------------------------------------------------
# Device image feed (TRAIN_IMAGE_FEED=device): (uint8 bucket, hw) batches
# ---------------------------------------------------------------------------


def _u8_feed_batch(variant, n, rng, bucket=48):
    """uint8 images padded into a bucket + true sizes, plus the SAME
    images through the host preprocess for the parity arm."""
    from PIL import Image

    from tpualign.ops.preprocess import pad_to_bucket, preprocess_host

    u8 = np.zeros((n, bucket, bucket, 3), np.uint8)
    hw = np.zeros((n, 2), np.int32)
    host = np.zeros((n, variant.image_size, variant.image_size, 3),
                    np.float32)
    for i in range(n):
        h, w = int(rng.integers(33, bucket + 1)), int(rng.integers(33, bucket + 1))
        raw = rng.integers(0, 256, (h, w, 3), np.uint8)
        padded, size = pad_to_bucket(raw, bucket)
        u8[i], hw[i] = padded, size
        host[i] = preprocess_host(Image.fromarray(raw), variant.image_size)
    return u8, hw, host


def test_device_feed_step_matches_host_feed(tiny_setup):
    """One train step from identical states: the (u8, hw) device-feed
    batch and the host-preprocessed batch of the same images give the
    same loss up to the preprocess parity bound (device bicubic matches
    PIL to <=2 uint8 steps)."""
    from tests.test_models import TINY

    model, params = tiny_setup
    config = TrainConfig(learning_rate=1e-3, warmup_steps=0,
                         total_steps=100)
    rng = np.random.default_rng(5)
    u8, hw, host = _u8_feed_batch(TINY, 8, rng)
    _, tokens, weak = batch_for(TINY, 8, rng)

    s1 = create_train_state(model, params, config)
    s1, m1 = train_step(
        s1, model, (jnp.asarray(u8), jnp.asarray(hw)),
        jnp.asarray(tokens), jnp.asarray(weak), config,
    )
    s2 = create_train_state(model, params, config)
    s2, m2 = train_step(
        s2, model, jnp.asarray(host), jnp.asarray(tokens),
        jnp.asarray(weak), config,
    )
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 2e-2
    # params moved the same way to the same tolerance class
    d = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.params, s2.params
    )
    assert max(jax.tree.leaves(d)) < 2e-2


def test_device_feed_accum_matches_single_pass(tiny_setup):
    """Gradient accumulation slices the (u8, hw) pair per microbatch;
    the accumulated update equals the one-pass update on the same
    device-feed batch."""
    from tests.test_models import TINY

    model, params = tiny_setup
    rng = np.random.default_rng(7)
    u8, hw, _ = _u8_feed_batch(TINY, 8, rng)
    _, tokens, weak = batch_for(TINY, 8, rng)
    imgs = (jnp.asarray(u8), jnp.asarray(hw))

    cfg1 = TrainConfig(learning_rate=1e-3, warmup_steps=0,
                       total_steps=100, grad_accum_steps=1)
    cfg4 = TrainConfig(learning_rate=1e-3, warmup_steps=0,
                       total_steps=100, grad_accum_steps=4)
    s1 = create_train_state(model, params, cfg1)
    s1, m1 = train_step(s1, model, imgs, jnp.asarray(tokens),
                        jnp.asarray(weak), cfg1)
    s4 = create_train_state(model, params, cfg4)
    s4, m4 = train_step(s4, model, imgs, jnp.asarray(tokens),
                        jnp.asarray(weak), cfg4)
    # the device preprocess reruns per microbatch with a different batch
    # shape than the one-pass arm, so its resize matmuls reduce in a
    # different order: ~1e-5 fp32 drift on the loss (pixel-input accum
    # stays fp32-ulp exact — TestGradAccum)
    np.testing.assert_allclose(float(m1["loss"]), float(m4["loss"]),
                               atol=5e-5)
    d = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.params, s4.params
    )
    assert max(jax.tree.leaves(d)) < 5e-4


def test_device_feed_sharded_step(tiny_setup):
    """The sharded step accepts (u8, hw) batches: u8 shards over data,
    hw rides along; the step runs and the loss is finite."""
    from tests.test_models import TINY
    from tpualign.parallel.mesh import create_mesh
    from tpualign.train.step import make_sharded_train_step

    model, params = tiny_setup
    config = TrainConfig(learning_rate=1e-3, warmup_steps=0,
                         total_steps=100)
    rng = np.random.default_rng(9)
    u8, hw, _ = _u8_feed_batch(TINY, 16, rng)
    _, tokens, weak = batch_for(TINY, 16, rng)
    run, shard_state = make_sharded_train_step(
        model, create_mesh(4, 2), config)
    state = shard_state(create_train_state(model, params, config))
    state, metrics = run(state, (u8, hw), tokens, weak)
    assert np.isfinite(float(metrics["loss"]))


def test_device_feed_augmented_step(tiny_setup):
    """TRAIN_AUGMENT=rrc: the 4-tuple (u8, hw, boxes, flips) batch runs
    through the jitted step; the full-box no-flip case equals the
    cropless device feed's loss (same pixels), and a real crop changes
    it."""
    from tests.test_models import TINY
    from tpualign.ops.preprocess import sample_crop_boxes

    model, params = tiny_setup
    config = TrainConfig(learning_rate=1e-3, warmup_steps=0,
                         total_steps=100)
    rng = np.random.default_rng(11)
    u8, hw, _ = _u8_feed_batch(TINY, 8, rng)
    _, tokens, weak = batch_for(TINY, 8, rng)

    # full-image boxes: crop-then-resize of the whole image
    full = np.concatenate(
        [np.zeros((8, 2), np.float32), hw.astype(np.float32)], axis=1)
    noflip = np.zeros(8, bool)
    s0 = create_train_state(model, params, config)
    s0, m_full = train_step(
        s0, model,
        (jnp.asarray(u8), jnp.asarray(hw), jnp.asarray(full),
         jnp.asarray(noflip)),
        jnp.asarray(tokens), jnp.asarray(weak), config,
    )
    assert np.isfinite(float(m_full["loss"]))

    boxes, flips = sample_crop_boxes(np.random.default_rng(0), hw)
    s1 = create_train_state(model, params, config)
    s1, m_aug = train_step(
        s1, model,
        (jnp.asarray(u8), jnp.asarray(hw), jnp.asarray(boxes),
         jnp.asarray(flips)),
        jnp.asarray(tokens), jnp.asarray(weak), config,
    )
    assert np.isfinite(float(m_aug["loss"]))
    assert float(m_aug["loss"]) != float(m_full["loss"])


def test_config_rejects_augment_without_device_feed():
    from tpualign.config import load_config

    with pytest.raises(ValueError, match="TRAIN_IMAGE_FEED"):
        load_config(env_file=None, overrides={"TRAIN_AUGMENT": "rrc"})
    with pytest.raises(ValueError, match="TRAIN_AUGMENT"):
        load_config(env_file=None, overrides={"TRAIN_AUGMENT": "mixup",
                                              "TRAIN_IMAGE_FEED": "device"})
    cfg = load_config(env_file=None, overrides={
        "TRAIN_AUGMENT": "rrc", "TRAIN_IMAGE_FEED": "device"})
    assert cfg.train.augment == "rrc"
    # a typo'd feed mode must not silently fall back to the host feed
    with pytest.raises(ValueError, match="TRAIN_IMAGE_FEED"):
        load_config(env_file=None, overrides={"TRAIN_IMAGE_FEED": "devcie"})

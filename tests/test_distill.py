"""Knowledge-distillation tests: the relational KD loss against a numpy
oracle, composition with the train step (weight mixing, gradient
accumulation, the sharded step), and the Trainer path with a teacher
whose embedding dimension differs from the student's.

Rebuild extension — the reference has no training at all; distillation
is the production lever for serving big-tower retrieval quality at
small-tower embed cost (docs/TRAINING.md)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_models import TINY, tiny_model
from tpualign.config import TrainConfig, load_config
from tpualign.models.clip import (
    CLIP,
    encode_image_fn,
    encode_text_fn,
    init_clip_params,
)
from tpualign.train.loss import distill_kl_loss
from tpualign.train.step import create_train_state, train_step

# a teacher with a DIFFERENT embedding dimension — relational KD compares
# (B, B) logit structures, so no projection head is needed
TEACHER_VARIANT = dataclasses.replace(TINY, name="tiny-teacher", embed_dim=32)


def teacher_model(**kw):
    return CLIP(variant=TEACHER_VARIANT, use_quick_gelu=True,
                compute_dtype=jnp.float32, **kw)


def _unit(rng, n, d):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _np_kd(si, st, ss, ti, tt, ts, temp=1.0):
    ls = ss * (si @ st.T) / temp
    lt = ts * (ti @ tt.T) / temp

    def logsoftmax(x):
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    def kl(a, b):
        pa = np.exp(logsoftmax(a))
        return (pa * (logsoftmax(a) - logsoftmax(b))).sum(-1)

    return float(0.5 * (kl(lt, ls) + kl(lt.T, ls.T)).mean() * temp * temp)


def _batch(n, rng):
    images = rng.normal(
        size=(n, TINY.image_size, TINY.image_size, 3)).astype(np.float32)
    tokens = np.zeros((n, TINY.context_length), np.int32)
    tokens[:, 0] = TINY.vocab_size - 2
    tokens[:, 1] = rng.integers(1, 100, size=n)
    tokens[:, 2] = TINY.vocab_size - 1
    weak = rng.random(n).astype(np.float32)
    return images, tokens, weak


def _teacher_embs(images, tokens):
    tm = teacher_model()
    tp = init_clip_params(tm, seed=7)
    ti = np.asarray(jax.jit(encode_image_fn(tm))(tp, jnp.asarray(images)))
    tt = np.asarray(jax.jit(encode_text_fn(tm))(tp, jnp.asarray(tokens)))
    scale = min(float(np.exp(jax.device_get(tp["logit_scale"]))), 100.0)
    return (jnp.asarray(ti), jnp.asarray(tt),
            jnp.asarray(scale, jnp.float32))


class TestDistillLoss:
    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(0)
        si, st = _unit(rng, 6, 16), _unit(rng, 6, 16)
        ti, tt = _unit(rng, 6, 24), _unit(rng, 6, 24)  # dims differ
        for temp in (1.0, 2.0):
            got = float(distill_kl_loss(
                jnp.asarray(si), jnp.asarray(st), jnp.asarray(10.0),
                jnp.asarray(ti), jnp.asarray(tt), jnp.asarray(25.0),
                temperature=temp,
            ))
            want = _np_kd(si, st, 10.0, ti, tt, 25.0, temp)
            assert got == pytest.approx(want, rel=1e-5, abs=1e-7)

    def test_zero_when_student_matches_teacher(self):
        rng = np.random.default_rng(1)
        si, st = _unit(rng, 5, 16), _unit(rng, 5, 16)
        v = float(distill_kl_loss(
            jnp.asarray(si), jnp.asarray(st), jnp.asarray(10.0),
            jnp.asarray(si), jnp.asarray(st), jnp.asarray(10.0),
        ))
        assert v == pytest.approx(0.0, abs=1e-6)

    def test_nonnegative(self):
        rng = np.random.default_rng(2)
        v = float(distill_kl_loss(
            jnp.asarray(_unit(rng, 4, 8)), jnp.asarray(_unit(rng, 4, 8)),
            jnp.asarray(30.0),
            jnp.asarray(_unit(rng, 4, 12)), jnp.asarray(_unit(rng, 4, 12)),
            jnp.asarray(50.0),
        ))
        assert v >= 0.0


class TestDistillStep:
    def test_weight_zero_matches_baseline(self):
        """distill_weight=0 with a teacher present must produce the exact
        baseline update (KD contributes metrics only)."""
        model = tiny_model()
        params = init_clip_params(model, seed=0)
        rng = np.random.default_rng(3)
        images, tokens, weak = _batch(8, rng)
        teacher = _teacher_embs(images, tokens)

        cfg0 = TrainConfig(learning_rate=1e-3, warmup_steps=0,
                           total_steps=100)
        s_base = create_train_state(model, params, cfg0)
        s_base, m_base = train_step(
            s_base, model, jnp.asarray(images), jnp.asarray(tokens),
            jnp.asarray(weak), cfg0,
        )

        cfg = dataclasses.replace(cfg0, distill_weight=0.0)
        s_kd = create_train_state(model, params, cfg)
        s_kd, m_kd = train_step(
            s_kd, model, jnp.asarray(images), jnp.asarray(tokens),
            jnp.asarray(weak), cfg, teacher=teacher,
        )
        assert "distill_kl" in m_kd and float(m_kd["distill_kl"]) > 0.0
        np.testing.assert_allclose(
            float(m_base["loss"]), float(m_kd["loss"]), rtol=1e-6)
        np.testing.assert_allclose(
            jax.device_get(s_base.params["text"]["text_projection"]),
            jax.device_get(s_kd.params["text"]["text_projection"]),
            atol=1e-7,
        )

    def test_pure_kd_moves_student_toward_teacher(self):
        """weight=1.0: the student's logit structure converges toward the
        (different-dimension) teacher's — the KD metric drops."""
        model = tiny_model()
        params = init_clip_params(model, seed=0)
        cfg = TrainConfig(learning_rate=3e-3, warmup_steps=0,
                          total_steps=100, distill_weight=1.0)
        rng = np.random.default_rng(4)
        images, tokens, weak = _batch(8, rng)
        teacher = _teacher_embs(images, tokens)

        state = create_train_state(model, params, cfg)
        step = jax.jit(lambda s: train_step(
            s, model, jnp.asarray(images), jnp.asarray(tokens),
            jnp.asarray(weak), cfg, teacher=teacher,
        ))
        kds = []
        for _ in range(25):
            state, metrics = step(state)
            kds.append(float(metrics["distill_kl"]))
        assert kds[-1] < 0.5 * kds[0], (kds[0], kds[-1])

    def test_grad_accum_matches_full_batch(self):
        """The cached-feature accumulation schedule reproduces the
        full-batch KD update (teacher arrays are full-batch constants)."""
        model = tiny_model()
        params = init_clip_params(model, seed=0)
        rng = np.random.default_rng(5)
        images, tokens, weak = _batch(8, rng)
        teacher = _teacher_embs(images, tokens)

        cfg1 = TrainConfig(learning_rate=1e-3, warmup_steps=0,
                           total_steps=100, distill_weight=0.5)
        s1 = create_train_state(model, params, cfg1)
        s1, m1 = train_step(
            s1, model, jnp.asarray(images), jnp.asarray(tokens),
            jnp.asarray(weak), cfg1, teacher=teacher,
        )

        cfg2 = dataclasses.replace(cfg1, grad_accum_steps=2)
        s2 = create_train_state(model, params, cfg2)
        s2, m2 = train_step(
            s2, model, jnp.asarray(images), jnp.asarray(tokens),
            jnp.asarray(weak), cfg2, teacher=teacher,
        )
        np.testing.assert_allclose(
            float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
        np.testing.assert_allclose(
            jax.device_get(s1.params["text"]["text_projection"]),
            jax.device_get(s2.params["text"]["text_projection"]),
            atol=1e-5,
        )

    def test_sharded_step_matches_single_device(self):
        from tpualign.parallel.mesh import create_mesh
        from tpualign.train.step import make_sharded_train_step

        model = tiny_model()
        params = init_clip_params(model, seed=0)
        cfg = TrainConfig(learning_rate=1e-3, warmup_steps=0,
                          total_steps=100, distill_weight=0.5)
        rng = np.random.default_rng(6)
        images, tokens, weak = _batch(8, rng)
        teacher = _teacher_embs(images, tokens)

        s1 = create_train_state(model, params, cfg)
        s1, m1 = train_step(
            s1, model, jnp.asarray(images), jnp.asarray(tokens),
            jnp.asarray(weak), cfg, teacher=teacher,
        )

        mesh = create_mesh(4, 2)
        s2 = create_train_state(model, params, cfg)
        step_fn, shard_state = make_sharded_train_step(model, mesh, cfg)
        s2 = shard_state(s2)
        s2, m2 = step_fn(s2, images, tokens, weak, teacher=teacher)

        np.testing.assert_allclose(
            float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
        np.testing.assert_allclose(
            float(m1["distill_kl"]), float(m2["distill_kl"]), rtol=1e-4)
        np.testing.assert_allclose(
            jax.device_get(s1.params["text"]["text_projection"]),
            jax.device_get(s2.params["text"]["text_projection"]),
            atol=1e-5,
        )


class TestDistillConfig:
    def test_env_wiring_and_validation(self):
        cfg = load_config(env_file=None, overrides={
            "DISTILL_CHECKPOINT": "/tmp/teacher", "DISTILL_MODEL": "ViT-H-14",
            "DISTILL_WEIGHT": "0.7", "DISTILL_TEMPERATURE": "2.0",
        })
        assert cfg.train.distill_checkpoint == "/tmp/teacher"
        assert cfg.train.distill_model == "ViT-H-14"
        assert cfg.train.distill_weight == pytest.approx(0.7)
        assert cfg.train.distill_temperature == pytest.approx(2.0)
        with pytest.raises(ValueError, match="DISTILL_WEIGHT"):
            load_config(env_file=None, overrides={"DISTILL_WEIGHT": "1.5"})
        with pytest.raises(ValueError, match="DISTILL_TEMPERATURE"):
            load_config(env_file=None,
                        overrides={"DISTILL_TEMPERATURE": "0"})
        with pytest.raises(ValueError, match="DISTILL_CHECKPOINT"):
            load_config(env_file=None,
                        overrides={"DISTILL_MODEL": "ViT-H-14"})


class TestCompositions:
    def test_qat_composes_with_lora(self):
        """LoRA adapters train THROUGH the QAT fake-quant forward: the
        merged effective params feed int8_dot_qat, STE gradients reach
        the adapters, and the frozen base stays untouched."""
        from tpualign.config import TrainConfig
        from tpualign.train.step import create_train_state, train_step

        model = CLIP(variant=TINY, use_quick_gelu=True,
                     compute_dtype=jnp.float32, quant="int8_qat")
        clean = CLIP(variant=TINY, use_quick_gelu=True,
                     compute_dtype=jnp.float32)
        params = init_clip_params(clean, seed=0)
        cfg = TrainConfig(learning_rate=1e-3, warmup_steps=0,
                          total_steps=100, lora_rank=2)
        state = create_train_state(model, params, cfg)
        frozen_before = jax.tree.map(np.asarray, state.frozen_params)

        rng = np.random.default_rng(8)
        images, tokens, weak = _batch(8, rng)
        step = jax.jit(lambda s: train_step(
            s, model, jnp.asarray(images), jnp.asarray(tokens),
            jnp.asarray(weak), cfg))
        losses = []
        for _ in range(8):
            state, m = step(state)
            losses.append(float(m["loss"]))
            assert float(m["grad_norm"]) > 0.0
        assert losses[-1] < losses[0]
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
            frozen_before, state.frozen_params,
        )

    def test_distill_composes_with_device_feed(self):
        """TRAIN_IMAGE_FEED=device batches are (u8, hw) tuples; the
        teacher tuple rides alongside and the mixed loss still runs."""
        from tpualign.config import TrainConfig
        from tpualign.train.step import create_train_state, train_step

        model = tiny_model()
        params = init_clip_params(model, seed=0)
        cfg = TrainConfig(learning_rate=1e-3, warmup_steps=0,
                          total_steps=100, distill_weight=0.5)
        rng = np.random.default_rng(9)
        b = 4
        u8 = rng.integers(0, 256, size=(b, 64, 64, 3)).astype(np.uint8)
        hw = np.full((b, 2), 48, np.int32)
        _, tokens, weak = _batch(b, rng)
        # teacher saw the SAME content in spirit; for the composition
        # test any fixed unit-norm rows suffice
        t_img = _unit(rng, b, 24)
        t_txt = _unit(rng, b, 24)
        teacher = (jnp.asarray(t_img), jnp.asarray(t_txt),
                   jnp.asarray(40.0, jnp.float32))

        state = create_train_state(model, params, cfg)
        state, m = train_step(
            state, model, (jnp.asarray(u8), jnp.asarray(hw)),
            jnp.asarray(tokens), jnp.asarray(weak), cfg, None, teacher)
        assert np.isfinite(float(m["loss"]))
        assert float(m["distill_kl"]) > 0.0

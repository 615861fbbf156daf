"""int8 quantized serving path: op accuracy, tower drift, ranking stability.

The int8 mode (CLIP_QUANT=int8) is a serving-only throughput/capacity
lever (1.61x on the MLP stack, benchmarks/bench_int8_gemm.py); these tests
pin its numerics: per-op error bounds, embedding cosine drift vs the fp32
towers, and top-k retrieval agreement — the same style of pin as the int8
retrieval corpus mode.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpualign.config import ClipVariant, ModelConfig
from tpualign.models.clip import CLIP, build_clip, init_clip_params
from tpualign.ops.quant import int8_dot, quantize_weight

TINY = ClipVariant(
    name="tiny", embed_dim=64,
    image_size=32, patch_size=8, vision_width=64, vision_layers=2, vision_heads=4,
    context_length=16, vocab_size=1000, text_width=64, text_layers=2, text_heads=4,
)


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 96)).astype(np.float32))
    w_q, scales = quantize_weight(w)
    assert w_q.dtype == jnp.int8
    assert scales.shape == (1, 96)
    recon = w_q.astype(jnp.float32) * scales
    # symmetric rounding: per-element error <= half a quantization step
    err = np.abs(np.asarray(recon - w))
    assert (err <= np.asarray(scales) / 2 + 1e-7).all()


def test_quantize_weight_zero_column():
    w = jnp.zeros((8, 4), jnp.float32)
    w_q, scales = quantize_weight(w)
    assert np.asarray(w_q).sum() == 0
    assert np.isfinite(np.asarray(scales)).all()


def test_int8_dot_matches_fp32():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(32, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 96)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(96,)).astype(np.float32))
    exact = np.asarray(x @ w + b)
    quant = np.asarray(int8_dot(x, w, b))
    # int8 dynamic quant at gaussian data: ~1% error at the output's scale
    scale = np.sqrt(np.mean(exact**2))
    err = np.abs(quant - exact) / scale
    assert np.max(err) < 0.05
    assert np.mean(err) < 0.01


def test_int8_dot_zero_row_finite():
    x = jnp.zeros((4, 16), jnp.float32)
    w = jnp.ones((16, 8), jnp.float32)
    out = np.asarray(int8_dot(x, w))
    assert np.isfinite(out).all()
    np.testing.assert_array_equal(out, 0.0)


def test_int8_dot_3d_batch():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 5, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(16, 12)).astype(np.float32))
    exact = np.asarray(jnp.einsum("btk,kn->btn", x, w))
    quant = np.asarray(int8_dot(x, w))
    assert quant.shape == (2, 5, 12)
    assert np.max(np.abs(quant - exact)) / np.max(np.abs(exact)) < 0.05


def _embed(model, params, images, tokens):
    img = model.apply({"params": params}, images, normalize=True,
                      method=model.encode_image)
    txt = model.apply({"params": params}, tokens, normalize=True,
                      method=model.encode_text)
    return np.asarray(img), np.asarray(txt)


def test_int8_tower_drift_and_ranking():
    """Quantized towers: high cosine agreement with fp32, stable top-k."""
    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
    tokens = np.zeros((8, 16), np.int32)
    tokens[:, 0] = 998
    tokens[:, 1] = rng.integers(1, 900, size=8)
    tokens[:, 2] = 999
    tokens = jnp.asarray(tokens)

    fp32 = CLIP(variant=TINY, use_quick_gelu=True, compute_dtype=jnp.float32)
    params = init_clip_params(fp32, seed=0)
    q = CLIP(variant=TINY, use_quick_gelu=True, compute_dtype=jnp.float32,
             quant="int8")

    img_f, txt_f = _embed(fp32, params, images, tokens)
    img_q, txt_q = _embed(q, params, images, tokens)

    # per-embedding cosine agreement (both already unit-norm)
    assert np.min(np.sum(img_f * img_q, axis=-1)) > 0.99
    assert np.min(np.sum(txt_f * txt_q, axis=-1)) > 0.99

    # retrieval stability: top-3 chunk sets per image mostly unchanged
    sims_f = img_f @ txt_f.T
    sims_q = img_q @ txt_q.T
    top_f = np.argsort(-sims_f, axis=1)[:, :3]
    top_q = np.argsort(-sims_q, axis=1)[:, :3]
    overlap = np.mean([
        len(set(a) & set(b)) / 3.0 for a, b in zip(top_f, top_q)
    ])
    assert overlap >= 0.75


def test_build_clip_quant_wiring():
    model = build_clip(ModelConfig(model_name="ViT-B-32", quant="int8"))
    assert model.quant == "int8"
    # parity mode forces the quantizer off
    model = build_clip(ModelConfig(model_name="ViT-B-32", quant="int8",
                                   parity_mode=True))
    assert model.quant == "none"
    with pytest.raises(ValueError, match="CLIP_QUANT"):
        build_clip(ModelConfig(model_name="ViT-B-32", quant="fp4"))


def test_env_wiring():
    from tpualign.config import load_config

    cfg = load_config(env_file=None, overrides={"CLIP_QUANT": "int8"})
    assert cfg.model.quant == "int8"


def test_train_step_refuses_quantized_model():
    from tpualign.config import TrainConfig
    from tpualign.parallel.mesh import create_mesh
    from tpualign.train.step import make_sharded_train_step

    model = CLIP(variant=TINY, use_quick_gelu=True,
                 compute_dtype=jnp.float32, quant="int8")
    mesh = create_mesh(1, 1, devices=jax.devices("cpu")[:1])
    with pytest.raises(ValueError, match="zero gradient"):
        make_sharded_train_step(model, mesh, TrainConfig(batch_size=2))


def test_single_device_training_refuses_quantized_model():
    """The guard must also cover the mesh=None fine-tune path (the CLI
    default when MESH_DATA*MESH_MODEL == 1): create_train_state refuses, so
    CLIP_QUANT=int8 can never silently train through round()'s zero
    gradient (ADVICE r2 medium)."""
    from tpualign.config import TrainConfig
    from tpualign.models.clip import init_clip_params
    from tpualign.train.step import create_train_state

    model = CLIP(variant=TINY, use_quick_gelu=True,
                 compute_dtype=jnp.float32, quant="int8")
    clean = CLIP(variant=TINY, use_quick_gelu=True,
                 compute_dtype=jnp.float32)
    params = init_clip_params(clean, seed=0)
    with pytest.raises(ValueError, match="zero gradient"):
        create_train_state(model, params, TrainConfig(batch_size=2))


class TestQAT:
    """Quantization-aware training (CLIP_QUANT=int8_qat): the serving
    rounding grid forward, straight-through gradients backward."""

    def _fake_quant_np(self, x, w):
        w_s = np.maximum(np.max(np.abs(w), axis=0, keepdims=True) / 127.0,
                         1e-12)
        w_fq = np.round(w / w_s) * w_s
        x_s = np.maximum(np.max(np.abs(x), axis=-1, keepdims=True) / 127.0,
                         1e-12)
        x_fq = np.round(x / x_s) * x_s
        return x_fq, w_fq

    def test_forward_matches_serving_int8(self):
        from tpualign.ops.quant import int8_dot_qat

        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(48,)).astype(np.float32))
        serve = np.asarray(int8_dot(x, w, b))
        qat = np.asarray(int8_dot_qat(x, w, b))
        # same grid; only fp32-vs-int32 accumulation order differs
        scale = np.sqrt(np.mean(serve ** 2))
        assert np.max(np.abs(qat - serve)) / scale < 1e-3

    def test_gradients_are_straight_through(self):
        from tpualign.ops.quant import int8_dot_qat

        rng = np.random.default_rng(5)
        x = rng.normal(size=(6, 16)).astype(np.float32)
        w = rng.normal(size=(16, 8)).astype(np.float32)
        x_fq, w_fq = self._fake_quant_np(x, w)

        gx = np.asarray(jax.grad(
            lambda a: jnp.sum(int8_dot_qat(a, jnp.asarray(w))))(
                jnp.asarray(x)))
        gw = np.asarray(jax.grad(
            lambda k: jnp.sum(int8_dot_qat(jnp.asarray(x), k)))(
                jnp.asarray(w)))
        # STE: out behaves as x_fq @ w_fq with identity quantizer grads
        np.testing.assert_allclose(
            gx, np.broadcast_to(w_fq.sum(axis=1), (6, 16)), rtol=1e-5)
        np.testing.assert_allclose(
            gw, np.broadcast_to(x_fq.sum(axis=0)[:, None], (16, 8)),
            rtol=1e-5)
        assert np.abs(gx).max() > 0 and np.abs(gw).max() > 0

    def test_qat_tower_trains(self):
        """A quant='int8_qat' model is accepted by the train state and its
        loss decreases — the guard stays for the dead-gradient int8 mode."""
        from tpualign.config import TrainConfig
        from tpualign.models.clip import init_clip_params
        from tpualign.train.step import create_train_state, train_step

        model = CLIP(variant=TINY, use_quick_gelu=True,
                     compute_dtype=jnp.float32, quant="int8_qat")
        clean = CLIP(variant=TINY, use_quick_gelu=True,
                     compute_dtype=jnp.float32)
        params = init_clip_params(clean, seed=0)
        cfg = TrainConfig(learning_rate=1e-3, warmup_steps=0,
                          total_steps=100, batch_size=8)
        state = create_train_state(model, params, cfg)

        rng = np.random.default_rng(6)
        images = jnp.asarray(
            rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
        tokens = np.zeros((8, 16), np.int32)
        tokens[:, 0] = 998
        tokens[:, 1] = rng.integers(1, 900, size=8)
        tokens[:, 2] = 999
        tokens = jnp.asarray(tokens)
        weak = jnp.asarray(rng.random(8).astype(np.float32))

        step = jax.jit(lambda s: train_step(
            s, model, images, tokens, weak, cfg))
        losses, gnorms = [], []
        for _ in range(10):
            state, m = step(state)
            losses.append(float(m["loss"]))
            gnorms.append(float(m["grad_norm"]))
        assert losses[-1] < losses[0]
        assert min(gnorms) > 0.0

    def test_wiring(self):
        from tpualign.config import load_config

        model = build_clip(ModelConfig(model_name="ViT-B-32",
                                       quant="int8_qat"))
        assert model.quant == "int8_qat"
        cfg = load_config(env_file=None,
                          overrides={"CLIP_QUANT": "int8_qat"})
        assert cfg.model.quant == "int8_qat"

"""Model tests: shapes, determinism, and numerical parity vs a torch CLIP.

The parity test instantiates a small randomly-initialized HuggingFace
``CLIPModel`` on CPU (no network), converts its weights into the tpualign
Flax tree, and requires <=1e-3 max drift between the torch and JAX towers —
the BASELINE.md north-star bound, checked offline.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpualign.config import ClipVariant, ModelConfig
from tpualign.models.clip import CLIP, build_clip, init_clip_params

TINY = ClipVariant(
    name="tiny", embed_dim=64,
    image_size=32, patch_size=8, vision_width=64, vision_layers=2, vision_heads=4,
    context_length=16, vocab_size=1000, text_width=64, text_layers=2, text_heads=4,
)


def tiny_model(**kw):
    return CLIP(variant=TINY, use_quick_gelu=True, compute_dtype=jnp.float32, **kw)


def test_shapes_and_normalization():
    model = tiny_model()
    params = init_clip_params(model, seed=0)
    images = jnp.asarray(np.random.default_rng(0).normal(size=(3, 32, 32, 3)), jnp.float32)
    tokens = jnp.zeros((5, 16), jnp.int32).at[:, 0].set(999)
    img, txt, scale = model.apply({"params": params}, images, tokens)
    assert img.shape == (3, 64)
    assert txt.shape == (5, 64)
    np.testing.assert_allclose(np.linalg.norm(img, axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(txt, axis=-1), 1.0, atol=1e-5)
    assert float(scale) > 0


def test_jit_deterministic():
    model = tiny_model()
    params = init_clip_params(model, seed=0)
    images = jnp.ones((2, 32, 32, 3), jnp.float32)

    @jax.jit
    def f(p, x):
        return model.apply({"params": p}, x, normalize=True, method=model.encode_image)

    a = np.asarray(f(params, images))
    b = np.asarray(f(params, images))
    np.testing.assert_array_equal(a, b)


def test_eot_position_gather():
    """Text features must come from the EOT (max-id) position."""
    model = tiny_model()
    params = init_clip_params(model, seed=0)
    eot = TINY.vocab_size - 1
    t1 = np.zeros((1, 16), np.int32)
    t1[0, :4] = [5, 7, 9, eot]
    t2 = np.zeros((1, 16), np.int32)
    t2[0, :6] = [5, 7, 9, eot, 3, 3]  # junk after EOT must change nothing? (causal: no)
    f = lambda t: np.asarray(
        model.apply({"params": params}, jnp.asarray(t), method=model.encode_text)
    )
    # causal mask => positions after EOT cannot influence the EOT feature
    np.testing.assert_allclose(f(t1), f(t2), atol=1e-5)


@pytest.mark.parametrize("tower", ["image", "text"])
def test_parity_vs_torch_hf(tower):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from transformers import CLIPConfig, CLIPModel

    from tpualign.models.loader import convert_hf_clip_state_dict

    torch.manual_seed(0)
    hf_cfg = CLIPConfig(
        projection_dim=64,
        vision_config={
            "image_size": 32, "patch_size": 8, "hidden_size": 64,
            "intermediate_size": 256, "num_hidden_layers": 2,
            "num_attention_heads": 4, "hidden_act": "quick_gelu",
        },
        text_config={
            "vocab_size": 1000, "hidden_size": 64, "intermediate_size": 256,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "max_position_embeddings": 16, "hidden_act": "quick_gelu",
            "eos_token_id": 999,
        },
    )
    hf = CLIPModel(hf_cfg).eval()
    params = convert_hf_clip_state_dict(hf.state_dict(), TINY)
    model = tiny_model()

    rng = np.random.default_rng(1)
    if tower == "image":
        x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            ref = hf.get_image_features(
                pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2))
            ).numpy()
        got = np.asarray(
            model.apply({"params": params}, jnp.asarray(x), method=model.encode_image)
        )
    else:
        tokens = np.zeros((2, 16), np.int32)
        tokens[0, :5] = [1, 17, 33, 501, 999]
        tokens[1, :3] = [1, 250, 999]
        with torch.no_grad():
            ref = hf.get_text_features(
                input_ids=torch.from_numpy(tokens.astype(np.int64)),
                attention_mask=torch.ones_like(torch.from_numpy(tokens.astype(np.int64))),
            ).numpy()
        got = np.asarray(
            model.apply({"params": params}, jnp.asarray(tokens), method=model.encode_text)
        )

    drift = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-12)
    assert drift <= 1e-3, f"{tower} tower drift {drift:.2e} exceeds 1e-3"


def test_build_clip_variants():
    for name in ["ViT-B-32", "ViT-L-14", "ViT-H-14", "ViT-g-14",
                 "ViT-bigG-14"]:
        cfg = ModelConfig(model_name=name)
        m = build_clip(cfg)
        assert m.variant.embed_dim == cfg.embed_dim
    assert ModelConfig(model_name="ViT-B/32").variant.name == "ViT-B-32"
    assert ModelConfig(pretrained="openai").use_quick_gelu
    assert not ModelConfig(pretrained="laion2b_s34b_b79k").use_quick_gelu


def test_variant_mlp_dim_override():
    """vision_mlp_dim/text_mlp_dim override the 4x rule (the OpenCLIP
    g/bigG towers need non-4x MLP ratios); None keeps 4x."""
    import dataclasses

    v = dataclasses.replace(TINY, vision_mlp_dim=96, text_mlp_dim=80)
    model = CLIP(variant=v, use_quick_gelu=False, compute_dtype=jnp.float32)
    params = init_clip_params(model, seed=0)
    vb = params["visual"]["transformer"]["resblock_0"]["mlp"]
    tb = params["text"]["transformer"]["resblock_0"]["mlp"]
    assert vb["c_fc_kernel"].shape == (64, 96)
    assert vb["c_proj_kernel"].shape == (96, 64)
    assert tb["c_fc_kernel"].shape == (64, 80)
    # default variant keeps the 4x rule
    base = init_clip_params(tiny_model(), seed=0)
    assert (base["visual"]["transformer"]["resblock_0"]["mlp"]
            ["c_fc_kernel"].shape == (64, 256))
    # forward pass runs with the overridden dims
    img, txt, _ = model.apply(
        {"params": params}, jnp.ones((2, 32, 32, 3), jnp.float32),
        jnp.zeros((2, 16), jnp.int32).at[:, 0].set(999),
    )
    assert img.shape == (2, 64) and txt.shape == (2, 64)


@pytest.mark.parametrize("name,total_m", [
    # published OpenCLIP parameter totals (open_clip model profiles):
    # ViT-g-14 1366.68M, ViT-bigG-14 2539.57M
    ("ViT-g-14", 1366.68),
    ("ViT-bigG-14", 2539.57),
])
def test_large_variant_param_counts(name, total_m):
    """The g/bigG configurations reproduce OpenCLIP's published parameter
    counts (within 1%) — pins the non-4x MLP dims, depths, and widths.
    Shape-only (jax.eval_shape): no multi-GB trees are allocated."""
    cfg = ModelConfig(model_name=name, pretrained="laion2b_s34b_b79k")
    model = build_clip(cfg)
    v = model.variant
    images = jnp.zeros((1, v.image_size, v.image_size, 3), jnp.float32)
    tokens = jnp.zeros((1, v.context_length), jnp.int32)
    shapes = jax.eval_shape(
        lambda k: model.init(k, images, tokens), jax.random.PRNGKey(0)
    )["params"]
    total = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert abs(total / 1e6 - total_m) / total_m < 0.01, total / 1e6


class TestVariableLengthText:
    """Causal attention makes pad-tail truncation EXACT: encode_text on
    tokens[:, :T'] must equal the full-context pass whenever every EOT sits
    inside T'. This is the invariant the embed engine's length buckets
    rely on."""

    def _tokens(self, lengths, ctx=16, vocab=1000):
        toks = np.zeros((len(lengths), ctx), np.int32)
        rng = np.random.default_rng(5)
        for i, ln in enumerate(lengths):
            toks[i, 0] = vocab - 2                      # SOT
            toks[i, 1:ln - 1] = rng.integers(1, vocab - 2, size=ln - 2)
            toks[i, ln - 1] = vocab - 1                 # EOT (largest id)
        return toks

    def test_truncated_equals_full(self):
        model = tiny_model()
        params = init_clip_params(model, seed=0)
        toks = self._tokens([4, 6, 8, 3])
        full = model.apply({"params": params}, jnp.asarray(toks),
                           method=model.encode_text)
        trunc = model.apply({"params": params}, jnp.asarray(toks[:, :8]),
                            method=model.encode_text)
        np.testing.assert_allclose(
            np.asarray(trunc), np.asarray(full), atol=1e-5)

    def test_over_context_raises(self):
        model = tiny_model()
        params = init_clip_params(model, seed=0)
        toks = jnp.zeros((2, 17), jnp.int32)
        with pytest.raises(ValueError, match="context_length"):
            model.apply({"params": params}, toks, method=model.encode_text)

"""Checkpoint file-reading safety and layout handling
(tpualign/models/loader.py)."""

import numpy as np
import pytest

from tpualign.models.loader import _read_state_dict

torch = pytest.importorskip("torch")


def test_read_plain_tensor_dict(tmp_path):
    path = str(tmp_path / "ckpt.pt")
    torch.save({"w": torch.ones(2, 2), "b": torch.zeros(3)}, path)
    sd = _read_state_dict(path)
    assert set(sd.keys()) == {"w", "b"}
    np.testing.assert_array_equal(np.asarray(sd["w"]), np.ones((2, 2)))


def test_read_strips_module_prefix(tmp_path):
    path = str(tmp_path / "ckpt.pt")
    torch.save({"module.w": torch.ones(1), "module.b": torch.zeros(1)}, path)
    sd = _read_state_dict(path)
    assert set(sd.keys()) == {"w", "b"}


def test_read_nested_state_dict_key(tmp_path):
    path = str(tmp_path / "ckpt.pt")
    torch.save({"state_dict": {"w": torch.ones(1)}}, path)
    sd = _read_state_dict(path)
    assert "w" in sd


class _Payload:
    """Stand-in for a pickle that weights_only refuses to load."""

    def __reduce__(self):
        return (print, ("pwned",))


def test_pickle_checkpoint_rejected_without_opt_in(tmp_path):
    """Arbitrary-pickle checkpoints must NOT load by default
    (advisor finding: weights_only=False executes pickle code)."""
    path = str(tmp_path / "evil.pt")
    torch.save({"w": torch.ones(1), "obj": _Payload()}, path)
    with pytest.raises(ValueError, match="allow_pickle"):
        _read_state_dict(path)


def test_pickle_checkpoint_loads_with_explicit_opt_in(tmp_path):
    path = str(tmp_path / "trusted.pt")
    torch.save({"w": torch.ones(1), "obj": _Payload()}, path)
    sd = _read_state_dict(path, allow_pickle=True)
    assert "w" in sd


class TestOrbaxCheckpointLoading:
    """CLIP_CHECKPOINT may point at a `tpualign train --ckpt-dir` orbax
    directory — the loader restores this framework's own fine-tuned params
    (EMA preferred), closing the fine-tune -> re-embed loop."""

    def _trained_state(self, ema: bool):
        import jax.numpy as jnp

        from tests.test_models import TINY, tiny_model
        from tpualign.config import TrainConfig
        from tpualign.models.clip import init_clip_params
        from tpualign.train.step import create_train_state, train_step

        model = tiny_model()
        params = init_clip_params(model, seed=0)
        cfg = TrainConfig(learning_rate=1e-3, warmup_steps=0,
                          total_steps=10, ema_decay=0.9 if ema else 0.0)
        state = create_train_state(model, params, cfg)
        rng = np.random.default_rng(31)
        images = rng.normal(size=(4, TINY.image_size, TINY.image_size, 3)
                            ).astype(np.float32)
        tokens = np.zeros((4, TINY.context_length), np.int32)
        tokens[:, 0] = TINY.vocab_size - 2
        tokens[:, 2] = TINY.vocab_size - 1
        weak = rng.random(4).astype(np.float32)
        state, _ = train_step(state, model, jnp.asarray(images),
                              jnp.asarray(tokens), jnp.asarray(weak), cfg)
        return state

    @pytest.mark.parametrize("ema", [False, True])
    def test_loader_reads_train_ckpt_dir(self, tmp_path, ema):
        import jax

        from tpualign.config import ModelConfig
        from tpualign.models.loader import load_checkpoint_params
        from tpualign.train.checkpoint import save_checkpoint

        state = self._trained_state(ema)
        ckdir = tmp_path / "ck"
        save_checkpoint(ckdir, state)

        cfg = ModelConfig(model_name="ViT-B-32",
                          checkpoint_path=str(ckdir))
        loaded = load_checkpoint_params(cfg)
        want = state.ema_params if ema else state.params
        got = loaded["text"]["text_projection"]
        np.testing.assert_array_equal(
            np.asarray(got),
            jax.device_get(want["text"]["text_projection"]))

    def test_missing_steps_raises(self, tmp_path):
        from tpualign.config import ModelConfig
        from tpualign.models.loader import load_checkpoint_params

        empty = tmp_path / "empty"
        empty.mkdir()
        cfg = ModelConfig(model_name="ViT-B-32",
                          checkpoint_path=str(empty))
        with pytest.raises(FileNotFoundError, match="orbax"):
            load_checkpoint_params(cfg)

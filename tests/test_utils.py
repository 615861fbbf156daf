"""Utils tests: profiling meter, debug checks, train checkpointing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpualign.utils.debugging import assert_sharded, check_finite, debug_mode
from tpualign.utils.profiling import ThroughputMeter, annotate, device_barrier


def test_throughput_meter():
    m = ThroughputMeter()
    with m.measure("embed", 100):
        pass
    with m.measure("embed", 50):
        pass
    assert m.counts["embed"] == 150
    assert m.rate("embed") > 0
    assert "embed" in m.report()
    assert m.rate("missing") is None


def test_annotate_and_barrier():
    with annotate("test_span"):
        x = jnp.ones((4, 4)) * 2
    device_barrier(x)
    device_barrier(None)


def test_check_finite():
    check_finite({"a": jnp.ones(3), "b": np.zeros(2)}, "ok")
    with pytest.raises(FloatingPointError):
        check_finite({"a": jnp.asarray([1.0, np.nan])}, "bad")
    # integer leaves are ignored
    check_finite({"i": jnp.asarray([1, 2, 3])})


def test_debug_mode_restores_flag():
    prev = jax.config.jax_debug_nans
    with debug_mode():
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == prev


def test_assert_sharded():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpualign.parallel.mesh import create_mesh

    mesh = create_mesh(8, 1)
    x = jax.device_put(np.zeros((16, 4), np.float32), NamedSharding(mesh, P("data")))
    assert_sharded(x, "data", 0)
    with pytest.raises(AssertionError):
        assert_sharded(x, "model", 0)
    y = jax.device_put(np.zeros((16, 4), np.float32), NamedSharding(mesh, P()))
    with pytest.raises(AssertionError):
        assert_sharded(y, "data", 0)


def test_checkpoint_roundtrip(tmp_path):
    from tests.test_models import TINY, tiny_model
    from tpualign.config import TrainConfig
    from tpualign.models.clip import init_clip_params
    from tpualign.train.checkpoint import (
        latest_step,
        restore_checkpoint,
        save_checkpoint,
    )
    from tpualign.train.step import create_train_state

    model = tiny_model()
    params = init_clip_params(model, seed=0)
    config = TrainConfig()
    state = create_train_state(model, params, config)
    state = state.replace(step=jnp.asarray(7, jnp.int32))

    assert latest_step(tmp_path / "ckpt") is None
    save_checkpoint(tmp_path / "ckpt", state)
    assert latest_step(tmp_path / "ckpt") == 7

    # perturb, then restore
    blank = create_train_state(model, init_clip_params(model, seed=123), config)
    restored = restore_checkpoint(tmp_path / "ckpt", blank)
    assert int(restored.step) == 7
    np.testing.assert_allclose(
        jax.device_get(restored.params["text"]["text_projection"]),
        jax.device_get(state.params["text"]["text_projection"]),
    )
    # missing dir -> None
    assert restore_checkpoint(tmp_path / "nope", blank) is None

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

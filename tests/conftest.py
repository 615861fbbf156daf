"""Test configuration: force an 8-device CPU mesh before JAX import.

The standard JAX fake-backend idiom (SURVEY.md §4): tests never require TPU
hardware; multi-chip sharding paths run on 8 virtual CPU devices.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend and sets
# jax_platforms="axon,cpu" at interpreter start; re-pin to CPU so tests run
# on the virtual 8-device host mesh regardless of environment.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# -- two-tier suite (r5: VERDICT r4 weak #6) --------------------------------
#
# `pytest -m fast` runs the oracle/contract/store/serving core in a few
# minutes on this 1-core box; the full suite stays the merge gate. Tests
# are auto-marked by module below; an explicit @pytest.mark.slow (or
# .fast) on a test/class inside a module overrides its module default —
# used for the handful of mesh/jit-heavy tests living in fast modules.

_FAST_MODULES = {
    "test_config", "test_store", "test_data", "test_weaksup",
    "test_utils", "test_tokenizer", "test_word_ocr", "test_native",
    "test_serving", "test_refine_store",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if (item.get_closest_marker("slow")
                or item.get_closest_marker("fast")):
            continue
        mod = item.module.__name__.rsplit(".", 1)[-1]
        item.add_marker(
            pytest.mark.fast if mod in _FAST_MODULES else pytest.mark.slow
        )


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)

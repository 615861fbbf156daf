"""Two-process jax.distributed smoke test (CPU backend).

Exercises the one branch of tpualign/parallel/multihost.py that
single-process tests can't: a real ``jax.distributed.initialize`` across two
OS processes, a global mesh spanning both, and a psum that crosses the
process boundary.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

from tpualign.parallel.multihost import initialize_distributed, hybrid_mesh

assert initialize_distributed() is True  # from COORDINATOR_ADDRESS etc.
assert jax.process_count() == 2
assert jax.device_count() == 4  # 2 virtual CPU devices per process

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = hybrid_mesh(model_parallel=2)
assert mesh.shape == {"data": 2, "model": 2}

# one global array sharded over data; psum over both axes must see every
# process's contribution: global value = sum over 4 shards
pid = jax.process_index()


def body(x):
    return jax.lax.psum(x, ("data", "model"))


out = jax.jit(
    jax.shard_map(
        body, mesh=mesh, in_specs=P("data", "model"), out_specs=P(),
    )
)(
    jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data", "model")),
        # each process owns one data row (both model columns locally)
        np.full((1, 2), float(pid + 1), np.float32),
        global_shape=(2, 2),
    )
)
total = float(jax.device_get(out)[0, 0] if out.ndim else out)
# process 0 contributes 1.0 per local shard (2 shards), process 1 -> 2.0
assert total == 6.0, total
print(f"worker {pid} psum ok: {total}")
"""


def test_two_process_distributed_psum(tmp_path):
    # pick a free port for the coordinator
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = {
            k: v for k, v in os.environ.items()
            if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
        }
        env.update(
            COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            NUM_PROCESSES="2",
            PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                cwd=repo, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-2000:]}"
        assert "psum ok: 6.0" in out

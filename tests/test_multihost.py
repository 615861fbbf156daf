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


_TRAIN_WORKER = r"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tpualign.parallel.multihost import initialize_distributed, hybrid_mesh
from tpualign.config import ClipVariant, TrainConfig
from tpualign.models.clip import CLIP, init_clip_params
from tpualign.train.step import create_train_state, make_sharded_train_step

assert initialize_distributed() is True
pid = jax.process_index()
mesh = hybrid_mesh(model_parallel=2)  # data=2 across processes, model=2 local

variant = ClipVariant(
    name="mh", embed_dim=32, image_size=16, patch_size=8, vision_width=64,
    vision_layers=1, vision_heads=2, context_length=8, vocab_size=128,
    text_width=64, text_layers=1, text_heads=2,
)
model = CLIP(variant=variant, use_quick_gelu=True, compute_dtype=jnp.float32)
params = init_clip_params(model, seed=0)  # identical on both processes
config = TrainConfig(batch_size=4, warmup_steps=1, total_steps=4,
                     learning_rate=1e-3)
state = create_train_state(model, params, config)
step_fn, shard_state = make_sharded_train_step(model, mesh, config)
state = shard_state(state)

# global batch 4, data axis = 2 processes -> each supplies 2 local rows
rng = np.random.default_rng(0)
g_images = rng.normal(size=(4, 16, 16, 3)).astype(np.float32)
g_tokens = np.zeros((4, 8), np.int32); g_tokens[:, 0] = 126; g_tokens[:, 2] = 127
g_weak = rng.random(4).astype(np.float32)
lo, hi = 2 * pid, 2 * pid + 2

def place(local, spec, gshape):
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), local, global_shape=gshape
    )

images = place(g_images[lo:hi], P("data", None, None, None), g_images.shape)
tokens = place(g_tokens[lo:hi], P("data", None), g_tokens.shape)
weak = place(g_weak[lo:hi], P("data"), g_weak.shape)

# call a jitted step directly (the convenience run() wrapper device_puts
# host arrays, which assumes single-controller semantics)
from tpualign.train import step as step_mod

jitted = jax.jit(
    lambda s, i, t, w: step_mod.train_step(s, model, i, t, w, config),
    donate_argnums=(0,),
)
new_state, metrics = jitted(state, images, tokens, weak)
loss = float(jax.device_get(metrics["loss"]))
gn = float(jax.device_get(metrics["grad_norm"]))
assert np.isfinite(loss) and np.isfinite(gn)
assert int(jax.device_get(new_state.step)) == 1
print(f"worker {pid} train ok: loss={loss:.6f} grad_norm={gn:.6f}")
"""


def test_two_process_sharded_train_step(tmp_path):
    """One full TP+DP training step across two OS processes: data axis
    spans processes (gradient psum over DCN-analog), model axis local."""
    import os
    import socket
    import subprocess
    import sys

    worker = _TRAIN_WORKER

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        env.update(COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                   NUM_PROCESSES="2", PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", worker], cwd=repo, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = [p.communicate(timeout=600) for p in procs]
    losses = []
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-3000:]}"
        assert "train ok" in out
        losses.append(out.split("loss=")[1].split(" ")[0])
    assert losses[0] == losses[1]  # both processes agree on the global loss


class TestHybridDeviceOrder:
    """DCN-safety invariant of the multi-slice mesh layout: no TP group
    may straddle a slice boundary (its collectives would ride DCN)."""

    def test_two_slices_model_groups_stay_in_slice(self):
        from tpualign.parallel.multihost import hybrid_device_order

        # 2 slices x 4 devices, interleaved enumeration order
        slice_ids = [0, 1, 0, 1, 0, 1, 0, 1]
        grid = hybrid_device_order(slice_ids, model_parallel=2)
        assert grid.shape == (4, 2)
        ids = [[slice_ids[i] for i in row] for row in grid]
        for row in ids:
            assert len(set(row)) == 1, f"TP group crosses DCN: {ids}"
        # data axis is slice-major: slice 0 rows first
        assert [r[0] for r in ids] == [0, 0, 1, 1]

    def test_uneven_slice_raises(self):
        from tpualign.parallel.multihost import hybrid_device_order

        with pytest.raises(ValueError, match="straddle"):
            hybrid_device_order([0, 0, 0, 1], model_parallel=2)

    def test_indivisible_total_raises(self):
        from tpualign.parallel.multihost import hybrid_device_order

        with pytest.raises(ValueError, match="not divisible"):
            hybrid_device_order([0, 0, 0], model_parallel=2)

    def test_single_slice_contiguous(self):
        from tpualign.parallel.multihost import hybrid_device_order

        grid = hybrid_device_order([0] * 8, model_parallel=2)
        assert grid.tolist() == [[0, 1], [2, 3], [4, 5], [6, 7]]

    def test_hybrid_mesh_on_cpu_devices(self):
        import jax
        from tpualign.parallel.multihost import hybrid_mesh

        mesh = hybrid_mesh(model_parallel=2)
        assert mesh.shape == {"data": len(jax.devices()) // 2, "model": 2}


_RETRIEVAL_WORKER = r"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tpualign.parallel.multihost import initialize_distributed, hybrid_mesh
from tpualign.parallel.retrieval import RetrievalIndex, encode_keys

assert initialize_distributed() is True
pid = jax.process_index()
mesh = hybrid_mesh(model_parallel=1)  # data axis = 4, spanning 2 processes

# identical corpus on both processes (single seed): the standard
# multi-controller SPMD contract
rng = np.random.default_rng(0)
n, d = 64, 16
c = rng.normal(size=(n, d)).astype(np.float32)
c /= np.linalg.norm(c, axis=1, keepdims=True)
man = [f"m{i % 2}" for i in range(n)]
page = [1 + i % 3 for i in range(n)]

for prec in ("fp32", "int8"):
    index = RetrievalIndex(c, man, page, mesh=mesh, precision=prec)
    q = c[:8]
    qk, _ = encode_keys(man[:8], page[:8], dict(index.vocab))
    qg = jax.device_put(jnp.asarray(q), NamedSharding(mesh, P()))
    qkg = jax.device_put(jnp.asarray(qk, jnp.int32),
                         NamedSharding(mesh, P()))
    from jax.experimental import multihost_utils

    for strat in ("gather", "streaming"):
        vals, idx = index.search_device(qg, qkg, 4, strategy=strat)
        # the jitted merge's output sharding may span processes; gather
        # the global value (the standard multi-controller fetch)
        idx = np.asarray(multihost_utils.process_allgather(idx,
                                                           tiled=True))
        assert (idx[:, 0] == np.arange(8)).all(), (prec, strat, idx[:, 0])
print(f"worker {pid} retrieval ok")
"""


def test_two_process_sharded_retrieval(tmp_path):
    """Sharded retrieval (gather + streaming, fp32 + int8) across two
    real OS processes: the corpus shards over a data axis that spans the
    process boundary, winners merge with cross-process collectives, and
    self-queries rank themselves first on both controllers."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        env.update(COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                   NUM_PROCESSES="2", PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _RETRIEVAL_WORKER], cwd=repo, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-3000:]}"
        assert "retrieval ok" in out

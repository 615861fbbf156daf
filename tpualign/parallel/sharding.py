"""Partition specs for the CLIP towers: tensor parallelism + optional FSDP.

Megatron-style column/row sharding of each transformer block over the
``model`` mesh axis:

- attention ``in_proj_kernel`` (d, 3d) — column-sharded (output features);
- attention ``out_proj_kernel`` (d, d) — row-sharded (input features), so
  the block's attention output needs one reduce (GSPMD inserts the psum);
- MLP ``c_fc_kernel`` (d, 4d) — column-sharded; ``c_proj_kernel`` (4d, d)
  — row-sharded;
- matching bias shards on column-sharded outputs; everything else
  (embeddings, layernorms, projections) replicated.

ViT-B/L fit on one chip, so TP is only engaged for configs with
mesh.model > 1 (H-14 scale) — on a (N, 1) mesh all specs collapse to
replication. Correctness is GSPMD's job; these specs only pin layout.

FSDP (ZeRO-3-style fully-sharded data parallelism): with ``fsdp > 1``
(the size of the ``data`` mesh axis), every parameter matrix additionally
shards one of its TP-free dims over ``data``. Params, gradients, AdamW
moments, and the EMA tree then all live at 1/(data*model) per device;
GSPMD inserts the per-layer weight all-gathers in the forward/backward
pass and reduce-scatters the gradients — the standard JAX FSDP recipe
(spec-driven, no hand-written collectives). Only dims divisible by the
axis size shard (XLA would pad otherwise); 0-D/1-D leaves stay on their
TP spec — they are layernorms/biases, a negligible fraction of memory.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["clip_param_specs", "shard_params", "data_spec"]


def _leaf_spec(path: str) -> P:
    """Partition spec for one parameter, keyed on its tree path."""
    if path.endswith("attn/in_proj_kernel") or path.endswith("mlp/c_fc_kernel"):
        return P(None, "model")
    if path.endswith("attn/in_proj_bias") or path.endswith("mlp/c_fc_bias"):
        return P("model")
    if path.endswith("attn/out_proj_kernel") or path.endswith("mlp/c_proj_kernel"):
        return P("model", None)
    # out_proj_bias, c_proj_bias, layernorms, embeddings, projections: replicated
    return P()


def _with_fsdp(spec: P, shape, fsdp: int, axis: str = "data") -> P:
    """Add ``axis`` to the largest TP-free, divisible dim of ``shape``."""
    entries = list(spec) + [None] * (len(shape) - len(spec))
    best: Optional[int] = None
    for i, (n, s) in enumerate(zip(shape, entries)):
        if s is None and n % fsdp == 0 and (best is None or n > shape[best]):
            best = i
    if best is None:
        return spec
    entries[best] = axis
    return P(*entries)


def clip_param_specs(
    params: Dict[str, Any], fsdp: int = 1
) -> Dict[str, Any]:
    """PartitionSpec tree matching a CLIP param tree.

    ``fsdp``: size of the ``data`` mesh axis to additionally shard every
    >=2-D parameter over (1 = plain TP specs, params replicated across
    ``data``).
    """

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: walk(v, f"{prefix}/{k}") for k, v in tree.items()}
        spec = _leaf_spec(prefix)
        if fsdp > 1 and getattr(tree, "ndim", 0) >= 2:
            spec = _with_fsdp(spec, tree.shape, fsdp)
        return spec

    return walk(params)


def shard_params(
    params: Dict[str, Any], mesh: Mesh, fsdp: bool = False
) -> Dict[str, Any]:
    """Place a param tree onto the mesh according to the TP(+FSDP) specs."""
    specs = clip_param_specs(
        params, fsdp=mesh.shape["data"] if fsdp else 1
    )
    return jax.tree.map(
        lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec)),
        params,
        specs,
    )


def data_spec(ndim: int) -> P:
    """Batch-leading data-parallel spec: shard dim 0 over ``data``."""
    return P("data", *([None] * (ndim - 1)))

"""Tensor-parallel partition specs for the CLIP towers.

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
"""

from __future__ import annotations

from typing import Any, Dict

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


def clip_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec tree matching a CLIP param tree."""

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: walk(v, f"{prefix}/{k}") for k, v in tree.items()}
        return _leaf_spec(prefix)

    return walk(params)


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a param tree onto the mesh according to the TP specs."""
    specs = clip_param_specs(params)
    return jax.tree.map(
        lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec)),
        params,
        specs,
    )


def data_spec(ndim: int) -> P:
    """Batch-leading data-parallel spec: shard dim 0 over ``data``."""
    return P("data", *([None] * (ndim - 1)))

"""SPMD parallelism over a TPU device mesh.

The reference is strictly single-process with zero parallelism — every image
and chunk is embedded one at a time and retrieval is per-query SQL
(SURVEY.md §2.3/§2.4). This module supplies the missing scale-out layer,
TPU-native:

- :mod:`tpualign.parallel.mesh` — ``("data", "model")`` mesh construction;
- :mod:`tpualign.parallel.sharding` — tensor-parallel partition specs for
  the CLIP towers (heads/MLP-hidden over ``model``);
- :mod:`tpualign.parallel.embed` — data-parallel batched embedding engine;
- :mod:`tpualign.parallel.retrieval` — corpus-sharded similarity matmul +
  distributed top-k with same-page candidate masking (the pgvector HNSW
  replacement; exact, not approximate);
- :mod:`tpualign.parallel.ivf` — cluster-probed approximate index (the
  pgvector IVFFlat equivalent): k-means trained on device, searched by
  a scalar-prefetch Pallas kernel; shards FAISS-style over the mesh.
"""

from tpualign.parallel.mesh import create_mesh, default_mesh  # noqa: F401
from tpualign.parallel.sharding import clip_param_specs, shard_params  # noqa: F401
from tpualign.parallel.embed import EmbedEngine  # noqa: F401
from tpualign.parallel.retrieval import (  # noqa: F401
    RetrievalIndex,
    sharded_topk_search,
)
from tpualign.parallel.ivf import IVFIndex  # noqa: F401
from tpualign.parallel.hnsw import HNSWIndex  # noqa: F401

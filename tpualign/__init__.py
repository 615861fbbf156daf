"""tpualign — TPU-native multimodal alignment of noisy image-text pairs using weak supervision.

A ground-up JAX/Flax/Pallas rebuild of the capabilities of
``guille-gil/Multimodal-Alignment-of-Noisy-Image-Text-Pairs-using-Weak-Supervision``:

- Host-side document processing (PDF/Word image+text extraction, chunking,
  captions, lexical vocabulary)  -> :mod:`tpualign.data`
- CLIP image/text towers (ViT-B-32 / ViT-L-14 / ViT-H-14) as Flax modules
  compiled by XLA for TPU        -> :mod:`tpualign.models`
- On-device preprocessing and fused ops (Pallas)  -> :mod:`tpualign.ops`
- SPMD parallelism: mesh, tensor-parallel tower sharding, data-parallel
  embedding engine, sharded similarity + distributed top-k retrieval (the
  pgvector replacement)          -> :mod:`tpualign.parallel`
- Vectorized weak supervision (lexical overlap, bbox IoU/distance)
                                 -> :mod:`tpualign.weaksup`
- Four-schema embedding store (vanilla_clip / clip_lexical / clip_positional
  / clip_combined)               -> :mod:`tpualign.store`
- Retrieval evaluation: Top-K accuracy, MRR, mean similarity, plots
                                 -> :mod:`tpualign.evaluation`
- Weak-supervision-weighted contrastive fine-tuning (CLIP/SigLIP losses,
  FLIP patch masking, sharded orbax checkpoints) -> :mod:`tpualign.train`
- Device-resident retrieval serving daemon (HTTP/JSON) -> :mod:`tpualign.serving`
- Pipeline orchestrator + CLI (incl. streaming ingest/watch)
                                 -> :mod:`tpualign.pipeline`, ``python -m tpualign``

Reference behavior citations in docstrings use ``ref:<file>:<lines>`` and are
relative to the upstream repository root.
"""

__version__ = "0.1.0"

from tpualign.config import (  # noqa: F401
    ClipVariant,
    DataConfig,
    MeshConfig,
    ModelConfig,
    PipelineConfig,
    StoreConfig,
    load_config,
)

SCHEMAS = ("vanilla_clip", "clip_lexical", "clip_positional", "clip_combined")

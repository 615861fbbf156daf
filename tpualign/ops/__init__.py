"""Device-side ops: preprocessing, normalization, masked similarity top-k.

Replaces the reference's torchvision preprocess + pgvector cosine operator
(ref:src/insert_clip_embeddings.py:80-82,108; ref:src/evaluate_alignments.py:95-99)
with XLA/Pallas implementations.
"""

from tpualign.ops.preprocess import (  # noqa: F401
    CLIP_MEAN,
    CLIP_STD,
    preprocess_host,
    preprocess_device,
    normalize_images,
)
from tpualign.ops.similarity import (  # noqa: F401
    l2_normalize,
    cosine_similarity_matrix,
    masked_topk,
)

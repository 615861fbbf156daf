"""Weak supervision: lexical-overlap and bbox-positional alignment scoring.

Vectorized rebuild of the reference's per-pair Python loops
(ref:src/insert_clip_embeddings.py:144-210,369-414): the O(images x chunks)
nested loop becomes batched array ops over an (I, C) grid with same-page
masking, suitable for on-device fusion into retrieval reranking.
"""

from tpualign.weaksup.lexical import (  # noqa: F401
    lexical_match_counts,
    lexical_scores,
)
from tpualign.weaksup.positional import positional_scores  # noqa: F401
from tpualign.weaksup.alignment import (  # noqa: F401
    compute_alignments,
    LEXICAL_THRESHOLD,
    POSITIONAL_THRESHOLD,
    COMBINED_THRESHOLD,
)
from tpualign.weaksup.calibration import (  # noqa: F401
    apply_calibration,
    calibrate_schema,
    fit_isotonic,
)

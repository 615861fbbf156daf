"""Alignment computation: thresholds, combination, record generation.

Vectorizes the reference's alignment loop
(ref:src/insert_clip_embeddings.py:369-414) over the (images x chunks) grid:

- candidates are pairs with equal manual_id AND equal page;
- lexical score kept iff > 0.05; positional kept iff > 0.05;
- when both strategies are enabled and BOTH survive: one 'combined' row with
  the mean score, kept iff > 0.1 (and no individual rows for that pair);
- otherwise each surviving individual score becomes its own typed row.

Record emission order is image-major then chunk-minor then
lexical-before-positional — the reference's iteration order — so stored
alignment tables compare byte-for-byte.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from tpualign.weaksup.lexical import lexical_scores
from tpualign.weaksup.positional import positional_scores

__all__ = [
    "LEXICAL_THRESHOLD",
    "POSITIONAL_THRESHOLD",
    "COMBINED_THRESHOLD",
    "same_page_mask",
    "alignment_grids",
    "compute_alignments",
]

LEXICAL_THRESHOLD = 0.05     # ref:src/insert_clip_embeddings.py:387
POSITIONAL_THRESHOLD = 0.05  # ref:src/insert_clip_embeddings.py:393
COMBINED_THRESHOLD = 0.1     # ref:src/insert_clip_embeddings.py:400


def same_page_mask(images: Sequence[dict], chunks: Sequence[dict]) -> np.ndarray:
    """(I, C) bool: equal manual_id and equal page
    (ref:src/insert_clip_embeddings.py:377-379)."""
    key_to_idx: Dict[Tuple, List[int]] = {}
    for j, c in enumerate(chunks):
        key_to_idx.setdefault((c["manual_id"], c.get("page")), []).append(j)
    mask = np.zeros((len(images), len(chunks)), dtype=bool)
    for i, img in enumerate(images):
        for j in key_to_idx.get((img["manual_id"], img.get("page")), ()):
            mask[i, j] = True
    return mask


def alignment_grids(
    images: Sequence[dict],
    chunks: Sequence[dict],
    lexical_terms: Sequence[str],
    use_lexical: bool,
    use_positional: bool,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Dense (I, C) score grids + candidate mask.

    Returns (mask, lex_grid, pos_grid); disabled strategies return zero
    grids. Lexical scores are per-chunk broadcast across images.
    """
    I, C = len(images), len(chunks)
    mask = same_page_mask(images, chunks)
    lex = np.zeros((I, C), np.float32)
    pos = np.zeros((I, C), np.float32)
    if use_lexical and C:
        lex_c = lexical_scores([c["text"] for c in chunks], lexical_terms)
        lex = np.broadcast_to(lex_c[None, :], (I, C)).copy()
    if use_positional and I and C:
        img_bb = np.asarray(
            [_bbox4(img.get("bbox")) for img in images], np.float32
        )
        chk_bb = np.asarray(
            [_bbox4(c.get("bbox")) for c in chunks], np.float32
        )
        pos = np.asarray(positional_scores(img_bb, chk_bb))
        # wrong-arity / missing bboxes score 0 (handled by _bbox4 zeroing)
    return mask, lex, pos


def _bbox4(bbox) -> List[float]:
    """Normalize to exactly 4 floats; invalid -> zeros (which the scorer
    treats as degenerate, matching the reference's early returns)."""
    if not bbox or len(bbox) != 4:
        return [0.0, 0.0, 0.0, 0.0]
    return [float(v) for v in bbox]


def compute_alignments(
    images: Sequence[dict],
    chunks: Sequence[dict],
    lexical_terms: Sequence[str],
    use_lexical: bool,
    use_positional: bool,
) -> List[Tuple[str, str, float, str]]:
    """All (image_id, chunk_id, weak_score, alignment_type) records for one
    schema, reference-ordered."""
    if not (use_lexical or use_positional):
        return []
    mask, lex, pos = alignment_grids(
        images, chunks, lexical_terms, use_lexical, use_positional
    )
    lex_ok = use_lexical & (lex > LEXICAL_THRESHOLD)
    pos_ok = use_positional & (pos > POSITIONAL_THRESHOLD)

    records: List[Tuple[str, str, float, str]] = []
    both_mode = use_lexical and use_positional
    I, C = mask.shape
    cand = np.argwhere(mask)
    for i, j in cand:
        if both_mode and lex_ok[i, j] and pos_ok[i, j]:
            combined = (float(lex[i, j]) + float(pos[i, j])) / 2.0
            if combined > COMBINED_THRESHOLD:
                records.append(
                    (images[i]["image_id"], chunks[j]["chunk_id"], combined, "combined")
                )
        else:
            if lex_ok[i, j]:
                records.append(
                    (images[i]["image_id"], chunks[j]["chunk_id"], float(lex[i, j]), "lexical")
                )
            if pos_ok[i, j]:
                records.append(
                    (images[i]["image_id"], chunks[j]["chunk_id"], float(pos[i, j]), "positional")
                )
    return records

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


# Dense-grid cell budget per image batch. The full (I, C) cartesian is
# O(I*C) memory — 20k images x 500k chunks would be three ~40 GB grids
# (found by benchmarks/bench_pipeline_scale.py at the 1M-pair scale:
# 94 GB RSS peak, r5) — while the VALID pairs are only the same-page
# ones. Batching images and scoring each batch against just ITS pages'
# chunks bounds the dense work at ~batch_cells fp32 cells with
# bit-identical per-pair math and emission order.
_ALIGN_BATCH_CELLS = 8 * 1024 * 1024


def compute_alignments(
    images: Sequence[dict],
    chunks: Sequence[dict],
    lexical_terms: Sequence[str],
    use_lexical: bool,
    use_positional: bool,
) -> List[Tuple[str, str, float, str]]:
    """All (image_id, chunk_id, weak_score, alignment_type) records for one
    schema, reference-ordered (image-major, chunk-minor,
    lexical-before-positional — ref:src/insert_clip_embeddings.py:369-414).

    Memory is O(valid pairs + batch), not O(I*C): images are processed
    in batches, each scored only against the chunks of its own
    (manual, page) keys."""
    if not (use_lexical or use_positional):
        return []
    I, C = len(images), len(chunks)
    if I == 0 or C == 0:
        return []
    lex_c = (
        np.asarray(
            lexical_scores([c["text"] for c in chunks], lexical_terms),
            np.float32,
        )
        if use_lexical
        else np.zeros(C, np.float32)
    )
    key_to_idx: Dict[Tuple, List[int]] = {}
    for j, c in enumerate(chunks):
        key_to_idx.setdefault((c["manual_id"], c.get("page")), []).append(j)
    img_keys = [(img["manual_id"], img.get("page")) for img in images]
    chunks_per_key = {k: len(v) for k, v in key_to_idx.items()}

    if use_positional:
        chk_bb = np.asarray([_bbox4(c.get("bbox")) for c in chunks],
                            np.float32)

    records: List[Tuple[str, str, float, str]] = []
    both_mode = use_lexical and use_positional
    i0 = 0
    while i0 < I:
        # grow the image batch until its dense sub-grid hits the budget
        i1 = i0
        keys: Dict[Tuple, None] = {}
        cols = 0
        while i1 < I:
            k = img_keys[i1]
            extra = 0 if k in keys else chunks_per_key.get(k, 0)
            if i1 > i0 and (i1 - i0 + 1) * (cols + extra) > _ALIGN_BATCH_CELLS:
                break
            if k not in keys:
                keys[k] = None
                cols += extra
            i1 += 1
        union: List[int] = sorted(
            j for k in keys for j in key_to_idx.get(k, ())
        )
        if union:
            col_of = {j: bj for bj, j in enumerate(union)}
            if use_positional:
                img_bb = np.asarray(
                    [_bbox4(images[i].get("bbox")) for i in range(i0, i1)],
                    np.float32,
                )
                pos_grid = np.asarray(
                    positional_scores(img_bb, chk_bb[union]), np.float32
                )
            for i in range(i0, i1):
                for j in key_to_idx.get(img_keys[i], ()):
                    lex_v = float(lex_c[j])
                    pos_v = (
                        float(pos_grid[i - i0, col_of[j]])
                        if use_positional else 0.0
                    )
                    lex_hit = use_lexical and lex_v > LEXICAL_THRESHOLD
                    pos_hit = use_positional and pos_v > POSITIONAL_THRESHOLD
                    if both_mode and lex_hit and pos_hit:
                        combined = (lex_v + pos_v) / 2.0
                        if combined > COMBINED_THRESHOLD:
                            records.append((
                                images[i]["image_id"],
                                chunks[j]["chunk_id"], combined, "combined",
                            ))
                    else:
                        if lex_hit:
                            records.append((
                                images[i]["image_id"],
                                chunks[j]["chunk_id"], lex_v, "lexical",
                            ))
                        if pos_hit:
                            records.append((
                                images[i]["image_id"],
                                chunks[j]["chunk_id"], pos_v, "positional",
                            ))
        i0 = i1
    return records

"""Positional (bounding-box) alignment scoring, fully vectorized.

Reference semantics per pair (ref:src/insert_clip_embeddings.py:159-210):

- missing bbox / wrong arity / zero width or height (either box) -> 0;
- boxes intersect (strict: x2_i > x1_i and y2_i > y1_i) -> IoU
  (0 when union == 0);
- disjoint -> ``max(0, 1 - centre_distance / 1000)``.

Here the whole (I, C) score grid is one batched jnp computation — the
device-side replacement for the reference's nested Python loop
(ref:src/insert_clip_embeddings.py:369-414). Degenerate-bbox handling is
mask arithmetic so shapes stay static.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["positional_scores", "MAX_CENTER_DISTANCE"]

MAX_CENTER_DISTANCE = 1000.0  # ref:src/insert_clip_embeddings.py:196


def positional_scores(img_bboxes, chunk_bboxes) -> jnp.ndarray:
    """(I, 4) x (C, 4) -> (I, C) float32 positional alignment scores.

    Inputs may be numpy or jax arrays; rows of all zeros (or zero
    width/height) yield 0 against everything, matching the scalar reference.
    """
    a = jnp.asarray(img_bboxes, jnp.float32)  # (I, 4)
    b = jnp.asarray(chunk_bboxes, jnp.float32)  # (C, 4)

    aw = a[:, 2] - a[:, 0]
    ah = a[:, 3] - a[:, 1]
    bw = b[:, 2] - b[:, 0]
    bh = b[:, 3] - b[:, 1]
    valid = ((aw != 0) & (ah != 0))[:, None] & ((bw != 0) & (bh != 0))[None, :]

    x1 = jnp.maximum(a[:, None, 0], b[None, :, 0])
    y1 = jnp.maximum(a[:, None, 1], b[None, :, 1])
    x2 = jnp.minimum(a[:, None, 2], b[None, :, 2])
    y2 = jnp.minimum(a[:, None, 3], b[None, :, 3])
    intersects = (x2 > x1) & (y2 > y1)

    inter = jnp.maximum(0.0, x2 - x1) * jnp.maximum(0.0, y2 - y1)
    area_a = (aw * ah)[:, None]
    area_b = (bw * bh)[None, :]
    union = area_a + area_b - inter
    iou = jnp.where(union != 0, inter / jnp.where(union != 0, union, 1.0), 0.0)

    acx = (a[:, 0] + a[:, 2]) * 0.5
    acy = (a[:, 1] + a[:, 3]) * 0.5
    bcx = (b[:, 0] + b[:, 2]) * 0.5
    bcy = (b[:, 1] + b[:, 3]) * 0.5
    dist = jnp.sqrt(
        (acx[:, None] - bcx[None, :]) ** 2 + (acy[:, None] - bcy[None, :]) ** 2
    )
    dist_score = jnp.maximum(0.0, 1.0 - dist / MAX_CENTER_DISTANCE)

    score = jnp.where(intersects, iou, dist_score)
    return jnp.where(valid, score, 0.0).astype(jnp.float32)


def positional_score_scalar(img_bbox, chunk_bbox) -> float:
    """Direct scalar transcription of the reference math — the oracle used
    by tests to pin the vectorized version (ref:src/insert_clip_embeddings.py:159-210)."""
    if not img_bbox or not chunk_bbox:
        return 0.0
    if len(img_bbox) != 4 or len(chunk_bbox) != 4:
        return 0.0
    if (img_bbox[2] - img_bbox[0] == 0) or (img_bbox[3] - img_bbox[1] == 0):
        return 0.0
    if (chunk_bbox[2] - chunk_bbox[0] == 0) or (chunk_bbox[3] - chunk_bbox[1] == 0):
        return 0.0
    x1 = max(img_bbox[0], chunk_bbox[0])
    y1 = max(img_bbox[1], chunk_bbox[1])
    x2 = min(img_bbox[2], chunk_bbox[2])
    y2 = min(img_bbox[3], chunk_bbox[3])
    if x2 <= x1 or y2 <= y1:
        ic = ((img_bbox[0] + img_bbox[2]) / 2, (img_bbox[1] + img_bbox[3]) / 2)
        cc = ((chunk_bbox[0] + chunk_bbox[2]) / 2, (chunk_bbox[1] + chunk_bbox[3]) / 2)
        d = float(np.sqrt((ic[0] - cc[0]) ** 2 + (ic[1] - cc[1]) ** 2))
        return max(0.0, 1.0 - d / MAX_CENTER_DISTANCE)
    inter = max(0, x2 - x1) * max(0, y2 - y1)
    union = (
        (img_bbox[2] - img_bbox[0]) * (img_bbox[3] - img_bbox[1])
        + (chunk_bbox[2] - chunk_bbox[0]) * (chunk_bbox[3] - chunk_bbox[1])
        - inter
    )
    if union == 0:
        return 0.0
    return inter / union

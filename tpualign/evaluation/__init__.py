"""Retrieval evaluation: Top-K accuracy, MRR, mean similarity, plots.

Rebuild of ref:src/evaluate_alignments.py with the same metric definitions —
including the reference's ground-truth quirk: "true pairs" are the FULL
cartesian product of images x chunks sharing (manual_id, page)
(ref:src/evaluate_alignments.py:48-69) — but computed with one sharded
on-TPU retrieval pass per schema instead of per-pair SQL round-trips
(the reference re-opens a DB connection per query and recomputes Top-K for
its plots, ref:src/evaluate_alignments.py:109-143,273-315).

Plot functions import lazily so the metrics path works without matplotlib
(the ``eval`` extra).
"""

from tpualign.evaluation.metrics import (  # noqa: F401
    Evaluator,
    get_image_text_pairs,
)

_PLOT_NAMES = (
    "plot_similarity_distributions",
    "plot_top_k_comparison",
    "plot_weak_supervision_scores",
)

__all__ = ["Evaluator", "get_image_text_pairs", *_PLOT_NAMES]


def __getattr__(name):
    if name in _PLOT_NAMES:
        from tpualign.evaluation import plots

        return getattr(plots, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

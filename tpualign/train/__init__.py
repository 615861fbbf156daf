"""Weak-supervision-weighted contrastive fine-tuning.

The reference performs no training — it uses frozen OpenCLIP embeddings and
heuristic weak-supervision scores only (SURVEY.md §6). This module is the
rebuild's extension that closes the loop: the weak scores (lexical overlap +
bbox proximity) become per-pair confidence weights in a symmetric CLIP
contrastive loss, so the towers can be fine-tuned on the noisy manual corpus
itself. Runs SPMD over the (data, model) mesh: batch sharded over ``data``,
tower params TP-sharded over ``model``.
"""

from tpualign.train.loss import clip_contrastive_loss  # noqa: F401
from tpualign.train.step import TrainState, create_train_state, train_step  # noqa: F401

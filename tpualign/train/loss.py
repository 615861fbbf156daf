"""Contrastive loss with weak-supervision weighting.

Symmetric CLIP InfoNCE over the global batch (image->text and text->image
cross entropy against the diagonal), with one extension: per-pair weak
supervision scores w in [0, 1] (from tpualign.weaksup) reweight each pair's
contribution — noisy pairs (low lexical/positional agreement) pull on the
towers less. ``weight_temperature`` controls the sharpness of the weighting:
weights are normalized as softmax(w / T) * B so the mean gradient scale is
independent of the score distribution.

All math is jit-traceable with static shapes; under pjit/GSPMD the (B, B)
logit matrix parallelizes across the mesh automatically when the batch is
sharded over ``data``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["clip_contrastive_loss", "siglip_loss", "distill_kl_loss"]


def distill_kl_loss(
    student_img: jnp.ndarray,
    student_txt: jnp.ndarray,
    student_scale: jnp.ndarray,
    teacher_img: jnp.ndarray,
    teacher_txt: jnp.ndarray,
    teacher_scale: jnp.ndarray,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Relational knowledge distillation on the contrastive logit matrix
    (the CRD term of CLIP-KD, arXiv:2212.12471 family): symmetric
    KL(teacher || student) over both retrieval directions' softmax rows.

    Because the loss compares (B, B) SIMILARITY structures — not raw
    features — the teacher and student embedding dimensions are free to
    differ (ViT-H-14's 1024-dim teacher distills into a 512-dim B-32
    student with no projection head). All inputs are UNIT-NORM rows;
    scales are the exp'd logit scales. ``temperature`` softens both
    distributions; the loss carries the standard T^2 gradient correction
    so the KD gradient magnitude is temperature-independent.
    """
    ls = student_scale * jnp.dot(
        student_img, student_txt.T, preferred_element_type=jnp.float32
    ) / temperature
    lt = teacher_scale * jnp.dot(
        teacher_img, teacher_txt.T, preferred_element_type=jnp.float32
    ) / temperature
    lt = jax.lax.stop_gradient(lt)

    def kl(lt_, ls_):
        pt = jax.nn.softmax(lt_, axis=-1)
        return jnp.sum(
            pt * (jax.nn.log_softmax(lt_, -1) - jax.nn.log_softmax(ls_, -1)),
            axis=-1,
        )

    per_row = 0.5 * (kl(lt, ls) + kl(lt.T, ls.T))
    return jnp.mean(per_row) * (temperature ** 2)


def siglip_loss(
    image_embs: jnp.ndarray,
    text_embs: jnp.ndarray,
    logit_scale: jnp.ndarray,
    logit_bias: jnp.ndarray,
    weak_scores: Optional[jnp.ndarray] = None,
    weight_temperature: float = 0.5,
) -> Tuple[jnp.ndarray, dict]:
    """SigLIP pairwise sigmoid loss (Zhai et al., arXiv:2303.15343).

    Every (i, j) logit is an independent binary problem: label +1 on the
    diagonal, -1 off it — no cross-batch softmax, so the loss needs no
    global normalization and scales to very large effective batches without
    a gather (a TPU-friendly property; with the batch sharded over ``data``
    GSPMD keeps the (B, B) logits fully sharded). Weak scores weight each
    POSITIVE pair's row+column contribution like the InfoNCE path.

    ``logit_bias``: learned scalar added to all logits (SigLIP inits it
    around -10 so training starts near the all-negatives prior).
    """
    b = image_embs.shape[0]
    logits = (
        logit_scale
        * jnp.dot(image_embs, text_embs.T, preferred_element_type=jnp.float32)
        + logit_bias
    )
    signs = 2.0 * jnp.eye(b, dtype=jnp.float32) - 1.0  # +1 diag, -1 off
    # -log sigmoid(sign * logit), numerically via softplus(-x)
    pairwise = jax.nn.softplus(-signs * logits)  # (B, B)

    if weak_scores is not None:
        w = jax.nn.softmax(weak_scores / weight_temperature) * b
        # weight row i (image i's positives+negatives) and implicitly the
        # matching column through symmetry of the diagonal weighting
        pairwise = pairwise * w[:, None]
    loss = jnp.sum(pairwise) / b

    acc_i2t = jnp.mean(jnp.argmax(logits, axis=-1) == jnp.arange(b))
    acc_t2i = jnp.mean(jnp.argmax(logits, axis=0) == jnp.arange(b))
    return loss, {
        "loss": loss,
        "acc_i2t": acc_i2t,
        "acc_t2i": acc_t2i,
        "logit_scale": logit_scale,
    }


def clip_contrastive_loss(
    image_embs: jnp.ndarray,
    text_embs: jnp.ndarray,
    logit_scale: jnp.ndarray,
    weak_scores: Optional[jnp.ndarray] = None,
    weight_temperature: float = 0.5,
    label_smoothing: float = 0.0,
) -> Tuple[jnp.ndarray, dict]:
    """Weighted symmetric InfoNCE.

    Args:
      image_embs / text_embs: (B, D) UNIT-NORM embeddings, row i paired.
      logit_scale: scalar multiplier (exp of the learned temperature).
      weak_scores: optional (B,) in [0, 1]; None = uniform weights.
      weight_temperature: softmax temperature for weight normalization.
      label_smoothing: standard smoothing over the B classes.

    Returns (loss, metrics) where metrics carries accuracy diagnostics.
    """
    b = image_embs.shape[0]
    logits = logit_scale * jnp.dot(
        image_embs, text_embs.T, preferred_element_type=jnp.float32
    )  # (B, B): image-major

    targets = jax.nn.one_hot(jnp.arange(b), b, dtype=jnp.float32)
    if label_smoothing > 0.0:
        targets = targets * (1.0 - label_smoothing) + label_smoothing / b

    log_p_i2t = jax.nn.log_softmax(logits, axis=-1)
    log_p_t2i = jax.nn.log_softmax(logits.T, axis=-1)
    ce_i2t = -jnp.sum(targets * log_p_i2t, axis=-1)  # (B,)
    ce_t2i = -jnp.sum(targets * log_p_t2i, axis=-1)
    per_pair = 0.5 * (ce_i2t + ce_t2i)

    if weak_scores is not None:
        w = jax.nn.softmax(weak_scores / weight_temperature) * b
    else:
        w = jnp.ones((b,), jnp.float32)
    loss = jnp.mean(w * per_pair)

    acc_i2t = jnp.mean(jnp.argmax(logits, axis=-1) == jnp.arange(b))
    acc_t2i = jnp.mean(jnp.argmax(logits, axis=0) == jnp.arange(b))
    return loss, {
        "loss": loss,
        "acc_i2t": acc_i2t,
        "acc_t2i": acc_t2i,
        "logit_scale": logit_scale,
    }

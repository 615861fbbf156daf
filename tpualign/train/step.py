"""Train state and the SPMD training step.

One jitted step: forward both towers on the local batch shard, global
weighted contrastive loss, AdamW with warmup+cosine schedule, logit-scale
clamp (standard CLIP practice, max 100). Under a mesh the step is jitted
with the batch sharded over ``data`` and params laid out by the TP specs —
GSPMD inserts the gradient psum over ``data`` and the activation collectives
over ``model``; no hand-written collectives needed.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpualign.config import TrainConfig
from tpualign.models.clip import CLIP
from tpualign.train.loss import (
    clip_contrastive_loss,
    distill_kl_loss,
    siglip_loss,
)

__all__ = ["TrainState", "create_train_state", "train_step",
           "make_sharded_train_step", "sample_patch_indices",
           "export_params"]

MAX_LOGIT_SCALE = 4.6052  # ln(100)


def _as_pixels(images, model: "CLIP"):
    """Resolve an image batch to (B, S, S, 3) float pixels.

    Device-feed batches (``TRAIN_IMAGE_FEED=device``) arrive as a
    ``(uint8_bucket, true_hw)`` pair — the host does DECODE ONLY and the
    parity-grade fused bicubic resize/crop/normalize runs on device
    inside the jitted step (the same design the embed engine's device
    feed uses; host->device traffic drops ~3x vs fp32 pixels and the
    few-core host feed rate rises 2.45x — docs/PERFORMANCE.md "Host
    feed"). Host-feed batches are already float pixels and pass
    through."""
    if isinstance(images, (tuple, list)):
        from tpualign.ops.preprocess import preprocess_device

        if len(images) == 4:
            # augmentation arm (TRAIN_AUGMENT=rrc): host-sampled
            # RandomResizedCrop boxes + flips fold into the resize
            # weight matrices — zero extra passes over the pixels
            u8, hw, boxes, flips = images
            return preprocess_device(u8, hw, model.variant.image_size,
                                     crop_boxes=boxes, flip=flips)
        u8, hw = images
        return preprocess_device(u8, hw, model.variant.image_size)
    return images


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # EMA of params (None = disabled); export/eval should prefer this tree
    ema_params: Any = None
    # LoRA: when set, ``params`` is the small adapter tree and this holds
    # the frozen base; the forward pass runs on
    # lora_apply(frozen_params, params, lora_scale)
    frozen_params: Any = None
    lora_scale: float = struct.field(pytree_node=False, default=0.0)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        # clamp the learned temperature (CLIP standard); lives in the
        # trainable tree under both full fine-tuning and LoRA
        new_params = dict(new_params)
        new_params["logit_scale"] = jnp.minimum(
            new_params["logit_scale"], MAX_LOGIT_SCALE
        )
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )

    def effective_params(self, trainable=None):
        """The full param tree the towers run on: the trainable tree
        itself, or (LoRA) the frozen base merged with the adapters."""
        trainable = self.params if trainable is None else trainable
        if self.frozen_params is None:
            return trainable
        from tpualign.train.lora import lora_apply

        return lora_apply(self.frozen_params, trainable, self.lora_scale)


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=config.learning_rate,
        warmup_steps=config.warmup_steps,
        decay_steps=max(config.total_steps, config.warmup_steps + 1),
    )
    if config.moments_dtype not in ("float32", "bfloat16"):
        raise ValueError(f"moments_dtype must be float32/bfloat16, "
                         f"got {config.moments_dtype!r}")
    mu_dtype = jnp.bfloat16 if config.moments_dtype == "bfloat16" else None
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(schedule, b1=0.9, b2=0.98, eps=1e-6,
                    weight_decay=config.weight_decay, mu_dtype=mu_dtype),
    )


def _reject_quantized_model(model: CLIP) -> None:
    if getattr(model, "quant", "none") == "int8":
        raise ValueError(
            "Training a quant='int8' model is not supported: the serving "
            "path's round() has zero gradient. For quantization-aware "
            "training use CLIP_QUANT=int8_qat (straight-through surrogate "
            "— same rounding grid, trainable), then serve the result with "
            "CLIP_QUANT=int8."
        )


def create_train_state(
    model: CLIP, params, config: TrainConfig
) -> TrainState:
    # guard at state creation so BOTH the sharded and the single-device
    # trainer paths refuse silently-dead int8 training
    _reject_quantized_model(model)
    tx = make_optimizer(config)
    frozen = None
    lora_scale = 0.0
    if config.lora_rank > 0:
        from tpualign.train.lora import lora_init, lora_param_count
        from tpualign.utils.logging import get_logger

        frozen = params
        if config.lora_base_dtype == "bfloat16":
            # the frozen base takes no updates, so it needs no fp32
            # accumulation; kernels/embeddings (ndim>=2, ~all the bytes)
            # store in bf16, vectors/scalars (LNs, biases) stay fp32
            frozen = jax.tree.map(
                lambda p: p.astype(jnp.bfloat16) if p.ndim >= 2 else p,
                frozen,
            )
        elif config.lora_base_dtype != "float32":
            raise ValueError(
                f"LORA_BASE_DTYPE must be float32 or bfloat16, "
                f"got {config.lora_base_dtype!r}"
            )
        params = lora_init(params, config.lora_rank, seed=config.seed)
        lora_scale = config.lora_alpha / config.lora_rank
        get_logger("train.step").info(
            "LoRA rank=%d alpha=%.1f: %d trainable params (base frozen)",
            config.lora_rank, config.lora_alpha, lora_param_count(params),
        )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
        # real copies (jnp.asarray is a no-op on device arrays): the EMA
        # tree must not alias params, or a donated train step donates the
        # same buffers twice (TPU runtime INVALID_ARGUMENT)
        ema_params=(jax.tree.map(lambda p: jnp.array(p, copy=True), params)
                    if config.ema_decay > 0.0 else None),
        frozen_params=frozen,
        lora_scale=lora_scale,
    )


def _update_ema(new_state: TrainState, old_state: TrainState,
                config: TrainConfig) -> TrainState:
    if old_state.ema_params is None or config.ema_decay <= 0.0:
        return new_state
    d = config.ema_decay
    ema = jax.tree.map(
        lambda e, p: (e * d + (1.0 - d) * p).astype(e.dtype),
        old_state.ema_params, new_state.params,
    )
    return new_state.replace(ema_params=ema)


def export_params(state: TrainState):
    """The tree to embed/serve with: the EMA when tracked, else params;
    under LoRA the adapters are merged into the frozen base so the result
    drops into embed/serve unchanged."""
    trainable = (state.ema_params if state.ema_params is not None
                 else state.params)
    return state.effective_params(trainable)


def _compose_loss(img, txt, scale, weak_scores, config: TrainConfig,
                  teacher) -> Tuple[jnp.ndarray, dict]:
    """Batch loss from encoded features: the configured contrastive
    objective, mixed with relational KD when a ``teacher`` triple
    ``(t_img, t_txt, t_scale)`` of precomputed teacher embeddings is
    present (loss = (1-w)*contrastive + w*KL; dims may differ)."""
    if config.loss_type == "siglip":
        base, metrics = siglip_loss(
            img, txt, scale, jnp.asarray(config.siglip_bias),
            weak_scores=weak_scores,
            weight_temperature=config.weak_score_temperature,
        )
    else:
        base, metrics = clip_contrastive_loss(
            img, txt, scale,
            weak_scores=weak_scores,
            weight_temperature=config.weak_score_temperature,
            label_smoothing=config.label_smoothing,
        )
    if teacher is None:
        return base, metrics
    t_img, t_txt, t_scale = teacher
    kd = distill_kl_loss(
        img, txt, scale, t_img, t_txt, t_scale,
        temperature=config.distill_temperature,
    )
    w = config.distill_weight
    loss = (1.0 - w) * base + w * kd
    metrics = dict(metrics)
    metrics["distill_kl"] = kd
    metrics["loss"] = loss
    return loss, metrics


def train_step(
    state: TrainState,
    model: CLIP,
    images: jnp.ndarray,
    token_ids: jnp.ndarray,
    weak_scores: Optional[jnp.ndarray],
    config: TrainConfig,
    patch_indices: Optional[jnp.ndarray] = None,
    teacher: Optional[Tuple] = None,
) -> Tuple[TrainState, dict]:
    """One optimization step (pure function of state + batch).

    ``patch_indices`` (B, K): FLIP-style visible-patch subset
    (arXiv:2212.00794) — the vision tower runs on K patches instead of all,
    cutting step FLOPs ~K/P at small accuracy cost; sample per step with
    :func:`sample_patch_indices`. None = no masking (default).

    ``teacher``: optional ``(t_img, t_txt, t_scale)`` precomputed teacher
    embeddings for this batch (relational distillation — see
    :func:`_compose_loss`). None = no distillation (default).

    When ``config.grad_accum_steps > 1`` the step runs the cached-feature
    accumulation schedule (:func:`_accum_train_step`) — numerically the
    same full-batch update at one-microbatch activation memory.
    """
    if config.grad_accum_steps > 1:
        return _accum_train_step(
            state, model, images, token_ids, weak_scores, config,
            patch_indices, teacher,
        )

    def loss_fn(params):
        img, txt, scale = model.apply(
            {"params": state.effective_params(params)},
            _as_pixels(images, model), token_ids, patch_indices,
        )
        return _compose_loss(img, txt, scale, weak_scores, config, teacher)

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    new_state = _update_ema(state.apply_gradients(grads), state, config)
    metrics["grad_norm"] = optax.global_norm(grads)
    return new_state, metrics


def _accum_train_step(
    state: TrainState,
    model: CLIP,
    images: jnp.ndarray,
    token_ids: jnp.ndarray,
    weak_scores: Optional[jnp.ndarray],
    config: TrainConfig,
    patch_indices: Optional[jnp.ndarray] = None,
    teacher: Optional[Tuple] = None,
) -> Tuple[TrainState, dict]:
    """Exact gradient accumulation with full-batch contrastive negatives.

    Naive accumulation (mean of per-microbatch losses) would shrink each
    microbatch's negative set A-fold. This uses the cached-feature schedule
    (the approach open_clip's --accum-freq implements for torch): phase 1
    scans the microbatches to cache all (B, D) features without gradients;
    phase 2 re-encodes each microbatch WITH gradients, splices its live
    rows into the cached full-batch feature matrix, and takes the gradient
    of the FULL-batch loss. Because dL/dtheta = sum_i (dL/df_i)(df_i/dtheta)
    and pass i contributes exactly the i-th term, the accumulated gradient
    equals the full-batch gradient (pinned by test to ~fp32 ulp). The only
    correction: ``logit_scale`` enters the loss directly in every pass, so
    its accumulated gradient is divided by A.

    Peak activation memory is one microbatch's, enabling H-14-scale towers
    at large effective batch; the feature cache is a negligible (B, D).
    """
    a = config.grad_accum_steps
    b = (images[0] if isinstance(images, (tuple, list))
         else images).shape[0]
    if b % a:
        raise ValueError(
            f"batch size {b} not divisible by grad_accum_steps={a}"
        )
    m = b // a

    def split(x):
        if x is None:
            return None
        if isinstance(x, (tuple, list)):
            # device-feed (u8, hw) pair: split each leaf; lax.scan
            # slices tuples as pytrees, so the microbatch arrives as a
            # (u8_m, hw_m) pair and preprocesses per microbatch (keeps
            # activation memory micro-bounded)
            return tuple(split(v) for v in x)
        return x.reshape((a, m) + x.shape[1:])

    imgs, toks, pidx = split(images), split(token_ids), split(patch_indices)

    def encode(params, im, tk, pi):
        return model.apply(
            {"params": state.effective_params(params)},
            _as_pixels(im, model), tk, pi,
        )

    def unpack(xs):
        return xs if pidx is not None else (*xs, None)

    # Phase 1: cache full-batch features, no gradients held.
    def cache_one(_, xs):
        im, tk, pi = unpack(xs)
        img, txt, _ = encode(state.params, im, tk, pi)
        return None, (img, txt)

    xs1 = (imgs, toks) + ((pidx,) if pidx is not None else ())
    _, (img_all, txt_all) = jax.lax.scan(cache_one, None, xs1)
    img_all = jax.lax.stop_gradient(img_all)  # (A, m, D)
    txt_all = jax.lax.stop_gradient(txt_all)

    def loss_at(params, i, im, tk, pi):
        img_i, txt_i, scale = encode(params, im, tk, pi)
        img_full = img_all.at[i].set(img_i).reshape(b, -1)
        txt_full = txt_all.at[i].set(txt_i).reshape(b, -1)
        # the teacher arrays are full-batch constants, so the KD term
        # accumulates by the same dL/df_i argument as the contrastive one
        return _compose_loss(
            img_full, txt_full, scale, weak_scores, config, teacher
        )

    grad_fn = jax.value_and_grad(loss_at, has_aux=True)

    def accum_one(gacc, xs):
        i, rest = xs[0], xs[1:]
        im, tk, pi = unpack(rest)
        (_, metrics), g = grad_fn(state.params, i, im, tk, pi)
        return jax.tree.map(jnp.add, gacc, g), metrics

    xs2 = (jnp.arange(a),) + xs1
    g0 = jax.tree.map(jnp.zeros_like, state.params)
    grads, metrics_seq = jax.lax.scan(accum_one, g0, xs2)
    grads = dict(grads)
    grads["logit_scale"] = grads["logit_scale"] / a

    new_state = _update_ema(state.apply_gradients(grads), state, config)
    # every pass computes the same full-batch loss; report the last
    metrics = jax.tree.map(lambda x: x[-1], metrics_seq)
    metrics["grad_norm"] = optax.global_norm(grads)
    return new_state, metrics


def make_sharded_train_step(
    model: CLIP, mesh: Mesh, config: TrainConfig, state_sharding=None
):
    """jit the step over a mesh: batch over ``data``, params per TP specs.

    With ``config.fsdp`` the param specs additionally shard over ``data``
    (ZeRO-3): params, grads, moments, and EMA all live at
    1/(data*model) per device and GSPMD inserts the weight all-gathers /
    gradient reduce-scatters. The update itself is unchanged — FSDP is
    purely a layout choice here, pinned equal to the replicated step by
    test (tests/test_train.py::test_fsdp_step_matches_replicated).

    Returns (step_fn, shard_state_fn). ``shard_state_fn`` places a host
    TrainState onto the mesh.
    """
    from tpualign.parallel.sharding import clip_param_specs

    _reject_quantized_model(model)
    fsdp = mesh.shape["data"] if config.fsdp else 1

    def param_sharding(params, use_fsdp=True):
        specs = clip_param_specs(params, fsdp=fsdp if use_fsdp else 1)
        return jax.tree.map(lambda s: NamedSharding(mesh, s), specs)

    batch_img = NamedSharding(mesh, P("data", None, None, None))
    batch_txt = NamedSharding(mesh, P("data", None))
    batch_w = NamedSharding(mesh, P("data"))

    # Placement that always materializes FRESH buffers: the jitted step
    # donates its input state, and jax.device_put may alias the source
    # buffer (e.g. replicating on the source device), which would let the
    # donation invalidate arrays the CALLER still holds (their original
    # params). A jitted identity never aliases its input unless asked to.
    def _place(x, sharding):
        return jax.jit(lambda a: a, out_shardings=sharding)(x)

    def shard_state(state: TrainState) -> TrainState:
        # under LoRA the trainable tree is the tiny adapter set — always
        # replicated (its leaves match no TP rule and FSDP would only add
        # collectives for negligible memory); the frozen base below gets
        # the full layout
        pshard = param_sharding(
            state.params, use_fsdp=state.frozen_params is None
        )
        params = jax.tree.map(_place, state.params, pshard)
        replicated = NamedSharding(mesh, P())
        param_struct = jax.tree.structure(state.params)

        # Optimizer state mirrors the param layout: the AdamW moments (mu,
        # nu) are param-shaped pytrees and get the TP param specs, so their
        # memory shards with the params instead of replicating; true
        # scalars (step counts, empty states) replicate.
        def place_opt(sub):
            if (
                isinstance(sub, dict)
                and jax.tree.structure(sub) == param_struct
            ):
                return jax.tree.map(_place, sub, pshard)
            return jax.tree.map(
                lambda leaf: _place(leaf, replicated), sub
            )

        opt_state = jax.tree.map(
            place_opt, state.opt_state,
            is_leaf=lambda x: isinstance(x, dict),
        )
        ema = state.ema_params
        if ema is not None:
            ema = jax.tree.map(_place, ema, pshard)
        frozen = state.frozen_params
        if frozen is not None:
            # LoRA: the frozen base gets the full TP(+FSDP) tower layout;
            # the trainable adapter tree above is tiny and replicates
            frozen = jax.tree.map(_place, frozen, param_sharding(frozen))
        return state.replace(
            step=_place(state.step, replicated),
            params=params,
            opt_state=opt_state,
            ema_params=ema,
            frozen_params=frozen,
        )

    step = partial(train_step, model=model, config=config)

    # donate the input state: its buffers are reused for the output state,
    # halving peak optimizer-state memory on device (ignored on CPU)
    @partial(jax.jit, donate_argnums=(0,))
    def jitted(state, images, token_ids, weak_scores, patch_indices,
               teacher=None):
        return step(state, images=images, token_ids=token_ids,
                    weak_scores=weak_scores, patch_indices=patch_indices,
                    teacher=teacher)

    def run(state, images, token_ids, weak_scores, patch_indices=None,
            teacher=None):
        if isinstance(images, (tuple, list)):
            # device feed: uint8 buckets shard like pixel batches, the
            # per-image metadata (sizes / crop boxes / flips) rides
            # along the data axis
            row2 = NamedSharding(mesh, P("data", None))
            row1 = NamedSharding(mesh, P("data"))
            if len(images) == 4:
                u8, hw, boxes, flips = images
                images = (
                    jax.device_put(u8, batch_img),
                    jax.device_put(hw, row2),
                    jax.device_put(boxes, row2),
                    jax.device_put(flips, row1),
                )
            else:
                u8, hw = images
                images = (
                    jax.device_put(u8, batch_img),
                    jax.device_put(hw, row2),
                )
        else:
            images = jax.device_put(images, batch_img)
        token_ids = jax.device_put(token_ids, batch_txt)
        if weak_scores is not None:
            weak_scores = jax.device_put(weak_scores, batch_w)
        if patch_indices is not None:
            patch_indices = jax.device_put(
                patch_indices, NamedSharding(mesh, P("data", None))
            )
        if teacher is not None:
            # teacher embedding rows shard with the batch; the scalar
            # exp'd logit scale replicates
            t_img, t_txt, t_scale = teacher
            teacher = (
                jax.device_put(t_img, batch_txt),
                jax.device_put(t_txt, batch_txt),
                jax.device_put(t_scale, NamedSharding(mesh, P())),
            )
        return jitted(state, images, token_ids, weak_scores, patch_indices,
                      teacher)

    return run, shard_state


def sample_patch_indices(
    rng: "np.random.Generator", batch: int, num_patches: int, mask_ratio: float
):
    """(batch, K) visible-patch indices for FLIP-style masking, K fixed by
    ``mask_ratio`` so jit shapes stay static; None when ratio <= 0."""
    import numpy as np

    if mask_ratio <= 0.0:
        return None
    keep = max(1, int(round(num_patches * (1.0 - mask_ratio))))
    idx = np.empty((batch, keep), np.int32)
    for i in range(batch):
        idx[i] = rng.permutation(num_patches)[:keep]
    return idx

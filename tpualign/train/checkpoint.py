"""Orbax checkpointing for training state and model params.

The reference has no tensor checkpoints — only file/DB-existence step
skipping (SURVEY.md §5 checkpoint/resume). The pipeline keeps that step-
manifest resume model (tpualign.pipeline completion checks + the store's
Parquet persistence); this module adds proper array checkpoints for the new
training capability: save/restore of params + optimizer state + step with
orbax, sharding-aware on restore.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax

from tpualign.utils.logging import get_logger

log = get_logger("train.checkpoint")

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step",
           "load_trained_params"]


def _manager(directory: str | Path, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        Path(directory).absolute(),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
    )


def save_checkpoint(directory: str | Path, state, step: Optional[int] = None) -> int:
    """Save {params, opt_state, step} (a TrainState or any pytree).

    Sharded arrays (TP/DP-laid-out H-14 states) are passed to orbax AS IS —
    orbax writes per-shard without gathering to host, so checkpointing
    scales with the mesh instead of host RAM.
    """
    import orbax.checkpoint as ocp

    if step is None:
        step = int(jax.device_get(state.step))
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": step,
    }
    if getattr(state, "ema_params", None) is not None:
        payload["ema_params"] = state.ema_params
    if getattr(state, "frozen_params", None) is not None:
        # LoRA: params above is the adapter tree; persist the frozen base
        # and the merge scale so the checkpoint stays self-contained for
        # params-only loading (embed/serve)
        payload["frozen_params"] = state.frozen_params
        payload["lora_scale"] = float(state.lora_scale)
    mgr = _manager(directory)
    mgr.save(step, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    log.info("saved checkpoint step=%d -> %s", step, directory)
    return step


def latest_step(directory: str | Path) -> Optional[int]:
    import orbax.checkpoint as ocp

    d = Path(directory)
    if not d.exists():
        return None
    mgr = _manager(d)
    return mgr.latest_step()


def load_trained_params(directory: str | Path, step: Optional[int] = None):
    """Params-only restore for inference/embedding — no TrainState needed.

    Prefers the EMA tree when the checkpoint tracked one (EMA_DECAY > 0);
    this is what closes the fine-tune -> re-embed loop: the embed engine's
    loader routes orbax checkpoint directories here (CLIP_CHECKPOINT can
    point at a ``tpualign train --ckpt-dir``), the counterpart of the
    reference loading OpenCLIP weights (ref:src/insert_clip_embeddings.py:80-82).
    """
    mgr = _manager(directory)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no orbax checkpoint steps in {directory}")
    restored = mgr.restore(step)
    params = restored.get("ema_params") or restored["params"]
    if restored.get("frozen_params") is not None:
        from tpualign.train.lora import lora_apply

        params = lora_apply(
            restored["frozen_params"], params,
            float(restored["lora_scale"]),
        )
    log.info("loaded trained params (step=%d, ema=%s, lora=%s) from %s",
             step, "ema_params" in restored and restored["ema_params"]
             is not None, restored.get("frozen_params") is not None,
             directory)
    return params


def _checkpoint_has_key(mgr, step: int, key: str) -> Optional[bool]:
    """Whether the saved step contains top-level ``key``; None = unknown
    (metadata unavailable — e.g. an externally produced layout)."""
    try:
        meta = mgr.item_metadata(step)
        if meta is not None:
            return key in set(meta.keys())
    except Exception:
        pass
    try:
        import orbax.checkpoint as ocp

        # a fresh manager has no handler registered yet and returns None
        # above; read the StandardSave item layout directly
        p = Path(mgr.directory) / str(step) / "default"
        if p.exists():
            meta = ocp.StandardCheckpointHandler().metadata(p)
            if meta is not None:
                return key in set(meta.keys())
    except Exception:
        pass
    return None


def restore_checkpoint(directory: str | Path, state, step: Optional[int] = None):
    """Restore into the structure of ``state`` (a TrainState); returns the
    updated state or None when no checkpoint exists.

    The template is ``state``'s own (possibly sharded) arrays, so a state
    that was laid out with ``shard_state`` restores DIRECTLY into the same
    mesh sharding — no host gather, no re-sharding pass.
    """
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        return None
    template = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": 0,
    }
    # Include the EMA tree in the template only when the checkpoint actually
    # saved one (checked via metadata, NOT by catching broad restore errors —
    # that could silently reset a real EMA on any unrelated restore failure).
    # Checkpoints predating EMA tracking restart the average from the
    # restored params.
    want_ema = getattr(state, "ema_params", None) is not None
    has_ema = _checkpoint_has_key(mgr, step, "ema_params")
    if want_ema and has_ema in (True, None):
        template["ema_params"] = state.ema_params
    if getattr(state, "frozen_params", None) is not None:
        template["frozen_params"] = state.frozen_params
        template["lora_scale"] = 0.0
    try:
        restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    except ValueError as e:
        # only when metadata was unavailable AND the mismatch is exactly the
        # missing-ema case does the legacy fallback apply
        if not (want_ema and has_ema is None and "ema_params" in str(e)):
            raise
        del template["ema_params"]
        restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    if want_ema and "ema_params" not in restored:
        restored["ema_params"] = jax.tree.map(
            lambda x: x, restored["params"]
        )
    import jax.numpy as jnp

    new_state = state.replace(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=jnp.asarray(restored["step"], jnp.int32),
        ema_params=restored.get(
            "ema_params", getattr(state, "ema_params", None)
        ),
        frozen_params=restored.get(
            "frozen_params", getattr(state, "frozen_params", None)
        ),
    )
    saved_scale = restored.get("lora_scale")
    if (saved_scale is not None
            and abs(float(saved_scale) - float(state.lora_scale)) > 1e-9):
        log.warning(
            "checkpoint lora scale %.4f != configured %.4f "
            "(LORA_RANK/LORA_ALPHA changed since save); the configured "
            "value applies", float(saved_scale), float(state.lora_scale),
        )
    log.info("restored checkpoint step=%d from %s", step, directory)
    return new_state

"""Checkpoint loading: OpenCLIP / HuggingFace CLIP state dicts -> Flax params.

The reference downloads OpenCLIP weights at runtime
(ref:src/insert_clip_embeddings.py:80-82). Here weights load from a local
file (``CLIP_CHECKPOINT``) — either an OpenCLIP/OpenAI ``state_dict`` (.pt /
.bin via torch, .safetensors via safetensors) or a HuggingFace ``CLIPModel``
state dict — and are converted into the tpualign Flax parameter tree.

When no checkpoint is available (this environment has zero egress), callers
fall back to seeded random initialization via
:func:`tpualign.models.clip.init_clip_params` — the deterministic equivalent
of the reference's placeholder-embedding degradation ladder
(ref:src/insert_clip_embeddings.py:250-267).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from tpualign.config import ClipVariant, ModelConfig
from tpualign.utils.logging import get_logger

log = get_logger("models.loader")

Array = np.ndarray
Params = Dict[str, Any]


def _np(t) -> np.ndarray:
    """torch tensor / array-like -> float32 numpy."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


# ---------------------------------------------------------------------------
# OpenCLIP (OpenAI layout) conversion
# ---------------------------------------------------------------------------


def _convert_tower_blocks(
    sd: Mapping[str, Any], prefix: str, num_layers: int
) -> Params:
    """Convert ``{prefix}.resblocks.{i}.*`` into tpualign transformer params."""
    out: Params = {}
    for i in range(num_layers):
        p = f"{prefix}.resblocks.{i}"
        out[f"resblock_{i}"] = {
            "ln_1": {
                "scale": _np(sd[f"{p}.ln_1.weight"]),
                "bias": _np(sd[f"{p}.ln_1.bias"]),
            },
            "attn": {
                # torch in_proj_weight: (3d, d); ours: (d, 3d)
                "in_proj_kernel": _np(sd[f"{p}.attn.in_proj_weight"]).T,
                "in_proj_bias": _np(sd[f"{p}.attn.in_proj_bias"]),
                "out_proj_kernel": _np(sd[f"{p}.attn.out_proj.weight"]).T,
                "out_proj_bias": _np(sd[f"{p}.attn.out_proj.bias"]),
            },
            "ln_2": {
                "scale": _np(sd[f"{p}.ln_2.weight"]),
                "bias": _np(sd[f"{p}.ln_2.bias"]),
            },
            "mlp": {
                "c_fc_kernel": _np(sd[f"{p}.mlp.c_fc.weight"]).T,
                "c_fc_bias": _np(sd[f"{p}.mlp.c_fc.bias"]),
                "c_proj_kernel": _np(sd[f"{p}.mlp.c_proj.weight"]).T,
                "c_proj_bias": _np(sd[f"{p}.mlp.c_proj.bias"]),
            },
        }
    return out


def convert_openclip_state_dict(
    sd: Mapping[str, Any], variant: ClipVariant
) -> Params:
    """OpenCLIP/OpenAI ``state_dict`` -> tpualign Flax params."""
    visual: Params = {
        # torch conv weight: (out, in, kh, kw); flax: (kh, kw, in, out)
        "conv1": {"kernel": _np(sd["visual.conv1.weight"]).transpose(2, 3, 1, 0)},
        "class_embedding": _np(sd["visual.class_embedding"]),
        "positional_embedding": _np(sd["visual.positional_embedding"]),
        "ln_pre": {
            "scale": _np(sd["visual.ln_pre.weight"]),
            "bias": _np(sd["visual.ln_pre.bias"]),
        },
        "transformer": _convert_tower_blocks(
            sd, "visual.transformer", variant.vision_layers
        ),
        "ln_post": {
            "scale": _np(sd["visual.ln_post.weight"]),
            "bias": _np(sd["visual.ln_post.bias"]),
        },
        "proj": _np(sd["visual.proj"]),
    }
    text: Params = {
        "token_embedding": _np(sd["token_embedding.weight"]),
        "positional_embedding": _np(sd["positional_embedding"]),
        "transformer": _convert_tower_blocks(sd, "transformer", variant.text_layers),
        "ln_final": {
            "scale": _np(sd["ln_final.weight"]),
            "bias": _np(sd["ln_final.bias"]),
        },
        "text_projection": _np(sd["text_projection"]),
    }
    return {
        "visual": visual,
        "text": text,
        "logit_scale": _np(sd["logit_scale"]).reshape(()),
    }


# ---------------------------------------------------------------------------
# HuggingFace CLIPModel conversion
# ---------------------------------------------------------------------------


def _convert_hf_blocks(sd: Mapping[str, Any], prefix: str, num_layers: int) -> Params:
    out: Params = {}
    for i in range(num_layers):
        p = f"{prefix}.layers.{i}"
        q_w = _np(sd[f"{p}.self_attn.q_proj.weight"])
        k_w = _np(sd[f"{p}.self_attn.k_proj.weight"])
        v_w = _np(sd[f"{p}.self_attn.v_proj.weight"])
        q_b = _np(sd[f"{p}.self_attn.q_proj.bias"])
        k_b = _np(sd[f"{p}.self_attn.k_proj.bias"])
        v_b = _np(sd[f"{p}.self_attn.v_proj.bias"])
        out[f"resblock_{i}"] = {
            "ln_1": {
                "scale": _np(sd[f"{p}.layer_norm1.weight"]),
                "bias": _np(sd[f"{p}.layer_norm1.bias"]),
            },
            "attn": {
                "in_proj_kernel": np.concatenate([q_w, k_w, v_w], axis=0).T,
                "in_proj_bias": np.concatenate([q_b, k_b, v_b], axis=0),
                "out_proj_kernel": _np(sd[f"{p}.self_attn.out_proj.weight"]).T,
                "out_proj_bias": _np(sd[f"{p}.self_attn.out_proj.bias"]),
            },
            "ln_2": {
                "scale": _np(sd[f"{p}.layer_norm2.weight"]),
                "bias": _np(sd[f"{p}.layer_norm2.bias"]),
            },
            "mlp": {
                "c_fc_kernel": _np(sd[f"{p}.mlp.fc1.weight"]).T,
                "c_fc_bias": _np(sd[f"{p}.mlp.fc1.bias"]),
                "c_proj_kernel": _np(sd[f"{p}.mlp.fc2.weight"]).T,
                "c_proj_bias": _np(sd[f"{p}.mlp.fc2.bias"]),
            },
        }
    return out


def convert_hf_clip_state_dict(sd: Mapping[str, Any], variant: ClipVariant) -> Params:
    """HuggingFace ``CLIPModel.state_dict()`` -> tpualign Flax params."""
    visual: Params = {
        "conv1": {
            "kernel": _np(
                sd["vision_model.embeddings.patch_embedding.weight"]
            ).transpose(2, 3, 1, 0)
        },
        "class_embedding": _np(sd["vision_model.embeddings.class_embedding"]),
        "positional_embedding": _np(
            sd["vision_model.embeddings.position_embedding.weight"]
        ),
        "ln_pre": {
            "scale": _np(sd["vision_model.pre_layrnorm.weight"]),
            "bias": _np(sd["vision_model.pre_layrnorm.bias"]),
        },
        "transformer": _convert_hf_blocks(
            sd, "vision_model.encoder", variant.vision_layers
        ),
        "ln_post": {
            "scale": _np(sd["vision_model.post_layernorm.weight"]),
            "bias": _np(sd["vision_model.post_layernorm.bias"]),
        },
        "proj": _np(sd["visual_projection.weight"]).T,
    }
    text: Params = {
        "token_embedding": _np(sd["text_model.embeddings.token_embedding.weight"]),
        "positional_embedding": _np(
            sd["text_model.embeddings.position_embedding.weight"]
        ),
        "transformer": _convert_hf_blocks(
            sd, "text_model.encoder", variant.text_layers
        ),
        "ln_final": {
            "scale": _np(sd["text_model.final_layer_norm.weight"]),
            "bias": _np(sd["text_model.final_layer_norm.bias"]),
        },
        "text_projection": _np(sd["text_projection.weight"]).T,
    }
    return {
        "visual": visual,
        "text": text,
        "logit_scale": _np(sd["logit_scale"]).reshape(()),
    }


# ---------------------------------------------------------------------------
# File loading
# ---------------------------------------------------------------------------


def _read_state_dict(
    path: str, allow_pickle: bool = False
) -> Mapping[str, Any]:
    """Read a checkpoint state dict, preferring safe loaders.

    ``.safetensors`` is the recommended format. For torch ``.pt``/``.bin``
    files, ``torch.load(weights_only=True)`` is tried first — it refuses to
    execute pickled code, which matters because the documented use case is
    externally-sourced OpenCLIP/HF weights. Full unpickling (arbitrary code
    execution on load!) only happens behind the explicit
    ``allow_pickle=True`` opt-in (config: ``CLIP_CHECKPOINT_ALLOW_PICKLE``).
    """
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as safe_err:
        if not allow_pickle:
            raise ValueError(
                f"Checkpoint {path!r} is not loadable with "
                f"torch.load(weights_only=True) ({safe_err}). If you trust "
                f"its source, re-export it as .safetensors or opt in to "
                f"full unpickling with allow_pickle=True / "
                f"CLIP_CHECKPOINT_ALLOW_PICKLE=true."
            ) from safe_err
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    # strip potential "module." / "model." prefixes
    keys = list(obj.keys())
    for prefix in ("module.", "model."):
        if keys and all(k.startswith(prefix) for k in keys):
            obj = {k[len(prefix):]: v for k, v in obj.items()}
            keys = list(obj.keys())
    return obj


def load_checkpoint_params(config: ModelConfig, path: str | None = None) -> Params:
    """Load and convert a local checkpoint for ``config``'s variant.

    Layout auto-detection: keys starting with ``visual.`` -> OpenCLIP;
    ``vision_model.`` -> HuggingFace.
    """
    path = path or config.checkpoint_path
    if not path:
        raise FileNotFoundError(
            "No checkpoint path configured (set CLIP_CHECKPOINT or "
            "ModelConfig.checkpoint_path)"
        )
    import os

    if os.path.isdir(path):
        # a `tpualign train --ckpt-dir` output: orbax directory of steps.
        # Restores this framework's own param tree (EMA preferred), closing
        # the fine-tune -> re-embed loop from the CLI.
        from tpualign.train.checkpoint import load_trained_params

        log.info("Loading fine-tuned orbax checkpoint from %s", path)
        return load_trained_params(path)
    sd = _read_state_dict(
        path, allow_pickle=getattr(config, "checkpoint_allow_pickle", False)
    )
    keys = set(sd.keys())
    variant = config.variant
    if any(k.startswith("visual.") for k in keys):
        log.info("Loading OpenCLIP-layout checkpoint from %s", path)
        return convert_openclip_state_dict(sd, variant)
    if any(k.startswith("vision_model.") for k in keys):
        log.info("Loading HuggingFace-layout checkpoint from %s", path)
        return convert_hf_clip_state_dict(sd, variant)
    raise ValueError(f"Unrecognized checkpoint layout in {path}")

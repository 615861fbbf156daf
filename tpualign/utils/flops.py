"""Analytic forward-pass FLOP counts for the CLIP towers, and TPU peaks.

Used by bench.py to report MFU (model FLOPs utilization = achieved
matmul-equivalent FLOP/s over the chip's peak). Counts follow the standard
convention: a (M, K) x (K, N) matmul costs 2*M*K*N FLOPs; elementwise ops,
layernorms, and softmax scaling are excluded (they are bandwidth-, not
FLOP-bound, and conventionally not counted in MFU).
"""

from __future__ import annotations

from typing import Optional

from tpualign.config import ClipVariant

__all__ = [
    "vision_tower_flops",
    "text_tower_flops",
    "clip_pair_flops",
    "device_peak_flops",
]


def _transformer_flops(seq: int, width: int, layers: int,
                       mlp_hidden: Optional[int] = None) -> int:
    """Per-item forward FLOPs of a pre-LN transformer stack.

    ``mlp_hidden``: MLP hidden dim; None = the standard 4x width (the
    g/bigG towers use non-4x ratios).
    """
    qkv = 2 * seq * width * (3 * width)
    attn_out = 2 * seq * width * width
    # scores (S, W) x (W, S) per head sums to 2*S*S*W across heads; same for
    # the attention-weighted value combine.
    scores = 2 * seq * seq * width
    combine = 2 * seq * seq * width
    mlp = 2 * (2 * seq * width * (mlp_hidden or 4 * width))
    return layers * (qkv + attn_out + scores + combine + mlp)


def vision_tower_flops(v: ClipVariant) -> int:
    """Forward FLOPs for one image through the ViT tower."""
    grid = v.image_size // v.patch_size
    seq = grid * grid + 1  # patches + CLS
    patch_dim = v.patch_size * v.patch_size * 3
    patch_embed = 2 * (grid * grid) * patch_dim * v.vision_width
    proj = 2 * v.vision_width * v.embed_dim  # CLS token -> embed dim
    return patch_embed + _transformer_flops(
        seq, v.vision_width, v.vision_layers, v.vision_mlp_dim) + proj


def text_tower_flops(v: ClipVariant) -> int:
    """Forward FLOPs for one text through the transformer tower."""
    proj = 2 * v.text_width * v.embed_dim  # EOT token -> embed dim
    return _transformer_flops(
        v.context_length, v.text_width, v.text_layers, v.text_mlp_dim) + proj


def clip_pair_flops(v: ClipVariant) -> int:
    """Forward FLOPs for one (image, text) pair through both towers."""
    return vision_tower_flops(v) + text_tower_flops(v)


# Peak dense bf16 matmul throughput per chip, FLOP/s. Public numbers from
# cloud.google.com/tpu docs (v5e = v5 lite: 197 TFLOP/s bf16; v5p: 459;
# v4: 275; v6e/Trillium: 918; v3: 123).
_PEAKS = {
    "v5 lite": 197e12,
    "v5e": 197e12,
    "v5litepod": 197e12,
    "v5p": 459e12,
    "v5": 459e12,
    "v4": 275e12,
    "v6 lite": 918e12,
    "v6e": 918e12,
    "v3": 123e12,
}


def device_peak_flops(device_kind: str) -> Optional[float]:
    """Peak bf16 FLOP/s for a jax device_kind string, or None if unknown."""
    kind = device_kind.lower().replace("tpu", "").strip()
    # longest-prefix match so "v5 lite0" resolves before "v5"
    for name in sorted(_PEAKS, key=len, reverse=True):
        if kind.startswith(name):
            return _PEAKS[name]
    return None

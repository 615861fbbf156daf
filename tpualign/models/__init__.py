"""Flax CLIP towers (image + text) and checkpoint loading.

TPU-native replacement for the reference's OpenCLIP/PyTorch model layer
(ref:src/insert_clip_embeddings.py:37-141): same architectures
(ViT-B-32 / ViT-L-14 / ViT-H-14, QuickGELU for OpenAI weights), implemented
as pure-functional Flax modules compiled by XLA, with bf16 matmul policy for
the MXU and fp32 parity mode for numerical-drift validation.
"""

from tpualign.models.clip import CLIP, build_clip, init_clip_params  # noqa: F401
from tpualign.models.loader import (  # noqa: F401
    load_checkpoint_params,
    convert_openclip_state_dict,
    convert_hf_clip_state_dict,
)

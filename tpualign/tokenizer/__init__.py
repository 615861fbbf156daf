"""CLIP BPE tokenizer (host-side, pure Python with optional C++ core).

Replaces the reference's ``open_clip.get_tokenizer`` usage
(ref:src/insert_clip_embeddings.py:84,133-134): 77-token contexts,
start/end-of-text specials, truncation with EOT forced at the last position.
"""

from tpualign.tokenizer.bpe import ClipTokenizer, tokenize  # noqa: F401

"""CLIP byte-pair-encoding tokenizer.

Implements the exact SimpleTokenizer algorithm used by OpenAI CLIP / OpenCLIP
(the tokenizer behind ref:src/insert_clip_embeddings.py:84): byte->unicode
remapping, greedy lowest-rank pair merging with ``</w>`` word terminals, the
CLIP text regex, lower-casing, whitespace collapsing, and fixed 77-token
contexts with ``<|startoftext|>`` / ``<|endoftext|>`` specials. Truncation
keeps the first ``context_length - 2`` word tokens and forces EOT at the last
slot, matching OpenCLIP's ``tokenize`` (the implicit truncation acknowledged
at ref:src/insert_clip_embeddings.py:133).

The merges table is loaded from a local ``bpe_simple_vocab_16e6.txt(.gz)``
when available (``CLIP_BPE_PATH`` env var or an explicit path). This
environment has no network egress, so when no merges file exists the
tokenizer falls back to a deterministic byte-level vocabulary (merges list
empty): every encoding is still valid (ids < vocab_size) and reproducible,
but not OpenCLIP-token-identical. Parity tests exercise the BPE algorithm
against hand-computed merges fixtures.
"""

from __future__ import annotations

import gzip
import html
import os
from functools import lru_cache
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

try:  # `regex` supports \p{L}/\p{N} classes used by CLIP's pattern
    import regex as re
except ImportError:  # pragma: no cover
    import re  # type: ignore

try:
    import ftfy
except ImportError:  # pragma: no cover - ftfy absent in this image
    ftfy = None

__all__ = ["ClipTokenizer", "tokenize", "bytes_to_unicode"]

SOT_TOKEN = "<|startoftext|>"
EOT_TOKEN = "<|endoftext|>"
DEFAULT_CONTEXT_LENGTH = 77

_CLIP_PATTERN = (
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
    r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"
)


@lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """Reversible byte -> printable-unicode-codepoint mapping (GPT-2/CLIP)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(2**8):
        if b not in bs:
            bs.append(b)
            cs.append(2**8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word: Tuple[str, ...]) -> set:
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def _basic_clean(text: str) -> str:
    if ftfy is not None:
        text = ftfy.fix_text(text)
    text = html.unescape(html.unescape(text))
    return text.strip()


_WS_RE = re.compile(r"\s+")


def _whitespace_clean(text: str) -> str:
    return _WS_RE.sub(" ", text).strip()


def _find_default_merges() -> Optional[str]:
    """Locate a merges file: CLIP_BPE_PATH env, package dir, or common caches."""
    cands = []
    envp = os.environ.get("CLIP_BPE_PATH")
    if envp:
        cands.append(envp)
    here = Path(__file__).parent
    cands += [
        str(here / "bpe_simple_vocab_16e6.txt.gz"),
        str(here / "bpe_simple_vocab_16e6.txt"),
    ]
    for c in cands:
        if c and Path(c).exists():
            return c
    return None


def _load_merges(path: str) -> List[Tuple[str, str]]:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt", encoding="utf-8") as f:  # type: ignore[arg-type]
        lines = f.read().split("\n")
    # The published CLIP vocab file has a version header line and is used in
    # the range [1:49152-256-2+1]; accept both raw merge lists and that file.
    if lines and (" " not in lines[0] or lines[0].startswith("#version")):
        lines = lines[1:]
    merges = []
    for line in lines:
        parts = line.split()
        if len(parts) == 2:
            merges.append((parts[0], parts[1]))
    # CLIP uses exactly 48894 merges so the final vocab is 49408.
    limit = 49152 - 256 - 2
    return merges[:limit]


class ClipTokenizer:
    """CLIP BPE tokenizer.

    Parameters
    ----------
    bpe_path:
        Path to a merges file. ``None`` tries the default locations and, if
        nothing is found, builds the deterministic byte-level fallback vocab.
    context_length:
        Fixed token context (77 for all CLIP variants).
    """

    def __init__(
        self,
        bpe_path: Optional[str] = None,
        context_length: int = DEFAULT_CONTEXT_LENGTH,
    ):
        self.context_length = context_length
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}

        path = bpe_path if bpe_path is not None else _find_default_merges()
        merges: List[Tuple[str, str]] = _load_merges(path) if path else []
        self.exact_vocab = bool(merges)

        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for merge in merges:
            vocab.append("".join(merge))
        vocab.extend([SOT_TOKEN, EOT_TOKEN])

        self.encoder: Dict[str, int] = {tok: i for i, tok in enumerate(vocab)}
        self.decoder: Dict[int, str] = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks: Dict[Tuple[str, str], int] = {m: i for i, m in enumerate(merges)}
        self.cache: Dict[str, str] = {SOT_TOKEN: SOT_TOKEN, EOT_TOKEN: EOT_TOKEN}
        self.pat = re.compile(_CLIP_PATTERN, re.IGNORECASE)

        self.sot_id = self.encoder[SOT_TOKEN]
        self.eot_id = self.encoder[EOT_TOKEN]

        # Optional native merge core (tpualign/native): the greedy-merge hot
        # loop runs in C++ over symbol IDS; Python keeps the regex split,
        # the byte->unicode mapping, and the per-word cache. Falls back to
        # the pure-Python bpe() transparently.
        self._id_cache: Dict[str, List[int]] = {}
        self._raw_cache: Dict[str, List[int]] = {}
        self._bpe_core = None
        if merges:
            try:
                from tpualign.native import make_bpe_core

                self._bpe_core = make_bpe_core(
                    [self.encoder[l] for l, _ in merges],
                    [self.encoder[r] for _, r in merges],
                    [self.encoder[l + r] for l, r in merges],
                )
            except Exception:
                self._bpe_core = None

    def _encode_token_ids(self, btoken: str) -> List[int]:
        """Byte-encoded token -> BPE ids (native fast path with cache)."""
        cached = self._id_cache.get(btoken)
        if cached is not None:
            return cached
        if self._bpe_core is not None:
            syms = [self.encoder[c] for c in btoken[:-1]]
            syms.append(self.encoder[btoken[-1] + "</w>"])
            ids = self._bpe_core.word(syms) if len(syms) > 1 else syms
        else:
            ids = [self.encoder[t] for t in self.bpe(btoken).split(" ")]
        self._id_cache[btoken] = ids
        return ids

    @property
    def vocab_size(self) -> int:
        return len(self.encoder)

    # -- core BPE ----------------------------------------------------------

    def bpe(self, token: str) -> str:
        cached = self.cache.get(token)
        if cached is not None:
            return cached
        word: Tuple[str, ...] = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"

        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)

        out = " ".join(word)
        self.cache[token] = out
        return out

    # -- public encode/decode ----------------------------------------------

    def encode(self, text: str) -> List[int]:
        """Text -> BPE ids (without specials, unpadded).

        The per-word cache keys on the RAW regex token so repeated words
        (the common case in a manual corpus) skip byte-encoding entirely —
        the host tokenizer must keep up with the device's short-bucket
        text rates (docs/PERFORMANCE.md host feed)."""
        ids: List[int] = []
        raw_cache = self._raw_cache
        byte_encoder = self.byte_encoder
        text = _whitespace_clean(_basic_clean(text)).lower()
        for token in self.pat.findall(text):
            got = raw_cache.get(token)
            if got is None:
                btoken = "".join(
                    byte_encoder[b] for b in token.encode("utf-8")
                )
                got = self._encode_token_ids(btoken)
                raw_cache[token] = got
            ids.extend(got)
        return ids

    def decode(self, ids: Iterable[int]) -> str:
        text = "".join(self.decoder.get(int(i), "") for i in ids)
        raw = bytearray(self.byte_decoder[c] for c in text if c in self.byte_decoder)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")

    def __call__(self, texts: Sequence[str] | str) -> np.ndarray:
        """Batch tokenize to a fixed (N, context_length) int32 array.

        Matches OpenCLIP semantics: [SOT] + ids + [EOT], zero padding,
        truncation with EOT forced at position context_length-1.
        """
        if isinstance(texts, str):
            texts = [texts]
        result = np.zeros((len(texts), self.context_length), dtype=np.int32)
        for i, text in enumerate(texts):
            ids = [self.sot_id] + self.encode(text) + [self.eot_id]
            if len(ids) > self.context_length:
                ids = ids[: self.context_length]
                ids[-1] = self.eot_id
            result[i, : len(ids)] = ids
        return result


_DEFAULT: Optional[ClipTokenizer] = None


def tokenize(
    texts: Sequence[str] | str, context_length: int = DEFAULT_CONTEXT_LENGTH
) -> np.ndarray:
    """Module-level convenience wrapper over a shared default tokenizer."""
    global _DEFAULT
    if _DEFAULT is None or _DEFAULT.context_length != context_length:
        _DEFAULT = ClipTokenizer(context_length=context_length)
    return _DEFAULT(texts)

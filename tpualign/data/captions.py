"""Caption extraction and image linking.

Reproduces ref:src/pdf_processor.py:818-869: regex caption patterns (Dutch
set for ``nl``, English otherwise) matched against the full page text with
IGNORECASE|MULTILINE, each match assigned to the FIRST image on the page —
so after the loop the first image carries the LAST caption found (the
acknowledged simplification at ref:src/pdf_processor.py:864-869). Also the
Word-document variant that matches caption numbers to image order
(ref:src/pdf_processor.py:871-936).
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence

__all__ = [
    "DUTCH_CAPTION_PATTERNS",
    "ENGLISH_CAPTION_PATTERNS",
    "find_captions",
    "link_captions_first_image",
    "link_captions_by_number",
]

DUTCH_CAPTION_PATTERNS = (
    r"Fig\.?\s*\d+[:\s]+.*?(?=\n|$)",
    r"Figuur\s*\d+[:\s]+.*?(?=\n|$)",
    r"Afb\.?\s*\d+[:\s]+.*?(?=\n|$)",
    r"Afbeelding\s*\d+[:\s]+.*?(?=\n|$)",
    r"Foto\s*\d+[:\s]+.*?(?=\n|$)",
)

ENGLISH_CAPTION_PATTERNS = (
    r"Fig\.?\s*\d+[:\s]+.*?(?=\n|$)",
    r"Figure\s*\d+[:\s]+.*?(?=\n|$)",
    r"Abb\.?\s*\d+[:\s]+.*?(?=\n|$)",
    r"Image\s*\d+[:\s]+.*?(?=\n|$)",
)


def find_captions(page_text: str, language: str = "nl") -> List[dict]:
    """All caption matches in pattern order, each as
    ``{"text", "start", "end"}`` (ref:src/pdf_processor.py:848-855)."""
    patterns = DUTCH_CAPTION_PATTERNS if language == "nl" else ENGLISH_CAPTION_PATTERNS
    captions = []
    for pattern in patterns:
        for match in re.finditer(pattern, page_text, re.IGNORECASE | re.MULTILINE):
            captions.append(
                {"text": match.group().strip(), "start": match.start(), "end": match.end()}
            )
    return captions


def link_captions_first_image(
    captions: Sequence[dict], page_images: List[Dict]
) -> None:
    """Assign every caption to the first image (in place); net effect: first
    image ends with the last caption (ref:src/pdf_processor.py:857-869)."""
    for caption in captions:
        if page_images:
            page_images[0]["caption"] = caption["text"]


def link_captions_by_number(
    captions: Sequence[dict], doc_images: List[Dict]
) -> None:
    """Word-document linking: caption number N -> N-1th image, fallback to
    first image (ref:src/pdf_processor.py:916-936)."""
    for caption in captions:
        if not doc_images:
            continue
        m = re.search(r"(\d+)", caption["text"])
        if m:
            idx = int(m.group(1)) - 1
            if 0 <= idx < len(doc_images):
                doc_images[idx]["caption"] = caption["text"]
            else:
                doc_images[0]["caption"] = caption["text"]
        else:
            doc_images[0]["caption"] = caption["text"]

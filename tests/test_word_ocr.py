"""Tests for the gated Word direct extractors and OCR fallback (stubbed)."""

import json

import numpy as np
import pytest
from PIL import Image

from tpualign.data.ocr import extract_ocr_bboxes, match_line_bbox
from tpualign.data.word import (
    detect_image_ext,
    extract_images_from_word,
    extract_text_chunks_from_word,
    link_word_captions,
)


# -- Word extractor stubs -----------------------------------------------------


class StubPara:
    def __init__(self, text):
        self.text = text


class StubCell:
    def __init__(self, text):
        self.text = text


class StubRow:
    def __init__(self, cells):
        self.cells = [StubCell(c) for c in cells]


class StubTable:
    def __init__(self, rows):
        self.rows = [StubRow(r) for r in rows]


class StubRel:
    def __init__(self, blob, ref="media/image1.png"):
        self.target_ref = ref
        self.target_part = type("P", (), {"blob": blob})()


class StubDoc:
    def __init__(self, paragraphs, tables=(), rels=()):
        self.paragraphs = [StubPara(p) for p in paragraphs]
        self.tables = list(tables)
        self.part = type("Part", (), {"rels": {i: r for i, r in enumerate(rels)}})()


PNG_MAGIC = b"\x89PNG\r\n\x1a\n" + b"0" * 16
JPG_MAGIC = b"\xff\xd8\xff\xe0" + b"0" * 16


def test_detect_image_ext():
    assert detect_image_ext(PNG_MAGIC) == "png"
    assert detect_image_ext(JPG_MAGIC) == "jpg"
    assert detect_image_ext(b"GIF89a") == "gif"
    assert detect_image_ext(b"BM1234") == "bmp"
    assert detect_image_ext(b"????") == "png"


def test_extract_images_from_word(tmp_path):
    doc = StubDoc([], rels=[StubRel(PNG_MAGIC), StubRel(JPG_MAGIC, "media/image2.jpg"),
                            StubRel(b"x", "styles.xml")])
    out = extract_images_from_word(doc, "man", tmp_path)
    assert len(out) == 2  # non-image rel skipped
    assert out[0]["image_id"] == "man_img0"
    assert out[0]["page"] == 1 and out[0]["bbox"] == [0, 0, 0, 0]
    assert (tmp_path / "man_img0.png").exists()
    assert (tmp_path / "man_img1.jpg").exists()


def test_extract_text_chunks_from_word():
    doc = StubDoc(
        ["1. Verwijder de schroef", "De pomp werkt. Daarna stopt hij.", ""],
        tables=[StubTable([["a", "b"], ["", ""]])],
    )
    chunks, full = extract_text_chunks_from_word(doc, "man", "nl", None)
    texts = [c["text"] for c in chunks]
    assert "1. Verwijder de schroef" in texts          # instruction kept whole
    assert "De pomp werkt" in texts and "Daarna stopt hij" in texts
    assert "a b" in texts                              # table row
    ids = [c["chunk_id"] for c in chunks]
    assert "man_p1_c0" in ids and "man_table0_row0" in ids
    assert "Verwijder" in full


def test_word_caption_number_linking():
    images = [
        {"image_id": "m_img0", "caption": None},
        {"image_id": "m_img1", "caption": None},
    ]
    link_word_captions("intro\nFiguur 2: de pomp\ntekst", images, "nl")
    assert images[1]["caption"] == "Figuur 2: de pomp"
    assert images[0]["caption"] is None
    # out-of-range number falls back to first image
    link_word_captions("Figuur 9: onbekend", images, "nl")
    assert images[0]["caption"] == "Figuur 9: onbekend"


# -- OCR fallback (stub engine) --------------------------------------------------


def stub_engine(boxes):
    def engine(image):
        return {
            "text": [b["text"] for b in boxes],
            "left": [b["l"] for b in boxes],
            "top": [b["t"] for b in boxes],
            "width": [b["w"] for b in boxes],
            "height": [b["h"] for b in boxes],
        }
    return engine


def test_extract_ocr_bboxes_coordinate_mapping():
    img = Image.new("RGB", (200, 100))
    # page 400x200 -> scale 2x
    boxes = extract_ocr_bboxes(
        img, 400, 200,
        stub_engine([{"text": "hello", "l": 10, "t": 20, "w": 30, "h": 10},
                     {"text": "  ", "l": 0, "t": 0, "w": 1, "h": 1}]),
    )
    assert len(boxes) == 1  # blank text dropped
    assert boxes[0]["bbox"] == [20.0, 40.0, 80.0, 60.0]


def test_match_line_bbox():
    boxes = [{"text": "hello world", "bbox": [1, 2, 3, 4]}]
    assert match_line_bbox("hello", boxes) == [1, 2, 3, 4]      # line in box text
    assert match_line_bbox("hello world and more", boxes) == [1, 2, 3, 4]
    assert match_line_bbox("zzz", boxes) == [0, 0, 0, 0]


def test_processor_ocr_fallback_path(tmp_path):
    """No-words page + USE_OCR_FALLBACK + injected engine -> OCR bboxes."""
    from tpualign.config import DataConfig
    from tpualign.data.backends import SyntheticHandle, write_synthetic_document
    from tpualign.data.processor import DocumentProcessor

    raw = tmp_path / "raw"
    raw.mkdir()
    write_synthetic_document(raw / "m.synthdoc.json", [{
        "width": 400, "height": 200,
        "images": [], "drawings": [], "words": [],
        "plain_text": "regel een\nregel twee",
    }])

    cfg = DataConfig(input_dir=str(raw), output_dir=str(tmp_path / "out"),
                     use_ocr_fallback=True)
    proc = DocumentProcessor(cfg, nlp=None)
    proc.ocr_engine = stub_engine(
        [{"text": "regel een", "l": 5, "t": 10, "w": 50, "h": 5}]
    )

    # synthetic backend can't render -> OCR yields nothing; patch render
    handle = SyntheticHandle(raw / "m.synthdoc.json")
    handle.render_page = lambda page, dpi=200: Image.new("RGB", (200, 100))
    blocks = proc.extract_text_blocks(handle, "m", 1)
    assert blocks[0]["text"] == "regel een"
    assert blocks[0]["bbox"] == [10.0, 20.0, 110.0, 30.0]  # scaled 2x
    assert blocks[1]["bbox"] == [0, 0, 0, 0]  # unmatched line stays zero

"""Data-layer tests: chunking, bbox logic, captions, lexical vocab, processor
end-to-end on synthetic documents."""

import json

import numpy as np
import pytest
from PIL import Image
import io

from tpualign.config import DataConfig
from tpualign.data.backends import Word, write_synthetic_document
from tpualign.data import chunking
from tpualign.data.captions import find_captions, link_captions_first_image
from tpualign.data.filtering import filter_lexical_components, load_exclude_terms
from tpualign.data.lexical import (
    HeuristicNoun,
    build_lexical_data,
    extract_lexical_components,
    preprocess_text,
)
from tpualign.data.processor import DocumentProcessor, filter_invalid_bboxes


def W(text, x0, top, x1, bottom):
    return Word(text=text, x0=x0, x1=x1, top=top, bottom=bottom)


def png_bytes(color=(255, 0, 0), size=(60, 40)):
    buf = io.BytesIO()
    Image.new("RGB", size, color).save(buf, format="PNG")
    return buf.getvalue()


# -- chunking ---------------------------------------------------------------


def test_group_words_into_lines_tolerance():
    # First word height 10 -> tolerance 5: tops within 5 of line-first join it.
    words = [
        W("a", 0, 100, 10, 110),
        W("b", 20, 104, 30, 114),  # within 5 of 100
        W("c", 0, 120, 10, 130),   # new line
    ]
    lines = chunking.group_words_into_lines(words)
    assert [[w.text for w in ln] for ln in lines] == [["a", "b"], ["c"]]


def test_lines_sorted_horizontally():
    words = [W("right", 50, 0, 60, 10), W("left", 0, 1, 10, 11)]
    lines = chunking.group_words_into_lines(words)
    assert [w.text for w in lines[0]] == ["left", "right"]


@pytest.mark.parametrize(
    "text,lang,expected",
    [
        ("1. Remove the cover", "en", True),
        ("• bullet item", "en", True),
        ("a. lettered", "en", True),
        ("Step one: do it", "en", True),
        ("Warning: hot", "en", True),
        ("Note the difference", "en", True),
        ("the quick brown fox", "en", False),
        ("Stap 1: verwijder", "nl", True),
        ("Controleer de filter", "nl", True),
        ("Verwijder het deksel", "nl", True),
        ("gewone zin zonder marker", "nl", False),
        # Dutch set doesn't contain English keywords (unless other regexes hit)
        ("remove the cover now", "nl", False),
        # IGNORECASE: lowercase keyword still matches
        ("warning: hot", "en", True),
        # "Title:" header pattern
        ("Onderhoud: jaarlijks", "nl", True),
    ],
)
def test_is_instruction_line(text, lang, expected):
    assert chunking.is_instruction_line(text, lang) is expected


def test_split_by_sentences_regex_fallback():
    out = chunking.split_by_sentences("One. Two! Three? Four", nlp=None)
    assert out == ["One", "Two", "Three", "Four"]


def test_split_into_instruction_chunks():
    lines = [
        [W("1.", 0, 0, 5, 10), W("Remove", 6, 0, 20, 10), W("cover.", 21, 0, 40, 10)],
        [W("It", 0, 20, 5, 30), W("works.", 6, 20, 20, 30), W("Done.", 21, 20, 40, 30)],
    ]
    chunks = chunking.split_into_instruction_chunks(lines, "en", None)
    assert chunks == ["1. Remove cover.", "It works", "Done"]


def test_chunk_bbox_first_matching_line():
    lines = [
        [W("hello", 10, 5, 40, 15), W("world", 45, 5, 80, 15)],
        [W("other", 10, 25, 40, 35)],
    ]
    # chunk matching line 1 exactly
    assert chunking.chunk_bbox_for_lines("hello world", lines) == [10, 5, 80, 15]
    # a chunk containing a full line's text triggers tier-1 on that line
    assert chunking.chunk_bbox_for_lines("world other", lines) == [10, 25, 40, 35]
    # no line containment but shared tokens -> union of those words (tier-2)
    assert chunking.chunk_bbox_for_lines("world qqq", lines) == [45, 5, 80, 15]
    # nothing matches -> zeros
    assert chunking.chunk_bbox_for_lines("zzz qqq", lines) == [0, 0, 0, 0]


# -- captions -----------------------------------------------------------------


def test_find_captions_order_and_patterns():
    text = "Figuur 2: tweede\nsome text\nFig. 1: eerste\nFoto 3 derde"
    caps = find_captions(text, "nl")
    # pattern order: Fig before Figuur before Foto
    assert [c["text"] for c in caps] == [
        "Fig. 1: eerste", "Figuur 2: tweede", "Foto 3 derde",
    ]


def test_caption_linking_last_wins():
    caps = [{"text": "Fig. 1: a"}, {"text": "Fig. 2: b"}]
    images = [{"caption": None}, {"caption": None}]
    link_captions_first_image(caps, images)
    assert images[0]["caption"] == "Fig. 2: b"  # last caption wins on first image
    assert images[1]["caption"] is None


def test_english_vs_dutch_caption_sets():
    text = "Figure 1: en only\nAfbeelding 2: nl only"
    en = [c["text"] for c in find_captions(text, "en")]
    nl = [c["text"] for c in find_captions(text, "nl")]
    assert "Figure 1: en only" in en and "Afbeelding 2: nl only" not in en
    assert "Afbeelding 2: nl only" in nl and "Figure 1: en only" not in nl


# -- lexical -------------------------------------------------------------------


def test_preprocess_text():
    assert preprocess_text("hyphen-\nated  word") == "hyphenated word"
    assert preprocess_text("a   b\t c") == "a b c"
    assert preprocess_text("42") == ""  # page-number-only string


class StubToken:
    def __init__(self, lemma, pos="NOUN", stop=False, punct=False):
        self.lemma_ = lemma
        self.pos_ = pos
        self.is_stop = stop
        self.is_punct = punct


def stub_nlp(tokens):
    return lambda text: tokens


def test_extract_lexical_filters():
    tokens = [
        StubToken("Filter"),            # ok -> "filter"
        StubToken("abc"),               # too short (<4)
        StubToken("de", stop=True),     # stop
        StubToken(".", punct=True),     # punct
        StubToken("1234"),              # no letter
        StubToken("bout-moer"),         # hyphenated ok
        StubToken("we!rd"),             # non-alnum, no hyphen
        StubToken("lopen", pos="VERB"), # not a noun
    ]
    out = extract_lexical_components("x", stub_nlp(tokens))
    assert out == ["filter", "bout-moer"]


def test_extract_lexical_none_nlp():
    assert extract_lexical_components("any text", None) == []


def test_build_lexical_data_sorting():
    data = build_lexical_data(["b", "a", "b", "c", "a", "b"])
    assert data["total_components"] == 3
    assert data["total_occurrences"] == 6
    assert [c["term"] for c in data["components"]] == ["b", "a", "c"]
    assert [c["count"] for c in data["components"]] == [3, 2, 1]


def test_heuristic_noun_extractor():
    nlp = HeuristicNoun()
    out = extract_lexical_components("Verwijder de filterdeksel met een sleutel", nlp)
    assert "filterdeksel" in out and "sleutel" in out
    assert "de" not in out and "een" not in out


# -- filtering -----------------------------------------------------------------


def test_filter_lexical_components(tmp_path):
    inp = tmp_path / "lex.json"
    inp.write_text(json.dumps(build_lexical_data(["schroef"] * 3 + ["ruis"] * 2)))
    out = tmp_path / "filtered.json"
    data = filter_lexical_components(inp, out, exclude_terms={"ruis"})
    assert data["total_components"] == 1
    assert data["total_occurrences"] == 3
    assert data["excluded_count"] == 1
    assert data["excluded_terms"] == ["ruis"]
    saved = json.loads(out.read_text())
    assert saved == data


def test_load_exclude_terms(tmp_path):
    p = tmp_path / "exclude.txt"
    p.write_text("# comment\nruis\n\n  proce  \n")
    assert load_exclude_terms(str(p)) == {"ruis", "proce"}
    assert load_exclude_terms(None) == set()
    assert load_exclude_terms(str(tmp_path / "missing.txt")) == set()


# -- bbox filter ------------------------------------------------------------------


def test_filter_invalid_bboxes():
    images = [
        {"bbox": [0, 0, 0, 0]},
        {"bbox": None},
        {"bbox": [1, 2, 3, 4]},
        {"bbox": [0, 0, 5, 0]},  # any nonzero coord -> kept (reference semantics)
    ]
    out = filter_invalid_bboxes(images)
    assert out == [{"bbox": [1, 2, 3, 4]}, {"bbox": [0, 0, 5, 0]}]


# -- processor end-to-end on synthetic documents -----------------------------------


@pytest.fixture()
def manual_dir(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    words_p1 = [
        # caption line
        W("Fig.", 50, 300, 70, 310), W("1:", 72, 300, 80, 310),
        W("de", 82, 300, 90, 310), W("filterdeksel", 92, 300, 150, 310),
        # instruction line
        W("1.", 50, 320, 60, 330), W("Verwijder", 62, 320, 110, 330),
        W("de", 112, 320, 120, 330), W("schroef", 122, 320, 160, 330),
        # plain sentence line
        W("De", 50, 340, 60, 350), W("pomp", 62, 340, 90, 350),
        W("werkt.", 92, 340, 120, 350),
    ]
    pages = [
        {
            "width": 612, "height": 792,
            "images": [
                {"data": png_bytes(), "ext": "png", "rects": [[100, 100, 200, 180]]},
                {"data": png_bytes((0, 255, 0)), "ext": "png", "rects": [],
                 "dict_bbox": [250, 100, 350, 200]},
                {"data": png_bytes((0, 0, 255)), "ext": "png", "rects": []},  # zero bbox
            ],
            "drawings": [[400, 400, 500, 480], [10, 10, 12, 12]],  # 2nd too small
            "words": [w.as_dict() for w in words_p1],
            "plain_text": "Fig. 1: de filterdeksel\n1. Verwijder de schroef\nDe pomp werkt.",
        },
        {
            "width": 612, "height": 792,
            "images": [],
            "drawings": [],
            "words": [],
            "plain_text": "pagina twee regel een\nregel twee",
        },
        {
            "width": 612, "height": 792,
            # no rects, no dict blocks anywhere on the page -> zero bbox -> filtered
            "images": [{"data": png_bytes((9, 9, 9)), "ext": "png", "rects": []}],
            "drawings": [],
            "words": [],
            "plain_text": "",
        },
    ]
    write_synthetic_document(raw / "manualA.synthdoc.json", pages)
    return tmp_path


def test_processor_end_to_end(manual_dir):
    cfg = DataConfig(
        input_dir=str(manual_dir / "raw"),
        output_dir=str(manual_dir / "processed"),
        language="nl",
    )
    proc = DocumentProcessor(cfg, nlp=HeuristicNoun())
    summary = proc.process_all_documents()

    images = json.loads((manual_dir / "processed/image_metadata.json").read_text())
    chunks = json.loads((manual_dir / "processed/text_chunks.json").read_text())
    lex = json.loads((manual_dir / "processed/lexical_components.json").read_text())

    # native + dict_fallback + idx-th-block last resort + vector kept;
    # the page-3 image (no rects, no dict blocks) got a zero bbox -> filtered
    assert summary["images"] == 4
    sources = {i["image_id"]: i["bbox_source"] for i in images}
    assert sources["manualA_p1_img0"] == "native"
    assert sources["manualA_p1_img1"] == "dict_fallback"
    # img2 has no rects/dict_bbox but the page has a dict block -> idx-th
    # block last resort (reference behavior, ref:src/pdf_processor.py:375-386)
    assert sources["manualA_p1_img2"] == "dict_fallback"
    assert "manualA_p3_img0" not in sources  # zero bbox -> filtered
    assert sources["manualA_p1_vector0"] == "vector"
    vec = [i for i in images if i["image_id"] == "manualA_p1_vector0"][0]
    assert vec["filename"] is None and vec["image_type"] == "vector_figure"

    # image files written
    assert (manual_dir / "processed/images/manualA_p1_img0.png").exists()

    # chunk structure: caption line is sentence-split? "Fig. 1: de filterdeksel"
    # -> not an instruction line (nl): sentence-split by regex on "."
    texts = [c["text"] for c in chunks]
    assert "1. Verwijder de schroef" in texts  # instruction kept whole
    assert any("pomp werkt" in t for t in texts)
    # page-2 has words=[] -> plain-text line fallback with zero bboxes
    p2 = [c for c in chunks if c["page"] == 2]
    assert [c["text"] for c in p2] == ["pagina twee regel een", "regel twee"]
    assert all(c["bbox"] == [0, 0, 0, 0] for c in p2)
    # chunk ids are per-page, 1-based page
    assert p2[0]["chunk_id"] == "manualA_p2_c0"

    # caption: last caption on page assigned to first image
    first_img = [i for i in images if i["image_id"] == "manualA_p1_img0"][0]
    assert first_img["caption"] is not None and "Fig" in first_img["caption"]

    # lexical vocabulary built via heuristic extractor
    terms = [c["term"] for c in lex["components"]]
    assert "schroef" in terms or "verwijder" in terms

    # idempotent re-run: same results, no duplication
    summary2 = proc.process_all_documents()
    assert summary2 == summary


def test_processor_chunk_bboxes(manual_dir):
    cfg = DataConfig(
        input_dir=str(manual_dir / "raw"),
        output_dir=str(manual_dir / "processed2"),
    )
    proc = DocumentProcessor(cfg, nlp=None)
    proc.process_all_documents()
    chunks = json.loads((manual_dir / "processed2/text_chunks.json").read_text())
    instr = [c for c in chunks if c["text"] == "1. Verwijder de schroef"][0]
    assert instr["bbox"] == [50, 320, 160, 330]


def test_chunk_length_bounds(manual_dir):
    """min/max chunk length enforced when set; no-op by default (the
    reference defines but never uses these, ref:config.py:20-21)."""
    cfg = DataConfig(
        input_dir=str(manual_dir / "raw"),
        output_dir=str(manual_dir / "bounded"),
        min_chunk_length=10,
        max_chunk_length=25,
    )
    proc = DocumentProcessor(cfg, nlp=None)
    proc.process_all_documents()
    chunks = json.loads((manual_dir / "bounded/text_chunks.json").read_text())
    p1 = [c for c in chunks if c["page"] == 1]
    assert all(10 <= len(c["text"]) <= 25 for c in p1)
    # page 2 uses the plain-text fallback path (bounds apply to the word
    # path only, like every other word-path-specific behavior)


def test_max_file_size_enforced(manual_dir):
    """Files over max_file_size_mb are skipped with a warning (the reference
    read MAX_FILE_SIZE_MB but never enforced it; the unified config does)."""
    cfg = DataConfig(
        input_dir=str(manual_dir / "raw"),
        output_dir=str(manual_dir / "sized"),
        max_file_size_mb=0,  # everything is oversized
    )
    proc = DocumentProcessor(cfg, nlp=None)
    summary = proc.process_all_documents()
    assert summary == {"images": 0, "chunks": 0, "lexical_terms": 0}


def test_link_captions_spatial_unit():
    from tpualign.data.captions import link_captions_spatial

    # two images: one above each caption; captions sit below their figure
    images = [
        {"image_id": "a", "bbox": [50, 100, 150, 200], "caption": None},
        {"image_id": "b", "bbox": [300, 100, 400, 200], "caption": None},
    ]
    lines = [
        {"text": "Figuur 1: de pomp", "bbox": [50, 210, 160, 222]},
        {"text": "Figuur 2: de klep", "bbox": [300, 210, 410, 222]},
    ]
    captions = [
        {"text": "Figuur 1: de pomp", "start": 0, "end": 17},
        {"text": "Figuur 2: de klep", "start": 20, "end": 37},
    ]
    link_captions_spatial(captions, images, lines)
    assert images[0]["caption"] == "Figuur 1: de pomp"
    assert images[1]["caption"] == "Figuur 2: de klep"

    # unresolvable caption bbox -> first-image fallback
    images2 = [dict(images[0], caption=None), dict(images[1], caption=None)]
    link_captions_spatial(
        [{"text": "Figuur 9: onvindbaar", "start": 0, "end": 10}],
        images2, lines,
    )
    assert images2[0]["caption"] == "Figuur 9: onvindbaar"


def test_processor_spatial_caption_linking(tmp_path):
    """CAPTION_LINKING=spatial assigns captions to the nearest image; the
    default first_image reproduces the reference rule on the same corpus."""
    raw = tmp_path / "raw"
    raw.mkdir()
    # two figures stacked vertically, each with its caption directly below
    words = []
    x = 60
    for t in "Figuur 1: de pomp".split():
        words.append({"text": t, "x0": x, "x1": x + 8 * len(t),
                      "top": 210, "bottom": 222})
        x += 8 * len(t) + 4
    x = 60
    for t in "Figuur 2: de klep".split():
        words.append({"text": t, "x0": x, "x1": x + 8 * len(t),
                      "top": 410, "bottom": 422})
        x += 8 * len(t) + 4
    pages = [{
        "width": 612, "height": 792,
        "images": [
            {"data": png_bytes((200, 0, 0)), "ext": "png", "rects": [[50, 100, 150, 200]]},
            {"data": png_bytes((0, 200, 0)), "ext": "png", "rects": [[50, 300, 150, 400]]},
        ],
        "drawings": [],
        "words": words,
        "plain_text": "Figuur 1: de pomp\nFiguur 2: de klep",
    }]
    write_synthetic_document(raw / "m.synthdoc.json", pages)

    def run(linking):
        out = tmp_path / f"out_{linking}"
        cfg = DataConfig(input_dir=str(raw), output_dir=str(out),
                         language="nl", caption_linking=linking)
        DocumentProcessor(cfg, nlp=None).process_all_documents()
        images = json.loads((out / "image_metadata.json").read_text())
        return {i["image_id"]: i["caption"] for i in images}

    spatial = run("spatial")
    assert spatial["m_p1_img0"] == "Figuur 1: de pomp"
    assert spatial["m_p1_img1"] == "Figuur 2: de klep"
    first = run("first_image")
    # reference rule: first image ends with the LAST caption; second gets none
    assert first["m_p1_img0"] == "Figuur 2: de klep"
    assert first["m_p1_img1"] is None

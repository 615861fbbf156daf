"""Document processor: images, text chunks, captions, lexical vocabulary.

The rebuild of the reference's ``PDFProcessor`` (ref:src/pdf_processor.py:38)
on top of the backend protocol in :mod:`tpualign.data.backends`. Behavioral
parity surface (SURVEY.md §2.5), all preserved:

- idempotent re-runs: delete prior JSON outputs + images dir contents
  (ref:src/pdf_processor.py:243-267);
- 3-tier image bbox fallback: native rects -> dict image block (matching
  xref, else idx-th block) -> zero bbox, with bbox_source
  native/dict_fallback/unknown (ref:src/pdf_processor.py:345-393);
- vector figures: drawings with w>=5 and h>=5 as placeholder entries with
  filename=None (ref:src/pdf_processor.py:427-452);
- zero-bbox images filtered before saving (ref:src/pdf_processor.py:78-94,989);
- word->line->chunk pipeline with per-page chunk ids
  ``{manual}_p{page}_c{idx}`` (1-based page, ref:src/pdf_processor.py:656-695);
- caption regexes with the first-image-on-page rule
  (ref:src/pdf_processor.py:818-869);
- noun vocabulary over the concatenation of all chunk text
  (ref:src/pdf_processor.py:986-1026);
- Word documents converted to PDF via LibreOffice then processed as PDFs,
  hard failure when conversion fails (ref:src/pdf_processor.py:293-318).
"""

from __future__ import annotations

import json
import subprocess
import tempfile
from pathlib import Path
from typing import Callable, List, Optional

from tpualign.config import DataConfig
from tpualign.data import chunking
from tpualign.data.backends import DocumentHandle, open_document
from tpualign.data.captions import find_captions, link_captions_first_image
from tpualign.data.lexical import (
    HeuristicNoun,
    build_lexical_data,
    extract_lexical_components,
    load_spacy,
    preprocess_text,
)
from tpualign.utils.logging import get_logger

log = get_logger("data.processor")

__all__ = ["DocumentProcessor", "filter_invalid_bboxes"]


def filter_invalid_bboxes(images: List[dict]) -> List[dict]:
    """Drop images whose bbox is absent or all-zero (ref:src/pdf_processor.py:78-94)."""
    if not images:
        return images
    valid = [
        img
        for img in images
        if img.get("bbox") and any((c or 0) != 0 for c in img["bbox"])
    ]
    dropped = len(images) - len(valid)
    if dropped:
        log.info(
            "Filtered out %d images with zero bounding boxes (%.2f%%)",
            dropped,
            100.0 * dropped / len(images),
        )
    return valid


class DocumentProcessor:
    """Extract multimodal data from manuals into the processed-JSON layout.

    Outputs (identical schemas to the reference):
      - ``image_metadata.json``: [{image_id, manual_id, page, bbox,
        bbox_source, caption, filename, image_type}]
      - ``text_chunks.json``: [{chunk_id, manual_id, page, bbox, text}]
      - ``lexical_components.json``: {total_components, total_occurrences,
        components: [{term, count}]}
      - ``images/``: extracted raster files named
        ``{manual}_p{page}_img{idx}.{ext}``
    """

    def __init__(
        self,
        config: DataConfig,
        nlp: Optional[Callable] = "auto",  # type: ignore[assignment]
        lexical_fallback: str = "none",  # "none" (reference parity) | "heuristic"
    ):
        self.config = config
        self.input_dir = Path(config.input_dir)
        self.output_dir = Path(config.output_dir)
        self.images_dir = Path(config.images_dir)
        self.language = config.language
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.images_dir.mkdir(parents=True, exist_ok=True)

        if nlp == "auto":
            nlp = load_spacy(self.language)
            if nlp is None and lexical_fallback == "heuristic":
                log.info("spaCy unavailable; using heuristic noun extractor")
                nlp = HeuristicNoun()
        self.nlp = nlp
        # sentence splitting degrades to the regex path for non-spaCy nlp
        self._sent_nlp = nlp if hasattr(nlp, "pipe") else None
        # OCR engine is injectable for tests; default resolves pytesseract
        # lazily (ref:src/pdf_processor.py:29-32 optional import)
        self.ocr_engine = None

        self.image_metadata: List[dict] = []
        self.text_chunks: List[dict] = []

    # -- top-level -----------------------------------------------------------

    def process_all_documents(self) -> dict:
        """Process every supported file in input_dir; save JSON outputs.

        Returns a summary dict {images, chunks, lexical_terms}.
        """
        self.image_metadata = []
        self.text_chunks = []

        # idempotent cleanup (ref:src/pdf_processor.py:252-267)
        for name in ("image_metadata.json", "text_chunks.json", "lexical_components.json"):
            p = self.output_dir / name
            if p.exists():
                p.unlink()
        for image in self.images_dir.glob("*"):
            try:
                image.unlink()
            except OSError as e:
                log.warning("Could not remove %s: %s", image, e)

        all_files = self._discover_files()
        if not all_files:
            log.warning(
                "No supported files found in %s (types: %s)",
                self.input_dir,
                ",".join(self.config.allowed_file_types),
            )
            return {"images": 0, "chunks": 0, "lexical_terms": 0}

        log.info("Found %d files to process", len(all_files))
        for file_path in all_files:
            try:
                self.process_single_document(file_path)
            except Exception as e:  # skip-and-continue (ref:src/pdf_processor.py:283-288)
                log.error("Error processing %s: %s", file_path, e)
                continue

        return self.save_extracted_data()

    def _discover_files(self) -> List[Path]:
        """Eligible input files, size-filtered.

        Enforces MAX_FILE_SIZE_MB (the reference read the env var but never
        applied it, ref:src/pdf_processor.py:54-60; the unified config
        promises honest settings, so oversized files are skipped-and-logged
        instead of silently ignoring the limit).
        """
        all_files: List[Path] = []
        for file_type in self.config.allowed_file_types:
            all_files.extend(sorted(self.input_dir.glob(f"*.{file_type}")))
        # synthetic fixtures are always eligible
        all_files.extend(sorted(self.input_dir.glob("*.synthdoc.json")))

        max_bytes = self.config.max_file_size_mb * 1024 * 1024
        kept: List[Path] = []
        for file_path in all_files:
            size = file_path.stat().st_size
            if size > max_bytes:
                log.warning(
                    "Skipping %s: %.1f MB exceeds max_file_size_mb=%d",
                    file_path, size / 1024 / 1024,
                    self.config.max_file_size_mb,
                )
                continue
            kept.append(file_path)
        return kept

    @staticmethod
    def _manual_id_for(file_path: Path) -> str:
        if file_path.name.endswith(".synthdoc.json"):
            return file_path.name[: -len(".synthdoc.json")]
        return file_path.stem

    def process_incremental(self) -> dict:
        """Streaming ingestion: process only NEW or CHANGED input files and
        merge with the previous outputs.

        A content-hash manifest (``ingest_manifest.json``) records every
        ingested file. Unchanged files keep their previous rows untouched
        (no reprocessing, no image re-extraction); new or changed files
        replace all rows of their manual and their previously extracted
        image files. The noun vocabulary is rebuilt over the merged chunk
        corpus. Files removed from the input directory keep their rows —
        ingestion is append/update; use :meth:`process_all_documents` for a
        clean rebuild. Returns the summary dict plus ``{"ingested": [...],
        "skipped_unchanged": N}``.
        """
        import hashlib

        manifest_path = self.output_dir / "ingest_manifest.json"
        manifest: dict = {}
        if manifest_path.exists():
            try:
                manifest = json.loads(manifest_path.read_text())
            except (OSError, json.JSONDecodeError):
                manifest = {}

        def load(name):
            p = self.output_dir / name
            if p.exists():
                try:
                    return json.loads(p.read_text())
                except (OSError, json.JSONDecodeError):
                    return []
            return []

        old_images = load("image_metadata.json")
        old_chunks = load("text_chunks.json")

        changed: List[Path] = []
        digests: dict = {}
        unchanged = 0
        for file_path in self._discover_files():
            digest = hashlib.sha256(file_path.read_bytes()).hexdigest()
            if manifest.get(file_path.name) == digest:
                unchanged += 1
                continue
            digests[file_path.name] = digest
            changed.append(file_path)

        if not changed:
            log.info("Ingest: nothing new (%d files unchanged)", unchanged)
            return {
                "images": len(old_images), "chunks": len(old_chunks),
                "lexical_terms": None, "ingested": [],
                "skipped_unchanged": unchanged,
            }

        # drop the reprocessed manuals' stale image files BEFORE extraction
        # writes the new ones (deleting after would destroy fresh output)
        reprocessed = {self._manual_id_for(p) for p in changed}
        for manual_id in reprocessed:
            for image in self.images_dir.glob(f"{manual_id}_p*"):
                try:
                    image.unlink()
                except OSError as e:
                    log.warning("Could not remove %s: %s", image, e)

        # process only the changed files into fresh accumulators; a file
        # that fails keeps its OLD manifest hash so the next cycle retries
        self.image_metadata = []
        self.text_chunks = []
        for file_path in changed:
            try:
                self.process_single_document(file_path)
                manifest[file_path.name] = digests[file_path.name]
            except Exception as e:  # skip-and-continue semantics
                log.error("Error processing %s: %s", file_path, e)
                continue

        merged_images = [
            m for m in old_images if m["manual_id"] not in reprocessed
        ] + self.image_metadata
        merged_chunks = [
            c for c in old_chunks if c["manual_id"] not in reprocessed
        ] + self.text_chunks

        self.image_metadata = merged_images
        self.text_chunks = merged_chunks
        summary = self.save_extracted_data()
        manifest_path.write_text(json.dumps(manifest, indent=2))
        summary["ingested"] = sorted(p.name for p in changed)
        summary["skipped_unchanged"] = unchanged
        log.info(
            "Ingest: %d file(s) processed, %d unchanged",
            len(changed), unchanged,
        )
        return summary

    def process_single_document(self, file_path: Path) -> None:
        file_path = Path(file_path)
        if file_path.name.endswith(".synthdoc.json"):
            manual_id = file_path.name[: -len(".synthdoc.json")]
        else:
            manual_id = file_path.stem
        suffix = file_path.suffix.lower()
        log.info("Processing %s (%s)", manual_id, suffix)

        if suffix == ".pdf" or file_path.name.endswith(".synthdoc.json"):
            self._process_paged_document(file_path, manual_id)
        elif suffix in (".docx", ".doc"):
            converted = self._convert_word_to_pdf(file_path)
            if converted is not None and converted.exists():
                self._process_paged_document(converted, manual_id)
            else:
                # no silent zero-bbox Word path (ref:src/pdf_processor.py:314-318)
                raise RuntimeError(
                    "Word->PDF conversion failed; aborting to avoid zero-bbox "
                    "Word extraction."
                )
        else:
            log.warning("Unsupported file type: %s", suffix)

    def _process_paged_document(self, path: Path, manual_id: str) -> None:
        handle = open_document(path)
        try:
            self.extract_images(handle, manual_id)
            self.extract_text_chunks(handle, manual_id)
        finally:
            handle.close()
        self._log_image_summary(manual_id)

    # -- images ---------------------------------------------------------------

    def extract_images(self, handle: DocumentHandle, manual_id: str) -> None:
        """Raster images with 3-tier bbox fallback + vector figures
        (ref:src/pdf_processor.py:326-457)."""
        for page_num in range(handle.num_pages()):
            images = handle.page_images(page_num)
            dict_blocks = None  # lazily fetched, like the reference's get_text("dict")
            for img_idx, img in enumerate(images):
                try:
                    bbox = None
                    bbox_source = None
                    if img.rects:
                        r = img.rects[0]
                        bbox = [r[0], r[1], r[2], r[3]]
                        bbox_source = "native"
                    if bbox is None and img.dict_bbox is not None:
                        bbox = list(img.dict_bbox)
                        bbox_source = "dict_fallback"
                    if bbox is None:
                        if dict_blocks is None:
                            dict_blocks = handle.dict_image_blocks(page_num)
                        if dict_blocks:
                            fb = dict_blocks[min(img_idx, len(dict_blocks) - 1)]
                            bbox = list(fb)
                            bbox_source = "dict_fallback"
                    if bbox is None:
                        bbox = [0, 0, 0, 0]
                        bbox_source = "unknown"

                    image_filename = (
                        f"{manual_id}_p{page_num + 1}_img{img_idx}.{img.ext}"
                    )
                    with open(self.images_dir / image_filename, "wb") as f:
                        f.write(img.data)

                    self.image_metadata.append(
                        {
                            "image_id": f"{manual_id}_p{page_num + 1}_img{img_idx}",
                            "manual_id": manual_id,
                            "page": page_num + 1,
                            "bbox": bbox,
                            "bbox_source": bbox_source or "unknown",
                            "caption": None,
                            "filename": image_filename,
                            "image_type": "raster_image",
                        }
                    )
                except Exception as e:
                    log.error(
                        "Error extracting image %d from page %d: %s",
                        img_idx, page_num, e,
                    )
                    continue

            # vector figures (ref:src/pdf_processor.py:427-452)
            v_idx = 0
            for rect in handle.page_drawings(page_num):
                w = float(rect[2] - rect[0])
                h = float(rect[3] - rect[1])
                if w < self.config.min_image_size or h < self.config.min_image_size:
                    continue
                self.image_metadata.append(
                    {
                        "image_id": f"{manual_id}_p{page_num + 1}_vector{v_idx}",
                        "manual_id": manual_id,
                        "page": page_num + 1,
                        "bbox": [rect[0], rect[1], rect[2], rect[3]],
                        "bbox_source": "vector",
                        "caption": None,
                        "filename": None,
                        "image_type": "vector_figure",
                    }
                )
                v_idx += 1

    # -- text -------------------------------------------------------------------

    def extract_text_chunks(self, handle: DocumentHandle, manual_id: str) -> None:
        """Per-page chunk extraction + caption linking
        (ref:src/pdf_processor.py:527-543)."""
        for page_num in range(handle.num_pages()):
            self.text_chunks.extend(
                self.extract_text_blocks(handle, manual_id, page_num + 1)
            )
            self._extract_and_link_captions(handle, manual_id, page_num + 1)

    def extract_text_blocks(
        self, handle: DocumentHandle, manual_id: str, page_num: int
    ) -> List[dict]:
        """Words -> lines -> chunks with bboxes; plain-text line fallback when
        the page has no word boxes (ref:src/pdf_processor.py:603-718)."""
        blocks: List[dict] = []
        try:
            words = handle.page_words(page_num - 1)
            if not words:
                # plain-text line fallback with optional OCR-derived bboxes
                # (ref:src/pdf_processor.py:619-648)
                plain_text = handle.page_text(page_num - 1)
                if plain_text:
                    ocr_boxes: List[dict] = []
                    if self.config.use_ocr_fallback:
                        from tpualign.data.ocr import extract_ocr_bboxes

                        w, h = handle.page_size(page_num - 1)
                        ocr_boxes = extract_ocr_bboxes(
                            handle.render_page(page_num - 1),
                            w, h, self.ocr_engine,
                        )
                    for line_idx, line in enumerate(plain_text.split("\n")):
                        if line.strip():
                            bbox = [0, 0, 0, 0]
                            if ocr_boxes:
                                from tpualign.data.ocr import match_line_bbox

                                bbox = match_line_bbox(line, ocr_boxes)
                            blocks.append(
                                {
                                    "chunk_id": f"{manual_id}_p{page_num}_c{line_idx}",
                                    "manual_id": manual_id,
                                    "page": page_num,
                                    "bbox": bbox,
                                    "text": line.strip(),
                                }
                            )
                return blocks

            lines = chunking.group_words_into_lines(words)
            chunks = chunking.split_into_instruction_chunks(
                lines, self.language, self._sent_nlp
            )
            min_len = self.config.min_chunk_length
            max_len = self.config.max_chunk_length
            for chunk_idx, chunk_text in enumerate(chunks):
                if not chunk_text.strip():
                    continue
                # optional length bounds (the reference defines but never
                # enforces these, ref:config.py:20-21; None = parity no-op)
                n_chars = len(chunk_text.strip())
                if min_len is not None and n_chars < min_len:
                    continue
                if max_len is not None and n_chars > max_len:
                    continue
                bbox = chunking.chunk_bbox_for_lines(chunk_text, lines)
                blocks.append(
                    {
                        "chunk_id": f"{manual_id}_p{page_num}_c{chunk_idx}",
                        "manual_id": manual_id,
                        "page": page_num,
                        "bbox": bbox,
                        "text": chunk_text.strip(),
                    }
                )
        except Exception as e:
            log.error("Error extracting text blocks from page %d: %s", page_num, e)
        return blocks

    def _extract_and_link_captions(
        self, handle: DocumentHandle, manual_id: str, page_num: int
    ) -> None:
        page_text = handle.page_text(page_num - 1)
        if not page_text:
            return
        captions = find_captions(page_text, self.language)
        page_images = [
            img
            for img in self.image_metadata
            if img["manual_id"] == manual_id and img["page"] == page_num
        ]
        if self.config.caption_linking == "spatial":
            # nearest-image linking from the page's line boxes (beyond-
            # reference improvement; see captions.link_captions_spatial)
            from tpualign.data.captions import link_captions_spatial

            try:
                words = handle.page_words(page_num - 1)
            except Exception:
                words = []
            lines = [
                {
                    "text": " ".join(w.text for w in line),
                    "bbox": [
                        min(w.x0 for w in line), min(w.top for w in line),
                        max(w.x1 for w in line), max(w.bottom for w in line),
                    ],
                }
                for line in chunking.group_words_into_lines(words)
            ]
            link_captions_spatial(captions, page_images, lines)
        else:
            link_captions_first_image(captions, page_images)

    # -- word conversion ---------------------------------------------------------

    def _convert_word_to_pdf(self, word_path: Path) -> Optional[Path]:
        """LibreOffice headless conversion (ref:src/pdf_processor.py:183-224)."""
        try:
            tmp_dir = Path(tempfile.mkdtemp(prefix="word2pdf_"))
            pdf_out = tmp_dir / f"{word_path.stem}.pdf"
            subprocess.run(
                [
                    self.config.soffice_path,
                    "--headless",
                    "--convert-to",
                    "pdf",
                    str(word_path),
                    "--outdir",
                    str(tmp_dir),
                ],
                check=True,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                timeout=self.config.word_to_pdf_timeout_seconds,
            )
            if pdf_out.exists() and pdf_out.stat().st_size > 0:
                return pdf_out
        except subprocess.TimeoutExpired:
            log.error("LibreOffice conversion timed out for %s", word_path)
        except FileNotFoundError:
            log.error(
                "LibreOffice (soffice) not found; set SOFFICE_PATH to its binary"
            )
        except Exception as e:
            log.error("LibreOffice conversion failed for %s: %s", word_path, e)
        return None

    # -- save ---------------------------------------------------------------------

    def save_extracted_data(self) -> dict:
        """Filter zero-bbox images, save the three JSONs, build the noun
        vocabulary (ref:src/pdf_processor.py:986-1026)."""
        self.image_metadata = filter_invalid_bboxes(self.image_metadata)

        with open(self.output_dir / "image_metadata.json", "w", encoding="utf-8") as f:
            json.dump(self.image_metadata, f, indent=2)
        with open(self.output_dir / "text_chunks.json", "w", encoding="utf-8") as f:
            json.dump(self.text_chunks, f, indent=2)

        all_text = " ".join(chunk["text"] for chunk in self.text_chunks)
        processed = preprocess_text(all_text)
        components = extract_lexical_components(processed, self.nlp)
        lexical_data = build_lexical_data(components)
        with open(
            self.output_dir / "lexical_components.json", "w", encoding="utf-8"
        ) as f:
            json.dump(lexical_data, f, indent=2)

        log.info(
            "Saved %d images, %d text chunks, %d unique lexical components",
            len(self.image_metadata),
            len(self.text_chunks),
            lexical_data["total_components"],
        )
        return {
            "images": len(self.image_metadata),
            "chunks": len(self.text_chunks),
            "lexical_terms": lexical_data["total_components"],
        }

    def _log_image_summary(self, manual_id: str) -> None:
        mine = [m for m in self.image_metadata if m["manual_id"] == manual_id]
        native = sum(1 for m in mine if m["bbox_source"] == "native")
        vector = sum(1 for m in mine if m["bbox_source"] == "vector")
        log.info(
            "Image extraction summary for %s: native=%d vector=%d total=%d",
            manual_id, native, vector, len(mine),
        )

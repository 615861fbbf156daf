"""Columnar embedding store with pgvector-equivalent semantics.

Replaces the reference's PostgreSQL layer:

- schema/table creation (ref:src/setup_vector_db.py:89-151) ->
  :meth:`EmbeddingStore.setup`;
- batch upserts keyed on image_id / chunk_id updating only the embedding
  (ref:src/insert_clip_embeddings.py:313-323,355-365) ->
  :meth:`insert_images` / :meth:`insert_chunks`;
- alignment upserts keyed on (image_id, chunk_id, alignment_type) updating
  weak_score (ref:src/insert_clip_embeddings.py:416-427) ->
  :meth:`insert_alignments`;
- the orchestrator's completion checks (schemas exist, row counts > 0,
  ref:src/run_pipeline.py:62-129) -> :meth:`schema_exists` /
  :meth:`has_embeddings`;
- HNSW/IVFFlat indexes are unnecessary: retrieval is exact sharded matmul
  + top-k on TPU (SURVEY.md §2.2 maps pgvector ANN -> exact on-TPU search).

Embeddings are stored row-major float32; ``embedding_matrix`` returns the
contiguous (N, D) block that feeds the device directly.
"""

from __future__ import annotations

import json
import shutil
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from tpualign.utils.logging import get_logger

log = get_logger("store")

SCHEMAS = ("vanilla_clip", "clip_lexical", "clip_positional", "clip_combined")

# metadata columns per table (embedding kept separately as a dense matrix)
_IMAGE_COLS = (
    "image_id", "manual_id", "page", "bbox", "bbox_source",
    "caption", "filename", "image_type",
)
_CHUNK_COLS = ("chunk_id", "manual_id", "page", "bbox", "text")
_ALIGN_COLS = ("image_id", "chunk_id", "weak_score", "alignment_type")


@dataclass
class _Table:
    """One keyed table: row metadata + optional embedding rows."""

    key_field: str
    rows: List[dict] = field(default_factory=list)
    index: Dict[str, int] = field(default_factory=dict)
    embeddings: List[Optional[np.ndarray]] = field(default_factory=list)

    def upsert(self, row: dict, embedding: Optional[np.ndarray]) -> None:
        key = row[self.key_field]
        pos = self.index.get(key)
        if pos is None:
            self.index[key] = len(self.rows)
            self.rows.append(dict(row))
            self.embeddings.append(embedding)
        else:
            # conflict: update only the embedding (reference ON CONFLICT ...
            # DO UPDATE SET clip_embedding = EXCLUDED.clip_embedding)
            if embedding is not None:
                self.embeddings[pos] = embedding

    def __len__(self) -> int:
        return len(self.rows)


@dataclass
class _AlignmentTable:
    rows: List[Tuple[str, str, float, str]] = field(default_factory=list)
    index: Dict[Tuple[str, str, str], int] = field(default_factory=dict)

    def upsert(self, image_id: str, chunk_id: str, score: float, a_type: str) -> None:
        key = (image_id, chunk_id, a_type)
        pos = self.index.get(key)
        if pos is None:
            self.index[key] = len(self.rows)
            self.rows.append((image_id, chunk_id, score, a_type))
        else:
            self.rows[pos] = (image_id, chunk_id, score, a_type)

    def __len__(self) -> int:
        return len(self.rows)


@dataclass
class _Schema:
    images: _Table = field(default_factory=lambda: _Table("image_id"))
    chunks: _Table = field(default_factory=lambda: _Table("chunk_id"))
    alignments: _AlignmentTable = field(default_factory=_AlignmentTable)


class EmbeddingStore:
    """Four-schema embedding store rooted at a directory."""

    def __init__(self, root: str | Path, embed_dim: int = 512):
        self.root = Path(root)
        self.embed_dim = embed_dim
        self._schemas: Dict[str, _Schema] = {}

    # -- lifecycle -----------------------------------------------------------

    def setup(self, schemas: Sequence[str] = SCHEMAS, force: bool = False) -> None:
        """Create schema directories (the DDL analogue). ``force`` drops and
        recreates, like re-running setup_vector_db."""
        self.root.mkdir(parents=True, exist_ok=True)
        for schema in schemas:
            d = self.root / schema
            if force and d.exists():
                shutil.rmtree(d)
            d.mkdir(parents=True, exist_ok=True)
            self._schemas.setdefault(schema, _Schema())
        self._write_manifest()

    def _write_manifest(self) -> None:
        manifest = {
            "embed_dim": self.embed_dim,
            "schemas": sorted(
                d.name for d in self.root.iterdir() if d.is_dir()
            ),
        }
        (self.root / "manifest.json").write_text(json.dumps(manifest, indent=2))

    def schema_exists(self, schema: str) -> bool:
        """Mirror of the information_schema check (ref:src/run_pipeline.py:62-96)."""
        return (self.root / schema).is_dir() or schema in self._schemas

    def has_embeddings(self, schema: str) -> bool:
        """images AND text_chunks counts > 0 (ref:src/run_pipeline.py:98-129)."""
        try:
            s = self._load(schema)
        except FileNotFoundError:
            return False
        return len(s.images) > 0 and len(s.chunks) > 0

    # -- inserts -------------------------------------------------------------

    def _schema(self, schema: str) -> _Schema:
        if schema not in self._schemas:
            self._schemas[schema] = _Schema()
        return self._schemas[schema]

    def insert_images(
        self,
        schema: str,
        records: Sequence[dict],
        embeddings: np.ndarray,
    ) -> int:
        """Batch-upsert image rows with their embeddings."""
        embeddings = np.asarray(embeddings, np.float32)
        assert len(records) == len(embeddings), "records/embeddings mismatch"
        s = self._schema(schema)
        for row, emb in zip(records, embeddings):
            s.images.upsert(
                {k: row.get(k) for k in _IMAGE_COLS}, np.ascontiguousarray(emb)
            )
        return len(records)

    def insert_chunks(
        self,
        schema: str,
        records: Sequence[dict],
        embeddings: np.ndarray,
    ) -> int:
        embeddings = np.asarray(embeddings, np.float32)
        assert len(records) == len(embeddings), "records/embeddings mismatch"
        s = self._schema(schema)
        for row, emb in zip(records, embeddings):
            s.chunks.upsert(
                {k: row.get(k) for k in _CHUNK_COLS}, np.ascontiguousarray(emb)
            )
        return len(records)

    def insert_alignments(
        self, schema: str, records: Sequence[Tuple[str, str, float, str]]
    ) -> int:
        s = self._schema(schema)
        for image_id, chunk_id, score, a_type in records:
            s.alignments.upsert(image_id, chunk_id, float(score), a_type)
        return len(records)

    # -- reads ----------------------------------------------------------------

    def _load(self, schema: str) -> _Schema:
        if schema in self._schemas:
            return self._schemas[schema]
        d = self.root / schema
        if not d.is_dir():
            raise FileNotFoundError(f"schema {schema} not found under {self.root}")
        self._schemas[schema] = self._read_schema_dir(d)
        return self._schemas[schema]

    def counts(self, schema: str) -> Dict[str, int]:
        s = self._load(schema)
        return {
            "images": len(s.images),
            "text_chunks": len(s.chunks),
            "alignments": len(s.alignments),
        }

    def images(self, schema: str) -> List[dict]:
        return [dict(r) for r in self._load(schema).images.rows]

    def chunks(self, schema: str) -> List[dict]:
        return [dict(r) for r in self._load(schema).chunks.rows]

    def alignments(self, schema: str) -> List[Tuple[str, str, float, str]]:
        return list(self._load(schema).alignments.rows)

    def embedding_matrix(
        self, schema: str, table: str
    ) -> Tuple[List[str], np.ndarray]:
        """(ids, (N, D) float32) for `table` in {'images', 'text_chunks'}.

        Rows lacking embeddings (e.g. vector figures before embedding, which
        the reference fills with placeholders) raise — callers must insert
        embeddings for every row, as the reference does.
        """
        s = self._load(schema)
        t = s.images if table == "images" else s.chunks
        ids = [r[t.key_field] for r in t.rows]
        if not ids:
            return ids, np.zeros((0, self.embed_dim), np.float32)
        missing = [ids[i] for i, e in enumerate(t.embeddings) if e is None]
        if missing:
            raise ValueError(f"{len(missing)} rows missing embeddings, e.g. {missing[:3]}")
        return ids, np.stack(t.embeddings).astype(np.float32)

    # -- persistence -------------------------------------------------------------

    def save(self, schemas: Sequence[str] = SCHEMAS) -> None:
        """Persist all in-memory schemas as Parquet tables."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        self.root.mkdir(parents=True, exist_ok=True)
        for schema in schemas:
            if schema not in self._schemas:
                continue
            s = self._schemas[schema]
            d = self.root / schema
            d.mkdir(parents=True, exist_ok=True)

            for name, table, cols in (
                ("images", s.images, _IMAGE_COLS),
                ("text_chunks", s.chunks, _CHUNK_COLS),
            ):
                data = {c: [r.get(c) for r in table.rows] for c in cols}
                data["clip_embedding"] = [
                    e.tolist() if e is not None else None for e in table.embeddings
                ]
                pq.write_table(pa.table(data), d / f"{name}.parquet")

            if s.alignments.rows:
                adata = pa.table({
                    c: [r[i] for r in s.alignments.rows]
                    for i, c in enumerate(_ALIGN_COLS)
                })
            else:
                adata = pa.table({
                    c: pa.array(
                        [], type=pa.float32() if c == "weak_score" else pa.string()
                    )
                    for c in _ALIGN_COLS
                })
            pq.write_table(adata, d / "alignments.parquet")
        self._write_manifest()

    def _read_schema_dir(self, d: Path) -> _Schema:
        import pyarrow.parquet as pq

        s = _Schema()
        for name, table, cols in (
            ("images", s.images, _IMAGE_COLS),
            ("text_chunks", s.chunks, _CHUNK_COLS),
        ):
            f = d / f"{name}.parquet"
            if not f.exists():
                continue
            t = pq.read_table(f).to_pydict()
            n = len(t.get(cols[0], []))
            for i in range(n):
                row = {c: t[c][i] for c in cols}
                emb = t["clip_embedding"][i]
                table.upsert(
                    row, np.asarray(emb, np.float32) if emb is not None else None
                )
        f = d / "alignments.parquet"
        if f.exists():
            t = pq.read_table(f).to_pydict()
            for i in range(len(t.get("image_id", []))):
                s.alignments.upsert(
                    t["image_id"][i], t["chunk_id"][i],
                    float(t["weak_score"][i]), t["alignment_type"][i],
                )
        return s

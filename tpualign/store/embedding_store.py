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

Layout is genuinely columnar, scaled to the device index's capacity
ladder (VERDICT r3 #1 — postgres keeps its heap tables on disk,
ref:src/setup_vector_db.py:100-151, and so must we at the 10M+ rows one
chip now serves):

- embeddings live in ONE dense (N, D) fp32 matrix per table, persisted
  as a raw ``.npy`` sidecar and **memory-mapped read-only on load** —
  a fresh process serving a 10M x 512 corpus resolves
  ``embedding_matrix`` without materializing 20 GB of RSS (pages ride
  the OS cache, postgres-buffer-cache style) and with zero per-row
  Python;
- row metadata is Parquet, read column-at-a-time (``to_pylist`` per
  column, no per-row dict assembly on load) and **lazily** — opening a
  store touches only Parquet footers; ``images()``/``chunks()`` pay for
  metadata only when asked;
- upserts are batch-vectorized: one key->position dict probe per row
  (the irreducible conflict check), then a single fancy-index write
  into the embedding matrix (duplicate keys in one batch resolve
  last-wins, matching the iterative ON CONFLICT semantics).

The v1 format (embeddings as Parquet list columns, ``tolist()`` per
row) is still readable; ``save`` always writes v2.
"""

from __future__ import annotations

import json
import os
import shutil
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

_EMB_GROW = 1024  # minimum embedding-matrix capacity grant


def _atomic_npy_save(path: Path, arr: np.ndarray) -> None:
    """Write-temp-then-rename (postgres WAL-rename discipline): a crash
    mid-save leaves the OLD file intact, and readers holding a memmap of
    the old inode keep their data — an in-place ``np.save`` would
    truncate the very pages a live ``embedding_matrix`` view is backed
    by."""
    # keep the .npy suffix on the temp name — np.save appends one to
    # anything else, and the rename target must match what it wrote
    tmp = path.with_suffix(".tmp.npy")
    np.save(tmp, arr)
    os.replace(tmp, path)


def _atomic_parquet_save(path: Path, table) -> None:
    import pyarrow.parquet as pq

    tmp = path.with_suffix(path.suffix + ".tmp")
    pq.write_table(table, tmp)
    os.replace(tmp, path)


class _Table:
    """One keyed table: columnar metadata + a dense embedding matrix.

    Disk-backed instances (from :meth:`_Table.from_dir`) start lazy:
    ``emb`` is a read-only ``np.memmap`` and metadata columns stay on
    disk until first access; the first mutation materializes a writable
    RAM copy (copy-on-write, like postgres pulling a page into shared
    buffers to dirty it)."""

    def __init__(self, key_field: str, col_names: Sequence[str]):
        self.key_field = key_field
        self.col_names = tuple(col_names)
        self.columns: Optional[Dict[str, list]] = {
            c: [] for c in col_names
        }
        self.index: Optional[Dict[str, int]] = {}
        self.n = 0
        self.emb: Optional[np.ndarray] = None  # (cap >= n, D) fp32
        self.has_emb: Optional[np.ndarray] = None  # (cap,) bool
        self._meta_path: Optional[Path] = None  # set when metadata is lazy
        self._col_cache: Dict[str, list] = {}  # lazily-read single columns

    # -- lazy loading --------------------------------------------------------

    @classmethod
    def from_dir(cls, key_field: str, col_names: Sequence[str],
                 meta_path: Path) -> "_Table":
        """Open a persisted table without reading metadata or
        materializing embeddings (v2) / with one vectorized read (v1)."""
        t = cls(key_field, col_names)
        emb_path = meta_path.with_suffix(".emb.npy")
        if emb_path.exists():
            # v2: metadata stays on disk, embeddings memory-map
            t.emb = np.load(emb_path, mmap_mode="r")
            t.n = int(t.emb.shape[0])
            # each file renames atomically, but the SET does not — a
            # crash (or a concurrent reader) between renames could pair
            # new metadata with an old matrix. Detect the tear from the
            # Parquet footer (row count only, no column read) and fail
            # loudly instead of serving misaligned ids.
            import pyarrow.parquet as pq

            meta_rows = pq.ParquetFile(meta_path).metadata.num_rows
            if meta_rows != t.n:
                raise ValueError(
                    f"{meta_path}: metadata has {meta_rows} rows but "
                    f"{emb_path.name} has {t.n} — torn save; re-run "
                    f"save() from the writing process"
                )
            mask_path = meta_path.with_suffix(".hasemb.npy")
            t.has_emb = (np.load(mask_path) if mask_path.exists()
                         else None)  # None = every row has one
            if t.has_emb is not None and len(t.has_emb) != t.n:
                raise ValueError(
                    f"{mask_path.name}: stale mask ({len(t.has_emb)} "
                    f"rows vs {t.n}) — torn save; re-run save()"
                )
            t.columns = None
            t.index = None
            t._meta_path = meta_path
            return t
        # v1 (embeddings inside Parquet): one columnar read, no row loop
        import pyarrow.parquet as pq

        pt = pq.read_table(meta_path)
        t.columns = {c: pt[c].to_pylist() for c in col_names}
        t.n = pt.num_rows
        t.index = {k: i for i, k in enumerate(t.columns[key_field])}
        embs = pt["clip_embedding"].to_pylist()
        if t.n:
            dim = next((len(e) for e in embs if e is not None), 0)
            t.emb = np.zeros((t.n, dim), np.float32)
            t.has_emb = np.zeros(t.n, bool)
            for i, e in enumerate(embs):  # v1 only; v2 never loops
                if e is not None:
                    t.emb[i] = e
                    t.has_emb[i] = True
            if bool(t.has_emb.all()):
                t.has_emb = None
        return t

    def _ensure_columns(self) -> Dict[str, list]:
        if self.columns is None:
            import pyarrow.parquet as pq

            pt = pq.read_table(self._meta_path, columns=list(self.col_names))
            self.columns = {c: pt[c].to_pylist() for c in self.col_names}
            self._col_cache.clear()
        return self.columns

    def column(self, name: str) -> list:
        """One metadata column, reading ONLY it from Parquet when the
        table is still lazy (a 10M-row serving start needs two columns,
        not 10M row dicts)."""
        if self.columns is not None:
            return self.columns[name]
        got = self._col_cache.get(name)
        if got is None:
            import pyarrow.parquet as pq

            pt = pq.read_table(self._meta_path, columns=[name])
            got = pt[name].to_pylist()
            self._col_cache[name] = got
        return got

    def keys(self) -> list:
        """Row keys in insertion order — reads ONLY the key column when
        metadata is still on disk."""
        return self.column(self.key_field)

    def _ensure_index(self) -> Dict[str, int]:
        if self.index is None:
            self.index = {k: i for i, k in enumerate(self.keys())}
        return self.index

    # -- mutation ------------------------------------------------------------

    def _writable(self, total: int, dim: int) -> None:
        """Guarantee a writable embedding matrix with capacity >= total
        (copy-on-write off a memmap; amortized-doubling growth)."""
        cap = 0 if self.emb is None else int(self.emb.shape[0])
        mm = isinstance(self.emb, np.memmap)
        if not mm and cap >= total and self.emb is not None:
            if self.has_emb is None:
                self.has_emb = np.ones(cap, bool)
            return
        new_cap = max(total, cap * 2, _EMB_GROW)
        new = np.empty((new_cap, dim), np.float32)
        mask = np.zeros(new_cap, bool)
        if self.emb is not None and self.n:
            new[: self.n] = self.emb[: self.n]
            mask[: self.n] = (True if self.has_emb is None
                              else self.has_emb[: self.n])
        self.emb = new
        self.has_emb = mask

    def upsert_many(self, records: Sequence[dict],
                    embeddings: np.ndarray) -> None:
        """Batch upsert: new keys append (metadata + embedding), known
        keys update ONLY the embedding (the reference's ON CONFLICT ...
        DO UPDATE SET clip_embedding, ref:src/insert_clip_embeddings.py:
        313-323). One dict probe per row; the embedding write is a
        single vectorized fancy-index (duplicates last-wins)."""
        if not len(records):
            return
        idx = self._ensure_index()
        cols = self._ensure_columns()
        key_field = self.key_field
        pos = np.empty(len(records), np.int64)
        fresh: List[int] = []
        for j, row in enumerate(records):
            k = row[key_field]
            p = idx.get(k)
            if p is None:
                p = len(idx)
                idx[k] = p
                fresh.append(j)
            pos[j] = p
        for c in self.col_names:
            cols[c].extend(records[j].get(c) for j in fresh)
        total = self.n + len(fresh)
        self._writable(total, embeddings.shape[1])
        self.emb[pos] = embeddings
        self.has_emb[pos] = True
        self.n = total

    # -- reads ---------------------------------------------------------------

    def __len__(self) -> int:
        return self.n

    def rows(self) -> List[dict]:
        cols = self._ensure_columns()
        names = self.col_names
        return [dict(zip(names, vals))
                for vals in zip(*(cols[c] for c in names))] if self.n else []

    def matrix(self) -> Tuple[list, np.ndarray]:
        """(keys, (N, D) fp32 view — a zero-copy memmap slice when the
        table is disk-backed). Raises if any row lacks an embedding."""
        ids = self.keys()
        if self.has_emb is not None and not bool(self.has_emb[: self.n].all()):
            missing = [ids[i] for i in
                       np.flatnonzero(~self.has_emb[: self.n])[:3]]
            count = int((~self.has_emb[: self.n]).sum())
            raise ValueError(
                f"{count} rows missing embeddings, e.g. {missing}"
            )
        return ids, self.emb[: self.n]

    # -- persistence ---------------------------------------------------------

    def save(self, meta_path: Path) -> None:
        import pyarrow as pa

        cols = self._ensure_columns()
        # matrix and mask land BEFORE metadata: the Parquet file is the
        # commit record (from_dir cross-checks its row count against
        # the matrix), so a crash at any point leaves either the old
        # consistent set or a detectable tear — never a silent
        # id/row misalignment
        emb_path = meta_path.with_suffix(".emb.npy")
        emb = (self.emb[: self.n] if self.emb is not None
               else np.zeros((0, 0), np.float32))
        if not (isinstance(self.emb, np.memmap)
                and Path(self.emb.filename or "").resolve()
                == emb_path.resolve()):
            # (an unmodified read-only memmap of this very file is
            # already its own serialization; the rename below would
            # otherwise replace the inode pointlessly)
            _atomic_npy_save(emb_path, np.ascontiguousarray(emb))
        mask_path = meta_path.with_suffix(".hasemb.npy")
        if self.has_emb is not None and not bool(self.has_emb[: self.n].all()):
            _atomic_npy_save(mask_path, self.has_emb[: self.n])
        elif mask_path.exists():
            mask_path.unlink()
        _atomic_parquet_save(
            meta_path, pa.table({c: cols[c] for c in self.col_names})
        )


class _AlignmentTable:
    """Columnar (image_id, chunk_id, weak_score, alignment_type) rows
    keyed on (image_id, chunk_id, alignment_type); conflicts update
    weak_score (ref:src/insert_clip_embeddings.py:416-427)."""

    def __init__(self):
        self.cols: Optional[Dict[str, list]] = {c: [] for c in _ALIGN_COLS}
        self.index: Optional[Dict[Tuple[str, str, str], int]] = {}
        self._meta_path: Optional[Path] = None
        self._n_disk = 0

    @classmethod
    def from_file(cls, path: Path) -> "_AlignmentTable":
        import pyarrow.parquet as pq

        t = cls()
        t.cols = None
        t.index = None
        t._meta_path = path
        t._n_disk = pq.ParquetFile(path).metadata.num_rows
        return t

    def _ensure(self) -> None:
        if self.cols is None:
            import pyarrow.parquet as pq

            pt = pq.read_table(self._meta_path)
            self.cols = {c: pt[c].to_pylist() for c in _ALIGN_COLS}
            self.index = {
                key: i for i, key in enumerate(zip(
                    self.cols["image_id"], self.cols["chunk_id"],
                    self.cols["alignment_type"],
                ))
            }

    def upsert(self, image_id: str, chunk_id: str, score: float,
               a_type: str) -> None:
        self._ensure()
        key = (image_id, chunk_id, a_type)
        pos = self.index.get(key)
        if pos is None:
            self.index[key] = len(self.cols["image_id"])
            self.cols["image_id"].append(image_id)
            self.cols["chunk_id"].append(chunk_id)
            self.cols["weak_score"].append(score)
            self.cols["alignment_type"].append(a_type)
        else:
            self.cols["weak_score"][pos] = score

    def rows(self) -> List[Tuple[str, str, float, str]]:
        self._ensure()
        return list(zip(self.cols["image_id"], self.cols["chunk_id"],
                        self.cols["weak_score"],
                        self.cols["alignment_type"]))

    def __len__(self) -> int:
        return self._n_disk if self.cols is None else len(self.cols["image_id"])

    def save(self, path: Path) -> None:
        import pyarrow as pa

        self._ensure()
        if self.cols["image_id"]:
            adata = pa.table({c: self.cols[c] for c in _ALIGN_COLS})
        else:
            adata = pa.table({
                c: pa.array(
                    [], type=pa.float32() if c == "weak_score"
                    else pa.string()
                )
                for c in _ALIGN_COLS
            })
        _atomic_parquet_save(path, adata)


class _Schema:
    def __init__(self):
        self.images = _Table("image_id", _IMAGE_COLS)
        self.chunks = _Table("chunk_id", _CHUNK_COLS)
        self.alignments = _AlignmentTable()


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
                self._schemas.pop(schema, None)
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
            d = self.root / schema
            if d.is_dir():
                # disk state exists: upserts must land on it, not shadow it
                return self._load(schema)
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
        self._schema(schema).images.upsert_many(records, embeddings)
        return len(records)

    def insert_chunks(
        self,
        schema: str,
        records: Sequence[dict],
        embeddings: np.ndarray,
    ) -> int:
        embeddings = np.asarray(embeddings, np.float32)
        assert len(records) == len(embeddings), "records/embeddings mismatch"
        self._schema(schema).chunks.upsert_many(records, embeddings)
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
        return self._load(schema).images.rows()

    def chunks(self, schema: str) -> List[dict]:
        return self._load(schema).chunks.rows()

    def alignments(self, schema: str) -> List[Tuple[str, str, float, str]]:
        return self._load(schema).alignments.rows()

    def column(self, schema: str, table: str, name: str) -> list:
        """One metadata column of 'images'/'text_chunks' — the lazy
        path for callers that need a column, not row dicts (e.g. the
        serving daemon's manual/page arrays at 10M-row scale)."""
        s = self._load(schema)
        t = s.images if table == "images" else s.chunks
        return t.column(name)

    def embedding_matrix(
        self, schema: str, table: str
    ) -> Tuple[List[str], np.ndarray]:
        """(ids, (N, D) float32) for `table` in {'images', 'text_chunks'}.

        The matrix is a zero-copy view — a read-only memmap slice when
        the store was opened from disk (bounded RSS at any N; pages
        stream in as the device feed consumes them). Rows lacking
        embeddings (e.g. vector figures before embedding, which the
        reference fills with placeholders) raise — callers must insert
        embeddings for every row, as the reference does.
        """
        s = self._load(schema)
        t = s.images if table == "images" else s.chunks
        if t.n == 0:
            return [], np.zeros((0, self.embed_dim), np.float32)
        return t.matrix()

    # -- persistence -------------------------------------------------------------

    def save(self, schemas: Sequence[str] = SCHEMAS) -> None:
        """Persist in-memory schemas: Parquet metadata + a raw ``.npy``
        embedding matrix per table (the v2 layout — loads memory-map)."""
        self.root.mkdir(parents=True, exist_ok=True)
        for schema in schemas:
            if schema not in self._schemas:
                continue
            s = self._schemas[schema]
            d = self.root / schema
            d.mkdir(parents=True, exist_ok=True)
            s.images.save(d / "images.parquet")
            s.chunks.save(d / "text_chunks.parquet")
            s.alignments.save(d / "alignments.parquet")
        self._write_manifest()

    def _read_schema_dir(self, d: Path) -> _Schema:
        s = _Schema()
        f = d / "images.parquet"
        if f.exists():
            s.images = _Table.from_dir("image_id", _IMAGE_COLS, f)
        f = d / "text_chunks.parquet"
        if f.exists():
            s.chunks = _Table.from_dir("chunk_id", _CHUNK_COLS, f)
        f = d / "alignments.parquet"
        if f.exists():
            s.alignments = _AlignmentTable.from_file(f)
        return s

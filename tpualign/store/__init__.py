"""Embedding store: the pgvector/PostgreSQL replacement.

Four logical schemas (vanilla_clip / clip_lexical / clip_positional /
clip_combined) with the reference's three tables each — images,
text_chunks, alignments (ref:src/setup_vector_db.py:89-151) — persisted as
columnar Parquet files instead of a database server. Similarity search runs
on TPU (tpualign.parallel.retrieval), not in the store.
"""

from tpualign.store.embedding_store import EmbeddingStore, SCHEMAS  # noqa: F401

"""Golden-file end-to-end regression test.

Runs the full pipeline on a fixed synthetic corpus with sha256-derived
deterministic embeddings and compares metrics.json against the committed
golden file — guarding the whole extraction -> weak supervision -> store ->
retrieval -> metrics chain against behavioral drift between rounds
(SURVEY.md §4 golden-file strategy). Regenerate after an INTENTIONAL
behavior change with the CPU backend pinned (the golden was produced on
CPU; see CLAUDE.md for the jax_platforms override):

    PYTHONPATH=. python -c "
    import jax; jax.config.update('jax_platforms', 'cpu')
    import json, tempfile
    from pathlib import Path
    import tests.test_golden as g
    with tempfile.TemporaryDirectory() as d:
        m = g.run_golden_pipeline(Path(d))
    g.GOLDEN.write_text(json.dumps(m, indent=2))"
"""

import hashlib
import json
from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "golden" / "metrics.json"


class Sha256Engine:
    """Process-stable deterministic embeddings (unlike hash(), which is
    salted per process)."""

    dim = 32

    def _emb(self, key: str) -> np.ndarray:
        seed = int.from_bytes(hashlib.sha256(key.encode()).digest()[:8], "little")
        v = np.random.default_rng(seed).normal(size=self.dim).astype(np.float32)
        return v / np.linalg.norm(v)

    def embed_image_records(self, records, images_dir, prefetch=2):
        if not records:
            return np.zeros((0, self.dim), np.float32)
        return np.stack([self._emb(r["image_id"]) for r in records])

    def embed_chunk_records(self, records):
        if not records:
            return np.zeros((0, self.dim), np.float32)
        return np.stack([self._emb(r["chunk_id"]) for r in records])


def run_golden_pipeline(tmp_path: Path) -> dict:
    from tests.test_pipeline import make_corpus
    from tpualign.config import load_config
    from tpualign.pipeline import Pipeline

    raw = tmp_path / "raw"
    raw.mkdir()
    make_corpus(raw, n_manuals=2, pages=2, imgs_per_page=2, lines_per_page=3)
    (tmp_path / "exclude.txt").write_text("pagina\n")
    cfg = load_config(env_file=None, overrides={
        "INPUT_DIR": str(raw),
        "OUTPUT_DIR": str(tmp_path / "processed"),
        "STORE_DIR": str(tmp_path / "store"),
        "EVAL_OUTPUT_DIR": str(tmp_path / "eval"),
        "EXCLUDE_TERMS_FILE": str(tmp_path / "exclude.txt"),
        "LANGUAGE": "nl",
    })
    pipe = Pipeline(cfg, engine=Sha256Engine())
    pipe.store.embed_dim = Sha256Engine.dim
    pipe.run(non_interactive=True)
    return json.loads((tmp_path / "eval/metrics.json").read_text())


def test_metrics_match_golden(tmp_path):
    if not GOLDEN.exists():
        pytest.skip("golden file not generated yet")
    got = run_golden_pipeline(tmp_path)
    want = json.loads(GOLDEN.read_text())
    assert got.keys() == want.keys()
    for schema in want:
        g, w = got[schema], want[schema]
        assert g["num_pairs"] == w["num_pairs"], schema
        np.testing.assert_allclose(g["mrr"], w["mrr"], atol=1e-6, err_msg=schema)
        np.testing.assert_allclose(
            g["avg_similarity"], w["avg_similarity"], atol=1e-5, err_msg=schema
        )
        for k in ("1", "5", "10"):
            np.testing.assert_allclose(
                g["top_k"][k], w["top_k"][k], atol=1e-6, err_msg=f"{schema} top-{k}"
            )


if __name__ == "__main__":
    # regenerate the golden file (run on the CPU backend — see docstring)
    import tempfile

    import jax

    jax.config.update("jax_platforms", "cpu")
    with tempfile.TemporaryDirectory() as d:
        metrics = run_golden_pipeline(Path(d))
    GOLDEN.parent.mkdir(parents=True, exist_ok=True)
    GOLDEN.write_text(json.dumps(metrics, indent=2))
    print(f"wrote {GOLDEN}")

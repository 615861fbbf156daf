"""Config-system tests: .env parsing, overrides, derivation rules, checks."""

import pytest

from tpualign.config import (
    CLIP_VARIANTS,
    ModelConfig,
    load_config,
    load_env_file,
    normalize_model_name,
)


def test_env_file_parsing(tmp_path, monkeypatch):
    env = tmp_path / ".env"
    env.write_text(
        "# comment\n"
        "CLIP_MODEL=ViT-L/14\n"
        'LANGUAGE="en"\n'
        "USE_OCR_FALLBACK=True\n"
        "BATCH_SIZE=64\n"
        "MALFORMED LINE WITHOUT EQUALS\n"
        "QUOTED='single'\n"
    )
    monkeypatch.delenv("CLIP_MODEL", raising=False)
    parsed = load_env_file(str(env))
    assert parsed["CLIP_MODEL"] == "ViT-L/14"
    assert parsed["LANGUAGE"] == "en"
    assert parsed["QUOTED"] == "single"
    assert "MALFORMED LINE WITHOUT EQUALS" not in parsed

    cfg = load_config(env_file=str(env))
    assert cfg.model.model_name == "ViT-L-14"     # slash normalized
    assert cfg.model.embed_dim == 768             # derived, not CLIP_DIM
    assert cfg.data.language == "en"
    assert cfg.data.use_ocr_fallback is True
    assert cfg.batch_size == 64


def test_overrides_beat_env_file(tmp_path, monkeypatch):
    monkeypatch.delenv("LANGUAGE", raising=False)
    env = tmp_path / ".env"
    env.write_text("LANGUAGE=nl\n")
    cfg = load_config(env_file=str(env), overrides={"LANGUAGE": "fr"})
    assert cfg.data.language == "fr"


def test_missing_env_file_is_fine(tmp_path, monkeypatch):
    # load_env_file intentionally exports into os.environ (python-dotenv
    # semantics, ref:src/insert_clip_embeddings.py:16) — scrub leakage from
    # other tests first
    for var in ("CLIP_MODEL", "LANGUAGE", "USE_OCR_FALLBACK", "BATCH_SIZE", "QUOTED"):
        monkeypatch.delenv(var, raising=False)
    cfg = load_config(env_file=str(tmp_path / "nope.env"))
    assert cfg.model.model_name == "ViT-B-32"
    assert cfg.data.language == "nl"  # reference default


def test_variant_table_dims():
    # the reference's documented dims (ref:src/insert_clip_embeddings.py:42-44)
    assert CLIP_VARIANTS["ViT-B-32"].embed_dim == 512
    assert CLIP_VARIANTS["ViT-L-14"].embed_dim == 768
    assert CLIP_VARIANTS["ViT-H-14"].embed_dim == 1024
    assert normalize_model_name("ViT-H/14") == "ViT-H-14"


def test_quick_gelu_override():
    assert ModelConfig(pretrained="openai", quick_gelu=False).use_quick_gelu is False
    assert ModelConfig(pretrained="laion2b_s34b_b79k", quick_gelu=True).use_quick_gelu is True


def test_checks_run(tmp_path, capsys):
    from tpualign.utils.checks import run_checks

    cfg = load_config(env_file=None, overrides={
        "STORE_DIR": str(tmp_path / "store"),
        "OUTPUT_DIR": str(tmp_path / "out"),
        "INPUT_DIR": str(tmp_path / "in"),
    })
    rc = run_checks(cfg)
    out = capsys.readouterr().out
    assert rc == 0  # required imports + devices present in this env
    assert "RESULT: healthy" in out
    assert "vanilla_clip" in out  # schema section rendered (absent is fine)


def test_train_config_from_env():
    """Training hyperparameters are env-settable (round-2 fix: these were
    silently ignored before)."""
    from tpualign.config import load_config

    cfg = load_config(env_file=None, overrides={
        "LEARNING_RATE": "2e-3", "TOTAL_STEPS": "150", "WARMUP_STEPS": "10",
        "TRAIN_BATCH_SIZE": "32", "BATCH_SIZE": "64",
        "WEAK_SCORE_TEMPERATURE": "0.1",
    })
    assert cfg.train.learning_rate == 2e-3
    assert cfg.train.total_steps == 150
    assert cfg.train.warmup_steps == 10
    assert cfg.train.batch_size == 32       # TRAIN_BATCH_SIZE wins
    assert cfg.batch_size == 64             # embed batch separate
    assert cfg.train.weak_score_temperature == 0.1
    # TRAIN_BATCH_SIZE falls back to BATCH_SIZE
    cfg2 = load_config(env_file=None, overrides={"BATCH_SIZE": "48"})
    assert cfg2.train.batch_size == 48


def test_memory_lever_knobs_from_env():
    """The H-14 single-chip training levers are env-settable."""
    from tpualign.config import load_config

    cfg = load_config(env_file=None, overrides={
        "GRAD_ACCUM_STEPS": "8", "EMA_DECAY": "0.99",
        "MOMENTS_DTYPE": "bfloat16", "CLIP_REMAT": "1",
    })
    assert cfg.train.grad_accum_steps == 8
    assert cfg.train.ema_decay == 0.99
    assert cfg.train.moments_dtype == "bfloat16"
    assert cfg.model.remat is True
    defaults = load_config(env_file=None)
    assert defaults.train.grad_accum_steps == 1
    assert defaults.train.ema_decay == 0.0
    assert defaults.model.remat is False


def test_text_buckets_from_env():
    from tpualign.config import load_config

    assert load_config(env_file=None).text_buckets == (16, 32, 77)
    cfg = load_config(env_file=None, overrides={"TEXT_BUCKETS": "24,77"})
    assert cfg.text_buckets == (24, 77)
    off = load_config(env_file=None, overrides={"TEXT_BUCKETS": "off"})
    assert off.text_buckets is None


def test_env_example_parses_and_inline_comments_stripped(tmp_path,
                                                         monkeypatch):
    """The checked-in .env.example must load verbatim (python-dotenv
    strips whitespace-preceded inline comments; so do we), and quoted
    values keep their '#'."""
    import os
    from pathlib import Path

    from tpualign.config import load_config, load_env_file

    for k in list(os.environ):
        if k.startswith(("CLIP_", "RETRIEVAL_", "HNSW_", "IVF_", "SERVE_",
                         "TRAIN_", "DISTILL_", "MESH_", "LORA_", "BATCH_")):
            monkeypatch.delenv(k, raising=False)
    example = Path(__file__).resolve().parents[1] / ".env.example"
    snapshot = dict(os.environ)  # load_env_file setdefaults globally
    try:
        cfg = load_config(env_file=str(example))
    finally:
        os.environ.clear()
        os.environ.update(snapshot)
    assert cfg.mesh.data == 1 and cfg.retrieval_index == "exact"
    assert cfg.hnsw_ef_search is None and cfg.serve_token is None

    env = tmp_path / "e.env"
    env.write_text('A=1 # comment\nB="x # kept"\nC=plain#nohash\n'
                   'D="y # kept" # and a real comment\nE= # empty\n'
                   'F=\nG=#ff0000\nH=30\t# tab comment\n'
                   'I="pa"ss"word"\n')
    snapshot = dict(os.environ)  # load_env_file setdefaults globally
    try:
        out = load_env_file(str(env))
    finally:
        os.environ.clear()
        os.environ.update(snapshot)
    assert out["A"] == "1"
    assert out["B"] == "x # kept"
    assert out["C"] == "plain#nohash"  # no whitespace -> not a comment
    assert out["D"] == "y # kept"  # quote ends the value, comment drops
    assert out["E"] == ""
    assert out["F"] == ""  # bare KEY= must not crash
    assert out["G"] == "#ff0000"  # hash-leading value survives (dotenv)
    assert out["H"] == "30"  # tab counts as comment whitespace
    assert out["I"] == 'pa"ss"word'  # interior quotes survive (greedy)



def test_serve_auto_compact_parses_and_validates():
    """SERVE_AUTO_COMPACT: fraction in (0, 1] (postgres autovacuum
    scale-factor analogue), off/none/empty disable, out-of-range
    values fail loudly."""
    cfg = load_config(env_file=None,
                      overrides={"SERVE_AUTO_COMPACT": "0.2"})
    assert cfg.serve_auto_compact == 0.2
    off = load_config(env_file=None,
                      overrides={"SERVE_AUTO_COMPACT": "off"})
    assert off.serve_auto_compact is None
    assert load_config(env_file=None).serve_auto_compact is None
    for bad in ("1.5", "0", "-0.1"):
        with pytest.raises(ValueError):
            load_config(env_file=None,
                        overrides={"SERVE_AUTO_COMPACT": bad})

"""Trainer tests: dataset construction from the store, a short training run
with a tiny model, checkpoint resume."""

import io

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from tpualign.config import load_config
from tpualign.store import EmbeddingStore
from tpualign.train.trainer import Trainer, build_pair_dataset


@pytest.fixture()
def small_store(tmp_path):
    images_dir = tmp_path / "processed/images"
    images_dir.mkdir(parents=True)
    store = EmbeddingStore(tmp_path / "store", embed_dim=16)
    store.setup(["clip_combined", "vanilla_clip"])

    rng = np.random.default_rng(0)
    img_rows, chunk_rows = [], []
    for i in range(6):
        fname = f"m_p1_img{i}.png"
        Image.new("RGB", (40, 30), (i * 30 % 255, 50, 80)).save(images_dir / fname)
        img_rows.append({
            "image_id": f"m_p1_img{i}", "manual_id": "m", "page": 1,
            "bbox": [0, 0, 10, 10], "bbox_source": "native", "caption": None,
            "filename": fname, "image_type": "raster_image",
        })
        chunk_rows.append({
            "chunk_id": f"m_p1_c{i}", "manual_id": "m", "page": 1,
            "bbox": [0, 20, 30, 30], "text": f"instructie {i} voor de filter",
        })
    emb = rng.normal(size=(6, 16)).astype(np.float32)
    for schema in ("clip_combined", "vanilla_clip"):
        store.insert_images(schema, img_rows, emb)
        store.insert_chunks(schema, chunk_rows, emb)
    store.insert_alignments(
        "clip_combined",
        [(f"m_p1_img{i}", f"m_p1_c{i}", 0.5 + 0.05 * i, "combined") for i in range(6)],
    )
    return store, images_dir


def test_build_pair_dataset_from_alignments(small_store):
    store, images_dir = small_store
    triples = build_pair_dataset(store, "clip_combined", images_dir)
    assert len(triples) == 6
    paths, texts, weights = zip(*triples)
    assert all(p.endswith(".png") for p in paths)
    assert weights[0] == pytest.approx(0.5)


def test_build_pair_dataset_cartesian_fallback(small_store):
    store, images_dir = small_store
    triples = build_pair_dataset(store, "vanilla_clip", images_dir)
    assert len(triples) == 36  # 6 images x 6 same-page chunks
    assert all(w == 1.0 for _, _, w in triples)


def test_trainer_short_run(small_store, tmp_path):
    from tests.test_models import TINY
    from tpualign.models.clip import CLIP, init_clip_params
    from tpualign.tokenizer import ClipTokenizer

    store, images_dir = small_store
    cfg = load_config(env_file=None, overrides={
        "STORE_DIR": str(store.root),
        "OUTPUT_DIR": str(images_dir.parent),
        "BATCH_SIZE": "4",
    })

    trainer = Trainer.__new__(Trainer)
    trainer.config = cfg
    trainer.mesh = None
    trainer.store = store
    model = CLIP(variant=TINY, use_quick_gelu=True, compute_dtype=jnp.float32)
    trainer.model = model
    trainer.variant = TINY
    trainer.tokenizer = ClipTokenizer(context_length=TINY.context_length)
    from tpualign.train.step import create_train_state, train_step
    import jax

    params = init_clip_params(model, seed=0)
    trainer.state = create_train_state(model, params, cfg.train)

    @jax.jit
    def _single_step(state, images, token_ids, weak_scores):
        return train_step(state, model, images, token_ids, weak_scores, cfg.train)

    trainer._step = _single_step

    metrics = trainer.train(
        schema="clip_combined", steps=3, batch_size=4,
        ckpt_dir=str(tmp_path / "ckpt"), ckpt_every=2, log_every=1,
    )
    assert np.isfinite(metrics["loss"])
    assert int(jax.device_get(trainer.state.step)) == 3

    # resume: restored step means fewer new steps run
    trainer.state = create_train_state(model, params, cfg.train)
    from tpualign.train.checkpoint import restore_checkpoint

    restored = restore_checkpoint(tmp_path / "ckpt", trainer.state)
    assert restored is not None and int(jax.device_get(restored.step)) == 3


def test_trainer_empty_schema_raises(small_store, tmp_path):
    store, images_dir = small_store
    cfg = load_config(env_file=None, overrides={
        "STORE_DIR": str(store.root), "OUTPUT_DIR": str(images_dir.parent),
    })
    store.setup(["clip_lexical"])
    trainer = Trainer.__new__(Trainer)
    trainer.config = cfg
    trainer.store = store
    from tests.test_models import TINY
    trainer.variant = TINY
    with pytest.raises((ValueError, FileNotFoundError)):
        trainer.train(schema="clip_lexical", steps=1)

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


@pytest.mark.parametrize("lora", [False, True], ids=["full-ft", "lora"])
def test_training_improves_heldout_retrieval(tmp_path, lora):
    """The loop the repo's title promises: weak-supervised contrastive
    fine-tuning must improve retrieval of the aligned chunk on HELD-OUT
    pages vs the frozen tower. The LoRA arm trains only the adapters
    (base provably frozen) and must clear the same bar.

    Uses the alignment ground-truth mode — the reference's cartesian GT is
    provably model-independent (Top-K = k/C, MRR = H(C)/C; see
    tpualign/evaluation/metrics.py) so it cannot measure this.

    Held-out-ness: new pages with UNSEEN image instances (different shades
    of the concept colors); instruction templates repeat across pages, as
    they do in real manuals. (A 2-layer tiny tower trained on 4 sentences
    cannot generalize to unseen sentence frames — that axis needs real
    pretrained weights, which this image cannot download.)
    """
    import jax
    from tests.test_models import TINY
    from tpualign.evaluation.metrics import Evaluator
    from tpualign.models.clip import CLIP, init_clip_params
    from tpualign.ops.preprocess import preprocess_host
    from tpualign.tokenizer import ClipTokenizer
    from tpualign.train.step import create_train_state, train_step

    colors = [(255, 40, 40), (40, 255, 40), (40, 40, 255), (250, 250, 60)]
    heldout_colors = [(220, 70, 70), (70, 220, 70), (70, 70, 220), (225, 225, 90)]
    words = ["rood", "groen", "blauw", "geel"]

    # -- train corpus: one page per concept, aligned (image, chunk) pairs
    images_dir = tmp_path / "processed/images"
    images_dir.mkdir(parents=True)
    store = EmbeddingStore(tmp_path / "store", embed_dim=TINY.embed_dim)
    store.setup(["clip_combined"])
    img_rows, chunk_rows, aligns = [], [], []
    for i, (c, w) in enumerate(zip(colors, words)):
        fname = f"t_p{i+1}_img0.png"
        Image.new("RGB", (40, 40), c).save(images_dir / fname)
        img_rows.append({
            "image_id": f"t_p{i+1}_img0", "manual_id": "t", "page": i + 1,
            "bbox": [0, 0, 10, 10], "bbox_source": "native", "caption": None,
            "filename": fname, "image_type": "raster_image",
        })
        chunk_rows.append({
            "chunk_id": f"t_p{i+1}_c0", "manual_id": "t", "page": i + 1,
            "bbox": [0, 20, 30, 30], "text": f"de {w} klep zit vast",
        })
        aligns.append((f"t_p{i+1}_img0", f"t_p{i+1}_c0", 1.0, "combined"))
    placeholder = np.zeros((4, TINY.embed_dim), np.float32)
    store.insert_images("clip_combined", img_rows, placeholder)
    store.insert_chunks("clip_combined", chunk_rows, placeholder)
    store.insert_alignments("clip_combined", aligns)

    # -- trainer around the tiny variant
    overrides = {
        "STORE_DIR": str(store.root),
        "OUTPUT_DIR": str(images_dir.parent),
        "BATCH_SIZE": "4",
        "LEARNING_RATE": "2e-3",
        "TOTAL_STEPS": "150",
        "WARMUP_STEPS": "10",
    }
    if lora:
        # adapters see an alpha/rank = 4x scaled update; same LR works
        overrides.update({"LORA_RANK": "4", "LORA_ALPHA": "16.0"})
    cfg = load_config(env_file=None, overrides=overrides)
    model = CLIP(variant=TINY, use_quick_gelu=True, compute_dtype=jnp.float32)
    tokenizer = ClipTokenizer(context_length=TINY.context_length)
    params0 = init_clip_params(model, seed=0)

    trainer = Trainer.__new__(Trainer)
    trainer.config = cfg
    trainer.mesh = None
    trainer.store = store
    trainer.model = model
    trainer.variant = TINY
    trainer.tokenizer = tokenizer
    trainer.state = create_train_state(model, params0, cfg.train)

    @jax.jit
    def _single_step(state, images, token_ids, weak_scores):
        return train_step(state, model, images, token_ids, weak_scores, cfg.train)

    trainer._step = _single_step

    # -- held-out corpus: new shades + new sentence frames, 4 same-page
    # distractor chunks per image, alignment GT marks the matching word
    ho_imgs = np.stack([
        preprocess_host(Image.new("RGB", (40, 40), c), TINY.image_size)
        for c in heldout_colors
    ])
    ho_img_rows, ho_chunk_rows, ho_aligns, ho_texts = [], [], [], []
    for i in range(4):
        ho_img_rows.append({
            "image_id": f"ho_p{i+1}_img0", "manual_id": "ho", "page": i + 1,
            "bbox": [0, 0, 10, 10], "bbox_source": "native", "caption": None,
            "filename": None, "image_type": "raster_image",
        })
        for j, w in enumerate(words):
            ho_chunk_rows.append({
                "chunk_id": f"ho_p{i+1}_c{j}", "manual_id": "ho", "page": i + 1,
                "bbox": [0, 20, 30, 30], "text": f"de {w} klep zit vast",
            })
            ho_texts.append(f"de {w} klep zit vast")
        ho_aligns.append((f"ho_p{i+1}_img0", f"ho_p{i+1}_c{i}", 1.0, "combined"))
    ho_tokens = tokenizer([c["text"] for c in ho_chunk_rows])

    eval_store = EmbeddingStore(tmp_path / "eval_store", embed_dim=TINY.embed_dim)
    eval_store.setup(["clip_combined"])

    def heldout_metrics(params):
        ie = np.asarray(model.apply(
            {"params": params}, jnp.asarray(ho_imgs), normalize=True,
            method=model.encode_image,
        ))
        te = np.asarray(model.apply(
            {"params": params}, jnp.asarray(ho_tokens), normalize=True,
            method=model.encode_text,
        ))
        eval_store.insert_images("clip_combined", ho_img_rows, ie)
        eval_store.insert_chunks("clip_combined", ho_chunk_rows, te)
        eval_store.insert_alignments("clip_combined", ho_aligns)
        ev = Evaluator(eval_store)
        return (
            ev.compute_top_k_accuracy("clip_combined", (1,), gt="alignments")[1],
            ev.compute_mrr("clip_combined", gt="alignments"),
            ev.compute_top_k_accuracy("clip_combined", (1,))[1],  # cartesian
            ev.compute_mrr("clip_combined"),
        )

    top1_0, mrr_0, cart_top1_0, cart_mrr_0 = heldout_metrics(params0)

    trainer.train(schema="clip_combined", steps=150, batch_size=4, log_every=50)
    from tpualign.train.step import export_params

    # under LoRA state.params is the adapter tree; export merges it into
    # the frozen base (the same tree embed/serve would load)
    params1 = jax.device_get(export_params(trainer.state))
    top1_1, mrr_1, cart_top1_1, cart_mrr_1 = heldout_metrics(params1)
    if lora:
        for a, b in zip(jax.tree.leaves(params0),
                        jax.tree.leaves(trainer.state.frozen_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # training must move alignment-GT retrieval decisively
    assert mrr_1 > mrr_0 + 0.15, (mrr_0, mrr_1)
    assert top1_1 >= max(top1_0, 0.75), (top1_0, top1_1)
    # ...while the reference's cartesian metrics are provably inert:
    # Top-1 = 1/4 and MRR = H(4)/4 regardless of the model
    assert cart_top1_0 == cart_top1_1 == pytest.approx(0.25)
    assert cart_mrr_0 == cart_mrr_1 == pytest.approx((1 + 1/2 + 1/3 + 1/4) / 4)


def test_trainer_batches_honor_config_text_buckets(small_store):
    """Trainer.batches threads PipelineConfig.text_buckets instead of a
    hardcoded (16, 32, 77): custom buckets truncate, TEXT_BUCKETS=off keeps
    the full context (ADVICE r2 low)."""
    from tests.test_models import TINY
    from tpualign.tokenizer import ClipTokenizer

    store, images_dir = small_store
    triples = build_pair_dataset(store, "clip_combined", images_dir)
    # short texts so the bucket choice is observable (SOT + 1 tok + EOT)
    triples = [(p, "a", w) for p, _, w in triples]

    def make_trainer(buckets_env):
        cfg = load_config(env_file=None, overrides={
            "STORE_DIR": str(store.root),
            "OUTPUT_DIR": str(images_dir.parent),
            "TEXT_BUCKETS": buckets_env,
        })
        t = Trainer.__new__(Trainer)
        t.config = cfg
        t.variant = TINY
        t.tokenizer = ClipTokenizer(context_length=TINY.context_length)
        return t

    # "a" tokenizes to 3 tokens -> the 8 bucket
    _, toks, _ = next(make_trainer("8,12").batches(triples, 4))
    assert toks.shape[1] == 8
    # off -> full model context, no truncation
    _, toks, _ = next(make_trainer("off").batches(triples, 4))
    assert toks.shape[1] == TINY.context_length


def _feed_trainer(store, images_dir, **overrides):
    from tests.test_models import TINY
    from tpualign.tokenizer import ClipTokenizer

    cfg = load_config(env_file=None, overrides={
        "STORE_DIR": str(store.root),
        "OUTPUT_DIR": str(images_dir.parent),
        **overrides,
    })
    t = Trainer.__new__(Trainer)
    t.config = cfg
    t.variant = TINY
    t.tokenizer = ClipTokenizer(context_length=TINY.context_length)
    return t


def test_batches_prefetch_feed_deterministic_and_correct(small_store):
    """The prefetching pooled feed yields the same RNG-ordered content
    as a straightforward reimplementation of the synchronous loop:
    images are the preprocessed files in permutation order, weights and
    tokens line up."""
    from tpualign.ops.preprocess import preprocess_host
    from PIL import Image as PILImage

    store, images_dir = small_store
    triples = build_pair_dataset(store, "clip_combined", images_dir)
    t = _feed_trainer(store, images_dir)
    size = t.variant.image_size

    got = []
    it = t.batches(triples, 2, seed=5, epochs=2)
    for b in it:
        got.append(b)
    assert len(got) == 2 * (len(triples) // 2)

    rng = np.random.default_rng(5)
    gi = 0
    for _ in range(2):
        order = rng.permutation(len(triples))
        for start in range(0, len(order) - 2 + 1, 2):
            sel = order[start: start + 2]
            imgs, toks, w = got[gi]
            gi += 1
            for i, j in enumerate(sel):
                path, text, ww = triples[j]
                with PILImage.open(path) as im:
                    np.testing.assert_allclose(
                        imgs[i], preprocess_host(im, size), atol=1e-6)
                assert w[i] == np.float32(ww)


def test_batches_cache_skips_epoch2_decodes(small_store, monkeypatch):
    """With the cache budget on, epoch 2 reads decoded images from
    memory (zero PIL opens); with TRAIN_FEED_CACHE_MB=0 every epoch
    re-decodes."""
    import PIL.Image as PILImage

    store, images_dir = small_store
    triples = build_pair_dataset(store, "clip_combined", images_dir)

    counts = {"open": 0}
    real_open = PILImage.open

    def counting_open(*a, **k):
        counts["open"] += 1
        return real_open(*a, **k)

    monkeypatch.setattr(PILImage, "open", counting_open)

    t = _feed_trainer(store, images_dir)
    list(t.batches(triples, 2, seed=1, epochs=2))
    assert counts["open"] == len(triples)  # epoch 2 fully cached

    counts["open"] = 0
    t0 = _feed_trainer(store, images_dir, TRAIN_FEED_CACHE_MB="0")
    list(t0.batches(triples, 2, seed=1, epochs=2))
    assert counts["open"] == 2 * len(triples)


def test_batches_missing_file_zero_image_keeps_weight(small_store):
    store, images_dir = small_store
    triples = build_pair_dataset(store, "clip_combined", images_dir)
    triples[0] = (str(images_dir / "nope.png"), triples[0][1], 0.7)
    t = _feed_trainer(store, images_dir)
    rng = np.random.default_rng(3)
    order = rng.permutation(len(triples))
    imgs, _, w = next(t.batches(triples, len(triples), seed=3, epochs=1))
    pos = int(np.where(order == 0)[0][0])
    assert (imgs[pos] == 0).all()
    assert w[pos] == np.float32(0.7)


def test_batches_generator_close_stops_producer(small_store):
    """Abandoning the iterator must stop the background producer (no
    leaked thread spinning on the queue)."""
    import threading as _threading

    store, images_dir = small_store
    triples = build_pair_dataset(store, "clip_combined", images_dir)
    t = _feed_trainer(store, images_dir)
    before = _threading.active_count()
    it = t.batches(triples, 2, seed=0)  # endless epochs
    next(it)
    it.close()
    import time as _time

    for _ in range(50):
        if _threading.active_count() <= before:
            break
        _time.sleep(0.1)
    assert _threading.active_count() <= before


def test_batches_device_feed_yields_u8_buckets(small_store):
    """TRAIN_IMAGE_FEED=device batches carry (uint8 bucket, true_hw)
    pairs — decode-only host; failures keep a full-bucket size so the
    device resize maps zeros to zeros."""
    store, images_dir = small_store
    triples = build_pair_dataset(store, "clip_combined", images_dir)
    triples[0] = (str(images_dir / "nope.png"), triples[0][1], 0.7)
    t = _feed_trainer(store, images_dir, TRAIN_IMAGE_FEED="device",
                      IMAGE_PREPROCESS_BUCKET="64")
    rng = np.random.default_rng(0)
    order = rng.permutation(len(triples))
    (u8, hw), toks, w = next(
        t.batches(triples, len(triples), seed=0, epochs=1))
    assert u8.dtype == np.uint8 and u8.shape[1:] == (64, 64, 3)
    assert hw.shape == (len(triples), 2)
    good = int(np.where(order == 1)[0][0])
    assert tuple(hw[good]) == (30, 40)  # the 40x30 PNG fixtures
    bad = int(np.where(order == 0)[0][0])
    assert tuple(hw[bad]) == (64, 64) and (u8[bad] == 0).all()


def test_train_heldout_eval_hook(small_store):
    """train(eval_every, eval_fraction): a deterministic fraction is
    held out of every training batch and retrieval metrics are logged
    at start/interval/end, returned as a trajectory."""
    import jax.numpy as jnp
    from tests.test_models import TINY, tiny_model
    from tpualign.models.clip import init_clip_params
    from tpualign.tokenizer import ClipTokenizer
    from tpualign.train.step import create_train_state, train_step

    store, images_dir = small_store
    cfg = load_config(env_file=None, overrides={
        "STORE_DIR": str(store.root),
        "OUTPUT_DIR": str(images_dir.parent),
        "BATCH_SIZE": "2", "TOTAL_STEPS": "10", "WARMUP_STEPS": "0",
    })
    model = tiny_model()
    t = Trainer.__new__(Trainer)
    t.config = cfg
    t.mesh = None
    t.store = store
    t.model = model
    t.variant = TINY
    t.tokenizer = ClipTokenizer(context_length=TINY.context_length)
    t.state = create_train_state(model, init_clip_params(model, seed=0),
                                 cfg.train)
    import jax

    @jax.jit
    def _single_step(state, images, token_ids, weak_scores,
                     patch_indices=None):
        return train_step(state, model, images, token_ids, weak_scores,
                          cfg.train, patch_indices)

    t._step = _single_step

    out = t.train(schema="clip_combined", steps=4, batch_size=2,
                  eval_every=2, eval_fraction=0.34)
    hist = out["heldout"]
    assert [h["step"] for h in hist] == [0, 2, 4]
    # 6 pairs * 0.34 -> 2 held out of training
    assert all(h["pairs"] == 2 for h in hist)
    for h in hist:
        assert 0.0 <= h["top1"] <= 1.0
        assert 0.0 < h["mrr"] <= 1.0

    with pytest.raises(ValueError, match="eval_fraction"):
        t.train(schema="clip_combined", steps=1, batch_size=2,
                eval_every=1, eval_fraction=1.5)


def _tiny_trainer(small_store):
    """Minimal Trainer over the tiny test model (no checkpoint load)."""
    import jax
    from tests.test_models import TINY, tiny_model
    from tpualign.models.clip import init_clip_params
    from tpualign.tokenizer import ClipTokenizer
    from tpualign.train.step import create_train_state, train_step

    store, images_dir = small_store
    cfg = load_config(env_file=None, overrides={
        "STORE_DIR": str(store.root),
        "OUTPUT_DIR": str(images_dir.parent),
        "BATCH_SIZE": "2", "TOTAL_STEPS": "10", "WARMUP_STEPS": "0",
    })
    model = tiny_model()
    t = Trainer.__new__(Trainer)
    t.config = cfg
    t.mesh = None
    t.store = store
    t.model = model
    t.variant = TINY
    t.tokenizer = ClipTokenizer(context_length=TINY.context_length)
    t.state = create_train_state(model, init_clip_params(model, seed=0),
                                 cfg.train)

    @jax.jit
    def _single_step(state, images, token_ids, weak_scores,
                     patch_indices=None, teacher=None):
        return train_step(state, model, images, token_ids, weak_scores,
                          cfg.train, patch_indices, teacher)

    t._step = _single_step
    return t


def test_train_eval_knobs_must_be_set_together(small_store):
    """eval_fraction without eval_every would silently shrink the
    training set and never evaluate; the inverse silently no-ops —
    both half-configurations raise."""
    t = _tiny_trainer(small_store)
    with pytest.raises(ValueError, match="together"):
        t.train(schema="clip_combined", steps=1, batch_size=2,
                eval_fraction=0.34)
    with pytest.raises(ValueError, match="together"):
        t.train(schema="clip_combined", steps=1, batch_size=2,
                eval_every=2)


def test_feed_producer_error_propagates(small_store):
    """An exception that escapes the background batch producer (here a
    malformed triple) must surface in the training thread, not hang the
    consumer on an empty queue. Per-image decode failures remain
    skip-and-continue (zero image) and do NOT raise."""
    store, images_dir = small_store
    t = _tiny_trainer(small_store)
    triples = build_pair_dataset(store, "clip_combined", images_dir)

    bad = triples[:2] + [("missing", "text")]  # 2-tuple: unpack error
    it = t.batches(bad, batch_size=3, epochs=1)
    with pytest.raises(RuntimeError, match="feed producer"):
        next(it)

    # contrast: an unreadable image file is a per-item decode failure
    broken = (images_dir / "broken.png")
    broken.write_bytes(b"not a png")
    ok = triples[:2] + [(str(broken), "tekst", 1.0)]
    imgs, tokens, weights = next(t.batches(ok, batch_size=3, epochs=1))
    zero_rows = [bool(np.all(imgs[i] == 0.0)) for i in range(3)]
    assert imgs.shape[0] == 3 and sum(zero_rows) == 1  # batch is shuffled


def test_heldout_prepare_cached_and_jitted(small_store):
    """Repeated held-out evals reuse the decoded/tokenized tensors (one
    _prepare_heldout per held-out set) and agree with a fresh compute."""
    store, images_dir = small_store
    t = _tiny_trainer(small_store)
    triples = build_pair_dataset(store, "clip_combined", images_dir)

    p1 = t._prepare_heldout(triples)
    p2 = t._prepare_heldout(triples)
    assert p1 is p2  # params-independent work done once

    m1 = t.evaluate_heldout(triples)
    m2 = t.evaluate_heldout(triples)
    assert m1 == m2
    assert m1["pairs"] == len(triples)
    assert 0.0 < m1["mrr"] <= 1.0
    # a different held-out set re-prepares
    p3 = t._prepare_heldout(triples[:3])
    assert p3 is not p1 and p3[3] == 3


def test_train_with_distillation_teacher(small_store):
    """set_teacher + train(): the teacher bank is computed once over the
    training pairs (cross-dimension teacher), every step carries the KD
    term, and the metrics expose it."""
    import jax
    from tests.test_distill import teacher_model
    from tpualign.models.clip import init_clip_params

    store, images_dir = small_store
    t = _tiny_trainer(small_store)
    tm = teacher_model()
    t.set_teacher(tm, init_clip_params(tm, seed=7))

    out = t.train(schema="clip_combined", steps=3, batch_size=2)
    assert "distill_kl" in out and out["distill_kl"] > 0.0
    assert np.isfinite(out["loss"])

    # bank alignment: rows follow the triples, duplicates share embeddings
    triples = build_pair_dataset(store, "clip_combined", images_dir)
    dup = triples + [triples[0]]
    t_img, t_txt, t_scale = t._teacher_bank(dup)
    assert t_img.shape == (len(dup), 32) and t_txt.shape == (len(dup), 32)
    np.testing.assert_array_equal(t_img[0], t_img[-1])
    np.testing.assert_array_equal(t_txt[0], t_txt[-1])
    assert float(t_scale) > 0.0
    norms = np.linalg.norm(t_img, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_metrics_file_jsonl(small_store, tmp_path):
    """--metrics-file: one JSON line per log interval plus held-out eval
    records, appended crash-safe."""
    import json

    t = _tiny_trainer(small_store)
    mf = tmp_path / "history.jsonl"
    t.train(schema="clip_combined", steps=4, batch_size=2, log_every=2,
            eval_every=2, eval_fraction=0.34, metrics_file=str(mf))
    lines = [json.loads(l) for l in mf.read_text().splitlines()]
    train_rows = [l for l in lines if l["kind"] == "train"]
    ho_rows = [l for l in lines if l["kind"] == "heldout"]
    final_rows = [l for l in lines if l["kind"] == "final"]
    assert [r["step"] for r in train_rows] == [2, 4]
    assert len(final_rows) == 1 and final_rows[0]["step"] == 4
    assert [r["step"] for r in ho_rows] == [0, 2, 4]
    assert all(np.isfinite(r["loss"]) for r in train_rows)
    assert all(0.0 < r["mrr"] <= 1.0 for r in ho_rows)

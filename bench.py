"""Throughput benchmark: image-text pairs embedded per second per chip.

Headline metric from BASELINE.md: >=5,000 pairs/sec/chip at ViT-B-32 on a
TPU v5e. One "pair" = one image through the vision tower + one text through
the text tower (the reference embedded both one at a time with batch size 1,
ref:src/insert_clip_embeddings.py:281-353 — it published no number, so
vs_baseline is measured against the 5k north star).

Measurement notes (important on tunneled/relayed TPU setups):
- ALL benchmark data is generated on device (params via on-device init,
  inputs via jax.random) — no bulk host->device uploads pollute the timing;
- synchronization is a SCALAR readback that data-depends on the last
  result. On some remote-attached configurations ``block_until_ready`` does
  not actually wait and only data fetches synchronize; a scalar fetch is
  correct on every backend and costs microseconds of transfer.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_PAIRS_PER_SEC = 5000.0  # north star (BASELINE.md), not reference-published


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpualign.config import ModelConfig
    from tpualign.models.clip import build_clip, init_clip_params

    import os

    # TPUALIGN_BENCH_QUANT=int8 benches the quantized serving path; the
    # headline stays the bf16 parity-grade path.
    quant = os.environ.get("TPUALIGN_BENCH_QUANT", "none")
    config = ModelConfig(
        model_name="ViT-B-32", compute_dtype="bfloat16", quant=quant
    )
    model = build_clip(config)
    params = init_clip_params(model, seed=0)  # on-device init, no host upload
    v = config.variant

    on_tpu = jax.default_backend() == "tpu"
    # measured sweep on v5e (fused attention): 512 -> 7578, 1024 -> 7296,
    # 2048 -> 7034 pairs/s; 512 balances VMEM pressure and MXU occupancy
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else (512 if on_tpu else 8)
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else (40 if on_tpu else 2)

    @jax.jit
    def make_batch(key):
        images = jax.random.normal(
            key, (batch, v.image_size, v.image_size, 3), jnp.float32
        )
        base = jax.random.randint(key, (batch, v.context_length), 1, 40000)
        pos = jnp.arange(v.context_length)[None, :]
        tokens = jnp.where(pos == 0, v.vocab_size - 2, base)
        tokens = jnp.where(pos == 20, v.vocab_size - 1, tokens)
        tokens = jnp.where(pos > 20, 0, tokens).astype(jnp.int32)
        return images, tokens

    @jax.jit
    def embed_pairs(p, imgs, toks):
        ie = model.apply({"params": p}, imgs, normalize=True,
                         method=model.encode_image)
        te = model.apply({"params": p}, toks, normalize=True,
                         method=model.encode_text)
        return ie, te

    @jax.jit
    def checksum(ie, te):
        return jnp.sum(ie) + jnp.sum(te)

    def sync(out) -> float:
        return float(checksum(*out))  # scalar fetch = real barrier

    images, tokens = make_batch(jax.random.PRNGKey(0))

    # warmup / compile, then drain the queue
    out = embed_pairs(params, images, tokens)
    sync(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = embed_pairs(params, images, tokens)
    sync(out)
    dt = time.perf_counter() - t0

    pairs_per_sec = batch * iters / dt

    # Production engines length-bucket the text tower (causal attention
    # makes pad-tail truncation exact — tpualign/models/text.py); these
    # bench tokens have EOT at position 20, so the engine would run them
    # in the 32-token bucket. Measure that rate too (reported as an extra
    # field; the headline stays the conservative full-77-context number).
    tokens32 = tokens[:, :32]
    out = embed_pairs(params, images, tokens32)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = embed_pairs(params, images, tokens32)
    sync(out)
    pairs_bucketed = batch * iters / (time.perf_counter() - t0)

    # --- end-to-end production path (VERDICT r2 #5) -----------------------
    # Drive the PRODUCTION EmbedEngine executables: the device-preprocess
    # image feed (uint8 bucket -> fused bicubic+antialias resize/crop/
    # normalize -> vision tower) and the bucketed text path — the exact
    # jitted functions embed_image_records dispatches. Inputs are
    # device-generated uint8 buckets standing in for the post-decode host
    # feed: through this relay, bulk host->device uploads run at ~64 KB/s
    # (docs/PERFORMANCE.md "Host feed"), so timing real uploads would
    # measure the tunnel, not the architecture. On a host-attached chip
    # the uint8 transfer (256KB/image) overlaps compute via the prefetch
    # queue.
    from tpualign.parallel.embed import EmbedEngine

    engine = EmbedEngine(
        config, batch_size=batch, params=params,
        preprocess="device", preprocess_bucket=256,
    )

    @jax.jit
    def make_u8_batch(key):
        u8 = jax.random.randint(
            key, (batch, 256, 256, 3), 0, 256, jnp.int32
        ).astype(jnp.uint8)
        hw = jax.random.randint(key, (batch, 2), 64, 257, jnp.int32)
        return u8, hw

    u8, hw = make_u8_batch(jax.random.PRNGKey(1))
    tokens32 = tokens[:, :32]

    def e2e_step():
        ie = engine._encode_image_u8(engine.params, u8, hw)
        te = engine._encode_text(engine.params, tokens32)
        return ie, te

    out = e2e_step()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = e2e_step()
    sync(out)
    pairs_e2e = batch * iters / (time.perf_counter() - t0)

    # --- retrieval headline (the pgvector replacement) --------------------
    # Exact search through the production RetrievalIndex at the standard
    # benchmark point (N=100k, D=512, Q=1024, k=10 — the BASELINE.md
    # retrieval config); corpus generated on device, single-key so every
    # row is a candidate. Reported as an extra field next to the embed
    # headline so one driver-captured line carries both subsystems.
    import numpy as np

    from tpualign.parallel.retrieval import RetrievalIndex

    n_corpus, dim = (100_000, 512) if on_tpu else (2_000, 64)

    @jax.jit
    def make_corpus(key):
        c = jax.random.normal(key, (n_corpus, dim), jnp.float32)
        return c / jnp.linalg.norm(c, axis=1, keepdims=True)

    corpus = make_corpus(jax.random.PRNGKey(2))
    index = RetrievalIndex.__new__(RetrievalIndex)
    index.vocab = {}
    # pass the DEVICE array straight through — _init_from_arrays only
    # len()s and device_puts it (a no-op on resident data); np.asarray
    # here would fetch 200 MB through the ~64 KB/s relay and upload it
    # back before the first timed search
    index._init_from_arrays(
        dim, corpus, np.zeros(n_corpus, np.int32), None
    )
    qn = 1024 if on_tpu else 64
    rq = corpus[:qn]
    rqk = jnp.zeros((qn,), jnp.int32)
    rv, _ri = index.search_device(rq, rqk, 10)
    float(jnp.sum(rv))  # compile + drain
    reps = 10 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(reps):
        rv, _ri = index.search_device(rq, rqk, 10)
    float(jnp.sum(rv))
    retrieval_qps = qn * reps / (time.perf_counter() - t0)

    from tpualign.utils.flops import clip_pair_flops, device_peak_flops

    record = {
        "metric": "pairs_embedded_per_sec_per_chip_vit_b32",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 3),
    }
    record["pairs_per_sec_text_bucket32"] = round(pairs_bucketed, 1)
    # engine path: device preprocess (bicubic parity resize from 256-buckets)
    # + 32-token text bucket — the production embed executables
    record["pairs_per_sec_end_to_end"] = round(pairs_e2e, 1)
    record["retrieval_qps_exact_n100k"] = round(retrieval_qps, 1)
    peak = device_peak_flops(jax.devices()[0].device_kind)
    if peak:
        achieved = pairs_per_sec * clip_pair_flops(v)
        record["mfu"] = round(achieved / peak, 4)
        record["tflops_per_sec"] = round(achieved / 1e12, 1)
    if quant != "none":
        record["quant"] = quant  # mfu above is vs the bf16 peak
    print(json.dumps(record))


if __name__ == "__main__":
    main()

"""Large-tower fine-tuning feasibility + throughput on ONE chip.

The reference cannot train at all; this repo's H-14 training memory story
is TP sharding across a mesh PLUS three single-chip levers measured here:
gradient accumulation (activations shrink to one microbatch, full-batch
negatives kept), bf16 AdamW first moments, and FLIP patch masking.

ViT-H-14 is ~1.0B params: fp32 params 4 GB + fp32 grads 4 GB + bf16 mu
2 GB + fp32 nu 4 GB ~= 14 GB of state on a 16 GB v5e — only microbatch
activations fit in the remainder, which is exactly what the accumulation
schedule provides.

Usage: python benchmarks/bench_train_large.py [model] [batch] [accum] [steps] [remat] [lora_rank]
Defaults: ViT-H-14 16 8 3 0 0. Prints one JSON line per step plus a summary.

lora_rank > 0 measures the LoRA arm: the base tree freezes (no base
grads, no moments), only rank-r adapters + logit_scale train — the
memory ladder above mostly stops mattering.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpualign.config import ModelConfig, TrainConfig
    from tpualign.models.clip import build_clip, init_clip_params
    from tpualign.train.step import (create_train_state, sample_patch_indices,
                                     train_step)

    model_name = sys.argv[1] if len(sys.argv) > 1 else "ViT-H-14"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    accum = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    steps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    remat = bool(int(sys.argv[5])) if len(sys.argv) > 5 else False
    lora_rank = int(sys.argv[6]) if len(sys.argv) > 6 else 0

    mcfg = ModelConfig(model_name=model_name, compute_dtype="bfloat16",
                       remat=remat)
    model = build_clip(mcfg)
    v = mcfg.variant
    tcfg = TrainConfig(
        learning_rate=1e-5, warmup_steps=1, total_steps=100,
        grad_accum_steps=accum, moments_dtype="bfloat16",
        patch_mask_ratio=0.5, lora_rank=lora_rank,
        # LORA_BASE_DTYPE=bfloat16 halves the frozen-base bytes — the
        # knob that fits ViT-bigG-14 (2.54B params) on one 16 GB chip
        lora_base_dtype=os.environ.get("LORA_BASE_DTYPE", "float32"),
    )

    params = init_clip_params(model, seed=0)  # on-device init
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    state = create_train_state(model, params, tcfg)
    # drop the host reference: under LORA_BASE_DTYPE=bfloat16 the state
    # holds a CAST COPY, and keeping the fp32 init alive too would pin
    # 1.5x the base bytes (10+5 GB at bigG scale) for the whole run
    del params

    num_patches = (v.image_size // v.patch_size) ** 2
    rng = np.random.default_rng(0)

    @jax.jit
    def make_batch(key):
        images = jax.random.normal(
            key, (batch, v.image_size, v.image_size, 3), jnp.float32)
        toks = jnp.tile(jnp.arange(v.context_length, dtype=jnp.int32)[None],
                        (batch, 1))
        weak = jax.random.uniform(key, (batch,), jnp.float32)
        return images, toks, weak

    step_fn = jax.jit(
        lambda s, i, t, w, pi: train_step(s, model, i, t, w, tcfg, pi),
        donate_argnums=(0,),
    )

    images, toks, weak = make_batch(jax.random.PRNGKey(0))
    times = []
    for i in range(steps):
        pidx = jnp.asarray(
            sample_patch_indices(rng, batch, num_patches,
                                 tcfg.patch_mask_ratio))
        t0 = time.perf_counter()
        state, metrics = step_fn(state, images, toks, weak, pidx)
        loss = float(metrics["loss"])  # scalar fetch = the sync barrier
        dt = time.perf_counter() - t0
        times.append(dt)
        print(json.dumps({"step": i, "loss": round(loss, 4),
                          "seconds": round(dt, 2),
                          "note": "first step includes compile" if i == 0
                          else ""}))
    dev = jax.devices()[0]
    stats = {}
    try:
        ms = dev.memory_stats() or {}
        stats = {"peak_bytes_in_use_gb":
                 round(ms.get("peak_bytes_in_use", 0) / 2**30, 2)}
    except Exception:
        pass
    steady = times[-1] if len(times) < 3 else float(np.mean(times[1:]))
    print(json.dumps({
        "metric": f"train_step_{model_name}_single_chip",
        "params_millions": round(n_params / 1e6, 1),
        "batch": batch, "grad_accum_steps": accum,
        "patch_mask_ratio": tcfg.patch_mask_ratio,
        "moments_dtype": "bfloat16", "remat": remat,
        "lora_rank": lora_rank,
        "lora_base_dtype": tcfg.lora_base_dtype,
        "trainable_millions": round(sum(
            int(np.prod(p.shape)) for p in jax.tree.leaves(state.params)
        ) / 1e6, 2),
        "steady_step_seconds": round(steady, 3),
        "pairs_per_sec": round(batch / steady, 2),
        **stats,
    }))


if __name__ == "__main__":
    main()

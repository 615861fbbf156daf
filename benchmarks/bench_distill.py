"""Step-cost A/B for the round-3 training additions, on the real chip:

  base      — ViT-B-32 contrastive train step (the PERFORMANCE.md row)
  + distill — same step with the relational KD term (teacher arrays are
              inputs; the extra work is one (B, B) logit matrix + KL)
  qat       — CLIP_QUANT=int8_qat step (fake-quant STE on every GEMM:
              extra absmax/round elementwise passes, fp32 dots)

All data device-generated; scalar-readback sync (relay discipline).
Usage: python benchmarks/bench_distill.py [batch] [iters]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpualign.config import ModelConfig, TrainConfig
    from tpualign.models.clip import build_clip, init_clip_params
    from tpualign.train.step import create_train_state, train_step

    on_tpu = jax.default_backend() == "tpu"
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else (256 if on_tpu else 8)
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else (10 if on_tpu else 2)

    def make_batch(key, ctx):
        ik, tk, wk = jax.random.split(key, 3)
        images = jax.random.normal(ik, (batch, 224, 224, 3), jnp.float32)
        base = jax.random.randint(tk, (batch, ctx), 1, 40000)
        pos = jnp.arange(ctx)[None, :]
        tokens = jnp.where(pos == 0, 49407, base)
        tokens = jnp.where(pos == 20, 49408, tokens)
        tokens = jnp.where(pos > 20, 0, tokens).astype(jnp.int32)
        weak = jax.random.uniform(wk, (batch,))
        return images, tokens, weak

    def bench(tag, quant, teacher_dim):
        cfg = ModelConfig(model_name="ViT-B-32", quant=quant)
        model = build_clip(cfg)
        params = init_clip_params(model, seed=0)
        tcfg = TrainConfig(batch_size=batch, warmup_steps=1,
                           total_steps=1000,
                           distill_weight=0.5 if teacher_dim else 0.0)
        state = create_train_state(model, params, tcfg)
        images, tokens, weak = jax.jit(
            lambda k: make_batch(k, cfg.variant.context_length)
        )(jax.random.PRNGKey(0))
        teacher = None
        if teacher_dim:
            def tgen(k):
                a = jax.random.normal(k, (batch, teacher_dim), jnp.float32)
                return a / jnp.linalg.norm(a, axis=1, keepdims=True)
            teacher = (jax.jit(tgen)(jax.random.PRNGKey(1)),
                       jax.jit(tgen)(jax.random.PRNGKey(2)),
                       jnp.asarray(50.0, jnp.float32))

        def step(s):
            return train_step(s, model, images, tokens, weak, tcfg,
                              None, teacher)

        jstep = jax.jit(step, donate_argnums=(0,))
        state, m = jstep(state)
        float(m["loss"])  # compile + drain
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = jstep(state)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / iters
        print(f"{tag}: {dt * 1e3:.1f} ms/step = "
              f"{batch / dt:.0f} pairs/s", flush=True)
        return dt

    base = bench("base (bf16 contrastive)", "none", 0)
    kd = bench("+ distill (teacher dim 1024)", "none", 1024)
    qat = bench("qat (int8_qat STE)", "int8_qat", 0)
    print(f"distill overhead: {100 * (kd / base - 1):.1f}%  "
          f"qat cost: {qat / base:.2f}x base")


if __name__ == "__main__":
    main()

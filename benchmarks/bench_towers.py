"""Per-tower throughput benchmark (ViT-B-32 by default).

Usage: python benchmarks/bench_towers.py [model] [batch] [iters]
Prints one JSON line per tower. Methodology: see bench.py.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpualign.config import ModelConfig
    from tpualign.models.clip import build_clip, init_clip_params

    model_name = sys.argv[1] if len(sys.argv) > 1 else "ViT-B-32"
    on_tpu = jax.default_backend() == "tpu"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else (512 if on_tpu else 4)
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else (30 if on_tpu else 2)

    config = ModelConfig(model_name=model_name, compute_dtype="bfloat16")
    model = build_clip(config)
    params = init_clip_params(model, seed=0)
    v = config.variant

    @jax.jit
    def make(key):
        imgs = jax.random.normal(
            key, (batch, v.image_size, v.image_size, 3), jnp.float32
        )
        toks = jnp.tile(
            jnp.arange(v.context_length, dtype=jnp.int32)[None], (batch, 1)
        )
        return imgs, toks

    imgs, toks = make(jax.random.PRNGKey(0))

    towers = {
        "image": jax.jit(lambda p, x: model.apply(
            {"params": p}, x, normalize=True, method=model.encode_image)),
        "text": jax.jit(lambda p, t: model.apply(
            {"params": p}, t, normalize=True, method=model.encode_text)),
    }
    args = {"image": imgs, "text": toks}
    for name, fn in towers.items():
        o = fn(params, args[name])
        float(jnp.sum(o))
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn(params, args[name])
        float(jnp.sum(o))
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": f"{name}_tower_throughput_{model_name}",
            "value": round(batch * iters / dt, 1),
            "unit": "items/s",
            "batch": batch,
            "fused_attention": bool(model.use_fused_attention),
        }))


if __name__ == "__main__":
    main()

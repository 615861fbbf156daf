"""EXPERIMENT: paired-head fused attention — full-register head slicing.

Hypothesis (docs/PERFORMANCE.md roofline): the fused-MHA core is not
FLOP-bound — the ablation shows the matmuls are free and ~72% of core time
is HBM I/O plus *sub-register* 64-lane head slicing (CLIP head_dim=64 is
half a v5e vector register). This kernel processes heads in PAIRS so every
VMEM slice/store touches an aligned 128-lane chunk:

- scores: with q2/k2 = two heads side by side (T, 128), one matmul
  contracting all 128 lanes yields S = sA + sB; a second with the
  second head's lanes negated yields D = sA - sB. Recover
  sA = (S+D)/2, sB = (S-D)/2. Two 128-deep matmuls replace two 64-deep
  ones — same MXU pass count (the MXU is 128 deep), zero 64-lane slices.
- context: stack V block-diagonally along the key axis:
  Vstack = [[vA | 0], [0 | vB]] (2T, 128) built with full-register lane
  masks, Pcat = [probsA | probsB] (T, 2T); one matmul contracting 2T
  yields [ctxA | ctxB] (T, 128), stored at an aligned 128-lane offset.
  2T = 100..154 <= 128..256 keeps this 1-2 MXU passes, same as before.

Numerics: the sum/difference reconstruction adds ~1 ulp of fp32 error on
the logits (shift-invariant under softmax max-subtraction); measured drift
vs the XLA reference must stay well under the 1e-3 parity bound.

Usage: python benchmarks/exp_paired_attention.py [check|bench] (default both)
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _paired_kernel(qkv_ref, mask_ref, out_ref, *, num_heads: int,
                   head_dim: int, width: int, scale: float):
    mask = mask_ref[0] if mask_ref is not None else None
    pd = 2 * head_dim
    t = qkv_ref.shape[1]
    # lane-wise sign/select vectors over the paired 128-lane chunk
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, pd), 2)
    first = (lane < head_dim)
    sgn = jnp.where(first, 1.0, -1.0).astype(qkv_ref.dtype)
    mA = first.astype(qkv_ref.dtype)
    mB = (1 - mA).astype(qkv_ref.dtype)
    for p in range(num_heads // 2):
        q2 = qkv_ref[:, :, p * pd:(p + 1) * pd]
        k2 = qkv_ref[:, :, width + p * pd: width + (p + 1) * pd]
        v2 = qkv_ref[:, :, 2 * width + p * pd: 2 * width + (p + 1) * pd]
        dn = (((2,), (2,)), ((0,), (0,)))
        s_sum = jax.lax.dot_general(q2, k2, dimension_numbers=dn,
                                    preferred_element_type=jnp.float32)
        s_dif = jax.lax.dot_general(q2 * sgn, k2, dimension_numbers=dn,
                                    preferred_element_type=jnp.float32)
        half = 0.5 * scale
        sA = (s_sum + s_dif) * half
        sB = (s_sum - s_dif) * half
        if mask is not None:
            sA = sA + mask[None]
            sB = sB + mask[None]
        pA = jax.nn.softmax(sA, axis=-1).astype(qkv_ref.dtype)
        pB = jax.nn.softmax(sB, axis=-1).astype(qkv_ref.dtype)
        pcat = jnp.concatenate([pA, pB], axis=2)           # (bb, T, 2T)
        vstack = jnp.concatenate([v2 * mA, v2 * mB], axis=1)  # (bb, 2T, 128)
        ctx = jax.lax.dot_general(
            pcat, vstack, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        out_ref[:, :, p * pd:(p + 1) * pd] = ctx.astype(out_ref.dtype)


def _paired_kernel_nomask(qkv_ref, out_ref, **kw):
    _paired_kernel(qkv_ref, None, out_ref, **kw)


def _hybrid_kernel(qkv_ref, mask_ref, out_ref, *, num_heads: int,
                   head_dim: int, width: int, scale: float):
    """Paired 128-lane q/k slicing for scores; per-head context as current."""
    mask = mask_ref[0] if mask_ref is not None else None
    pd = 2 * head_dim
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, pd), 2)
    sgn = jnp.where(lane < head_dim, 1.0, -1.0).astype(qkv_ref.dtype)
    for p in range(num_heads // 2):
        q2 = qkv_ref[:, :, p * pd:(p + 1) * pd]
        k2 = qkv_ref[:, :, width + p * pd: width + (p + 1) * pd]
        dn = (((2,), (2,)), ((0,), (0,)))
        s_sum = jax.lax.dot_general(q2, k2, dimension_numbers=dn,
                                    preferred_element_type=jnp.float32)
        s_dif = jax.lax.dot_general(q2 * sgn, k2, dimension_numbers=dn,
                                    preferred_element_type=jnp.float32)
        half = 0.5 * scale
        for j, s in enumerate(((s_sum + s_dif) * half, (s_sum - s_dif) * half)):
            h = 2 * p + j
            if mask is not None:
                s = s + mask[None]
            probs = jax.nn.softmax(s, axis=-1).astype(qkv_ref.dtype)
            v = qkv_ref[:, :, 2 * width + h * head_dim:
                        2 * width + (h + 1) * head_dim]
            ctx = jax.lax.dot_general(
                probs, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            out_ref[:, :, h * head_dim:(h + 1) * head_dim] = ctx.astype(out_ref.dtype)


def _hybrid_kernel_nomask(qkv_ref, out_ref, **kw):
    _hybrid_kernel(qkv_ref, None, out_ref, **kw)


def hybrid_mha(qkv, num_heads: int, mask=None, block_b: int = 16):
    b, t, three_d = qkv.shape
    d = three_d // 3
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    block_b = max(1, min(block_b, b))
    pad_b = (-b) % block_b
    if pad_b:
        qkv = jnp.pad(qkv, ((0, pad_b), (0, 0), (0, 0)))
    bp = qkv.shape[0]
    if mask is not None:
        mask = mask.reshape(t, t)[None].astype(jnp.float32)
    kernel = functools.partial(
        _hybrid_kernel if mask is not None else _hybrid_kernel_nomask,
        num_heads=num_heads, head_dim=hd, width=d, scale=scale)
    in_specs = [pl.BlockSpec((block_b, t, three_d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [qkv]
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, t, t), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask)
    out = pl.pallas_call(
        kernel, grid=(bp // block_b,), in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, t, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, t, d), qkv.dtype),
        interpret=_interpret(),
    )(*args)
    return out[:b]


def paired_mha(qkv, num_heads: int, mask=None, block_b: int = 16):
    b, t, three_d = qkv.shape
    d = three_d // 3
    hd = d // num_heads
    assert num_heads % 2 == 0 and hd * num_heads == d
    scale = 1.0 / (hd ** 0.5)
    block_b = max(1, min(block_b, b))
    pad_b = (-b) % block_b
    if pad_b:
        qkv = jnp.pad(qkv, ((0, pad_b), (0, 0), (0, 0)))
    bp = qkv.shape[0]
    if mask is not None:
        mask = mask.reshape(t, t)[None].astype(jnp.float32)
    kernel = functools.partial(
        _paired_kernel if mask is not None else _paired_kernel_nomask,
        num_heads=num_heads, head_dim=hd, width=d, scale=scale)
    in_specs = [pl.BlockSpec((block_b, t, three_d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [qkv]
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, t, t), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask)
    out = pl.pallas_call(
        kernel, grid=(bp // block_b,), in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, t, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, t, d), qkv.dtype),
        interpret=_interpret(),
    )(*args)
    return out[:b]


def check(t=50, d=768, h=12, b=8, with_mask=False):
    from tpualign.ops.pallas_attention import _xla_reference_mha, fused_mha
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (b, t, 3 * d), jnp.bfloat16) * 0.5
    mask = None
    if with_mask:
        mask = jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)
    ref = _xla_reference_mha(qkv, h, mask).astype(jnp.float32)
    cur = fused_mha(qkv, h, mask).astype(jnp.float32)
    new = paired_mha(qkv, h, mask).astype(jnp.float32)
    e_cur = float(jnp.max(jnp.abs(cur - ref)))
    e_new = float(jnp.max(jnp.abs(new - ref)))
    print(json.dumps({"t": t, "d": d, "h": h, "mask": with_mask,
                      "max_err_current": e_cur, "max_err_paired": e_new}))
    assert e_new < 5e-3, e_new


def bench(t=50, d=768, h=12, b=512, iters=50, with_mask=False):
    from tpualign.ops.pallas_attention import fused_mha
    key = jax.random.PRNGKey(0)
    qkv = jax.device_put(jax.random.normal(key, (b, t, 3 * d), jnp.bfloat16))
    mask = None
    if with_mask:
        mask = jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)

    def timeit(fn, label):
        R = 8

        @jax.jit
        def chained(x):
            # Chain R applications with a 1-element data dependency between
            # them: defeats CSE (each fn sees a distinct input) at the cost
            # of one in-place 1-element update per application.
            acc = jnp.zeros((), jnp.float32)
            for _ in range(R):
                y = fn(x)
                s = y[0, 0, 0].astype(x.dtype)
                x = x.at[0, 0, 0].add(s * jnp.asarray(1e-6, x.dtype))
                acc = acc + y[0, 0, 0].astype(jnp.float32)
            return acc

        o = chained(qkv); float(o)
        t0 = time.perf_counter()
        for _ in range(iters):
            o = chained(qkv)
        float(o)
        dt = (time.perf_counter() - t0) / (iters * R)
        print(json.dumps({"kernel": label, "t": t, "d": d, "b": b,
                          "mask": with_mask, "us_per_app": round(dt * 1e6, 1)}))
        return dt

    timeit(lambda x: fused_mha(x, h, mask), "current_per_head")
    timeit(lambda x: paired_mha(x, h, mask), "paired_128lane")
    timeit(lambda x: hybrid_mha(x, h, mask), "hybrid_scores_paired")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    if mode in ("check", "both"):
        check(50, 768, 12, 8, False)
        check(77, 512, 8, 8, True)
    if mode in ("bench", "both") and jax.default_backend() == "tpu":
        bench(50, 768, 12, 512, with_mask=False)   # vision B-32
        bench(77, 512, 8, 512, with_mask=True)     # text B-32

"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpualign.ops.pallas_kernels import masked_sim_topk, normalize_u8
from tpualign.ops.preprocess import CLIP_MEAN, CLIP_STD
from tpualign.ops.similarity import NEG_INF


def oracle(q, qk, c, ck, k):
    sims = q @ c.T
    vals = np.full((len(q), k), NEG_INF, np.float32)
    idx = np.full((len(q), k), -1, np.int64)
    for r in range(len(q)):
        cand = np.where(qk[r] == ck)[0]
        order = cand[np.lexsort((cand, -sims[r][cand]))][:k]
        vals[r, : len(order)] = sims[r][order]
        idx[r, : len(order)] = order
    return vals, idx


def make(rng, Q, N, D, groups):
    q = rng.normal(size=(Q, D)).astype(np.float32)
    c = rng.normal(size=(N, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    qk = rng.integers(0, groups, Q).astype(np.int32)
    ck = rng.integers(0, groups, N).astype(np.int32)
    return q, qk, c, ck


@pytest.mark.parametrize(
    "Q,N,D,k,bq,bn",
    [
        (23, 301, 64, 7, 8, 128),
        (64, 512, 128, 10, 32, 256),   # exact block multiples
        (3, 17, 32, 5, 8, 128),        # tiny, heavy padding
    ],
)
def test_masked_sim_topk_matches_oracle(Q, N, D, k, bq, bn):
    rng = np.random.default_rng(Q * N + k)
    q, qk, c, ck = make(rng, Q, N, D, 4)
    vals, idx = masked_sim_topk(
        jnp.asarray(q), jnp.asarray(qk), jnp.asarray(c), jnp.asarray(ck),
        k, block_q=bq, block_n=bn,
    )
    vals, idx = np.asarray(vals), np.asarray(idx)
    ovals, oidx = oracle(q, qk, c, ck, k)
    has = oidx >= 0
    np.testing.assert_array_equal(idx[has], oidx[has])
    np.testing.assert_allclose(vals[has], ovals[has], atol=2e-5)
    # empty slots carry the sentinel index
    assert (idx[~has] >= N).all()


def test_masked_sim_topk_no_candidates():
    rng = np.random.default_rng(0)
    q, qk, c, ck = make(rng, 4, 32, 16, 2)
    qk[:] = 99  # matches nothing
    vals, idx = masked_sim_topk(
        jnp.asarray(q), jnp.asarray(qk), jnp.asarray(c), jnp.asarray(ck),
        3, block_q=8, block_n=128,
    )
    assert (np.asarray(vals) <= NEG_INF / 2).all()


def test_masked_sim_topk_tie_break():
    # identical corpus rows -> equal sims; winners must be ascending index
    q = np.ones((1, 8), np.float32) / np.sqrt(8)
    c = np.tile(q, (6, 1))
    qk = np.zeros(1, np.int32)
    ck = np.zeros(6, np.int32)
    _, idx = masked_sim_topk(
        jnp.asarray(q), jnp.asarray(qk), jnp.asarray(c), jnp.asarray(ck),
        4, block_q=8, block_n=128,
    )
    np.testing.assert_array_equal(np.asarray(idx)[0], [0, 1, 2, 3])


def test_normalize_u8():
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (3, 16, 8, 3)).astype(np.uint8)
    out = np.asarray(normalize_u8(jnp.asarray(imgs)))
    want = (imgs / 255.0 - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
    np.testing.assert_allclose(out, want, atol=1e-5)

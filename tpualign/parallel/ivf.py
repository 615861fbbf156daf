"""TPU-native IVF (inverted-file) approximate retrieval index.

The reference creates an IVFFlat index (``lists=100``) whenever pgvector's
HNSW build is unavailable (ref:src/setup_vector_db.py:171-190): corpus
vectors are partitioned into ``lists`` clusters by k-means and a query
scans only the ``probes`` nearest clusters. This module is that index
rebuilt TPU-first — everything from k-means training to the probed search
runs on device with static shapes:

- **Training**: spherical k-means (Lloyd's) over the device-resident
  corpus. The assignment step is a blockwise ``lax.scan`` whose inner ops
  are two MXU matmuls per block — scores ``(block, L) = X_b @ C^T`` and
  the centroid update accumulated as ``one_hot(assign)^T @ X_b`` — so the
  whole build is matmul-bound, not scatter-bound.
- **Packed layout**: clusters are padded to a fixed capacity ``C``
  (a multiple of 128 — lane alignment for the kernel's key blocks) and
  packed into ONE flat ``((L+2+n_spill_blocks)*C, D)`` array by a device
  sort + scatter: blocks ``0..L-1`` are the clusters, block ``L`` is an
  all-masked zero block (the kernel's padding target), and blocks ``L+1
  ..`` hold the **spill tail** — rows beyond a cluster's capacity, which
  every query scans exactly, so capacity overflow degrades compute,
  never recall. Only the ``(L,)`` cluster-size vector is fetched to the
  host to size the layout.
- **Search (TPU)**: probe selection is one ``(B, L)`` centroid matmul +
  ``lax.top_k``; scoring runs :func:`tpualign.ops.pallas_kernels.
  ivf_probe_topk` — a scalar-prefetch Pallas kernel whose grid iterates
  the deduplicated union of the batch's probed clusters and whose
  BlockSpec ``index_map`` reads the prefetched union array, so the DMA
  engine streams ONLY probed blocks from HBM (contiguous, double-
  buffered) while each resident block is scored for all queries with one
  MXU matmul and folded into a running top-k in VMEM. Per-query cluster
  gathers (the classic IVF schedule) measured 0.43x brute force on v5e —
  zero MXU operand reuse — and an XLA gather+``lax.top_k`` union
  schedule measured ~40x the matmul cost per step; the kernel replaces
  both. A membership mask keeps each query's candidates exactly its own
  probed clusters (classic IVFFlat semantics, batch-invariant), composed
  with the same (manual, page) key masking as the exact paths in
  :mod:`tpualign.parallel.retrieval`.
- **Search (CPU / full probes)**: an XLA union-scan path with identical
  semantics backs the kernel off device and provides the bit-exact
  ``n_probes == n_lists`` mode (two-key tie-breaks against the dense
  oracle).
- **int8**: ``precision="int8"`` stores the packed layout per-row
  symmetrically quantized (4x corpus HBM capacity); blocks dequantize in
  VMEM right before the matmul, exactly like the exact streaming
  kernel's int8 mode — or, with ``int8_mxu=True``, queries quantize too
  and the block matmul runs s8 x s8 -> s32 on the MXU (2x rate, no fp32
  dequant intermediate, ~1e-3 extra query-side noise).
- **int4**: ``precision="int4"`` stores the layout as packed nibble
  pairs ((rows, D/2) uint8, offset-8 encoding — 8x corpus HBM capacity
  at coarser ~1e-2-level noise); the kernel unpacks per VMEM block and
  scores with two half-width s8 x s8 -> s32 MXU dots. Builds accept
  fp32 corpora (quantized along the packed layout) or pre-packed
  ``(N, D/2)`` uint8 + per-row scales (no fp32 copy ever exists).

Recall semantics match IVFFlat's: a query's true neighbors are found iff
their clusters are probed (or they spilled). ``n_probes = n_lists`` is
exhaustively exact and is pinned against the dense oracle in tests; the
reference never measured its index's recall at all.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpualign.ops.pallas_kernels import SENTINEL_IDX, ivf_probe_topk
from tpualign.ops.similarity import NEG_INF, WILDCARD_KEY
from tpualign.parallel.retrieval import (
    _pad_results,
    _refine_rescore,
    _sentinel,
    _setup_refine,
    _two_key_topk,
    encode_keys,
)
from tpualign.utils.logging import get_logger

log = get_logger("parallel.ivf")

__all__ = ["IVFIndex"]


def _corpus_fingerprint(rows) -> Tuple[str, str]:
    """Cheap content hash for artifact validation (mirrors
    ``hnsw._corpus_fingerprint``): shape + a ≤64-row strided sample.
    Returns ``(hexdigest, dtype_str)``. The shape check alone misses a
    same-size store whose rows changed between ``tpualign index`` and
    serve (upserts reorder/replace rows) — a stale artifact would then
    serve WRONG keys, pgvector's stale-index failure mode. Works on
    device arrays: the strided slice fetches only the sample."""
    import hashlib

    h = hashlib.sha256()
    shape = tuple(int(s) for s in rows.shape)
    h.update(np.asarray(shape, np.int64).tobytes())
    if shape[0]:
        step = max(1, shape[0] // 64)
        h.update(np.ascontiguousarray(np.asarray(rows[::step])).tobytes())
    return h.hexdigest(), str(rows.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# packed-int4 helpers (layout contract shared with
# retrieval._quantize_rows_int4: two offset-8 nibbles per byte, LOW
# nibbles dims [0, D/2), HIGH nibbles [D/2, D)). A byte of 0x88 decodes
# to (0.0, 0.0) — the all-zero padding row for packed corpora.
INT4_ZERO_BYTE = 0x88


def _unpack_int4(x):
    """(..., D/2) uint8 nibble pairs -> (..., D) fp32 (unscaled)."""
    b = x.astype(jnp.int32)
    return jnp.concatenate(
        [(b & 15) - 8, (b >> 4) - 8], axis=-1
    ).astype(jnp.float32)


def _pack_rows_int4(x):
    """(rows, D) fp32 -> ((rows, D/2) uint8, (rows,) fp32 scales): the
    jnp analogue of ``retrieval._quantize_rows_int4`` (per-row symmetric
    4-bit in [-7, 7], offset-8 nibble encoding). Requires even D."""
    d = x.shape[1]
    if d % 2:
        raise ValueError(f"int4 packing needs even embedding dim, got {d}")
    scale = jnp.maximum(
        jnp.max(jnp.abs(x), axis=1, keepdims=True) / 7.0, 1e-12
    )
    qv = jnp.clip(jnp.rint(x / scale), -7, 7).astype(jnp.int32) + 8
    packed = (qv[:, : d // 2] | (qv[:, d // 2:] << 4)).astype(jnp.uint8)
    return packed, scale.astype(jnp.float32)[:, 0]


def _unpack_int2(x):
    """(..., D/4) uint8 (four 2-bit codes per byte; plane p in bits
    [2p, 2p+1] holds dims [p*D/4, (p+1)*D/4)) -> (..., D) fp32 4-level
    values {-3,-1,1,3} (unscaled). NOTE int2 has no zero level, so
    packed-int2 PADDING rows must carry scale 0 (dequant -> 0) — a fill
    byte alone cannot decode to zero like int4's 0x88."""
    b = x.astype(jnp.int32)
    return jnp.concatenate(
        [(b >> (2 * p)) & 3 for p in range(4)], axis=-1
    ).astype(jnp.float32) * 2.0 - 3.0


def _pack_rows_int2(x):
    """(rows, D) fp32 -> ((rows, D/4) uint8, (rows,) fp32 scales): the
    jnp analogue of ``retrieval._quantize_rows_int2`` (per-row 4-level
    {-3,-1,1,3} * s/3 encoding). Requires D % 4 == 0."""
    d = x.shape[1]
    if d % 4:
        raise ValueError(
            f"int2 packing needs embedding dim divisible by 4, got {d}"
        )
    s = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True), 1e-12)
    code = jnp.clip(
        jnp.rint((x / s * 3.0 + 3.0) / 2.0), 0, 3
    ).astype(jnp.int32)
    q4 = d // 4
    packed = (
        code[:, :q4] | (code[:, q4: 2 * q4] << 2)
        | (code[:, 2 * q4: 3 * q4] << 4) | (code[:, 3 * q4:] << 6)
    ).astype(jnp.uint8)
    return packed, (s / 3.0).astype(jnp.float32)[:, 0]


def _pack_rows_chunked(x, pack_fn, block: int = 1 << 19):
    """Quantize-and-pack a large fp32 layout in row chunks: pack_fn's
    elementwise chain materializes several fp32/int32 temporaries of its
    input size, which OOMs a 16 GB chip when x is a multi-GB packed
    layout (hit at a 2M-row int2 build). The packed outputs are 4-16x
    smaller, so chunking bounds peak memory at ~block rows of
    temporaries. (Pre-quantized builds never take this path.)"""
    n = x.shape[0]
    if n <= block:
        return pack_fn(x)
    outs, scales = [], []
    for s0 in range(0, n, block):
        pb, sb = pack_fn(x[s0: s0 + block])
        outs.append(pb)
        scales.append(sb)
    return jnp.concatenate(outs), jnp.concatenate(scales)


def _unpack_packed(x, dim: int):
    """Width-dispatched unpack for packed uint8 rows: (…, D/2) = int4
    nibbles, (…, D/4) = int2 planes."""
    cols = x.shape[-1]
    if cols * 2 == dim:
        return _unpack_int4(x)
    if cols * 4 == dim:
        return _unpack_int2(x)
    raise ValueError(f"packed rows {x.shape} do not match dim {dim}")


def _max_capacity(dim: int, itemsize: int, budget: int = 12 * 2**20,
                  int8_mxu: bool = False) -> int:
    """Largest packed-cluster capacity whose kernel block fits the ~16MB
    scoped VMEM (with margin): fp32 blocks double-buffer (2 x C x d x 4);
    int8 dequant blocks add a full fp32 dequant intermediate
    (C x d x (4 + 2x1)). Measured: capacity 8256 int8 at d=512 fails AOT
    compile (19.25M > 16M scoped vmem); 4096 compiles. The int8 MXU
    variant holds NO dequant intermediate — per row just the
    double-buffered int8 block (2 x d) plus the (block_q<=64, C) s32
    accumulator + f32 sims columns (64 x 8 bytes): capacity 8192 at
    d=512 compile-probed OK on v5e (2x the dequant bound — half the
    lists, half the spill, fewer per-block fixed costs). Multiples of
    128 (lane alignment)."""
    if itemsize == 0:
        # packed int4 (the MXU nibble kernel): per row the double-
        # buffered (D/2) packed block (D bytes) + the int32 unpack
        # intermediate (2D) + the lo/hi int8 planes (D) + accumulator
        # columns — conservative until compile-probed on real Mosaic
        per_row = dim * 4 + 512
    elif int8_mxu and itemsize == 1:
        per_row = dim * 2 + 512
    else:
        per_row = dim * (8 if itemsize == 4 else 6)
    return max(128, (budget // per_row // 128) * 128)


@partial(jax.jit, static_argnames=("iters", "block", "dim"))
def _kmeans(corpus, scales, centroids, iters: int, block: int,
            dim: int | None = None):
    """Spherical k-means on device. Returns (centroids, assignment, sizes).

    ``corpus`` is ``(N, D)`` with N % block == 0 (caller pads); padding
    rows must be all-zero — they get weight 0 via their zero norm and
    cannot perturb centroids. With ``scales`` (an (N, 1) fp32 array) the
    corpus is int8 — or packed int4 ((N, D/2) uint8 nibble pairs; the
    zero padding row is 0x88 bytes) — and each block dequantizes in the
    scan body right before its matmul — the build never materializes an
    fp32 corpus, so quantized capacity extends to the index's packing
    peak, not 4-8x less. ``centroids`` is the (L, D) fp32 init (caller
    picks real rows, deterministically — build must be reproducible).
    Empty clusters keep their previous centroid.
    """
    n, cols = corpus.shape
    # unpacked width: packed uint8 corpora (int4 D/2, int2 D/4) pass it
    d = dim if (dim is not None and corpus.dtype == jnp.uint8) else cols
    n_lists = centroids.shape[0]
    n_blocks = n // block
    blocks = corpus.reshape(n_blocks, block, cols)
    sblocks = (None if scales is None
               else scales.reshape(n_blocks, block, 1))

    def deq(xb, sb):
        if xb.dtype == jnp.uint8:  # packed int4/int2 rows
            return _unpack_packed(xb, d) * sb
        if sb is None:
            return xb
        return xb.astype(jnp.float32) * sb

    def assign_block(cent, xbf, vb):
        scores = jnp.dot(xbf, cent.T, preferred_element_type=jnp.float32)
        a = jnp.argmax(scores, axis=1)
        return jnp.where(vb, a, n_lists)  # padding rows -> one-past-end

    def step(cent, _):
        def scan_body(carry, xs):
            sums, counts = carry
            xb, sb = xs
            xbf = deq(xb, sb)
            vb = jnp.sum(xbf * xbf, axis=1) > 0.0
            a = assign_block(cent, xbf, vb)
            onehot = jax.nn.one_hot(a, n_lists, dtype=jnp.float32)
            sums = sums + jnp.dot(onehot.T, xbf,
                                  preferred_element_type=jnp.float32)
            counts = counts + jnp.sum(onehot, axis=0)
            return (sums, counts), None

        (sums, counts), _ = jax.lax.scan(
            scan_body,
            (jnp.zeros((n_lists, d), jnp.float32),
             jnp.zeros((n_lists,), jnp.float32)),
            (blocks, sblocks),
        )
        new = sums / jnp.maximum(counts[:, None], 1.0)
        norm = jnp.linalg.norm(new, axis=1, keepdims=True)
        new = new / jnp.maximum(norm, 1e-12)
        keep = counts[:, None] > 0.0
        return jnp.where(keep, new, cent), None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iters)

    def final_block(_, xs):
        xb, sb = xs
        xbf = deq(xb, sb)
        vb = jnp.sum(xbf * xbf, axis=1) > 0.0
        return None, assign_block(centroids, xbf, vb)

    _, assign = jax.lax.scan(final_block, None, (blocks, sblocks))
    assign = assign.reshape(n)
    # scatter-add histogram — padding rows carry index n_lists and drop
    sizes = jnp.zeros((n_lists,), jnp.int32).at[assign].add(1, mode="drop")
    return centroids, assign, sizes


@partial(jax.jit, static_argnames=("n_lists", "capacity", "spill_blocks"))
def _pack(corpus, keys, assign, n_lists: int, capacity: int,
          spill_blocks: int):
    """Sort-by-cluster, then GATHER into the flat padded block layout.

    Returns ``(emb, keys, ids)`` — all flat with ``(L + 1 + spill_blocks)
    * capacity`` rows: blocks 0..L-1 the clusters, block L the all-masked
    zero block (kernel padding target), blocks L+1.. the spill tail. Row
    order inside a cluster is ascending original index (stable sort), so
    the layout preserves the information the two-key tie-break needs.
    Unused slots carry key -1 (matches nothing) and id -1.

    Memory: only int32 arrays are permuted by scatter; the float layout
    is produced by gathers on the final id arrays, so the peak is corpus
    + layout. ``corpus`` may carry zero padding rows (assign == n_lists):
    they sort to the tail, their dest falls beyond ``total`` and drops.
    Unused slots gather row 0 harmlessly — every scoring path masks them
    via key -1.
    """
    n, d = corpus.shape
    order = jnp.argsort(assign, stable=True)
    sa = assign[order]
    starts = jnp.searchsorted(sa, jnp.arange(n_lists), side="left")
    rank = jnp.arange(n) - starts[jnp.clip(sa, 0, n_lists - 1)]
    in_main = (rank < capacity) & (sa < n_lists)
    main_dest = jnp.clip(sa, 0, n_lists - 1) * capacity + rank
    spill_rank = jnp.cumsum(jnp.where(in_main, 0, 1)) - 1
    spill_start = (n_lists + 1) * capacity  # block L stays all-masked
    total = (n_lists + 1 + spill_blocks) * capacity
    dest = jnp.where(in_main, main_dest, spill_start + spill_rank)
    # padding rows (assign == n_lists) must NEVER land in a slot — not
    # even the spill region — so force them out of range
    dest = jnp.where(sa < n_lists, dest, total)
    pids = jnp.full((total,), -1, jnp.int32).at[dest].set(
        order.astype(jnp.int32), mode="drop"
    )
    pkeys = jnp.full((total,), -1, jnp.int32).at[dest].set(
        keys[order], mode="drop"
    )
    pemb = corpus[jnp.maximum(pids, 0)]
    return pemb, pkeys, pids


class IVFIndex:
    """Cluster-probed approximate index (pgvector IVFFlat equivalent).

    Build: ``IVFIndex(corpus, manuals, pages, n_lists=..., n_probes=...)``.
    Search mirrors :class:`~tpualign.parallel.retrieval.RetrievalIndex`:
    ``search(queries, manuals, pages, k)`` with the same (manual, page)
    candidate restriction, wildcard global mode, and (-inf, -1) sentinel
    rows. With ``mesh`` (data axis > 1) the index shards FAISS-style:
    rows split across devices, each shard k-means its own ``n_lists /
    n_devices`` lists and probes them locally (``n_probes`` per shard),
    and the exact two-key cross-shard merge picks the global top-k —
    beyond-HBM corpora with probed-QPS on every shard.

    Defaults follow IVFFlat practice: ``n_lists ~ sqrt(N)`` (the reference
    hard-codes ``lists=100``, tuned for nothing in particular —
    ref:src/setup_vector_db.py:181) and ``n_probes = max(1, n_lists//8)``.
    """

    def __init__(
        self,
        corpus_embeddings,
        corpus_manuals: Optional[Sequence[str]] = None,
        corpus_pages: Optional[Sequence[Optional[int]]] = None,
        n_lists: Optional[int] = None,
        n_probes: Optional[int] = None,
        iters: int = 10,
        capacity_factor: float = 1.5,
        keys: Optional[np.ndarray] = None,
        query_block: int = 64,
        cluster_chunk: int = 8,
        precision: str = "fp32",
        use_kernel: Optional[bool] = None,
        corpus_scales=None,
        int8_mxu: Optional[bool] = None,
        mesh=None,
        refine: int = 0,
        refine_store=None,
    ):
        if precision not in ("fp32", "int8", "int4", "int2"):
            raise ValueError(
                f"precision must be fp32|int8|int4|int2, got {precision}"
            )
        self.vocab: Dict[str, int] = {}
        # mesh (data axis > 1): rows shard across devices; every shard
        # k-means its LOCAL rows into n_lists/n_devices lists, searches
        # its local packed layout (n_probes applies PER SHARD), and the
        # exact two-key cross-shard merge picks the global top-k — the
        # FAISS-style sharded-IVF schedule, riding the same winners-only
        # ICI traffic as the exact mesh strategies.
        self.mesh = (mesh if mesh is not None
                     and dict(mesh.shape).get("data", 1) > 1 else None)
        # None = auto: kernel on TPU, XLA path elsewhere. True forces the
        # kernel (interpret mode off-TPU — tests pin kernel semantics).
        self.use_kernel = use_kernel
        # int8 layouts as s8 x s8 -> s32 MXU matmuls (queries quantized
        # per dispatch). Default (None) = auto: ON when searches run on
        # TPU — measured 1.7-2x the VMEM-dequant path on v5e at N=2M
        # (benchmarks/ab_ivf_int8.py) AND more accurate (the dequant fp32
        # dot lowers to bf16 MXU passes, ~1.8e-3 score error vs the exact
        # integer dot's ~8.5e-4 query-side quantization). The dequant
        # path remains for interpret-mode oracles / non-TPU.
        from tpualign.parallel.retrieval import _use_int8_mxu

        self.int8_mxu = (_use_int8_mxu() if int8_mxu is None
                         else bool(int8_mxu))
        corpus = jnp.asarray(corpus_embeddings)
        if corpus.dtype == jnp.int8:
            # pre-quantized corpus (per-row symmetric scales): the build
            # dequantizes blockwise inside k-means and packs int8 rows
            # directly — no fp32 corpus copy ever exists, so single-chip
            # capacity is bounded by corpus + int8 layout, not 4x more
            if corpus_scales is None:
                raise ValueError("int8 corpus needs corpus_scales")
            precision = "int8"
            scales_in = jnp.asarray(corpus_scales, jnp.float32).reshape(-1, 1)
        elif corpus.dtype == jnp.uint8:
            # pre-quantized PACKED corpus: int4 ((N, D/2) offset-8 nibble
            # pairs) by default, int2 ((N, D/4) 2-bit planes) when the
            # caller says precision="int2" — the packed widths are
            # ambiguous without the hint. k-means unpacks blockwise in
            # its scan body; the layout packs the bytes directly — the
            # 8x/16x-capacity build never holds fp32 rows
            if corpus_scales is None:
                raise ValueError("packed corpus needs corpus_scales")
            if precision != "int2":
                precision = "int4"
            scales_in = jnp.asarray(corpus_scales, jnp.float32).reshape(-1, 1)
        else:
            corpus = corpus.astype(jnp.float32)
            scales_in = None
        self.precision = precision
        # content fingerprint of the (post-cast) build corpus: save()
        # writes it so load() can reject a stale artifact whose store
        # changed without changing size; mutations (add/compact) clear
        # it — the packed layout then no longer mirrors any store
        # snapshot, and a post-mutation save falls back to shape checks
        self._corpus_fp = _corpus_fingerprint(corpus)
        self.n, d_cols = corpus.shape
        if corpus.dtype == jnp.uint8:
            self.dim = d_cols * (4 if precision == "int2" else 2)
        else:
            self.dim = d_cols
        if self.n == 0:
            raise ValueError("IVFIndex needs a non-empty corpus")
        # host rescore rows for the exact refine stage (see
        # retrieval._RefineCorpus — ram/fp16/memmap storage modes); only
        # a quantized first stage needs
        # its candidate scores corrected
        self._refine_store = refine_store
        self.refine, self._refine_corpus = _setup_refine(
            refine, precision, corpus_embeddings,
            prequantized=scales_in is not None, store=refine_store,
        )
        if keys is not None:
            keys = jnp.asarray(keys, jnp.int32)
        elif corpus_manuals is not None:
            hk, self.vocab = encode_keys(
                corpus_manuals, corpus_pages, self.vocab
            )
            keys = jnp.asarray(hk)
        else:
            keys = jnp.zeros((self.n,), jnp.int32)

        if self.mesh is not None:
            self._build_sharded(
                corpus, keys, scales_in, n_lists, n_probes, int(iters),
                capacity_factor, query_block, cluster_chunk,
            )
            return

        if n_lists is None:
            n_lists = max(8, min(_round_up(int(self.n ** 0.5), 8), self.n))
        # keep cluster blocks inside the kernel's VMEM budget: too-few
        # lists would either blow the scoped-vmem compile (measured) or
        # dump whole clusters into the everyone-scans spill tail
        max_cap = _max_capacity(
            self.dim,
            {"int8": 1, "int4": 0, "int2": 0}.get(precision, 4),
            int8_mxu=self.int8_mxu and precision == "int8",
        )
        min_lists = -(-int(np.ceil(capacity_factor * self.n)) // max_cap)
        if n_lists < min_lists:
            bumped = min(_round_up(min_lists, 8), self.n)
            log.info(
                "IVF: n_lists %d would give cluster capacity ~%d > the "
                "%d-row VMEM bound at d=%d; using %d lists",
                n_lists, int(capacity_factor * self.n / n_lists), max_cap,
                self.dim, bumped,
            )
            n_lists = bumped
        self.n_lists = int(n_lists)
        self.n_probes = (
            max(1, self.n_lists // 8) if n_probes is None
            else min(int(n_probes), self.n_lists)
        )
        self.query_block = int(query_block)
        self.cluster_chunk = max(1, int(cluster_chunk))

        # ---- build: k-means (blockwise), then size + pack the layout ----
        # padded arrays flow end-to-end (k-means AND pack) so no slice
        # copy of the corpus is ever made; padding rows carry assign ==
        # n_lists and key -1 and drop out inside _pack
        # prefer a block that DIVIDES n (no padded corpus copy at all);
        # fall back to 2^14 with zero padding
        block = 1 << 14
        while block > self.n:
            block //= 2
        block = max(block, 8)
        if self.n % block:
            for b in range(min(1 << 14, self.n), 1023, -1):
                if b % 8 == 0 and self.n % b == 0:
                    block = b
                    break
        n_pad = _round_up(self.n, block)
        scales_p = scales_in
        if n_pad > self.n:
            # packed int4 padding decodes to 0.0 via 0x88, so the
            # zero-norm validity check in k-means still drops it
            pad_fill = (INT4_ZERO_BYTE if corpus.dtype == jnp.uint8
                        else 0)
            corpus_p = jnp.concatenate(
                [corpus,
                 jnp.full((n_pad - self.n, corpus.shape[1]), pad_fill,
                          corpus.dtype)]
            )
            keys_p = jnp.concatenate(
                [keys, jnp.full((n_pad - self.n,), -1, jnp.int32)]
            )
            if scales_in is not None:
                # int2 has no zero level: padding rows dequant to zero
                # via scale 0 (int4's 0x88 fill decodes to zero on its
                # own, so its pad scale value never mattered)
                pad_scale = 0.0 if precision == "int2" else 1.0
                scales_p = jnp.concatenate(
                    [scales_in,
                     jnp.full((n_pad - self.n, 1), pad_scale, jnp.float32)]
                )
        else:
            corpus_p = corpus
            keys_p = keys
        del corpus  # the padded buffer is the only live corpus copy
        # deterministic strided init over REAL rows (padding is all-zero
        # and must never seed a centroid)
        init_idx = (np.arange(self.n_lists, dtype=np.int64) * self.n
                    ) // self.n_lists
        init_idx = jnp.asarray(init_idx)
        init_rows = corpus_p[init_idx]
        init_cent = (_unpack_packed(init_rows, self.dim)
                     if init_rows.dtype == jnp.uint8
                     else init_rows.astype(jnp.float32))
        if scales_p is not None:
            init_cent = init_cent * scales_p[init_idx]
        centroids, assign, sizes = _kmeans(
            corpus_p, scales_p, init_cent, int(iters), block, dim=self.dim
        )
        sizes = np.asarray(sizes)  # (L,) — the only host fetch at build
        avg = self.n / self.n_lists
        # capacity is a multiple of 128: lane alignment for the kernel's
        # (1, capacity) key blocks (and int8 sublane tiling)
        cap = _round_up(max(1, int(np.ceil(capacity_factor * avg))), 128)
        cap = min(cap, _round_up(int(sizes.max()), 128), max_cap)
        overflow = int(np.maximum(sizes - cap, 0).sum())
        self.capacity = cap
        self.spill = overflow
        self.spill_blocks = max(1, -(-overflow // cap))
        if overflow:
            log.info(
                "IVF build: %d/%d rows spilled past cluster capacity %d "
                "(scanned exactly by every query)", overflow, self.n, cap
            )
        self.centroids = centroids
        # flat block layout: whole-cluster DMAs/gathers read contiguous
        # (C*D)-float runs; block L is the all-masked kernel padding
        # target; blocks L+1.. hold the spill tail
        pemb, self._keys, self._ids = _pack(
            corpus_p, keys_p, assign, self.n_lists, cap, self.spill_blocks,
        )
        del corpus_p, keys_p, assign
        if scales_p is not None:
            # pre-quantized corpus: pack the scales along the same layout
            self._emb = pemb
            self._scales = scales_p[jnp.maximum(self._ids, 0), 0]
            del scales_p
        elif precision == "int8":
            scales = jnp.maximum(
                jnp.max(jnp.abs(pemb), axis=1, keepdims=True) / 127.0,
                1e-12,
            )
            self._emb = jnp.clip(
                jnp.rint(pemb / scales), -127, 127
            ).astype(jnp.int8)
            self._scales = scales.astype(jnp.float32)[:, 0]
            del pemb
        elif precision == "int4":
            self._emb, self._scales = _pack_rows_chunked(
                pemb, _pack_rows_int4)
            del pemb
        elif precision == "int2":
            self._emb, self._scales = _pack_rows_chunked(
                pemb, _pack_rows_int2)
            del pemb
        else:
            self._emb = pemb
            self._scales = None

    # -- sharded (mesh) build/search --------------------------------------------

    def _build_sharded(self, corpus, keys, scales_in, n_lists, n_probes,
                       iters: int, capacity_factor: float,
                       query_block: int, cluster_chunk: int) -> None:
        """Per-shard IVF over the mesh's ``data`` axis: rows shard into
        contiguous chunks, each shard k-means its own rows into
        ``n_lists/n_devices`` lists (one shard_map — no DCN/ICI traffic
        during the build beyond the initial placement), layouts pack with
        a GLOBALLY uniform capacity/spill geometry (shard_map needs
        identical static shapes per device), and searches sweep each
        shard's own probed union. Recall semantics: a true neighbor is
        found iff its cluster is probed ON ITS SHARD (or it spilled) —
        ``n_probes`` applies per shard, so the scanned fraction matches
        the single-device index at equal n_probes/n_lists ratio."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self.mesh
        ndev = int(dict(mesh.shape)["data"])
        itemsize = {"int8": 1, "int4": 0, "int2": 0}.get(self.precision, 4)
        max_cap = _max_capacity(
            self.dim, itemsize,
            int8_mxu=self.int8_mxu and self.precision == "int8",
        )

        # per-shard rows, padded so a k-means block divides them exactly
        n_local = -(-self.n // ndev)
        block = 1 << 14
        while block > n_local:
            block //= 2
        block = max(block, 8)
        n_local = _round_up(n_local, block)
        n_pad = n_local * ndev
        self._n_local = n_local
        if n_pad > self.n:
            pad_fill = (INT4_ZERO_BYTE if corpus.dtype == jnp.uint8
                        else 0)
            corpus = jnp.concatenate(
                [corpus,
                 jnp.full((n_pad - self.n, corpus.shape[1]), pad_fill,
                          corpus.dtype)]
            )
            keys = jnp.concatenate(
                [keys, jnp.full((n_pad - self.n,), -1, jnp.int32)]
            )
            if scales_in is not None:
                pad_scale = 0.0 if self.precision == "int2" else 1.0
                scales_in = jnp.concatenate(
                    [scales_in,
                     jnp.full((n_pad - self.n, 1), pad_scale,
                              jnp.float32)]
                )

        if n_lists is None:
            n_lists = max(8 * ndev,
                          min(_round_up(int(self.n ** 0.5), 8), self.n))
        ll = max(8, _round_up(-(-int(n_lists) // ndev), 8))
        min_ll = -(-int(np.ceil(capacity_factor * n_local)) // max_cap)
        ll = max(ll, _round_up(min_ll, 8))
        self.n_lists_local = ll
        self.n_lists = ll * ndev
        self.n_probes = (
            max(1, ll // 8) if n_probes is None else min(int(n_probes), ll)
        )
        self.query_block = int(query_block)
        self.cluster_chunk = max(1, int(cluster_chunk))

        row_sh = NamedSharding(mesh, P("data"))
        mat_sh = NamedSharding(mesh, P("data", None))
        corpus = jax.device_put(corpus, mat_sh)
        keys = jax.device_put(keys, row_sh)
        if scales_in is not None:
            scales_in = jax.device_put(scales_in, mat_sh)

        init_idx = jnp.asarray(
            (np.arange(ll, dtype=np.int64) * n_local) // ll
        )

        has_sc = scales_in is not None

        dim = self.dim

        def kmeans_body(c_l, s_l):
            if not has_sc:
                s_l = None  # dummy arg: shard_map args must be arrays
            rows = c_l[init_idx]
            init = (_unpack_packed(rows, dim) if rows.dtype == jnp.uint8
                    else rows.astype(jnp.float32))
            if s_l is not None:
                init = init * s_l[init_idx]
            return _kmeans(c_l, s_l, init, iters, block, dim=dim)

        in_specs = (P("data", None), P("data", None) if has_sc else P())
        cent, assign, sizes = jax.jit(jax.shard_map(
            kmeans_body, mesh=mesh, in_specs=in_specs,
            out_specs=(P("data", None), P("data"), P("data")),
            # scan carries start as fresh (unvarying) zeros; skip the
            # varying-manual-axes check like the streaming search path
            check_vma=False,
        ))(corpus, scales_in if has_sc
           else jnp.zeros((1, 1), jnp.float32))
        sizes = np.asarray(sizes).reshape(ndev, ll)
        avg = n_local / ll
        cap = _round_up(max(1, int(np.ceil(capacity_factor * avg))), 128)
        cap = min(cap, _round_up(int(sizes.max()), 128), max_cap)
        overflow = np.maximum(sizes - cap, 0).sum(axis=1)  # per shard
        self.capacity = cap
        self.spill = int(overflow.sum())
        self.spill_blocks = max(1, -(-int(overflow.max()) // cap))
        if self.spill:
            log.info(
                "sharded IVF build: %d/%d rows spilled past capacity %d "
                "(max %d on one shard)", self.spill, self.n, cap,
                int(overflow.max()),
            )
        self.centroids = cent  # (ndev*ll, D), row-sharded

        def pack_body(c_l, k_l, a_l):
            # ids are stored GLOBAL (unlike the shard-local values _pack
            # emits): incremental adds route new global ids to any shard,
            # and _positions/_probe_depths/removes read them uniformly
            pemb, pkeys, pids = _pack(c_l, k_l, a_l, ll, cap,
                                      self.spill_blocks)
            off = jax.lax.axis_index("data").astype(jnp.int32) * n_local
            return pemb, pkeys, jnp.where(pids >= 0, pids + off, -1)

        pemb, self._keys, self._ids = jax.jit(jax.shard_map(
            pack_body, mesh=mesh,
            in_specs=(P("data", None), P("data"), P("data")),
            out_specs=(P("data", None), P("data"), P("data")),
            check_vma=False,
        ))(corpus, keys, assign)
        del corpus, keys, assign
        if scales_in is not None:
            self._emb = pemb
            # gather each shard's scales from its own rows inside
            # shard_map (a plain global gather here would fetch shard 0's
            # scales for every shard — r3 regression test pins this); the
            # stored ids are global, so localize them against the shard
            # offset first
            def scale_body(s_l, i_l):
                off = jax.lax.axis_index("data").astype(jnp.int32) * n_local
                return s_l[jnp.maximum(i_l - off, 0), 0]

            self._scales = jax.jit(jax.shard_map(
                scale_body,
                mesh=mesh, in_specs=(P("data", None), P("data")),
                out_specs=P("data"), check_vma=False,
            ))(scales_in, self._ids)
        elif self.precision == "int8":
            scales = jnp.maximum(
                jnp.max(jnp.abs(pemb), axis=1, keepdims=True) / 127.0,
                1e-12,
            )
            self._emb = jnp.clip(
                jnp.rint(pemb / scales), -127, 127
            ).astype(jnp.int8)
            self._scales = scales.astype(jnp.float32)[:, 0]
            del pemb
        elif self.precision == "int4":
            self._emb, self._scales = _pack_rows_int4(pemb)
            del pemb
        elif self.precision == "int2":
            self._emb, self._scales = _pack_rows_int2(pemb)
            del pemb
        else:
            self._emb = pemb
            self._scales = None
        self._sharded_cache: Dict = {}

    def _sharded_search_fn(self, k: int, p: int, exact_ties: bool):
        from jax.sharding import PartitionSpec as P

        key = (k, p, exact_ties)
        cached = self._sharded_cache.get(key)
        if cached is not None:
            return cached
        ll, cap, sb = self.n_lists_local, self.capacity, self.spill_blocks
        chunk = self.cluster_chunk
        kernel_path = self._kernel_path(exact_ties, k)
        int8_mxu = self.int8_mxu
        has_scales = self._scales is not None

        def body(q, qk, cent_l, pemb_l, pkeys_l, pids_l, pscales_l):
            if not has_scales:
                pscales_l = None
            if kernel_path:
                vals, idx = _ivf_kernel_search(
                    q, qk, cent_l, pemb_l, pkeys_l, pids_l, pscales_l,
                    k, p, ll, cap, sb, chunk, exact_ties,
                    int8_mxu=int8_mxu,
                )
            else:
                vals, idx = _ivf_union_search(
                    q, qk, cent_l, pemb_l, pkeys_l, pids_l, pscales_l,
                    k, p, ll, cap, sb, chunk, exact_ties,
                )
            # packed ids are stored global already; -1 stays the sentinel
            return vals[None], idx[None]

        in_specs = (P(), P(), P("data", None), P("data", None),
                    P("data"), P("data"),
                    P("data") if has_scales else P())
        mapped = jax.shard_map(
            body, mesh=self.mesh, in_specs=in_specs,
            out_specs=(P("data", None, None), P("data", None, None)),
            # pallas_call does not annotate varying-mesh-axes metadata on
            # its outputs; the specs pin the layout explicitly
            check_vma=False,
        )

        from tpualign.parallel.retrieval import _merge_gathered

        @jax.jit
        def run(q, qk, cent, pemb, pkeys, pids, pscales):
            lv, li = mapped(q, qk, cent, pemb, pkeys, pids, pscales)
            return _merge_gathered(lv, li, q.shape[0], k)

        self._sharded_cache[key] = run
        return run

    # -- incremental inserts -----------------------------------------------------

    def add(
        self,
        embeddings,
        manuals: Optional[Sequence[str]] = None,
        pages: Optional[Sequence[Optional[int]]] = None,
    ) -> None:
        """Incremental insert, classic IVFFlat semantics (pgvector
        absorbs ``INSERT``s into existing lists without retraining,
        ref:src/setup_vector_db.py:155-190): each new row joins its
        nearest centroid's packed block (appended after the block's used
        slots — intra-cluster ascending-id order is preserved), rows
        that land in a FULL block go to the spill tail (scanned exactly
        by every query, so full-probe search stays bit-exact over the
        combined corpus), and a full spill tail grows by whole blocks
        (one-time kernel recompile, logged). Centroids are NOT
        retrained — standard IVF insert behavior; recall drifts only as
        the data distribution does (recalibrate with
        :meth:`calibrate` after bulk drift).

        Works on a mesh too (r3 late): each new row routes to its
        globally nearest centroid's shard+list (FAISS-style per-shard
        list routing — the row is probed exactly like a built one),
        overflow goes to the OWNING shard's spill tail, and tail growth
        keeps the per-shard geometry uniform (shard_map needs identical
        static shapes), so one shard's overflow grows every shard's tail
        by the same block count."""
        rows = np.asarray(embeddings, np.float32)
        if rows.ndim != 2 or rows.shape[1] != self.dim:
            raise ValueError(
                f"embeddings must be (M, {self.dim}); got {rows.shape}"
            )
        m = len(rows)
        if m == 0:
            return
        if manuals is not None:
            new_keys, _ = encode_keys(manuals, pages, self.vocab)
        else:
            new_keys = np.zeros((m,), np.int32)
        if self.mesh is not None:
            self._add_sharded(rows, np.asarray(new_keys, np.int32))
            return

        # nearest centroid per new row (one device matmul)
        assign = np.asarray(jnp.argmax(
            jnp.dot(jnp.asarray(rows), self.centroids.T,
                    preferred_element_type=jnp.float32), axis=1,
        ))
        cap, L = self.capacity, self.n_lists
        used = np.asarray(jnp.sum(
            self._keys.reshape(-1, cap) != -1, axis=1,
        ))  # per packed block; used slots are contiguous from slot 0

        order = np.argsort(assign, kind="stable")
        a_sorted = assign[order]
        starts = np.searchsorted(a_sorted, np.arange(L), side="left")
        rank = np.arange(m) - starts[a_sorted]
        slot = used[a_sorted] + rank
        in_main = slot < cap
        dest_sorted = a_sorted.astype(np.int64) * cap + slot

        emb, keys_arr = self._emb, self._keys
        ids_arr, scales_arr = self._ids, self._scales
        spill_blocks = self.spill_blocks
        n_over = int((~in_main).sum())
        if n_over:
            spill_start = (L + 1) * cap
            spill_used = int(used[L + 1:].sum())  # tail fills contiguously
            need = spill_start + spill_used + n_over
            total = ids_arr.shape[0]
            if need > total:
                add_blocks = -(-(need - total) // cap)
                grow = add_blocks * cap
                pad_fill = (INT4_ZERO_BYTE
                            if emb.dtype == jnp.uint8 else 0)
                emb = jnp.concatenate(
                    [emb, jnp.full((grow, emb.shape[1]), pad_fill,
                                   emb.dtype)]
                )
                keys_arr = jnp.concatenate(
                    [keys_arr, jnp.full((grow,), -1, jnp.int32)]
                )
                ids_arr = jnp.concatenate(
                    [ids_arr, jnp.full((grow,), -1, jnp.int32)]
                )
                if scales_arr is not None:
                    scales_arr = jnp.concatenate(
                        [scales_arr, jnp.ones((grow,), jnp.float32)]
                    )
                spill_blocks += add_blocks
                log.info(
                    "IVF add: spill tail grew by %d block(s) to hold %d "
                    "overflow row(s) — searches recompile once",
                    add_blocks, n_over,
                )
            dest_sorted[~in_main] = (spill_start + spill_used
                                     + np.arange(n_over))
        dest = np.empty(m, np.int64)
        dest[order] = dest_sorted

        new_rows, new_scales = self._quantize_new_rows(rows)

        d_dev = jnp.asarray(dest)
        emb = emb.at[d_dev].set(jnp.asarray(new_rows))
        keys_arr = keys_arr.at[d_dev].set(jnp.asarray(new_keys, jnp.int32))
        ids_arr = ids_arr.at[d_dev].set(
            jnp.asarray(np.arange(self.n, self.n + m), jnp.int32)
        )
        if scales_arr is not None:
            scales_arr = scales_arr.at[d_dev].set(
                jnp.asarray(new_scales, jnp.float32)
            )
        # one C-level swap: racing searches see the old or the new field
        # set, never a shape-mismatched mix; the lazy positions cache
        # drops with the same swap
        state = {
            "_emb": emb, "_keys": keys_arr, "_ids": ids_arr,
            "_scales": scales_arr, "n": self.n + m,
            "spill": self.spill + n_over, "spill_blocks": spill_blocks,
        }
        if self._refine_corpus is not None:
            state["_refine_corpus"] = self._refine_corpus.appended(rows)
        state["_corpus_fp"] = None  # layout no longer mirrors a store snapshot
        self.__dict__.pop("_positions_cache", None)
        self.__dict__.update(state)

    def _quantize_new_rows(self, rows: np.ndarray):
        """New fp32 rows on the index's own quantization grid — per-row
        symmetric scales, identical to the build's, so full-probe search
        over an added index matches a fresh combined build bit-for-bit."""
        if self.precision == "int8":
            s = np.maximum(np.abs(rows).max(axis=1, keepdims=True) / 127.0,
                           1e-12)
            new_rows = np.clip(np.rint(rows / s), -127, 127).astype(np.int8)
            return new_rows, s.astype(np.float32)[:, 0]
        if self.precision == "int4":
            return _pack_rows_int4(jnp.asarray(rows))
        if self.precision == "int2":
            return _pack_rows_int2(jnp.asarray(rows))
        return rows, None

    def _add_sharded(self, rows: np.ndarray, new_keys: np.ndarray) -> None:
        """Mesh insert: route each row to its globally nearest
        centroid's shard+list (per-shard list routing), append after the
        block's used slots, overflow to the owning shard's spill tail.
        Geometry stays uniform across shards (shard_map requires equal
        static shapes), so tail growth adds the same whole blocks to
        every shard via a shard-local reshape+concat (never the host
        link). All writes are sharding-pinned jits; the all-new-array
        swap keeps racing searches consistent."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self.mesh
        ndev = int(dict(mesh.shape)["data"])
        ll, cap = self.n_lists_local, self.capacity
        m = len(rows)

        # globally nearest centroid -> (shard, local list); centroids are
        # row-sharded (ndev*ll, D), the matmul is one small dispatch
        assign = np.asarray(jnp.argmax(
            jnp.dot(jnp.asarray(rows), self.centroids.T,
                    preferred_element_type=jnp.float32), axis=1,
        ))
        blocks = ll + 1 + self.spill_blocks  # per-shard packed blocks
        used = np.asarray(jnp.sum(
            self._keys.reshape(-1, cap) != -1, axis=1,
        )).reshape(ndev, blocks)

        order = np.argsort(assign, kind="stable")  # ascending id in list
        a_sorted = assign[order]
        sh_sorted = a_sorted // ll
        ls_sorted = a_sorted % ll
        starts = np.searchsorted(a_sorted, np.arange(ndev * ll),
                                 side="left")
        rank = np.arange(m) - starts[a_sorted]
        slot = used[sh_sorted, ls_sorted] + rank
        in_main = slot < cap
        over = ~in_main

        # per-shard spill occupancy + per-row within-shard spill rank
        spill_used = used[:, ll + 1:].sum(axis=1)  # tails fill contiguously
        n_over_sh = np.zeros(ndev, np.int64)
        spill_rank = np.zeros(m, np.int64)
        for s in np.unique(sh_sorted[over]):
            sel = over & (sh_sorted == s)
            n_over_sh[s] = sel.sum()
            spill_rank[sel] = np.arange(n_over_sh[s])
        n_over = int(over.sum())

        emb, keys_arr = self._emb, self._keys
        ids_arr, scales_arr = self._ids, self._scales
        spill_blocks = self.spill_blocks
        need = spill_used + n_over_sh
        if int(need.max()) > spill_blocks * cap:
            add_blocks = -(-(int(need.max()) - spill_blocks * cap) // cap)
            grow = add_blocks * cap  # rows per shard
            pad_fill = INT4_ZERO_BYTE if emb.dtype == jnp.uint8 else 0
            per_shard = blocks * cap
            emb = self._grow_sharded(emb, ndev, per_shard, grow, pad_fill,
                                     P("data", None))
            keys_arr = self._grow_sharded(keys_arr, ndev, per_shard, grow,
                                          -1, P("data"))
            ids_arr = self._grow_sharded(ids_arr, ndev, per_shard, grow,
                                         -1, P("data"))
            if scales_arr is not None:
                scales_arr = self._grow_sharded(scales_arr, ndev,
                                                per_shard, grow, 1.0,
                                                P("data"))
            spill_blocks += add_blocks
            blocks += add_blocks
            log.info(
                "sharded IVF add: spill tails grew by %d block(s) per "
                "shard to hold %d overflow row(s) — searches recompile "
                "once", add_blocks, n_over,
            )

        total_local = blocks * cap
        dest_sorted = (sh_sorted.astype(np.int64) * total_local
                       + ls_sorted * cap + slot)
        dest_sorted[over] = (sh_sorted[over].astype(np.int64) * total_local
                             + (ll + 1) * cap
                             + spill_used[sh_sorted[over]]
                             + spill_rank[over])
        dest = np.empty(m, np.int64)
        dest[order] = dest_sorted

        new_rows, new_scales = self._quantize_new_rows(rows)
        d_dev = jnp.asarray(dest)

        def scatter(a, upd, spec):
            return self._pinned_jit(
                "scatter", lambda: (lambda aa, ii, uu: aa.at[ii].set(uu)),
                spec,
            )(a, d_dev, jnp.asarray(upd))

        emb = scatter(emb, new_rows, P("data", None))
        keys_arr = scatter(keys_arr, np.asarray(new_keys, np.int32),
                           P("data"))
        ids_arr = scatter(ids_arr,
                          np.arange(self.n, self.n + m, dtype=np.int32),
                          P("data"))
        if scales_arr is not None:
            scales_arr = scatter(scales_arr,
                                 np.asarray(new_scales, np.float32),
                                 P("data"))
        state = {
            "_emb": emb, "_keys": keys_arr, "_ids": ids_arr,
            "_scales": scales_arr, "n": self.n + m,
            "spill": self.spill + n_over, "spill_blocks": spill_blocks,
        }
        if self._refine_corpus is not None:
            state["_refine_corpus"] = self._refine_corpus.appended(rows)
        if spill_blocks != self.spill_blocks:
            # cached sharded search fns close over the OLD spill_blocks
            # (a static kernel arg) — drop them with the same swap
            state["_sharded_cache"] = {}
        state["_corpus_fp"] = None  # layout no longer mirrors a store snapshot
        self.__dict__.pop("_positions_cache", None)
        self.__dict__.update(state)

    def _pinned_jit(self, key, make_fn, spec):
        """Per-instance cache of sharding-pinned mutation jits (same
        rationale as ``RetrievalIndex._pinned_jit``): a fresh
        ``jax.jit(lambda ...)`` every call would retrace and recompile
        every add; one cached wrapper per (key, spec) reuses executables
        across repeated same-shape adds. ``key`` must include any value
        the traced function CLOSES OVER (geometry, fill) — the closure
        is frozen into the cached wrapper."""
        from jax.sharding import NamedSharding

        cache = self.__dict__.setdefault("_pinned_jit_cache", {})
        fn = cache.get((key, spec))
        if fn is None:
            fn = jax.jit(make_fn(),
                         out_shardings=NamedSharding(self.mesh, spec))
            cache[(key, spec)] = fn
        return fn

    def _grow_sharded(self, arr, ndev: int, per_shard: int, grow: int,
                      fill, spec):
        """Append ``grow`` fill rows INSIDE every shard's region (after
        its last block), sharding-pinned: the reshape exposes the shard
        axis, so the concat is shard-local — no host transfer, no
        cross-device traffic."""
        def make():
            def fn(a):
                al = a.reshape(ndev, per_shard, *a.shape[1:])
                pad = jnp.full((ndev, grow, *a.shape[1:]), fill, a.dtype)
                return jnp.concatenate([al, pad], axis=1).reshape(
                    ndev * (per_shard + grow), *a.shape[1:])
            return fn

        return self._pinned_jit(
            ("grow", ndev, per_shard, grow, fill), make, spec,
        )(arr)

    def remove(self, corpus_ids) -> int:
        """Tombstone rows by corpus id (pgvector ``DELETE`` parity):
        the packed slot's key becomes -2 — a reserved query-padding
        value no query key can equal — so the row can never be returned,
        while the slot stays allocated (``!= -1``), preserving the
        used-slots-are-contiguous invariant :meth:`add` relies on.
        Slots are reclaimed by :meth:`compact` (pgvector's VACUUM) or
        a rebuild. Returns the number of rows newly
        tombstoned; unknown / already-removed ids are ignored. Works on
        a mesh too (r3 late): packed ids are global, so the key scatter
        lands in the owning shard (sharding-pinned — reshards nothing)."""
        ids = np.unique(np.asarray(corpus_ids, np.int64))
        ids = ids[(ids >= 0) & (ids < self.n)]
        if ids.size == 0:
            return 0
        pos = jnp.asarray(self._positions_of(ids))
        # guard against a stale position (id re-added after a remove maps
        # ambiguously): only tombstone slots that actually hold the id
        live = self._ids[pos] == jnp.asarray(ids, jnp.int32)
        before = self._keys[pos]
        tgt = jnp.where(live, pos, self._keys.shape[0])
        if self.mesh is None:
            keys = self._keys.at[tgt].set(-2, mode="drop")
        else:
            from jax.sharding import PartitionSpec as P

            keys = self._pinned_jit(
                "tomb",
                lambda: (lambda kk, ii: kk.at[ii].set(-2, mode="drop")),
                P("data"),
            )(self._keys, tgt)
        removed = int(jnp.sum(live & (before != -2)))
        self.__dict__.update({"_keys": keys})
        return removed

    @property
    def dead(self) -> int:
        """Tombstoned rows awaiting :meth:`compact` (pgvector's dead
        tuples; /stats reports this so operators know when to VACUUM)."""
        return int(jnp.sum(self._keys == -2))

    def compact(self) -> np.ndarray:
        """Reclaim tombstoned slots WITHOUT re-running k-means —
        pgvector's VACUUM analogue for the IVF rung
        (ref:src/setup_vector_db.py:171-190). Survivors re-pack around
        the EXISTING centroids: main-block rows keep their list, spill
        rows reassign to their nearest centroid (a shrunken corpus
        re-absorbs its spill), and everything renumbers ``0..L-1`` in
        ascending old-id order. Returns the ascending surviving old
        ids (the serving layer remaps its id-aligned state). Capacity
        is kept, so probe/recall semantics are unchanged; the spill
        tail re-sizes (shrinking reclaims whole blocks). Quantized rows
        move untouched — no requantization. Works on a mesh too
        (:meth:`_compact_sharded`)."""
        if self.mesh is not None:
            return self._compact_sharded()
        ids_h = np.asarray(self._ids)
        keys_h = np.asarray(self._keys)
        live_slots = np.flatnonzero((ids_h >= 0) & (keys_h != -2))
        live_old = np.sort(ids_h[live_slots]).astype(np.int64)
        n_new = int(live_old.size)
        if n_new == 0:
            raise ValueError(
                "compact would empty the index — rebuild from the store "
                "instead"
            )
        pos = np.asarray(self._positions_of(live_old))
        d_pos = jnp.asarray(pos)
        emb_rows = self._emb[d_pos]  # ascending old-id order
        key_rows = jnp.asarray(keys_h[pos], jnp.int32)
        scale_rows = (self._scales[d_pos]
                      if self._scales is not None else None)
        # main-block rows keep their list; spill rows get their nearest
        # existing centroid (one small matmul over just the spill)
        blk = pos // self.capacity
        assign = np.where(blk < self.n_lists, blk, -1).astype(np.int32)
        spill_sel = np.flatnonzero(assign < 0)
        if spill_sel.size:
            sp = _dequant(
                emb_rows[jnp.asarray(spill_sel)],
                None if scale_rows is None
                else scale_rows[jnp.asarray(spill_sel)][:, None],
                dim=self.dim,
            )
            assign[spill_sel] = np.asarray(jnp.argmax(
                jnp.dot(sp, self.centroids.T,
                        preferred_element_type=jnp.float32), axis=1,
            ))
        sizes = np.bincount(assign, minlength=self.n_lists)
        overflow = int(np.maximum(sizes - self.capacity, 0).sum())
        spill_blocks = max(1, -(-overflow // self.capacity))
        pemb, pkeys, pids = _pack(
            emb_rows, key_rows, jnp.asarray(assign),
            self.n_lists, self.capacity, spill_blocks,
        )
        # _pack's positional ids into emb_rows ARE the new ids (ascending
        # old-id order), so the renumbering falls out of the gather
        state = {
            "_emb": pemb, "_keys": pkeys, "_ids": pids,
            "n": n_new, "spill": overflow, "spill_blocks": spill_blocks,
        }
        if scale_rows is not None:
            state["_scales"] = scale_rows[jnp.maximum(pids, 0)]
        if self._refine_corpus is not None:
            state["_refine_corpus"] = self._refine_corpus.selected(live_old)
        state["_corpus_fp"] = None  # layout no longer mirrors a store snapshot
        self.__dict__.pop("_positions_cache", None)
        self.__dict__.update(state)
        return live_old

    def _compact_sharded(self) -> np.ndarray:
        """Mesh VACUUM for the sharded IVF rung. Survivors re-pack
        around the EXISTING per-shard centroids: main-block rows keep
        their shard+list, spill rows reassign to their GLOBALLY nearest
        centroid's shard+list (the same routing :meth:`add` uses, so a
        shrunken corpus re-absorbs its spill across the mesh), and
        everything renumbers ``0..L-1`` in ascending old-id order. The
        spill tail re-sizes to the post-compact per-shard overflow max —
        geometry stays shard-uniform (shard_map static shapes). The row
        data moves through ONE sharding-pinned global gather per array:
        cross-shard re-absorption rides the ICI all-to-all, never the
        host link; only the int32 ids/keys touch the host."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self.mesh
        ndev = int(dict(mesh.shape)["data"])
        ll, cap = self.n_lists_local, self.capacity
        total_old = (ll + 1 + self.spill_blocks) * cap
        ids_h = np.asarray(self._ids)
        keys_h = np.asarray(self._keys)
        live_slots = np.flatnonzero((ids_h >= 0) & (keys_h != -2))
        order0 = np.argsort(ids_h[live_slots])
        live_slots = live_slots[order0].astype(np.int64)
        live_old = ids_h[live_slots].astype(np.int64)
        n_new = int(live_old.size)
        if n_new == 0:
            raise ValueError(
                "compact would empty the index — rebuild from the store "
                "instead"
            )
        # main-block rows keep their shard+list; spill rows reroute to
        # the globally nearest centroid (one small matmul on device)
        sh = live_slots // total_old
        lblk = (live_slots % total_old) // cap
        main = lblk < ll
        assign = np.where(main, sh * ll + lblk, -1).astype(np.int64)
        spill_sel = np.flatnonzero(assign < 0)
        if spill_sel.size:
            sp_pos = jnp.asarray(live_slots[spill_sel])
            sp = _dequant(
                self._emb[sp_pos],
                None if self._scales is None
                else self._scales[sp_pos][:, None],
                dim=self.dim,
            )
            assign[spill_sel] = np.asarray(jnp.argmax(
                jnp.dot(sp, self.centroids.T,
                        preferred_element_type=jnp.float32), axis=1,
            ))
        # per-list rank in ascending new-id order (live_slots is already
        # id-sorted; the stable sort preserves that inside each list)
        order = np.argsort(assign, kind="stable")
        a_sorted = assign[order]
        starts = np.searchsorted(a_sorted, np.arange(ndev * ll),
                                 side="left")
        rank = np.arange(n_new) - starts[a_sorted]
        in_main = rank < cap
        over = ~in_main
        sh2 = a_sorted // ll
        overflow_sh = np.bincount(sh2[over], minlength=ndev)
        spill_blocks = max(1, -(-int(overflow_sh.max()) // cap))
        total_new = (ll + 1 + spill_blocks) * cap
        dest_sorted = sh2 * total_new + (a_sorted % ll) * cap + rank
        for s in np.flatnonzero(overflow_sh):
            selx = over & (sh2 == s)
            dest_sorted[selx] = (s * total_new + (ll + 1) * cap
                                 + np.arange(int(overflow_sh[s])))
        dest = np.empty(n_new, np.int64)
        dest[order] = dest_sorted

        # gather permutation: every unused slot points at its own
        # shard's all-masked padding block (key/id -1, inert values), so
        # one gather produces a fully valid packed layout
        perm = np.repeat(
            np.arange(ndev, dtype=np.int64) * total_old + ll * cap,
            total_new,
        )
        perm[dest] = live_slots
        row_sh = NamedSharding(mesh, P("data"))
        d_perm = jax.device_put(jnp.asarray(perm), row_sh)

        def gath(arr, spec):
            return self._pinned_jit(
                "compact_gather", lambda: (lambda a, p: a[p]), spec,
            )(arr, d_perm)

        emb = gath(self._emb, P("data", None))
        scales = (gath(self._scales, P("data"))
                  if self._scales is not None else None)
        keys_new = np.full(ndev * total_new, -1, np.int32)
        keys_new[dest] = keys_h[live_slots]
        ids_new = np.full(ndev * total_new, -1, np.int32)
        ids_new[dest] = np.arange(n_new, dtype=np.int32)

        state = {
            "_emb": emb,
            "_keys": jax.device_put(jnp.asarray(keys_new), row_sh),
            "_ids": jax.device_put(jnp.asarray(ids_new), row_sh),
            "n": n_new, "spill": int(over.sum()),
            "spill_blocks": spill_blocks,
        }
        if scales is not None:
            state["_scales"] = scales
        if self._refine_corpus is not None:
            state["_refine_corpus"] = self._refine_corpus.selected(live_old)
        if spill_blocks != self.spill_blocks:
            # cached sharded search fns close over the OLD spill_blocks
            # (a static kernel arg) — drop them with the same swap
            state["_sharded_cache"] = {}
        state["_corpus_fp"] = None  # layout no longer mirrors a store snapshot
        self.__dict__.pop("_positions_cache", None)
        self.__dict__.update(state)
        return live_old

    # -- search ----------------------------------------------------------------

    def _kernel_path(self, exact_ties: bool, k: int) -> bool:
        if exact_ties:
            return False  # dense-oracle tie parity needs the two-key sort
        if (self.precision == "int8" and not self.int8_mxu
                and jax.default_backend() == "tpu"
                and self.capacity > _max_capacity(self.dim, 1)):
            # index packed under the MXU clamp (capacity up to 2x the
            # dequant bound); the dequant kernel would blow scoped VMEM
            # on the real Mosaic — fall back to the XLA union path
            log.warning(
                "IVF: capacity %d exceeds the dequant kernel's %d-row "
                "VMEM bound; searching via the XLA union path (set "
                "int8_mxu=True to use the kernel)",
                self.capacity, _max_capacity(self.dim, 1),
            )
            return False
        if self.use_kernel is not None:
            return self.use_kernel
        # k <= 16 runs the unrolled merge; 17..64 the fori merge —
        # slower per block (~linear in k, see PERFORMANCE.md) but still
        # far ahead of the XLA union path, and the route the refine
        # over-fetch (k*refine) needs. Compile-probed on the remote
        # Mosaic to k=64.
        return jax.default_backend() == "tpu" and k <= 64

    def search(
        self,
        query_embeddings,
        query_manuals: Optional[Sequence[str]] = None,
        query_pages: Optional[Sequence[Optional[int]]] = None,
        k: int = 10,
        n_probes: Optional[int] = None,
        global_search: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k per query as host arrays (values, corpus indices; -1 =
        no candidate). ``n_probes`` overrides the build-time default —
        ``n_probes=self.n_lists`` scans everything (exact)."""
        queries = np.asarray(query_embeddings, np.float32)
        if global_search or query_manuals is None:
            qk = np.full(len(queries), WILDCARD_KEY, np.int32)
        else:
            qk, _ = encode_keys(query_manuals, query_pages, dict(self.vocab))
        return self.search_encoded(queries, qk, k, n_probes)

    def search_encoded(
        self, queries: np.ndarray, qk: np.ndarray, k: int,
        n_probes: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        if self.refine > 1 and k > 0 and len(queries):
            # refine: over-fetch k*refine candidates from the quantized
            # probed sweep, exact fp32 rescore + trim on host (see
            # retrieval._refine_rescore). Recall stays bounded by the
            # probe set; ranking inside it becomes exact.
            kf = min(max(k, k * self.refine), self.n)
            vals, idx = self._search_encoded_raw(queries, qk, kf, n_probes)
            return _refine_rescore(queries, vals, idx,
                                   self._refine_corpus, k)
        return self._search_encoded_raw(queries, qk, k, n_probes)

    def _search_encoded_raw(
        self, queries: np.ndarray, qk: np.ndarray, k: int,
        n_probes: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        nq = len(queries)
        if nq == 0:
            return (np.full((0, k), NEG_INF, np.float32),
                    np.full((0, k), -1, np.int64))
        p = self.n_probes if n_probes is None else min(int(n_probes),
                                                       self.n_lists)
        # pad the query block to a fixed size so the jitted executable is
        # reused (remote compiles cost minutes); large batches chunk at
        # query_block per dispatch to bound the per-dispatch union
        qb = self.query_block
        out_v, out_i = [], []
        for s in range(0, nq, qb):
            qc = queries[s: s + qb]
            kc = qk[s: s + qb]
            if len(qc) < qb:
                pad = qb - len(qc)
                qc = np.concatenate(
                    [qc, np.zeros((pad, self.dim), np.float32)]
                )
                kc = np.concatenate([kc, np.full(pad, -2, np.int32)])
            vals, idx = self.search_device(
                jnp.asarray(qc), jnp.asarray(kc, jnp.int32), k, p
            )
            out_v.append(np.asarray(vals))
            out_i.append(np.asarray(idx, np.int64))
        vals = np.concatenate(out_v)[:nq]
        idx = np.concatenate(out_i)[:nq]
        vals, idx = _pad_results(vals, idx, k)
        return _sentinel(vals, idx)

    def search_device(self, query_embeddings, query_keys, k: int,
                      n_probes: Optional[int] = None):
        """Device-resident probed search (bench/serving path): one jitted
        dispatch, no host round-trip, corpus indices resolved on device
        (-1 sentinel). Query count should match a warmed shape (pad on
        the caller side). On a mesh, ``n_probes`` applies PER SHARD
        (capped at the per-shard list count)."""
        if self.mesh is not None:
            ll = self.n_lists_local
            p = self.n_probes if n_probes is None else min(int(n_probes),
                                                           ll)
            run = self._sharded_search_fn(k, p, exact_ties=(p == ll))
            ps = (self._scales if self._scales is not None
                  else jnp.zeros((1,), jnp.float32))
            return run(query_embeddings, query_keys, self.centroids,
                       self._emb, self._keys, self._ids, ps)
        p = self.n_probes if n_probes is None else min(int(n_probes),
                                                       self.n_lists)
        exact_ties = p == self.n_lists
        if self._kernel_path(exact_ties, k):
            return _ivf_kernel_search(
                query_embeddings, query_keys, self.centroids, self._emb,
                self._keys, self._ids, self._scales, k, p,
                self.n_lists, self.capacity, self.spill_blocks,
                self.cluster_chunk, exact_ties, int8_mxu=self.int8_mxu,
            )
        return _ivf_union_search(
            query_embeddings, query_keys, self.centroids, self._emb,
            self._keys, self._ids, self._scales, k, p,
            self.n_lists, self.capacity, self.spill_blocks,
            self.cluster_chunk, exact_ties,
        )

    # -- probe auto-calibration --------------------------------------------------

    def calibrate(self, recall_target: float, k: int = 10,
                  sample: int = 256) -> int:
        """Pick the smallest ``n_probes`` whose expected recall@k meets
        ``recall_target``, and set it as the default. pgvector makes the
        user guess ``probes`` (the reference hard-codes lists=100 and
        never measures recall, ref:src/setup_vector_db.py:171-190); this
        measures it, ANALYTICALLY over every probe count at once:

        a true neighbor is found at probe count P iff its cluster ranks
        inside the query's top-P centroid scores (or the row spilled —
        spill rows are always scanned). So ONE exact (full-probe) search
        over a deterministic corpus sample plus one (S, L) centroid
        matmul yields each neighbor's required probe depth; recall(P) is
        a quantile over those depths. No probed-search ladder, no
        per-P kernel compiles.

        Returns the chosen probe count. Recall here is vs the index's
        own exact ranking on in-corpus sample queries (the standard
        IVFFlat calibration protocol); real query recall varies with
        query/corpus drift.
        """
        if not 0.0 < recall_target <= 1.0:
            raise ValueError(f"recall_target in (0, 1], got {recall_target}")
        s = min(int(sample), self.n)
        sel = np.asarray(
            (np.arange(s, dtype=np.int64) * self.n) // s, np.int64
        )
        # sample queries straight from the packed layout (device gather)
        pos = np.asarray(self._positions_of(sel))
        q = _dequant(self._emb[pos],
                     None if self._scales is None
                     else self._scales[pos][:, None], dim=self.dim)
        qk = jnp.full((s,), WILDCARD_KEY, jnp.int32)
        _, nbr = self.search_encoded(np.asarray(q), np.asarray(qk), k,
                                     n_probes=self.n_lists)
        if self.mesh is not None:
            # per-shard depth: a neighbor is found iff its cluster ranks
            # < P among ITS OWN shard's centroid scores (probes apply
            # per shard)
            ndev = int(dict(self.mesh.shape)["data"])
            depth = np.asarray(_probe_depths_sharded(
                jnp.asarray(q), jnp.asarray(nbr, jnp.int32),
                self.centroids, self._positions, ndev,
                self.n_lists_local, self.capacity,
                self._ids.shape[0] // ndev,
            ))
            max_p = self.n_lists_local
        else:
            depth = np.asarray(_probe_depths(
                jnp.asarray(q), jnp.asarray(nbr, jnp.int32),
                self.centroids, self._positions, self.n_lists,
                self.capacity,
            ))
            max_p = self.n_lists
        valid = depth >= 0  # -1 marks empty neighbor slots
        depths = np.sort(depth[valid])
        if depths.size == 0:
            return self.n_probes
        # smallest P with mean(depth < P) >= target
        idx = min(int(np.ceil(recall_target * depths.size)) - 1,
                  depths.size - 1)
        p = int(depths[idx]) + 1
        p = max(1, min(p, max_p))
        achieved = float(np.mean(depths < p))
        log.info(
            "IVF calibration: n_probes=%d reaches recall@%d %.4f "
            "(target %.3f, %d sample queries)", p, k, achieved,
            recall_target, s,
        )
        self.n_probes = p
        self.calibrated_target = float(recall_target)
        return p

    def _positions_of(self, corpus_ids: np.ndarray):
        """Packed row position of each corpus id (device gather)."""
        return self._positions[jnp.asarray(corpus_ids)]

    @property
    def _positions(self):
        """Packed row position per corpus id, built lazily once (packed
        ids are global corpus ids on every geometry)."""
        cached = getattr(self, "_positions_cache", None)
        if cached is None:
            total = self._ids.shape[0]
            rows = jnp.arange(total, dtype=jnp.int32)
            size = self.n
            dest = jnp.where(self._ids >= 0, self._ids, size)
            cached = jnp.zeros((size,), jnp.int32).at[dest].set(
                rows, mode="drop"
            )
            self._positions_cache = cached
        return cached

    # -- persistence -----------------------------------------------------------

    def save(self, path) -> None:
        """Persist the trained index STRUCTURE (centroids + packed layout
        ids/keys + geometry) — not the vectors. pgvector's index survives
        restarts on disk (ref:src/setup_vector_db.py:155-190); here the
        vectors live in the embedding store already, so the artifact is
        small (L*D floats + ~1.5*N int32 pairs) and :meth:`load` rebuilds
        the device layout with one gather instead of re-running k-means.
        Sharded indexes persist too (r3 late): the artifact additionally
        records the shard count + per-shard list geometry, and loads
        back onto a mesh with the SAME data-axis size (packed ids are
        global, so the structure round-trips exactly; the sharded
        gather at load re-places rows without re-running the per-shard
        k-means)."""
        import json as _json

        meta = {
            "n": self.n, "dim": self.dim, "n_lists": self.n_lists,
            "n_probes": self.n_probes, "capacity": self.capacity,
            "spill": self.spill, "spill_blocks": self.spill_blocks,
            "precision": self.precision,
            "query_block": self.query_block,
            "cluster_chunk": self.cluster_chunk,
            "calibrated_target": getattr(self, "calibrated_target",
                                         None),
            "vocab": self.vocab,
            # (hexdigest, dtype) of the build corpus; None after a
            # mutation (the layout no longer mirrors a store snapshot)
            "fingerprint": getattr(self, "_corpus_fp", None),
        }
        if self.mesh is not None:
            meta["ndev"] = int(dict(self.mesh.shape)["data"])
            meta["n_lists_local"] = self.n_lists_local
        np.savez_compressed(
            path,
            centroids=np.asarray(self.centroids, np.float32),
            pids=np.asarray(self._ids, np.int32),
            pkeys=np.asarray(self._keys, np.int32),
            meta=np.frombuffer(_json.dumps(meta).encode(), dtype=np.uint8),
        )

    @classmethod
    def load(cls, path, corpus_embeddings, corpus_scales=None,
             use_kernel: Optional[bool] = None,
             int8_mxu: Optional[bool] = None,
             refine: int = 0, mesh=None,
             refine_store=None) -> "IVFIndex":
        """Rebuild a saved index around the SAME corpus (row order must
        match the build — ids index into it). One device gather replaces
        the k-means build; precision follows the saved index (an fp32
        corpus is re-quantized along the packed layout for int8). A
        sharded artifact loads back onto a ``mesh`` whose data axis
        matches the saved shard count — the layout gather runs under a
        sharding-pinned jit, so each device materializes only its own
        shard (never the full layout on one chip)."""
        import json as _json

        z = np.load(path)
        meta = _json.loads(bytes(z["meta"]).decode())
        use_mesh = (mesh if mesh is not None
                    and dict(mesh.shape).get("data", 1) > 1 else None)
        saved_ndev = meta.get("ndev")
        if saved_ndev is None and use_mesh is not None:
            raise ValueError(
                "artifact is single-device; rebuild to shard it over a "
                "mesh"
            )
        if saved_ndev is not None and (
                use_mesh is None
                or dict(use_mesh.shape)["data"] != saved_ndev):
            raise ValueError(
                f"artifact is sharded over {saved_ndev} devices; pass a "
                f"mesh with a data axis of {saved_ndev}"
            )
        corpus = jnp.asarray(corpus_embeddings)
        if corpus.dtype == jnp.uint8:
            # packed widths: int4 rows are D/2 bytes, int2 rows D/4
            want_cols = meta["dim"] // (
                4 if meta["precision"] == "int2" else 2)
        else:
            want_cols = meta["dim"]
        if corpus.shape != (meta["n"], want_cols):
            raise ValueError(
                f"corpus shape {corpus.shape} does not match saved index "
                f"({meta['n']}, {want_cols})"
            )
        saved_fp = meta.get("fingerprint")
        if saved_fp is not None:
            # verify content, not just shape — a same-size store whose
            # rows changed since the build would otherwise serve the
            # artifact's stale keys/clusters. Cast exactly as the build
            # did; a cross-precision load (fp32 build served over a
            # pre-quantized corpus) fingerprints differently by design,
            # so only matching dtypes are comparable.
            check = (corpus if corpus.dtype in (jnp.int8, jnp.uint8)
                     else corpus.astype(jnp.float32))
            got_fp, got_dtype = _corpus_fingerprint(check)
            if got_dtype != saved_fp[1]:
                # the stale-corpus guard is INACTIVE on this load —
                # operators should know (ADVICE r3 #2); shape checks
                # above still apply
                log.warning(
                    "IVF cache fingerprint skipped: artifact was built "
                    "over %s rows but the served corpus is %s — "
                    "cross-precision loads get shape-only validation",
                    saved_fp[1], got_dtype,
                )
            elif got_fp != saved_fp[0]:
                raise ValueError(
                    "IVF artifact was built over a different corpus "
                    "(content fingerprint mismatch); rebuild the index"
                )
        from tpualign.parallel.retrieval import _use_int8_mxu

        self = cls.__new__(cls)
        self.vocab = {k: int(v) for k, v in meta["vocab"].items()}
        # keep the build fingerprint so save-after-load (e.g. a
        # recalibration refresh) stays verifiable
        self._corpus_fp = tuple(saved_fp) if saved_fp else None
        self.mesh = use_mesh if saved_ndev is not None else None
        if self.mesh is not None:
            self.n_lists_local = meta["n_lists_local"]
            self._sharded_cache = {}
        self.use_kernel = use_kernel
        self.int8_mxu = (_use_int8_mxu() if int8_mxu is None
                         else bool(int8_mxu))
        self.n, self.dim = meta["n"], meta["dim"]
        self.n_lists = meta["n_lists"]
        self.n_probes = meta["n_probes"]
        self.capacity = meta["capacity"]
        self.spill = meta["spill"]
        self.spill_blocks = meta["spill_blocks"]
        self.precision = meta["precision"]
        self.query_block = meta["query_block"]
        self.cluster_chunk = meta["cluster_chunk"]
        if meta.get("calibrated_target") is not None:
            self.calibrated_target = meta["calibrated_target"]
        self._refine_store = refine_store
        self.refine, self._refine_corpus = _setup_refine(
            refine, self.precision, corpus_embeddings,
            prequantized=corpus.dtype in (jnp.int8, jnp.uint8),
            store=refine_store,
        )
        self.centroids = jnp.asarray(z["centroids"], jnp.float32)
        self._ids = jnp.asarray(z["pids"], jnp.int32)
        self._keys = jnp.asarray(z["pkeys"], jnp.int32)
        gather = jnp.maximum(self._ids, 0)
        if self.mesh is not None:
            # pin the big layout gather's OUTPUT sharding so each device
            # materializes only its own shard's packed rows (ids are
            # global, so the gather itself may cross shards — adds route
            # rows to the globally nearest centroid)
            from jax.sharding import NamedSharding, PartitionSpec as P

            mat_sh = NamedSharding(self.mesh, P("data", None))
            row_sh = NamedSharding(self.mesh, P("data"))
            take = jax.jit(lambda c, g: c[g], out_shardings=mat_sh)
        else:
            take = lambda c, g: c[g]
        if corpus.dtype == jnp.int8:
            if corpus_scales is None:
                raise ValueError("int8 corpus needs corpus_scales")
            if self.precision != "int8":
                raise ValueError("fp32 index cannot load an int8 corpus")
            self._emb = take(corpus, gather)
            self._scales = jnp.asarray(
                corpus_scales, jnp.float32).reshape(-1)[gather]
        elif corpus.dtype == jnp.uint8:
            if corpus_scales is None:
                raise ValueError("packed corpus needs corpus_scales")
            if self.precision not in ("int4", "int2"):
                raise ValueError(
                    f"{self.precision} index cannot load a packed corpus"
                )
            self._emb = take(corpus, gather)
            self._scales = jnp.asarray(
                corpus_scales, jnp.float32).reshape(-1)[gather]
        elif self.precision == "int4":
            self._emb, self._scales = _pack_rows_int4(
                take(corpus.astype(jnp.float32), gather)
            )
        elif self.precision == "int2":
            self._emb, self._scales = _pack_rows_int2(
                take(corpus.astype(jnp.float32), gather)
            )
        elif self.precision == "int8":
            pemb = take(corpus.astype(jnp.float32), gather)
            scales = jnp.maximum(
                jnp.max(jnp.abs(pemb), axis=1, keepdims=True) / 127.0,
                1e-12,
            )
            self._emb = jnp.clip(
                jnp.rint(pemb / scales), -127, 127
            ).astype(jnp.int8)
            self._scales = scales.astype(jnp.float32)[:, 0]
        else:
            self._emb = take(corpus.astype(jnp.float32), gather)
            self._scales = None
        if self.mesh is not None:
            # re-place every structure array with its build-time sharding
            # (the quantize/pack branches above may have dropped it); a
            # device_put onto the sharding an array already has is free
            self.centroids = jax.device_put(self.centroids, mat_sh)
            self._ids = jax.device_put(self._ids, row_sh)
            self._keys = jax.device_put(self._keys, row_sh)
            self._emb = jax.device_put(self._emb, mat_sh)
            if self._scales is not None:
                self._scales = jax.device_put(
                    jnp.asarray(self._scales).reshape(-1), row_sh)
        return self

    @property
    def memory_bytes(self) -> int:
        """Resident bytes: packed corpus + keys + ids + centroids."""
        total = self._emb.shape[0]
        row = {"int8": self.dim, "int4": self.dim // 2}.get(
            self.precision, self.dim * 4)
        scale = 0 if self.precision == "fp32" else 4
        return (total * (row + 8 + scale)
                + self.n_lists * self.dim * 4)


@partial(jax.jit, static_argnames=("n_lists", "capacity"))
def _probe_depths(q, nbr, centroids, positions,
                  n_lists: int, capacity: int):
    """(S, k) probe depth at which each true neighbor is found: the rank
    of its cluster among the query's centroid scores — 0 for spilled
    rows (always scanned), -1 for empty neighbor slots. ``positions``
    maps corpus id -> packed row; the packed block index IS the cluster
    (spill blocks sit past ``n_lists``)."""
    qc = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
    pos = positions[jnp.maximum(nbr, 0)]  # (S, k) packed rows
    block = pos // capacity
    spilled = block > n_lists  # the zero block (== n_lists) holds no ids
    cluster = jnp.minimum(block, n_lists - 1)
    s_c = jnp.take_along_axis(qc, cluster, axis=1)  # (S, k)
    rank = jnp.sum(qc[:, None, :] > s_c[:, :, None], axis=2)
    depth = jnp.where(spilled, 0, rank)
    return jnp.where(nbr >= 0, depth, -1)


@partial(jax.jit, static_argnames=("ndev", "ll", "capacity",
                                   "total_local"))
def _probe_depths_sharded(q, nbr, centroids, positions, ndev: int,
                          ll: int, capacity: int, total_local: int):
    """Sharded analogue of :func:`_probe_depths`: each neighbor's probe
    depth is the rank of its cluster among ITS OWN SHARD's centroid
    scores (per-shard probing). 0 for spilled rows, -1 for empty
    slots."""
    qc = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
    pos = positions[jnp.maximum(nbr, 0)]  # (S, k) global packed rows
    shard = pos // total_local
    local_row = pos % total_local
    block = local_row // capacity
    spilled = block > ll  # the zero block (== ll) holds no ids
    col = shard * ll + jnp.minimum(block, ll - 1)
    s_c = jnp.take_along_axis(qc, col, axis=1)  # (S, k)
    col_shard = (jnp.arange(ndev * ll, dtype=jnp.int32) // ll)
    same_shard = col_shard[None, None, :] == shard[:, :, None]
    rank = jnp.sum((qc[:, None, :] > s_c[:, :, None]) & same_shard,
                   axis=2)
    depth = jnp.where(spilled, 0, rank)
    return jnp.where(nbr >= 0, depth, -1)


def _dequant(emb, scales, dim: int | None = None):
    if emb.dtype == jnp.uint8:  # packed int4/int2 rows
        return _unpack_packed(emb, dim if dim is not None
                              else emb.shape[-1] * 2) * scales
    if scales is None:
        return emb
    return emb.astype(jnp.float32) * scales


@partial(jax.jit, static_argnames=(
    "k", "n_probes", "n_lists", "capacity", "spill_blocks", "chunk",
    "exact_ties"))
def _ivf_union_search(q, qk, centroids, pemb, pkeys, pids, pscales,
                      k: int, n_probes: int, n_lists: int, capacity: int,
                      spill_blocks: int, chunk: int, exact_ties: bool):
    """XLA union-probed search over the flat packed layout — the CPU
    fallback and the bit-exact ``exact_ties`` mode. Scans the
    deduplicated union of the batch's probed blocks (plus the spill
    blocks, which every query accepts) ``chunk`` blocks per step: one
    shared dense matmul, per-query membership mask, running top-k merge.
    With ``exact_ties`` every stage uses the full two-key (value desc,
    id asc) sort so the ranking is bit-identical to the dense oracle
    even among equal scores; the probed path accepts packed-order ties
    on the (already approximate) candidate set to stay cheap.

    On TPU this schedule measures ~40x the matmul cost per step (XLA
    gathers + per-chunk ``lax.top_k``); :func:`_ivf_kernel_search` is
    the production path there.
    """
    b, d = q.shape
    cs = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
    _, probe = jax.lax.top_k(cs, n_probes)  # (B, P)
    probe = jnp.where(qk[:, None] == -2, n_lists, probe.astype(jnp.int32))

    # sorted deduplicated union, padded to a chunk multiple with n_lists
    u = min(n_lists, b * n_probes)
    flat = jnp.sort(probe.reshape(-1))
    first = jnp.concatenate([jnp.ones((1,), bool), flat[1:] != flat[:-1]])
    uids = jnp.sort(
        jnp.where(first, flat, n_lists).astype(jnp.int32)
    )[:u]
    # spill blocks: every query accepts them (uid > n_lists in the mask)
    spill_ids = n_lists + 1 + jnp.arange(spill_blocks, dtype=jnp.int32)
    uids = jnp.concatenate([uids, spill_ids])
    u_pad = _round_up(uids.shape[0], chunk)
    if u_pad > uids.shape[0]:
        uids = jnp.concatenate(
            [uids, jnp.full((u_pad - uids.shape[0],), n_lists, jnp.int32)]
        )

    def stage_topk(s, ids):
        """Top-k of one scored stage, padded to width k with (-inf, -1)."""
        m = s.shape[1]
        kk = min(k, m)
        if exact_ties:
            v, i = _two_key_topk(s, jnp.broadcast_to(ids[None], (b, m)), kk)
        else:
            v, pos = jax.lax.top_k(s, kk)
            i = jnp.take_along_axis(
                jnp.broadcast_to(ids[None], (b, m)), pos, axis=1
            )
        if kk < k:
            v = jnp.concatenate(
                [v, jnp.full((b, k - kk), NEG_INF, jnp.float32)], axis=1)
            i = jnp.concatenate(
                [i, jnp.full((b, k - kk), -1, jnp.int32)], axis=1)
        return v, i

    arange_c = jnp.arange(capacity, dtype=jnp.int32)

    def merge(carry, cid):
        bv, bi = carry
        member = (jnp.any(probe[:, :, None] == cid[None, None, :], axis=1)
                  | (cid > n_lists)[None, :])  # spill: everyone scans it
        rows = (cid[:, None] * capacity + arange_c[None, :]).reshape(-1)
        emb = _dequant(pemb[rows], None if pscales is None
                       else pscales[rows][:, None], dim=q.shape[1])
        keysc = pkeys[rows]
        idsc = pids[rows]
        s = jnp.dot(q, emb.T, preferred_element_type=jnp.float32)
        m = ((qk[:, None] == keysc[None]) |
             (qk[:, None] == WILDCARD_KEY)) & (keysc[None] >= 0)
        s = jnp.where(m & jnp.repeat(member, capacity, axis=1), s, NEG_INF)
        cv, ci = stage_topk(s, idsc)
        return _two_key_topk(
            jnp.concatenate([bv, cv], axis=1),
            jnp.concatenate([bi, ci], axis=1), k,
        ), None

    init = (jnp.full((b, k), NEG_INF, jnp.float32),
            jnp.full((b, k), -1, jnp.int32))
    (bv, bi), _ = jax.lax.scan(merge, init, uids.reshape(-1, chunk))
    return bv, bi


@partial(jax.jit, static_argnames=(
    "k", "n_probes", "n_lists", "capacity", "spill_blocks", "chunk",
    "exact_ties", "int8_mxu"))
def _ivf_kernel_search(q, qk, centroids, pemb, pkeys, pids, pscales,
                       k: int, n_probes: int, n_lists: int, capacity: int,
                       spill_blocks: int, chunk: int = 8,
                       exact_ties: bool = False, int8_mxu: bool = False):
    """Production TPU probed search: probe selection + union build in XLA,
    then ONE scalar-prefetch Pallas kernel sweep
    (:func:`tpualign.ops.pallas_kernels.ivf_probe_topk`) that streams
    exactly the probed blocks (plus spill) through VMEM. Packed winner
    indices resolve to corpus ids on device. ``chunk``/``exact_ties``
    accepted for signature parity with the XLA path (the kernel path is
    never routed with exact_ties). ``int8_mxu`` runs int8 layouts as
    s8 x s8 -> s32 MXU matmuls (queries quantized in the prologue)."""
    b, d = q.shape
    int4 = pemb.dtype == jnp.uint8 and pscales is not None
    block_q = min(64, _round_up(b, 32 if (int8_mxu or int4) else 8))
    bp = _round_up(b, block_q)
    if bp > b:
        q = jnp.pad(q, ((0, bp - b), (0, 0)))
        qk = jnp.pad(qk, (0, bp - b), constant_values=-2)
    cs = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
    _, probe = jax.lax.top_k(cs, n_probes)
    # padding queries must not pollute the union: their probes -> n_lists
    probe = jnp.where(qk[:, None] == -2, n_lists, probe.astype(jnp.int32))

    u = min(n_lists, bp * n_probes)
    flat = jnp.sort(probe.reshape(-1))
    first = jnp.concatenate([jnp.ones((1,), bool), flat[1:] != flat[:-1]])
    uids = jnp.sort(
        jnp.where(first, flat, n_lists).astype(jnp.int32)
    )[:u]
    spill_ids = n_lists + 1 + jnp.arange(spill_blocks, dtype=jnp.int32)
    # real union (ascending — locality), then padding (n_lists: DMA
    # repeats the zero block and compute is skipped), spill last
    uids = jnp.concatenate([uids, spill_ids])

    vals, pidx = ivf_probe_topk(
        q, qk[:, None], probe, uids, pemb, pkeys[None, :], k,
        capacity, n_lists, block_q=block_q, packed_scales=pscales,
        int8_mxu=int8_mxu and pscales is not None,
    )
    safe = jnp.minimum(pidx, pids.shape[0] - 1)
    idx = jnp.where(pidx >= SENTINEL_IDX, -1, pids[safe])
    vals = jnp.where(pidx >= SENTINEL_IDX, NEG_INF, vals)
    return vals[:b], idx[:b]

"""Typed configuration for the tpualign pipeline.

The reference scatters configuration across ``.env`` lookups duplicated in
every stage module plus a dead ``config.py`` constants file
(ref:config.py:1-47, ref:src/insert_clip_embeddings.py:19-34,
ref:src/pdf_processor.py:53-60). Here a single typed config tree is the only
source of defaults; every field can be overridden by environment variables
(same names as the reference ``.env.example``) and by CLI flags.

Unlike the reference — which lets ``CLIP_DIM`` disagree with the model
(ref:src/insert_clip_embeddings.py:26-27) — the embedding dimension is always
derived from the model variant.
"""

from __future__ import annotations

import dataclasses
import os
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Mapping, Optional, Sequence

__all__ = [
    "ClipVariant",
    "CLIP_VARIANTS",
    "ModelConfig",
    "MeshConfig",
    "DataConfig",
    "StoreConfig",
    "PipelineConfig",
    "load_env_file",
    "load_config",
]


# ---------------------------------------------------------------------------
# Model variants
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ClipVariant:
    """Architecture hyper-parameters of one CLIP model size.

    Mirrors the three model options of the reference
    (ref:src/insert_clip_embeddings.py:37-49, ref:README.md:243-246) plus
    ViT-B-16 as a free extra. ``embed_dim`` is what the reference called
    ``CLIP_DIM``.
    """

    name: str
    embed_dim: int
    # vision tower
    image_size: int
    patch_size: int
    vision_width: int
    vision_layers: int
    vision_heads: int
    # text tower
    context_length: int
    vocab_size: int
    text_width: int
    text_layers: int
    text_heads: int
    # MLP hidden dims; None = the standard 4x width. The OpenCLIP g/bigG
    # towers use non-4x ratios (g-14: 6144/1408, bigG-14: 8192/1664).
    vision_mlp_dim: Optional[int] = None
    text_mlp_dim: Optional[int] = None

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size * self.grid_size


CLIP_VARIANTS: Mapping[str, ClipVariant] = {
    "ViT-B-32": ClipVariant(
        name="ViT-B-32", embed_dim=512,
        image_size=224, patch_size=32, vision_width=768, vision_layers=12, vision_heads=12,
        context_length=77, vocab_size=49408, text_width=512, text_layers=12, text_heads=8,
    ),
    "ViT-B-16": ClipVariant(
        name="ViT-B-16", embed_dim=512,
        image_size=224, patch_size=16, vision_width=768, vision_layers=12, vision_heads=12,
        context_length=77, vocab_size=49408, text_width=512, text_layers=12, text_heads=8,
    ),
    "ViT-L-14": ClipVariant(
        name="ViT-L-14", embed_dim=768,
        image_size=224, patch_size=14, vision_width=1024, vision_layers=24, vision_heads=16,
        context_length=77, vocab_size=49408, text_width=768, text_layers=12, text_heads=12,
    ),
    "ViT-H-14": ClipVariant(
        name="ViT-H-14", embed_dim=1024,
        image_size=224, patch_size=14, vision_width=1280, vision_layers=32, vision_heads=16,
        context_length=77, vocab_size=49408, text_width=1024, text_layers=24, text_heads=16,
    ),
    # OpenCLIP's two largest released CLIP towers (LAION weights only; no
    # OpenAI counterparts). Non-4x vision MLP ratios.
    "ViT-g-14": ClipVariant(
        name="ViT-g-14", embed_dim=1024,
        image_size=224, patch_size=14, vision_width=1408, vision_layers=40, vision_heads=16,
        context_length=77, vocab_size=49408, text_width=1024, text_layers=24, text_heads=16,
        vision_mlp_dim=6144,
    ),
    "ViT-bigG-14": ClipVariant(
        name="ViT-bigG-14", embed_dim=1280,
        image_size=224, patch_size=14, vision_width=1664, vision_layers=48, vision_heads=16,
        context_length=77, vocab_size=49408, text_width=1280, text_layers=32, text_heads=20,
        vision_mlp_dim=8192,
    ),
}


def normalize_model_name(name: str) -> str:
    """``ViT-B/32`` -> ``ViT-B-32`` (ref:src/insert_clip_embeddings.py:60-73)."""
    return name.replace("/", "-")


# ---------------------------------------------------------------------------
# Config dataclasses
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ModelConfig:
    """Model + numerics configuration.

    ``pretrained`` follows the reference's ``CLIP_PRETRAINED`` env
    (``openai`` default, ``laion2b_s34b_b79k`` alternative,
    ref:src/insert_clip_embeddings.py:75-77). OpenAI checkpoints use the
    QuickGELU activation; LAION checkpoints use exact GELU — derived here,
    overridable.
    """

    model_name: str = "ViT-B-32"
    pretrained: str = "openai"
    checkpoint_path: Optional[str] = None  # local OpenCLIP/HF checkpoint file
    # opt-in to full torch unpickling for .pt/.bin checkpoints that fail
    # torch.load(weights_only=True); executes arbitrary pickle code on load
    checkpoint_allow_pickle: bool = False
    quick_gelu: Optional[bool] = None      # None => derived from `pretrained`
    compute_dtype: str = "bfloat16"        # MXU-friendly default
    param_dtype: str = "float32"
    parity_mode: bool = False              # fp32 everywhere for <=1e-3 parity runs
    remat: bool = False                    # jax.checkpoint the transformer blocks
    fused_attention: Optional[bool] = None  # None => auto (Pallas kernel on TPU)
    quant: str = "none"                    # "int8": quantized GEMMs, serving only

    @property
    def variant(self) -> ClipVariant:
        name = normalize_model_name(self.model_name)
        if name not in CLIP_VARIANTS:
            raise ValueError(
                f"Unknown CLIP model {self.model_name!r}; "
                f"available: {sorted(CLIP_VARIANTS)}"
            )
        return CLIP_VARIANTS[name]

    @property
    def embed_dim(self) -> int:
        return self.variant.embed_dim

    @property
    def use_quick_gelu(self) -> bool:
        if self.quick_gelu is not None:
            return self.quick_gelu
        return self.pretrained == "openai"


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for SPMD execution.

    Axes:
      - ``data``  — data parallelism for the embedding stream and the corpus
        axis of sharded retrieval.
      - ``model`` — tensor parallelism for the large towers (H-14); 1 for
        single-chip-sized models.

    The reference has no parallelism at all (SURVEY.md §2.3); this component
    is new in the rebuild.
    """

    data: int = 1
    model: int = 1
    axis_names: Sequence[str] = ("data", "model")

    @property
    def num_devices(self) -> int:
        return self.data * self.model


@dataclass(frozen=True)
class DataConfig:
    """Host-side document-processing configuration.

    Field-for-field superset of the reference env surface
    (ref:src/pdf_processor.py:53-60, ref:.env.example:14-28) plus the
    constants from the reference's unused ``config.py`` (ref:config.py:20-22).
    """

    input_dir: str = "data/raw/manuals"
    output_dir: str = "data/processed"
    language: str = "nl"
    use_ocr_fallback: bool = False
    max_file_size_mb: int = 50
    allowed_file_types: Sequence[str] = ("pdf", "docx", "doc")
    soffice_path: str = "soffice"
    word_to_pdf_timeout_seconds: int = 120
    min_image_size: int = 5         # vector-figure min w/h (ref:src/pdf_processor.py:436)
    exclude_terms_file: Optional[str] = None  # operator-in-the-loop exclusion list
    # chunk-length bounds: the reference DEFINES these (ref:config.py:20-21)
    # but never imports them anywhere; None preserves that no-op behavior,
    # set values to actually enforce character-length filtering of chunks.
    min_chunk_length: Optional[int] = None
    max_chunk_length: Optional[int] = None
    # caption->image assignment: "first_image" reproduces the reference's
    # acknowledged simplification (ref:src/pdf_processor.py:864-869);
    # "spatial" links each caption to the nearest image by line/image bboxes
    caption_linking: str = "first_image"

    @property
    def images_dir(self) -> str:
        return str(Path(self.output_dir) / "images")


@dataclass(frozen=True)
class StoreConfig:
    """Embedding-store configuration (the pgvector replacement).

    The reference stores embeddings in PostgreSQL+pgvector across four
    schemas (ref:src/setup_vector_db.py:89-151). Here each schema is a
    columnar on-disk table set under ``root``; similarity search runs as a
    sharded on-TPU matmul instead of SQL.
    """

    root: str = "data/store"


@dataclass(frozen=True)
class TrainConfig:
    """Weak-supervision-weighted contrastive fine-tuning (rebuild extension;
    the reference performs no training)."""

    learning_rate: float = 1e-5
    weight_decay: float = 0.2
    batch_size: int = 256
    warmup_steps: int = 200
    total_steps: int = 2000
    weak_score_temperature: float = 0.5  # how strongly weak scores weight positives
    label_smoothing: float = 0.0
    # FLIP-style visible-patch ratio to MASK during training (0 = off);
    # 0.5 cuts vision-tower step FLOPs ~2x (arXiv:2212.00794, PAPERS.md)
    patch_mask_ratio: float = 0.0
    # contrastive objective: "clip" (symmetric InfoNCE) or "siglip"
    # (pairwise sigmoid, arXiv:2303.15343 — no cross-batch softmax, scales
    # to huge effective batches without gathers)
    loss_type: str = "clip"
    siglip_bias: float = -10.0  # fixed logit bias for the sigmoid loss
    # Gradient accumulation microsteps per optimizer step (1 = off). Uses
    # the cached-feature two-phase schedule, so the contrastive loss keeps
    # FULL-batch negatives and the accumulated gradient equals the
    # full-batch gradient exactly — activation memory drops to one
    # microbatch (batch_size / grad_accum_steps), the H-14 enabler.
    grad_accum_steps: int = 1
    # Exponential moving average of the params (0 = off). The EMA tree is
    # what export/eval should use — standard CLIP fine-tuning stabilizer.
    ema_decay: float = 0.0
    # dtype of AdamW's first moment (mu): "float32" or "bfloat16". bf16
    # halves mu's memory (nu stays fp32 — it needs the range); with TP
    # sharding this is the other half of the H-14 memory story.
    moments_dtype: str = "float32"
    # LoRA (arXiv:2106.09685): rank > 0 freezes the base tree and trains
    # low-rank adapters on every block kernel (plus logit_scale), applied
    # as W + (alpha/rank) * A @ B. The trainable state (and with it the
    # AdamW moments and EMA) drops to a few million params — large-tower
    # fine-tuning fits wherever the frozen forward pass does.
    lora_rank: int = 0
    lora_alpha: float = 16.0
    # seed for trainable-state init that is not derived from the model
    # params (today: the LoRA adapter A matrices); wired from SEED so
    # different seeds give independent fine-tunes
    seed: int = 0
    # Knowledge distillation (rebuild extension): a non-empty checkpoint
    # turns on relational KD — the teacher's embeddings are precomputed
    # ONCE over the training pairs (zero teacher FLOPs inside the step)
    # and the student matches the teacher's (B, B) contrastive logit
    # structure (train/loss.py::distill_kl_loss; embedding dims may
    # differ, e.g. an H-14 teacher into a B-32 student). The serving win:
    # big-tower retrieval quality at small-tower embed cost.
    distill_checkpoint: str = ""
    # teacher model name ("" = the student's own variant — self-distill)
    distill_model: str = ""
    # loss mix: (1-w) * contrastive + w * KD; 1.0 = pure distillation
    distill_weight: float = 0.5
    # softmax temperature for both logit matrices (T^2-corrected)
    distill_temperature: float = 1.0
    # Host feed for Trainer.batches: decode-pool size (0 = auto,
    # min(8, cores)) and the decoded-image cache budget (MB; epochs
    # after the first read from memory instead of re-decoding — 0
    # disables). See docs/PERFORMANCE.md "Training feed".
    feed_workers: int = 0
    feed_cache_mb: int = 2048
    # "host" (PIL bicubic pixels, bit-compatible with the embed host
    # feed) or "device" (decode-only host: batches carry uint8 buckets
    # + true sizes, the parity-grade fused bicubic runs on device inside
    # the jitted step — ~3x less host->device traffic, 2.45x per-core
    # feed; <=2 uint8 steps of preprocess drift vs host)
    image_feed: str = "host"
    # "rrc": RandomResizedCrop + horizontal-flip augmentation (standard
    # CLIP training transform), device-feed only — host-sampled boxes
    # fold into the on-device resize weight matrices
    augment: str = "none"
    # Storage dtype for the FROZEN base under LoRA: "bfloat16" halves the
    # dominant memory term (the base never receives updates, so it needs
    # no fp32 accumulation; matmuls already run in bf16). Vectors/scalars
    # (layernorms, biases, logit_scale) stay fp32. fp32 default = exact
    # parity with the checkpoint.
    lora_base_dtype: str = "float32"
    # Fully-sharded data parallelism (ZeRO-3): shard every parameter
    # matrix (plus grads, AdamW moments, and the EMA tree) over the
    # ``data`` mesh axis as well as ``model``, for 1/(data*model) state
    # per device. GSPMD inserts the per-layer weight all-gathers and
    # gradient reduce-scatters. Off by default — it trades ICI traffic
    # for memory, the right trade only when the optimizer state would
    # not otherwise fit (pretrain-scale towers or tiny meshes).
    fsdp: bool = False


@dataclass(frozen=True)
class PipelineConfig:
    """Top-level pipeline configuration."""

    model: ModelConfig = field(default_factory=ModelConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    data: DataConfig = field(default_factory=DataConfig)
    store: StoreConfig = field(default_factory=StoreConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval_output_dir: str = "evaluation_results"
    batch_size: int = 256            # embedding batch per step (global)
    log_level: str = "INFO"
    seed: int = 0
    # Serving-path retrieval: approximate top-k recall target (None = exact).
    # 0.99 measured 2.1x QPS at recall 0.997 (docs/PERFORMANCE.md); the
    # reference's HNSW index was approximate too. Evaluation always uses
    # exact search regardless, so metrics stay deterministic.
    retrieval_recall_target: Optional[float] = None
    # Serving-path index structure: "exact" (default, brute-force MXU
    # matmul — beats probing whenever batches are large), "ivf" (the
    # pgvector-IVFFlat equivalent, union-probed k-means index — wins in
    # the small-batch/large-corpus serving regime; parallel/ivf.py), or
    # "hnsw" (the reference's PRIMARY pgvector index,
    # ref:src/setup_vector_db.py:155-170 — a host-native C++ graph for
    # the no-TPU / single-query lowest-latency corner; parallel/hnsw.py).
    # Evaluation always uses exact search regardless.
    retrieval_index: str = "exact"
    # IVF geometry (None = sqrt(N) lists, lists//8 probes)
    ivf_lists: Optional[int] = None
    ivf_probes: Optional[int] = None
    # HNSW geometry — pgvector's defaults (m=16, ef_construction=64).
    # ef_search None = auto: pgvector's 40, or calibrated to
    # RETRIEVAL_RECALL_TARGET when that is set; an explicit value wins
    # (recall rises with ef_search at linear cost)
    hnsw_m: int = 16
    hnsw_ef_construction: int = 64
    hnsw_ef_search: Optional[int] = None
    # Persist the built HNSW graph here (pgvector's on-disk index
    # analogue): loaded when its fingerprint matches the corpus,
    # rebuilt + re-saved otherwise. None = rebuild at each serve start.
    hnsw_cache: Optional[str] = None
    # Persist the trained IVF structure (centroids + packed layout) here,
    # like pgvector's on-disk index: loaded when it matches the corpus,
    # rebuilt (and re-saved) otherwise. None = rebuild at each serve start.
    ivf_cache: Optional[str] = None
    # Serving-index storage precision: "fp32" (exact), "int8" (per-row
    # symmetric quantization: 4x corpus capacity per HBM byte at ~1e-3
    # similarity perturbation; composes with exact, ivf, and the mesh
    # streaming strategies; sweeps run s8xs8->s32 on the TPU MXU), or
    # "int4" (packed two-per-byte: 8x capacity at coarser ~1e-2
    # quantization; composes with exact, streaming, mesh, and IVF), or
    # "int2" (packed four-per-byte, 4-level values: 16x capacity at
    # ~5e-2-level noise — the extreme-capacity rung; composes with
    # exact, streaming, mesh, and IVF; pair it with RETRIEVAL_REFINE
    # for exact final rankings). RETRIEVAL_INDEX=hnsw instead takes
    # "fp16" (pgvector's halfvec: half the host RAM, ~1e-3 rounding)
    # and warns on the int rungs. Evaluation always uses exact fp32.
    retrieval_precision: str = "fp32"
    # Refine stage (FAISS refine / rescore-after-quantization parity):
    # with a quantized precision (or a recall_target), each search
    # over-fetches k*refine candidates from the fast first stage, then
    # exactly rescores + re-ranks them in fp32 on host (from a host-RAM
    # fp32 copy — zero HBM cost) before returning k. Quantized capacity
    # with exact final rankings; recall@k rises with the factor. 0 = off.
    retrieval_refine: int = 0
    # Where the refine stage's exact-rescore rows live on HOST:
    # "auto" (RAM below ~2 GiB, disk memmap above), "ram" (fp32 ndarray),
    # "fp16" (half the RAM; rescore exact over the fp16-rounded rows,
    # ~5e-4 rounding — still ~8x finer than int8 first-stage noise), or
    # "memmap" (fp32 rows in a disk file, ~0 resident RSS — the
    # capacity-ladder rung: a 24M x 512 corpus's rescore rows are 49 GB,
    # which should page through the OS cache like postgres' heap tables
    # do, not pin process RAM), or "memmap16" (fp16 rows on disk — half
    # the DISK bytes too, for the extreme rungs where even the fp32
    # file won't fit: 96M x 512 int2 needs 196 GB fp32 but 98 GB fp16;
    # ~5e-4 rounding). RETRIEVAL_REFINE_DIR picks the memmap
    # directory (default: system temp dir).
    retrieval_refine_store: str = "auto"
    # Image feed: "host" (PIL bicubic, torchvision parity) or "device"
    # (host decodes only — 2.45x per-core feed rate — resize/crop/normalize
    # fused on TPU as matmul bicubic+antialias matching PIL's uint8
    # pipeline to <=2 uint8 steps; parity-grade as of r3). "host" stays the
    # default for bit-exact reproducibility of existing stores; flip to
    # "device" for throughput.
    image_preprocess: str = "host"
    # uint8 bucket edge for the device feed; size to the corpus (larger
    # images are pre-shrunk on host, smaller ones pad)
    image_preprocess_bucket: int = 256
    # text length buckets for the embed engine (None = always full
    # context). Exact under causal attention; the model context length is
    # always an implicit last bucket.
    text_buckets: Optional[Sequence[int]] = (16, 32, 77)
    # serving request-coalescing window in ms (SERVE_COALESCE_MS; None/off
    # disables): concurrent /search* requests inside the window merge into
    # one device dispatch (serving/server.py BatchCoalescer)
    serve_coalesce_ms: Optional[float] = 2.0
    # serving text-query LRU result cache (SERVE_QUERY_CACHE, entries;
    # 0 = off): repeated /search_text queries skip BOTH the text-tower
    # encode and the corpus sweep; invalidated on corpus mutation
    serve_query_cache: int = 1024
    # serving bearer token (SERVE_TOKEN): when set, every endpoint
    # except /healthz requires "Authorization: Bearer <token>" — the
    # analogue of the reference's DB_PASSWORD (its pgvector endpoint is
    # credentialed; an exposed daemon must be too). None = open
    # (loopback-only deployments).
    serve_token: Optional[str] = None
    # Idle keep-alive read timeout (seconds): a silent client's
    # connection is closed after this long, so crashed peers and
    # never-closing probes cannot pin daemon threads.
    serve_idle_timeout: float = 60.0
    # Request-body ceiling (SERVE_MAX_BODY_BYTES): a Content-Length
    # above it is rejected with 413 BEFORE any body byte is read, so an
    # unauthenticated client claiming an 8 GB body allocates nothing.
    # The default (64 MiB) leaves ample room for /search_image_bytes
    # base64 payloads and bulk /add batches.
    serve_max_body_bytes: int = 64 * 2**20
    # Live-connection cap (SERVE_MAX_CONNECTIONS): ThreadingHTTPServer
    # is thread-per-connection and keep-alive makes threads live as long
    # as connections — past the cap new connections are shed with 503.
    serve_max_connections: int = 128
    # Total-request READ deadline (SERVE_REQUEST_DEADLINE, seconds) on
    # top of the idle timeout: the per-read timeout bounds silence, not
    # drip-feeds (1 byte / 59 s never times out); the watchdog cuts
    # connections still reading past idle_timeout + this.
    serve_request_deadline: float = 30.0
    # auto-compaction threshold (SERVE_AUTO_COMPACT, fraction in (0, 1]):
    # when a delete leaves the served index's dead-row fraction at or
    # above it, the daemon compacts in place — postgres autovacuum
    # parity (ref:src/setup_vector_db.py:155-190 relies on autovacuum's
    # default 0.2 scale factor to reclaim dead index tuples). None/off =
    # manual POST /compact only; opting in is explicit because
    # compaction changes the corpus shape, so searches recompile once.
    serve_auto_compact: Optional[float] = None

    def replace(self, **kw) -> "PipelineConfig":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# Environment loading
# ---------------------------------------------------------------------------


def load_env_file(path: str = ".env") -> dict:
    """Minimal ``.env`` parser (python-dotenv equivalent, no dependency).

    Lines of ``KEY=VALUE``; ``#`` comments and blank lines ignored; values may
    be single- or double-quoted. Does not override variables already in
    ``os.environ`` (matching python-dotenv's default behavior used at
    ref:src/insert_clip_embeddings.py:16).
    """
    out: dict = {}
    p = Path(path)
    if not p.exists():
        return out
    for raw in p.read_text(encoding="utf-8").splitlines():
        line = raw.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        key, _, rhs = line.partition("=")
        key = key.strip()
        stripped = rhs.strip()
        if stripped[:1] in ("\"", "'"):
            # quoted value: closes at the LAST matching quote (interior
            # quotes survive), anything after — e.g. an inline comment
            # — is dropped; '#' inside quotes is kept
            m = re.match(r"^(['\"])(.*)\1", stripped)
            value = m.group(2) if m else stripped
        else:
            # python-dotenv semantics on the UNSTRIPPED value: an
            # inline comment is '#' preceded by whitespace, so
            # `KEY= # c` is empty while `KEY=#ff0000` keeps its value
            value = re.sub(r"\s+#.*", "", rhs).strip()
        out[key] = value
        os.environ.setdefault(key, value)
    return out


def _env(env: Mapping[str, str], key: str, default: str) -> str:
    return env.get(key, os.environ.get(key, default))


def _env_bool(env: Mapping[str, str], key: str, default: bool) -> bool:
    raw = _env(env, key, str(default))
    return str(raw).strip().lower() in ("true", "1", "yes", "on")


def _parse_buckets(raw: str) -> Optional[tuple]:
    """\"16,32,77\" -> (16, 32, 77); \"off\"/\"none\"/\"\" -> None."""
    raw = str(raw).strip().lower()
    if raw in ("", "off", "none", "false", "0"):
        return None
    return tuple(int(b.strip()) for b in raw.split(",") if b.strip())


def load_config(
    env_file: Optional[str] = ".env",
    overrides: Optional[Mapping[str, str]] = None,
) -> PipelineConfig:
    """Build a :class:`PipelineConfig` from defaults + ``.env`` + overrides.

    Environment variable names match the reference ``.env.example``
    (CLIP_MODEL, CLIP_PRETRAINED, LANGUAGE, USE_OCR_FALLBACK,
    MAX_FILE_SIZE_MB, ALLOWED_FILE_TYPES, SOFFICE_PATH, LOG_LEVEL, ...).
    ``CLIP_DIM`` is intentionally ignored: the dimension derives from the
    model (the reference allowed them to disagree, which would break its own
    vector(CLIP_DIM) inserts — SURVEY.md §5 config notes).
    """
    env: dict = {}
    if env_file:
        env.update(load_env_file(env_file))
    if overrides:
        env.update({k: str(v) for k, v in overrides.items()})

    model = ModelConfig(
        model_name=normalize_model_name(_env(env, "CLIP_MODEL", "ViT-B-32")),
        pretrained=_env(env, "CLIP_PRETRAINED", "openai"),
        checkpoint_path=_env(env, "CLIP_CHECKPOINT", "") or None,
        checkpoint_allow_pickle=_env_bool(
            env, "CLIP_CHECKPOINT_ALLOW_PICKLE", False
        ),
        compute_dtype=_env(env, "COMPUTE_DTYPE", "bfloat16"),
        parity_mode=_env_bool(env, "PARITY_MODE", False),
        quant=_env(env, "CLIP_QUANT", "none"),
        remat=_env_bool(env, "CLIP_REMAT", False),
    )
    mesh = MeshConfig(
        data=int(_env(env, "MESH_DATA", "1")),
        model=int(_env(env, "MESH_MODEL", "1")),
    )
    data = DataConfig(
        input_dir=_env(env, "INPUT_DIR", "data/raw/manuals"),
        output_dir=_env(env, "OUTPUT_DIR", "data/processed"),
        language=_env(env, "LANGUAGE", "nl"),
        use_ocr_fallback=_env_bool(env, "USE_OCR_FALLBACK", False),
        max_file_size_mb=int(_env(env, "MAX_FILE_SIZE_MB", "50")),
        caption_linking=_env(env, "CAPTION_LINKING", "first_image"),
        allowed_file_types=tuple(
            t.strip() for t in _env(env, "ALLOWED_FILE_TYPES", "pdf,docx,doc").split(",") if t.strip()
        ),
        soffice_path=_env(env, "SOFFICE_PATH", "soffice"),
        word_to_pdf_timeout_seconds=int(_env(env, "WORD_TO_PDF_TIMEOUT_SECONDS", "120")),
        exclude_terms_file=_env(env, "EXCLUDE_TERMS_FILE", "") or None,
    )
    store = StoreConfig(root=_env(env, "STORE_DIR", "data/store"))
    train = TrainConfig(
        learning_rate=float(_env(env, "LEARNING_RATE", "1e-5")),
        weight_decay=float(_env(env, "WEIGHT_DECAY", "0.2")),
        batch_size=int(_env(env, "TRAIN_BATCH_SIZE", "")
                       or _env(env, "BATCH_SIZE", "256") or "256"),
        warmup_steps=int(_env(env, "WARMUP_STEPS", "200")),
        total_steps=int(_env(env, "TOTAL_STEPS", "2000")),
        weak_score_temperature=float(_env(env, "WEAK_SCORE_TEMPERATURE", "0.5")),
        label_smoothing=float(_env(env, "LABEL_SMOOTHING", "0.0")),
        patch_mask_ratio=float(_env(env, "PATCH_MASK_RATIO", "0.0")),
        loss_type=_env(env, "LOSS_TYPE", "clip"),
        siglip_bias=float(_env(env, "SIGLIP_BIAS", "-10.0")),
        grad_accum_steps=int(_env(env, "GRAD_ACCUM_STEPS", "1")),
        ema_decay=float(_env(env, "EMA_DECAY", "0.0")),
        moments_dtype=_env(env, "MOMENTS_DTYPE", "float32"),
        fsdp=_env_bool(env, "TRAIN_FSDP", False),
        seed=int(_env(env, "SEED", "0")),
        feed_workers=int(_env(env, "TRAIN_FEED_WORKERS", "0")),
        feed_cache_mb=int(_env(env, "TRAIN_FEED_CACHE_MB", "2048")),
        image_feed=_env(env, "TRAIN_IMAGE_FEED", "host"),
        augment=_env(env, "TRAIN_AUGMENT", "none"),
        lora_rank=int(_env(env, "LORA_RANK", "0")),
        lora_alpha=float(_env(env, "LORA_ALPHA", "16.0")),
        lora_base_dtype=_env(env, "LORA_BASE_DTYPE", "float32"),
        distill_checkpoint=_env(env, "DISTILL_CHECKPOINT", ""),
        distill_model=_env(env, "DISTILL_MODEL", ""),
        distill_weight=float(_env(env, "DISTILL_WEIGHT", "0.5")),
        distill_temperature=float(_env(env, "DISTILL_TEMPERATURE", "1.0")),
    )
    if not 0.0 <= train.distill_weight <= 1.0:
        raise ValueError(
            f"DISTILL_WEIGHT must be in [0, 1], got {train.distill_weight}"
        )
    if train.distill_temperature <= 0.0:
        raise ValueError(
            f"DISTILL_TEMPERATURE must be > 0, got {train.distill_temperature}"
        )
    if train.distill_model and not train.distill_checkpoint:
        raise ValueError(
            "DISTILL_MODEL is set but DISTILL_CHECKPOINT is not — a teacher "
            "needs weights (set DISTILL_CHECKPOINT to the teacher checkpoint)"
        )
    if train.image_feed not in ("host", "device"):
        raise ValueError(
            f"TRAIN_IMAGE_FEED must be host|device, got {train.image_feed!r}"
        )
    if train.augment not in ("none", "rrc"):
        raise ValueError(
            f"TRAIN_AUGMENT must be none|rrc, got {train.augment!r}"
        )
    if train.augment == "rrc" and train.image_feed != "device":
        raise ValueError(
            "TRAIN_AUGMENT=rrc needs TRAIN_IMAGE_FEED=device (crop boxes "
            "fold into the on-device resize weights)"
        )
    auto_compact_raw = _env(env, "SERVE_AUTO_COMPACT", "")
    serve_auto_compact = (
        float(auto_compact_raw)
        if auto_compact_raw.lower() not in ("", "off", "none") else None
    )
    if serve_auto_compact is not None and not 0.0 < serve_auto_compact <= 1.0:
        raise ValueError(
            f"SERVE_AUTO_COMPACT must be a fraction in (0, 1] (postgres' "
            f"autovacuum scale factor analogue), got {serve_auto_compact}"
        )
    return PipelineConfig(
        model=model,
        mesh=mesh,
        data=data,
        store=store,
        train=train,
        eval_output_dir=_env(env, "EVAL_OUTPUT_DIR", "evaluation_results"),
        batch_size=int(_env(env, "BATCH_SIZE", "256")),
        log_level=_env(env, "LOG_LEVEL", "INFO"),
        seed=int(_env(env, "SEED", "0")),
        retrieval_recall_target=(
            float(_env(env, "RETRIEVAL_RECALL_TARGET", ""))
            if _env(env, "RETRIEVAL_RECALL_TARGET", "") else None
        ),
        retrieval_index=_env(env, "RETRIEVAL_INDEX", "exact"),
        retrieval_precision=_env(env, "RETRIEVAL_PRECISION", "fp32"),
        retrieval_refine=int(_env(env, "RETRIEVAL_REFINE", "0")),
        retrieval_refine_store=_env(env, "RETRIEVAL_REFINE_STORE", "auto"),
        ivf_lists=(
            int(_env(env, "IVF_LISTS", ""))
            if _env(env, "IVF_LISTS", "") else None
        ),
        ivf_probes=(
            int(_env(env, "IVF_PROBES", ""))
            if _env(env, "IVF_PROBES", "") else None
        ),
        ivf_cache=_env(env, "IVF_CACHE", "") or None,
        hnsw_m=int(_env(env, "HNSW_M", "16")),
        hnsw_ef_construction=int(_env(env, "HNSW_EF_CONSTRUCTION", "64")),
        hnsw_ef_search=(
            int(_env(env, "HNSW_EF_SEARCH", ""))
            if _env(env, "HNSW_EF_SEARCH", "") else None
        ),
        hnsw_cache=_env(env, "HNSW_CACHE", "") or None,
        image_preprocess=_env(env, "IMAGE_PREPROCESS", "host"),
        image_preprocess_bucket=int(
            _env(env, "IMAGE_PREPROCESS_BUCKET", "256")
        ),
        text_buckets=_parse_buckets(_env(env, "TEXT_BUCKETS", "16,32,77")),
        serve_coalesce_ms=(
            float(_env(env, "SERVE_COALESCE_MS", "2.0"))
            if _env(env, "SERVE_COALESCE_MS", "2.0").lower()
            not in ("off", "none", "") else None
        ),
        serve_query_cache=int(_env(env, "SERVE_QUERY_CACHE", "1024")),
        serve_token=_env(env, "SERVE_TOKEN", "") or None,
        serve_idle_timeout=float(_env(env, "SERVE_IDLE_TIMEOUT", "60")),
        serve_max_body_bytes=int(
            _env(env, "SERVE_MAX_BODY_BYTES", str(64 * 2**20))
        ),
        serve_max_connections=int(_env(env, "SERVE_MAX_CONNECTIONS", "128")),
        serve_request_deadline=float(
            _env(env, "SERVE_REQUEST_DEADLINE", "30")
        ),
        serve_auto_compact=serve_auto_compact,
    )

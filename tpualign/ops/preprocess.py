"""CLIP image preprocessing.

The reference runs torchvision's preprocess on host CPU one image at a time
(ref:src/insert_clip_embeddings.py:107-108: PIL open -> preprocess ->
unsqueeze(0)). Semantics of the OpenCLIP transform: resize the short side to
``image_size`` with bicubic interpolation + antialias, center-crop to
``image_size`` x ``image_size``, scale to [0,1], normalize with the CLIP
channel statistics.

Two paths here:

- :func:`preprocess_host` — exact-parity host path (PIL bicubic, identical
  to torchvision) used for drift validation and small corpora.
- :func:`preprocess_device` — the throughput path: the host only decodes
  JPEG/PNG bytes and pads crops into fixed-size uint8 buckets; resize,
  crop, scale and normalize all run on TPU under jit with static shapes.
  The resize reproduces PIL/torchvision BICUBIC-with-antialias semantics
  (parity-grade, see :func:`_resample_weights`) as two MXU matmuls per
  image — weight matrices are built on the fly from each image's true
  (h, w), so one compiled executable serves every crop size in a bucket.
  HBM traffic is one uint8 array in and the model-ready tensor never
  round-trips. A ``method="bilinear"`` fallback keeps the cheaper gather
  path available.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)

__all__ = [
    "CLIP_MEAN",
    "CLIP_STD",
    "preprocess_host",
    "preprocess_device",
    "normalize_images",
    "pad_to_bucket",
]


def normalize_images(images: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(…, H, W, 3) float in [0,1] -> CLIP-normalized."""
    mean = jnp.asarray(CLIP_MEAN, dtype)
    std = jnp.asarray(CLIP_STD, dtype)
    return ((images.astype(dtype) - mean) / std).astype(dtype)


# ---------------------------------------------------------------------------
# Host parity path (PIL — bit-matches torchvision's transform)
# ---------------------------------------------------------------------------


def preprocess_host(pil_image, image_size: int = 224) -> np.ndarray:
    """PIL image -> (H, W, 3) float32 normalized array (NHWC).

    Matches torchvision Resize(short side, BICUBIC, antialias=True) +
    CenterCrop + ToTensor + Normalize, which is the OpenCLIP `preprocess`
    the reference applies per image.
    """
    from PIL import Image

    img = pil_image.convert("RGB")
    w, h = img.size
    if w < h:
        new_w, new_h = image_size, max(1, round(h * image_size / w))
    else:
        new_w, new_h = max(1, round(w * image_size / h)), image_size
    img = img.resize((new_w, new_h), Image.BICUBIC)
    left = (new_w - image_size) // 2
    top = (new_h - image_size) // 2
    img = img.crop((left, top, left + image_size, top + image_size))
    arr = np.asarray(img, np.float32) / 255.0
    mean = np.asarray(CLIP_MEAN, np.float32)
    std = np.asarray(CLIP_STD, np.float32)
    return (arr - mean) / std


# ---------------------------------------------------------------------------
# Device throughput path
# ---------------------------------------------------------------------------


def pad_to_bucket(
    decoded: np.ndarray, bucket: int
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Pad a decoded (h, w, 3) uint8 image into a (bucket, bucket, 3) buffer.

    Images larger than the bucket are pre-shrunk on host (PIL bicubic, the
    same antialiased family as the parity resize — still one extra
    resampling vs the host path's single resize, flagged in
    docs/PARITY.md) so the jit shapes stay static. Returns the padded
    buffer and the true (h, w) occupying its top-left corner.
    """
    h, w = decoded.shape[:2]
    if h > bucket or w > bucket:
        from PIL import Image

        scale = bucket / max(h, w)
        nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
        decoded = np.asarray(
            Image.fromarray(decoded).resize((nw, nh), Image.BICUBIC)
        )
        h, w = nh, nw
    out = np.zeros((bucket, bucket, 3), np.uint8)
    out[:h, :w] = decoded
    return out, (h, w)


def _output_geometry(true_hw: jnp.ndarray, image_size: int):
    """Replicates the host path's resize-short-side + center-crop geometry
    with traced (h, w): new dims via round-half-even (Python round()'s
    rule, which jnp.round shares), crop offsets via floor division."""
    h = true_hw[0].astype(jnp.float32)
    w = true_hw[1].astype(jnp.float32)
    s = jnp.float32(image_size)
    new_h = jnp.where(w < h, jnp.maximum(jnp.round(h * s / w), 1.0), s)
    new_w = jnp.where(w < h, s, jnp.maximum(jnp.round(w * s / h), 1.0))
    top = jnp.floor((new_h - s) / 2.0)
    left = jnp.floor((new_w - s) / 2.0)
    return h, w, new_h, new_w, top, left


def _bicubic_kernel(x: jnp.ndarray) -> jnp.ndarray:
    """PIL/torchvision bicubic filter (a = -0.5), support 2."""
    a = -0.5
    ax = jnp.abs(x)
    w1 = ((a + 2.0) * ax - (a + 3.0)) * ax * ax + 1.0
    w2 = (((ax - 5.0) * ax + 8.0) * ax - 4.0) * a
    return jnp.where(ax < 1.0, w1, jnp.where(ax < 2.0, w2, 0.0))


def _resample_weights(
    in_size: jnp.ndarray, scale: jnp.ndarray, offset: jnp.ndarray,
    bucket: int, image_size: int,
) -> jnp.ndarray:
    """(image_size, bucket) separable resampling weight matrix reproducing
    PIL's antialiased bicubic (ImagingResampleHorizontal semantics, the
    engine under torchvision Resize(..., BICUBIC, antialias=True) that the
    reference's OpenCLIP `preprocess` applies per image,
    ref:src/insert_clip_embeddings.py:107-108):

    - output pixel ``i`` (after the center-crop, so source row
      ``i + offset`` of the resized image) has center ``(i + offset + 0.5)
      * scale`` in source space;
    - on downscale the filter dilates by ``ss = max(scale, 1)`` (the
      antialias), taps at every source pixel ``s + 0.5``;
    - taps outside the valid region [0, in_size) are dropped and the row
      renormalized — exactly PIL's xmin/xmax clipping + coefficient
      normalization.

    Dense (image_size, bucket) instead of a banded gather: the follow-up
    apply is then a plain matmul on the MXU, and one compiled executable
    covers every (h, w) in the bucket with no dynamic shapes.
    """
    ss = jnp.maximum(scale, 1.0)
    i = jnp.arange(image_size, dtype=jnp.float32)[:, None]
    s = jnp.arange(bucket, dtype=jnp.float32)[None, :]
    center = (i + offset + 0.5) * scale
    w = _bicubic_kernel((s + 0.5 - center) / ss)
    w = jnp.where(s < in_size, w, 0.0)
    return w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)


def _resample_weights_box(start, length, bucket: int, image_size: int):
    """Resample weights for an arbitrary integer crop box segment
    [start, start+length) mapped to the full ``image_size`` output —
    PIL crop-then-resize parity: taps clip to the BOX (the cropped
    image's borders), not the full valid region, and the filter dilates
    by the box's own scale (antialias). The random-resized-crop
    augmentation arm of the device feed."""
    scale = length / jnp.float32(image_size)
    ss = jnp.maximum(scale, 1.0)
    i = jnp.arange(image_size, dtype=jnp.float32)[:, None]
    s = jnp.arange(bucket, dtype=jnp.float32)[None, :]
    center = start + (i + 0.5) * scale
    w = _bicubic_kernel((s + 0.5 - center) / ss)
    w = jnp.where((s >= start) & (s < start + length), w, 0.0)
    return w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)


def _resize_crop_box_bicubic(
    image: jnp.ndarray, crop_box: jnp.ndarray, do_flip: jnp.ndarray,
    bucket: int, image_size: int,
) -> jnp.ndarray:
    """Resize an arbitrary (cy, cx, ch, cw) source box to the full
    (S, S) output with the same PIL-parity bicubic+antialias
    weight-matrix machinery as the center-crop path; a horizontal flip
    reverses the x-weight OUTPUT rows — bit-identical to flipping the
    resized image (same taps, same sums). This is torchvision's
    RandomResizedCrop semantics (crop-then-resize) on device."""
    cy = crop_box[0]
    cx = crop_box[1]
    ch = crop_box[2]
    cw = crop_box[3]
    wy = _resample_weights_box(cy, ch, bucket, image_size)
    wx = _resample_weights_box(cx, cw, bucket, image_size)
    wx = jnp.where(do_flip, wx[::-1, :], wx)
    hp = jax.lax.Precision.HIGHEST
    cols = jnp.einsum("jt,stc->sjc", wx, image, precision=hp)
    cols = _quantize_u8_grid(cols)
    out = jnp.einsum("os,sjc->ojc", wy, cols, precision=hp)
    return _quantize_u8_grid(out)


def sample_crop_boxes(
    rng, true_hw: "np.ndarray", scale_range=(0.6, 1.0),
    ratio_range=(3.0 / 4.0, 4.0 / 3.0), flip_prob: float = 0.5,
):
    """Host-side RandomResizedCrop sampling (torchvision's algorithm:
    10 attempts of area*aspect jitter, center-crop fallback), returning
    ((B, 4) float32 integer boxes (cy, cx, ch, cw), (B,) bool flips) for
    :func:`preprocess_device`'s augmentation arm. Sampling stays on host
    (like FLIP's patch indices) so the jitted step is a pure function of
    its inputs."""
    import math

    import numpy as np

    n = len(true_hw)
    boxes = np.zeros((n, 4), np.float32)
    for b in range(n):
        h, w = int(true_hw[b][0]), int(true_hw[b][1])
        area = h * w
        for _ in range(10):
            target = area * rng.uniform(*scale_range)
            logr = rng.uniform(math.log(ratio_range[0]),
                               math.log(ratio_range[1]))
            r = math.exp(logr)
            cw = int(round(math.sqrt(target * r)))
            ch = int(round(math.sqrt(target / r)))
            if 0 < cw <= w and 0 < ch <= h:
                cy = int(rng.integers(0, h - ch + 1))
                cx = int(rng.integers(0, w - cw + 1))
                boxes[b] = (cy, cx, ch, cw)
                break
        else:  # center-crop fallback, torchvision's
            ratio = w / h
            if ratio < ratio_range[0]:
                cw, ch = w, min(h, int(round(w / ratio_range[0])))
            elif ratio > ratio_range[1]:
                cw, ch = min(w, int(round(h * ratio_range[1]))), h
            else:
                cw, ch = w, h
            boxes[b] = ((h - ch) // 2, (w - cw) // 2, ch, cw)
    flips = rng.random(n) < flip_prob
    return boxes, flips


def _quantize_u8_grid(x: jnp.ndarray) -> jnp.ndarray:
    """Clamp + round to the uint8 grid in [0,1] space, PIL's clip8 with
    round-half-up (``ss + (1 << (PRECISION_BITS-1)) >> PRECISION_BITS``)."""
    return jnp.clip(jnp.floor(x * 255.0 + 0.5), 0.0, 255.0) * (1.0 / 255.0)


def _resize_short_side_crop_bicubic(
    image: jnp.ndarray, true_hw: jnp.ndarray, bucket: int, image_size: int
) -> jnp.ndarray:
    """Parity-grade device resize: PIL bicubic + antialias + center-crop as
    two weight-matrix matmuls — MXU work, not gathers.

    Matches PIL's uint8 pipeline (the torchvision transform the reference
    applies, ref:src/insert_clip_embeddings.py:107-108) to ~1 uint8 step:
    horizontal pass first, each pass's result clamped and rounded to the
    uint8 grid exactly where PIL's fixed-point ``clip8`` does. The crop is
    fused into the weight matrices (identical per-pixel taps, never
    materializing the (new_h, new_w) intermediate)."""
    h, w, new_h, new_w, top, left = _output_geometry(true_hw, image_size)
    wy = _resample_weights(h, h / new_h, top, bucket, image_size)
    wx = _resample_weights(w, w / new_w, left, bucket, image_size)
    # HIGHEST: keep true fp32 through the MXU (the TPU default rounds fp32
    # matmuls to bf16 operands, which would cost ~1 uint8 step per pass);
    # the resize is a negligible fraction of tower FLOPs
    hp = jax.lax.Precision.HIGHEST
    cols = jnp.einsum("jt,stc->sjc", wx, image, precision=hp)  # (bucket, S, 3)
    cols = _quantize_u8_grid(cols)
    out = jnp.einsum("os,sjc->ojc", wy, cols, precision=hp)    # (S, S, 3)
    return _quantize_u8_grid(out)


def _resize_short_side_crop(
    image: jnp.ndarray, true_hw: jnp.ndarray, bucket: int, image_size: int
) -> jnp.ndarray:
    """One (bucket, bucket, 3) float image with valid region (h, w) ->
    (image_size, image_size, 3): scale the short side of the valid region to
    ``image_size``, center-crop the long side.

    Implemented with a static-shape gather: output pixel (i, j) maps to a
    dynamically computed source coordinate — XLA-friendly (no dynamic
    shapes), bilinear sampling (NO antialias — a throughput knob, not the
    parity path; see :func:`_resize_short_side_crop_bicubic`).
    """
    h = true_hw[0].astype(jnp.float32)
    w = true_hw[1].astype(jnp.float32)
    short = jnp.minimum(h, w)
    scale = short / image_size  # source pixels per output pixel
    # center offsets in source space for the crop
    out = jnp.arange(image_size, dtype=jnp.float32) + 0.5
    src_y0 = (h - scale * image_size) / 2.0
    src_x0 = (w - scale * image_size) / 2.0
    src_y = src_y0 + out * scale - 0.5
    src_x = src_x0 + out * scale - 0.5

    y0 = jnp.clip(jnp.floor(src_y), 0, bucket - 1)
    x0 = jnp.clip(jnp.floor(src_x), 0, bucket - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = jnp.clip(src_y - y0, 0.0, 1.0)
    wx = jnp.clip(src_x - x0, 0.0, 1.0)
    y0i, y1i, x0i, x1i = (t.astype(jnp.int32) for t in (y0, y1, x0, x1))

    # gather rows then columns (separable bilinear)
    top = image[y0i, :, :]  # (S, bucket, 3)
    bot = image[y1i, :, :]
    rows = top * (1.0 - wy)[:, None, None] + bot * wy[:, None, None]
    left = rows[:, x0i, :]  # (S, S, 3)
    right = rows[:, x1i, :]
    return left * (1.0 - wx)[None, :, None] + right * wx[None, :, None]


def preprocess_device(
    images_u8: jnp.ndarray,
    true_hw: jnp.ndarray,
    image_size: int = 224,
    dtype=jnp.float32,
    method: str = "bicubic",
    crop_boxes: jnp.ndarray = None,
    flip: jnp.ndarray = None,
) -> jnp.ndarray:
    """Batched on-device preprocess.

    Args:
      images_u8: (B, bucket, bucket, 3) uint8, valid region top-left.
      true_hw: (B, 2) int32 true (h, w) per image.
      method: "bicubic" (default; PIL/torchvision antialias parity — the
        device feed is parity-grade) or "bilinear" (cheaper gather, no
        antialias — throughput knob).
      crop_boxes: optional (B, 4) float32 integer (cy, cx, ch, cw) boxes
        (see :func:`sample_crop_boxes`) — RandomResizedCrop semantics:
        each box resizes to the FULL output (crop-then-resize, PIL
        parity) instead of the short-side + center-crop geometry.
        Bicubic only (the augmentation arm of the training device feed).
      flip: optional (B,) bool horizontal flips (with ``crop_boxes``).

    Returns (B, image_size, image_size, 3) normalized ``dtype`` tensor.
    """
    if method not in ("bicubic", "bilinear"):
        raise ValueError(f"method must be bicubic or bilinear, got {method!r}")
    bucket = images_u8.shape[1]
    imgs = images_u8.astype(jnp.float32) / 255.0
    if crop_boxes is not None:
        if method != "bicubic":
            raise ValueError("crop_boxes requires the bicubic path")
        if flip is None:
            flip = jnp.zeros((images_u8.shape[0],), bool)

        def one_box(img, box, fl):
            return _resize_crop_box_bicubic(img, box, fl, bucket,
                                            image_size)

        out = jax.vmap(one_box)(imgs, crop_boxes, flip)
        return normalize_images(out, dtype)
    resize = (
        _resize_short_side_crop_bicubic
        if method == "bicubic" else _resize_short_side_crop
    )

    def one(img, hw):
        return resize(img, hw, bucket, image_size)

    out = jax.vmap(one)(imgs, true_hw)
    return normalize_images(out, dtype)

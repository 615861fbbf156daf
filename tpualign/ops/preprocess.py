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
  crop, scale and normalize all run on TPU under jit (static shapes,
  ``jax.image.resize`` with antialiasing + fused normalize), so HBM traffic
  is one uint8 array in and the model-ready tensor never round-trips.
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

    Images larger than the bucket are pre-shrunk on host (PIL bilinear) so
    the jit shapes stay static. Returns the padded buffer and the true
    (h, w) occupying its top-left corner.
    """
    h, w = decoded.shape[:2]
    if h > bucket or w > bucket:
        from PIL import Image

        scale = bucket / max(h, w)
        nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
        decoded = np.asarray(
            Image.fromarray(decoded).resize((nw, nh), Image.BILINEAR)
        )
        h, w = nh, nw
    out = np.zeros((bucket, bucket, 3), np.uint8)
    out[:h, :w] = decoded
    return out, (h, w)


def _resize_short_side_crop(
    image: jnp.ndarray, true_hw: jnp.ndarray, bucket: int, image_size: int
) -> jnp.ndarray:
    """One (bucket, bucket, 3) float image with valid region (h, w) ->
    (image_size, image_size, 3): scale the short side of the valid region to
    ``image_size``, center-crop the long side.

    Implemented with a static-shape gather: output pixel (i, j) maps to a
    dynamically computed source coordinate — XLA-friendly (no dynamic
    shapes), bilinear sampling. Bilinear (not bicubic) keeps the gather
    footprint small; the parity path uses the host bicubic instead.
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
) -> jnp.ndarray:
    """Batched on-device preprocess.

    Args:
      images_u8: (B, bucket, bucket, 3) uint8, valid region top-left.
      true_hw: (B, 2) int32 true (h, w) per image.

    Returns (B, image_size, image_size, 3) normalized ``dtype`` tensor.
    """
    bucket = images_u8.shape[1]
    imgs = images_u8.astype(jnp.float32) / 255.0

    def one(img, hw):
        return _resize_short_side_crop(img, hw, bucket, image_size)

    out = jax.vmap(one)(imgs, true_hw)
    return normalize_images(out, dtype)

"""Tissue masking ops: RGB→HSV, Otsu thresholding, foreground masks.

TPU-native replacement for the tissue-segmentation math the reference
delegates to Mussel (Otsu, ``tiling.py:28-30``) and computes with skimage
(HSV saturation > 0.04 tissue boundary, ``polygon_morphology.py:100-153``).
All functions are jit-friendly (static shapes, no host sync) and operate on
uint8 RGB arrays of shape (H, W, 3) or batches (N, H, W, 3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """uint8/float RGB (..., 3) → float32 HSV with H, S, V ∈ [0, 1].

    Matches matplotlib/skimage ``rgb2hsv`` semantics (hue wraps at 1.0).
    """
    x = rgb.astype(jnp.float32)
    x = jnp.where(jnp.issubdtype(rgb.dtype, jnp.integer), x / 255.0, x)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        r == maxc, bc - gc, jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = (h / 6.0) % 1.0
    h = jnp.where(delta == 0, 0.0, h)
    return jnp.stack([h, s, v], axis=-1)


def histogram_256(
    img_u8: jnp.ndarray, weights: jnp.ndarray | None = None
) -> jnp.ndarray:
    """256-bin histogram of a uint8 image (any shape) via one-hot sum.
    ``weights`` (same shape, 0/1) excludes pixels — used to ignore the
    padding of canonically-shaped thumbnails."""
    flat = img_u8.reshape(-1).astype(jnp.int32)
    w = (
        jnp.ones_like(flat, jnp.int32)
        if weights is None
        else weights.reshape(-1).astype(jnp.int32)
    )
    return jnp.zeros((256,), jnp.int32).at[flat].add(w)


def otsu_threshold(
    img_u8: jnp.ndarray, weights: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Otsu's threshold over a uint8 image. Returns the scalar threshold t;
    foreground is ``img > t`` (skimage ``threshold_otsu`` convention)."""
    hist = histogram_256(img_u8, weights).astype(jnp.float32)
    total = jnp.sum(hist)
    bins = jnp.arange(256, dtype=jnp.float32)
    w0 = jnp.cumsum(hist)
    sum0 = jnp.cumsum(hist * bins)
    sum_all = sum0[-1]
    w1 = total - w0
    mu0 = sum0 / jnp.maximum(w0, 1e-12)
    mu1 = (sum_all - sum0) / jnp.maximum(w1, 1e-12)
    between = w0 * w1 * (mu0 - mu1) ** 2
    between = jnp.where((w0 > 0) & (w1 > 0), between, -1.0)
    return jnp.argmax(between).astype(jnp.uint8)


def median_blur_3x3(img: jnp.ndarray) -> jnp.ndarray:
    """3×3 median filter (edge-replicated) — the usual smoothing before Otsu
    in WSI foreground segmentation."""
    pad = jnp.pad(img, 1, mode="edge")
    stack = jnp.stack(
        [pad[dy : dy + img.shape[0], dx : dx + img.shape[1]] for dy in range(3) for dx in range(3)],
        axis=0,
    )
    return jnp.median(stack, axis=0).astype(img.dtype)


@partial(jax.jit, static_argnames=("use_otsu",))
def tissue_mask(
    thumbnail_rgb: jnp.ndarray,
    use_otsu: bool = True,
    segment_threshold: int = 20,
    valid_hw: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Foreground tissue mask from an RGB thumbnail.

    Mussel/CLAM-style: saturation channel (scaled to uint8) → 3×3 median →
    Otsu (or fixed) threshold. ``segment_threshold`` acts as a floor so
    near-blank slides don't segment noise (ref config ``segment_threshold=20``
    at ``tiling.py:29``). Returns bool (H, W).

    ``valid_hw``: optional (2,) int32 DYNAMIC valid extent (rows, cols) —
    lets callers pad thumbnails to one canonical shape (a fresh thumbnail
    shape per slide would recompile this program per slide, minutes each
    on a remote-compile chip); padding is excluded from the Otsu
    histogram and forced to background in the output.
    """
    hsv = rgb_to_hsv(thumbnail_rgb)
    sat_u8 = (hsv[..., 1] * 255.0).astype(jnp.uint8)
    valid = None
    if valid_hw is not None:
        h, w = sat_u8.shape
        # replicate the last valid row/col into the padding BEFORE the
        # median blur: zero-saturation padding would otherwise bleed into
        # the last valid row/col through the 3×3 window, deviating from
        # the unpadded per-shape path by a 1-px ring (ADVICE r2). After
        # this fill the blur sees exactly the cropped image's
        # edge-replicated neighborhood, so the paths match everywhere.
        rows_idx = jnp.minimum(jnp.arange(h), valid_hw[0] - 1)
        cols_idx = jnp.minimum(jnp.arange(w), valid_hw[1] - 1)
        sat_u8 = sat_u8[rows_idx[:, None], cols_idx[None, :]]
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        valid = (rows < valid_hw[0]) & (cols < valid_hw[1])
    sat_u8 = median_blur_3x3(sat_u8)
    if use_otsu:
        t = jnp.maximum(
            otsu_threshold(sat_u8, valid), jnp.uint8(segment_threshold)
        )
    else:
        t = jnp.uint8(segment_threshold)
    mask = sat_u8 > t
    return mask if valid is None else mask & valid


@jax.jit
def tissue_mask_hsv(thumbnail_rgb: jnp.ndarray, sat_threshold: float = 0.04) -> jnp.ndarray:
    """Plain HSV-saturation mask (polygon_morphology.py:114-121 semantics:
    ``hsv[..., 1] > 0.04``). Morphological cleanup is applied separately by
    ``ops.morphology``."""
    hsv = rgb_to_hsv(thumbnail_rgb)
    return hsv[..., 1] > sat_threshold

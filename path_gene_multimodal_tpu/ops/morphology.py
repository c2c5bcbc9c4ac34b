"""Binary morphology on-device (XLA conv formulation).

Replaces the skimage/cv2 morphology the reference applies to tile grids and
thumbnails (``create_and_overlay_polygon_from_prediction.py:160-179``
closing+opening with a disk SE; ``polygon_morphology.py:100-153`` disk(6)
closing + small-object/hole removal; ``polygon_and_preview.py`` ellipse
CLOSE/OPEN).

Border semantics match skimage (the reference's library): out-of-image
pixels are False for dilation and True for erosion, so foreground touching
the border is preserved by closing.

Formulation: dilation = conv(mask, SE) > 0; erosion = conv(mask, SE) ==
sum(SE). One batched conv over a stacked (K, H, W) mask set handles all
classes in a single XLA kernel. Inputs can be any 2-D or 3-D (leading batch)
bool array.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def disk(radius: int) -> np.ndarray:
    """skimage.morphology.disk: (2r+1)² grid, x²+y² ≤ r²."""
    r = int(radius)
    yy, xx = np.mgrid[-r : r + 1, -r : r + 1]
    return (xx * xx + yy * yy <= r * r).astype(np.float32)


def ellipse_kernel(h: int, w: int) -> np.ndarray:
    """cv2.getStructuringElement(MORPH_ELLIPSE, (w, h)) equivalent."""
    import cv2

    return cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (int(w), int(h))).astype(np.float32)


def _conv_count(mask: jnp.ndarray, se: np.ndarray, pad_value: float) -> jnp.ndarray:
    """Counts of SE-covered foreground at each pixel, with explicit border
    fill. mask: (..., H, W) float32."""
    squeeze = mask.ndim == 2
    if squeeze:
        mask = mask[None]
    k = jnp.asarray(se, jnp.float32)
    kh, kw = k.shape
    ph0, ph1 = kh // 2, kh - 1 - kh // 2
    pw0, pw1 = kw // 2, kw - 1 - kw // 2
    x = jnp.pad(
        mask.astype(jnp.float32),
        ((0, 0), (ph0, ph1), (pw0, pw1)),
        constant_values=pad_value,
    )
    out = jax.lax.conv_general_dilated(
        x[:, None],                       # NCHW
        k[None, None],                    # OIHW
        window_strides=(1, 1),
        padding="VALID",
        preferred_element_type=jnp.float32,
    )[:, 0]
    return out[0] if squeeze else out


# SEs are tiny host constants; keep them numpy (baked into the trace) so
# callers can jit at whatever level they like.
def binary_dilation(mask: jnp.ndarray, se: np.ndarray) -> jnp.ndarray:
    return _conv_count(mask, np.asarray(se), 0.0) > 0.5


def binary_erosion(mask: jnp.ndarray, se: np.ndarray) -> jnp.ndarray:
    se = np.asarray(se)
    return _conv_count(mask, se, 1.0) > float(se.sum()) - 0.5


def binary_closing(mask: jnp.ndarray, se: np.ndarray) -> jnp.ndarray:
    return binary_erosion(binary_dilation(mask, se), se)


def binary_opening(mask: jnp.ndarray, se: np.ndarray) -> jnp.ndarray:
    return binary_dilation(binary_erosion(mask, se), se)


def gaussian_blur(img: jnp.ndarray, sigma: float, truncate: float = 4.0) -> jnp.ndarray:
    """Separable Gaussian (skimage.filters.gaussian semantics: 'nearest'
    border mode, radius = truncate * sigma rounded) — the reference's
    smooth_mask blur (create_and_overlay_polygon_from_prediction.py:173-176)."""
    # scipy's radius rule: int(truncate*sigma + 0.5). Python round() would
    # banker's-round half-integers DOWN (4.5→4), shrinking the kernel
    # support vs the skimage parity target.
    radius = int(truncate * float(sigma) + 0.5)
    xs = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (xs / sigma) ** 2)
    k /= k.sum()
    k = jnp.asarray(k)
    squeeze = img.ndim == 2
    x = img[None] if squeeze else img
    x = x.astype(jnp.float32)
    pad = ((0, 0), (radius, radius), (0, 0))
    xp = jnp.pad(x, pad, mode="edge")
    x = jax.lax.conv_general_dilated(
        xp[:, None], k[None, None, :, None], (1, 1), "VALID",
        preferred_element_type=jnp.float32,
    )[:, 0]
    pad = ((0, 0), (0, 0), (radius, radius))
    xp = jnp.pad(x, pad, mode="edge")
    x = jax.lax.conv_general_dilated(
        xp[:, None], k[None, None, None, :], (1, 1), "VALID",
        preferred_element_type=jnp.float32,
    )[:, 0]
    return x[0] if squeeze else x

"""Device-side JPEG chroma upsample + YCbCr→RGB conversion.

The planar tile feed halves host→device bytes by shipping JPEG tiles as raw
4:2:0 planes (Y full-res + Cb/Cr quarter-res, ``native/tiledecode.cpp
decode_jpeg_batch_planar``) and finishing the decode on device: 2×2 nearest
chroma upsample + libjpeg's exact fixed-point YCbCr→RGB conversion
(jdcolor.c/jdmerge.c integer tables, SCALEBITS=16). Output is bit-identical
to the native decoder's nearest-upsample RGB path
(``decode_jpeg_batch_nearest``) — tested in ``tests/test_slide_io.py``.

Rationale: the reference delegates tile decode to tiffslide/libjpeg on the
host and ships full RGB to the accelerator (SURVEY.md §1 L0;
``extract_embedding_from_tiles.py:16`` moves decoded uint8 batches). On TPU
the host→device link is the narrow resource (PCIe in production, ~25-70 MB/s
over the dev tunnel), while the VPU upsample+convert is ~free next to the
model matmuls — so the TPU-native design moves the last decode stage across
the link in compressed planar form.

Chroma-fidelity note: production default RGB decode keeps libjpeg *fancy*
(triangular) chroma upsampling; the planar path uses *nearest* upsampling
(libjpeg's merged/do_fancy_upsampling=FALSE semantics) because nearest
commutes with the even-aligned plane crops done during region assembly.
The two differ by at most ±1 chroma level before conversion — smaller than
the decode variance the reference already tolerates across its own readers
(tiffslide/PIL/cv2 builds differ in the same way).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# libjpeg jdcolor.c fixed-point constants: FIX(x) = int(x * 2**16 + 0.5)
_SCALEBITS = 16
_ONE_HALF = 1 << (_SCALEBITS - 1)
_FIX_1_40200 = 91881
_FIX_1_77200 = 116130
_FIX_0_71414 = 46802
_FIX_0_34414 = 22554


def ycbcr420_to_rgb(y: jnp.ndarray, cbcr: jnp.ndarray) -> jnp.ndarray:
    """Finish a planar 4:2:0 JPEG decode on device.

    Args:
      y: uint8 luma, shape (..., H, W).
      cbcr: uint8 interleaved chroma, shape (..., ⌈H/2⌉, ⌈W/2⌉, 2).

    Returns uint8 RGB (..., H, W, 3), bit-identical to libjpeg's
    nearest-upsample (merged) decode of the same scan data.
    """
    h, w = y.shape[-2], y.shape[-1]
    cb = cbcr[..., 0].astype(jnp.int32) - 128
    cr = cbcr[..., 1].astype(jnp.int32) - 128
    # h2v2 nearest upsample: each chroma sample covers a 2×2 luma block
    up = lambda c: jnp.repeat(jnp.repeat(c, 2, axis=-2), 2, axis=-1)[
        ..., :h, :w
    ]
    cb = up(cb)
    cr = up(cr)
    yi = y.astype(jnp.int32)
    r = yi + ((_FIX_1_40200 * cr + _ONE_HALF) >> _SCALEBITS)
    g = yi + (
        ((-_FIX_0_34414) * cb + _ONE_HALF + (-_FIX_0_71414) * cr)
        >> _SCALEBITS
    )
    b = yi + ((_FIX_1_77200 * cb + _ONE_HALF) >> _SCALEBITS)
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(rgb, 0, 255).astype(jnp.uint8)


# shared jitted entry point for pipeline feeds (one compiled program per
# plane shape across embed / nuclei / bench consumers)
ycbcr420_to_rgb_jit = jax.jit(ycbcr420_to_rgb)

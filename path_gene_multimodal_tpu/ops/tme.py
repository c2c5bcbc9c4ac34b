"""TME region-of-interest flags — exact on-device reformulation of the
reference's shapely geometry.

Reference (``load_annotation_with_coordinates.py:188-222``): a TME tile is
``in_tme_roi`` iff its patch box intersects
``unary_union(tumor_boxes).buffer(margin)`` (round buffer). Because all
geometries are axis-aligned boxes and shapely's buffer is Euclidean, that
predicate is exactly::

    min over tumor boxes B of  rectdist(tile_box, B)  <=  margin

where ``rectdist`` is the Euclidean distance between two axis-aligned
rectangles (0 if they overlap). This removes the O(N_tme) shapely hot loop
(SURVEY.md §3.1 step 5) — one scanned min-reduction on the TPU, exact to
float32.

Reference quirks preserved by the caller (``pipeline.spatial``): boxes use
``patch_size=508`` regardless of the 224 px tile grid (main.py never
overrides the default), and ``tme_classes = classes`` (every class is ROI-
eligible, only the *seed* set is restricted to tumor classes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _rect_dist_sq(
    a_xy: jnp.ndarray, b_xy: jnp.ndarray, size: float
) -> jnp.ndarray:
    """Squared Euclidean distance between axis-aligned ``size``-boxes with
    top-left corners ``a_xy`` (N, 2) and ``b_xy`` (M, 2) → (N, M)."""
    ax = a_xy[:, 0:1]
    ay = a_xy[:, 1:2]
    bx = b_xy[None, :, 0]
    by = b_xy[None, :, 1]
    # gap along each axis (0 when projections overlap)
    dx = jnp.maximum(jnp.maximum(bx - (ax + size), ax - (bx + size)), 0.0)
    dy = jnp.maximum(jnp.maximum(by - (ay + size), ay - (by + size)), 0.0)
    return dx * dx + dy * dy


@partial(jax.jit, static_argnames=("chunk",))
def min_box_distance_sq(
    tile_xy: jnp.ndarray,
    tumor_xy: jnp.ndarray,
    box_size: float,
    chunk: int = 512,
) -> jnp.ndarray:
    """Per-tile squared distance to the nearest tumor box. Tumor boxes are
    processed in chunks under ``lax.scan`` to bound memory at N×chunk.
    ``tumor_xy`` must be padded to a multiple of ``chunk`` with coords
    ≤ -1e9 (sentinel rows are masked out)."""
    m = tumor_xy.shape[0]
    pad = (-m) % chunk
    tumor_pad = jnp.concatenate(
        [tumor_xy, jnp.full((pad, 2), -1e9, tumor_xy.dtype)], axis=0
    )
    chunks = tumor_pad.reshape(-1, chunk, 2)

    def body(carry, tumor_chunk):
        valid = tumor_chunk[:, 0] > -1e8
        d2 = _rect_dist_sq(tile_xy, tumor_chunk, box_size)
        d2 = jnp.where(valid[None, :], d2, jnp.inf)
        return jnp.minimum(carry, jnp.min(d2, axis=1)), None

    init = jnp.full((tile_xy.shape[0],), jnp.inf, jnp.float32)
    out, _ = jax.lax.scan(body, init, chunks)
    return out


def tme_roi_flags(
    tile_xy: np.ndarray,
    is_tumor: np.ndarray,
    is_tme_eligible: np.ndarray,
    box_size: float,
    margin: float,
) -> np.ndarray:
    """``in_tme_roi`` per tile (bool, N). A tile is flagged iff it is
    TME-eligible and its box lies within ``margin`` of any tumor box."""
    tile_xy = np.asarray(tile_xy, np.float32)
    tumor_xy = tile_xy[np.asarray(is_tumor, bool)]
    if len(tumor_xy) == 0:
        raise ValueError("No tumor tiles found for tumor classes")
    if not np.asarray(is_tme_eligible, bool).any():
        raise ValueError("No TME tiles for the given classes found")
    d2 = np.asarray(
        min_box_distance_sq(jnp.asarray(tile_xy), jnp.asarray(tumor_xy), float(box_size))
    )
    within = d2 <= np.float32(margin) ** 2
    return within & np.asarray(is_tme_eligible, bool)

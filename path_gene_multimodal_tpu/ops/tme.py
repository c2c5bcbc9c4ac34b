"""TME region-of-interest flags — exact on-device reformulation of the
reference's shapely geometry.

Reference (``load_annotation_with_coordinates.py:188-222``): a TME tile is
``in_tme_roi`` iff its patch box intersects
``unary_union(tumor_boxes).buffer(margin)``. Geometry is axis-aligned
boxes, and Minkowski sums distribute over unions, so that predicate is
exactly::

    min over tumor boxes B of  boxdist(tile_box, B)  <=  margin

This removes the O(N_tme) shapely hot loop (SURVEY.md §3.1 step 5) — one
scanned min-reduction on the TPU, exact to float32.

``boxdist`` corner metric: shapely's ``.buffer`` is NOT a Euclidean disc —
it approximates each convex corner arc with ``quad_segs=8`` inscribed
chords (the default), which sit up to ``margin·(1−cos(π/32)) ≈ 0.48%``
inside the true radius (≈4.9 px at the 1016 px production margin). The
default ``corners="polygon8"`` reproduces that inscribed-16-gon metric
bit-for-bit via its support function (max over the 8 chord normals per
quadrant); ``corners="euclid"`` gives the true disc
(``CompatConfig.polygonal_buffer_corners`` selects).

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


#: chord normals of shapely's quad_segs=8 corner arc (one quadrant): edge k
#: spans θ ∈ [kπ/16, (k+1)π/16] with outward normal at the midpoint and
#: plane offset margin·cos(π/32)
_CHORD_ANGLES = tuple((2 * k + 1) * np.pi / 32.0 for k in range(8))
_CHORD_COS_HALF = float(np.cos(np.pi / 32.0))


def _rect_gaps(
    a_xy: jnp.ndarray, b_xy: jnp.ndarray, size: float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-axis gaps (0 when projections overlap) between axis-aligned
    ``size``-boxes with top-left corners ``a_xy`` (N, 2), ``b_xy`` (M, 2)."""
    ax = a_xy[:, 0:1]
    ay = a_xy[:, 1:2]
    bx = b_xy[None, :, 0]
    by = b_xy[None, :, 1]
    dx = jnp.maximum(jnp.maximum(bx - (ax + size), ax - (bx + size)), 0.0)
    dy = jnp.maximum(jnp.maximum(by - (ay + size), ay - (by + size)), 0.0)
    return dx, dy


def _box_dist_sq(dx: jnp.ndarray, dy: jnp.ndarray, corners: str) -> jnp.ndarray:
    """Squared box distance under the chosen corner metric.

    ``euclid``: dx² + dy² (true round buffer). ``polygon8``: squared
    support-function distance of shapely's inscribed corner polygon —
    ``(max_k (dx·cosφ_k + dy·sinφ_k) / cos(π/32))²``. The k=0/k=7 chords
    reduce to dx ≤ margin / dy ≤ margin on the axes, so the edge regions
    agree with Euclidean and only diagonal approaches differ (by ≤0.48%,
    exactly as the reference's buffer polygon does)."""
    if corners == "euclid":
        return dx * dx + dy * dy
    if corners != "polygon8":
        raise ValueError(f"unknown corner metric {corners!r}")
    d = jnp.zeros_like(dx)
    for ang in _CHORD_ANGLES:
        d = jnp.maximum(d, dx * np.float32(np.cos(ang)) + dy * np.float32(np.sin(ang)))
    d = d * np.float32(1.0 / _CHORD_COS_HALF)
    # corner chords only bind where BOTH gaps are positive; on the axes the
    # support value already equals the gap (see docstring), but guard the
    # pure-overlap case explicitly
    d = jnp.where((dx == 0.0) & (dy == 0.0), 0.0, jnp.maximum(d, jnp.maximum(dx, dy)))
    return d * d


@partial(jax.jit, static_argnames=("chunk", "corners"))
def min_box_distance_sq(
    tile_xy: jnp.ndarray,
    tumor_xy: jnp.ndarray,
    box_size: float,
    chunk: int = 512,
    corners: str = "polygon8",
) -> jnp.ndarray:
    """Per-tile squared distance to the nearest tumor box. Tumor boxes are
    processed in chunks under ``lax.scan`` to bound memory at N×chunk.
    Sentinel rows (coords ≤ -1e9) are masked out. Callers on the per-slide
    path should pre-pad BOTH operands to bucketed shapes host-side
    (``tme_roi_flags`` does) — the in-trace pad below only keeps odd shapes
    correct; it cannot make two different raw shapes share a program."""
    m = tumor_xy.shape[0]
    pad = (-m) % chunk
    if pad:
        tumor_xy = jnp.concatenate(
            [tumor_xy, jnp.full((pad, 2), -1e9, tumor_xy.dtype)], axis=0
        )
    chunks = tumor_xy.reshape(-1, chunk, 2)

    def body(carry, tumor_chunk):
        valid = tumor_chunk[:, 0] > -1e8
        dx, dy = _rect_gaps(tile_xy, tumor_chunk, box_size)
        d2 = _box_dist_sq(dx, dy, corners)
        d2 = jnp.where(valid[None, :], d2, jnp.inf)
        return jnp.minimum(carry, jnp.min(d2, axis=1)), None

    init = jnp.full((tile_xy.shape[0],), jnp.inf, jnp.float32)
    out, _ = jax.lax.scan(body, init, chunks)
    return out


def _bucket_rows(xy: np.ndarray, multiple: int) -> np.ndarray:
    """Pad (N, 2) coords with -1e9 sentinel rows up to a doubling bucket of
    ``multiple`` — shape reuse across slides (every distinct N would
    otherwise be a fresh multi-minute compile over a tunnel)."""
    n_pad = multiple
    while n_pad < len(xy):
        n_pad *= 2
    out = np.full((n_pad, 2), -1e9, np.float32)
    out[: len(xy)] = xy
    return out


def tme_roi_flags(
    tile_xy: np.ndarray,
    is_tumor: np.ndarray,
    is_tme_eligible: np.ndarray,
    box_size: float,
    margin: float,
    corners: str = "polygon8",
) -> np.ndarray:
    """``in_tme_roi`` per tile (bool, N). A tile is flagged iff it is
    TME-eligible and its box lies within ``margin`` of any tumor box
    (corner metric per the module docstring; ``polygon8`` = the
    reference's shapely buffer)."""
    tile_xy = np.asarray(tile_xy, np.float32)
    n = len(tile_xy)
    tumor_xy = tile_xy[np.asarray(is_tumor, bool)]
    if len(tumor_xy) == 0:
        raise ValueError("No tumor tiles found for tumor classes")
    if not np.asarray(is_tme_eligible, bool).any():
        raise ValueError("No TME tiles for the given classes found")
    chunk = 512
    d2 = np.asarray(
        min_box_distance_sq(
            jnp.asarray(_bucket_rows(tile_xy, chunk)),
            jnp.asarray(_bucket_rows(tumor_xy, chunk)),
            float(box_size), chunk=chunk, corners=corners,
        )
    )[:n]
    within = d2 <= np.float32(margin) ** 2
    return within & np.asarray(is_tme_eligible, bool)

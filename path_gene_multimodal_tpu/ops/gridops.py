"""Tile-grid ops: grid generation, foreground pooling, tiles↔grid rasterize.

Replaces the reference's per-tile Python loops:

- tile grid + foreground filter: Mussel tessellation (``tiling.py``);
- ``infer_tile_size``: mode of positive coordinate diffs
  (``create_and_overlay_polygon_from_prediction.py:60-72``,
  ``aggregated_hovernet_run.py:14-24``);
- ``tiles_to_grid``: 1 tile → 1 grid pixel rasterization with per-class
  score channels (``create_and_overlay_polygon_from_prediction.py:79-137``).

Everything is static-shape jnp; callers pass padded arrays with validity
masks where tile counts are data-dependent.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def full_tile_grid(slide_w: int, slide_h: int, patch_size: int) -> np.ndarray:
    """All top-left (x, y) level-0 coords of a non-overlapping patch grid.
    Row-major (y outer, x inner) — the order the reference's H5s use.
    Host-side (static shapes derive from it)."""
    nx = slide_w // patch_size
    ny = slide_h // patch_size
    xs = np.arange(nx, dtype=np.int64) * patch_size
    ys = np.arange(ny, dtype=np.int64) * patch_size
    gx, gy = np.meshgrid(xs, ys)
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=1)


@jax.jit
def tile_foreground_fraction_edges(
    mask: jnp.ndarray,
    y0: jnp.ndarray,
    y1: jnp.ndarray,
    x0: jnp.ndarray,
    x1: jnp.ndarray,
) -> jnp.ndarray:
    """Shape-canonical variant of ``tile_foreground_fraction``: the tile
    edge arrays (in mask pixels) are computed HOST-side in float64 and
    passed as dynamic operands, so ONE compiled program serves every
    slide regardless of thumbnail aspect or mpp — a fresh (shape,
    mask_scale) pair would otherwise recompile per slide (minutes each on
    a remote-compile chip). Pad the edge arrays to a fixed length with
    y0 == y1 (area 0 → fraction 0, dropped by any threshold).

    Returns (len(y0), len(x0)) float32 fractions.
    """
    mh, mw = mask.shape
    ii = jnp.pad(
        jnp.cumsum(jnp.cumsum(mask.astype(jnp.float32), 0), 1), ((1, 0), (1, 0))
    )
    y0 = jnp.clip(y0, 0, mh)
    y1 = jnp.clip(y1, 0, mh)
    x0 = jnp.clip(x0, 0, mw)
    x1 = jnp.clip(x1, 0, mw)
    a = ii[y1[:, None], x1[None, :]]
    b = ii[y0[:, None], x1[None, :]]
    c = ii[y1[:, None], x0[None, :]]
    d = ii[y0[:, None], x0[None, :]]
    counts = a - b - c + d
    areas = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    return counts / jnp.maximum(areas.astype(jnp.float32), 1.0)


def tile_edges_for_scale(
    mh: int, mw: int, patch_size: int, mask_scale: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int, int]:
    """Host-side float64 tile-edge arrays matching
    ``tile_foreground_fraction``'s rounding exactly. Returns
    (y0, y1, x0, x1, ny, nx)."""
    tile_m = patch_size / mask_scale
    ny = int(np.floor(mh / tile_m))
    nx = int(np.floor(mw / tile_m))
    # edge products in FLOAT32, matching the device path bit-for-bit:
    # tile_foreground_fraction rounds jnp f32 products (x64 disabled), so
    # float64 host math could differ by 1 mask px near .5 products and
    # flip keep decisions at the threshold (ADVICE r2)
    tile_m32 = np.float32(tile_m)
    ty = np.arange(ny, dtype=np.float32)
    tx = np.arange(nx, dtype=np.float32)
    y0 = np.clip(np.round(ty * tile_m32).astype(np.int32), 0, mh)
    y1 = np.clip(np.round((ty + 1.0).astype(np.float32) * tile_m32).astype(np.int32), 0, mh)
    x0 = np.clip(np.round(tx * tile_m32).astype(np.int32), 0, mw)
    x1 = np.clip(np.round((tx + 1.0).astype(np.float32) * tile_m32).astype(np.int32), 0, mw)
    return y0, y1, x0, x1, ny, nx


@partial(jax.jit, static_argnames=("patch_size", "mask_scale"))
def tile_foreground_fraction(
    mask: jnp.ndarray, patch_size: int, mask_scale: float
) -> jnp.ndarray:
    """Per-tile foreground fraction from a thumbnail-resolution bool mask.

    ``mask_scale`` = level-0 px per mask px. Pools the mask over each tile's
    footprint (box filter via integral image — exact, any scale). Returns
    (ny, nx) float32 where ny = floor(H0/patch)/..., computed from mask dims.
    """
    mh, mw = mask.shape
    # tile size in mask pixels (fractional) — use integral image for exact sums
    ii = jnp.pad(jnp.cumsum(jnp.cumsum(mask.astype(jnp.float32), 0), 1), ((1, 0), (1, 0)))
    tile_m = patch_size / mask_scale
    ny = int(np.floor(mh / tile_m))
    nx = int(np.floor(mw / tile_m))
    ty = jnp.arange(ny)
    tx = jnp.arange(nx)
    y0 = jnp.clip(jnp.round(ty * tile_m).astype(jnp.int32), 0, mh)
    y1 = jnp.clip(jnp.round((ty + 1) * tile_m).astype(jnp.int32), 0, mh)
    x0 = jnp.clip(jnp.round(tx * tile_m).astype(jnp.int32), 0, mw)
    x1 = jnp.clip(jnp.round((tx + 1) * tile_m).astype(jnp.int32), 0, mw)
    a = ii[y1[:, None], x1[None, :]]
    b = ii[y0[:, None], x1[None, :]]
    c = ii[y1[:, None], x0[None, :]]
    d = ii[y0[:, None], x0[None, :]]
    counts = a - b - c + d
    areas = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    return counts / jnp.maximum(areas.astype(jnp.float32), 1.0)


def infer_tile_size(coords: np.ndarray, default: int = 224) -> int:
    """Tile size = mode of positive nearest-neighbor diffs of sorted unique
    x (fallback y) coordinates — reference semantics
    (create_and_overlay_polygon_from_prediction.py:60-72)."""
    coords = np.asarray(coords)
    for axis in (0, 1):
        vals = np.unique(coords[:, axis])
        if len(vals) >= 2:
            diffs = np.diff(vals)
            diffs = diffs[diffs > 0]
            if len(diffs):
                sizes, counts = np.unique(diffs, return_counts=True)
                return int(sizes[np.argmax(counts)])
    return default


def tiles_to_grid_shape(coords: np.ndarray, tile_size: int) -> tuple[int, int, int, int]:
    """Grid extent: (gw, gh, x_min, y_min), 1 tile = 1 grid px
    (create_and_overlay_polygon_from_prediction.py:79-137). Host-side: shapes
    must be static for the on-device rasterizer."""
    coords = np.asarray(coords)
    x_min, y_min = coords[:, 0].min(), coords[:, 1].min()
    gw = int((coords[:, 0].max() - x_min) // tile_size) + 1
    gh = int((coords[:, 1].max() - y_min) // tile_size) + 1
    return gw, gh, int(x_min), int(y_min)


@partial(jax.jit, static_argnames=("gw", "gh", "tile_size"))
def rasterize_tiles(
    coords: jnp.ndarray,
    values: jnp.ndarray,
    gw: int,
    gh: int,
    x_min: int,
    y_min: int,
    tile_size: int,
    fill: float = 0.0,
) -> jnp.ndarray:
    """Scatter per-tile values onto the (gh, gw[, C]) grid, 1 tile = 1 px.

    ``values`` may be (N,) or (N, C). Out-of-range rows (use coords < 0 to
    mark padding) are dropped.
    """
    gx = (coords[:, 0] - x_min) // tile_size
    gy = (coords[:, 1] - y_min) // tile_size
    valid = (coords[:, 0] >= 0) & (gx >= 0) & (gx < gw) & (gy >= 0) & (gy < gh)
    # route invalid rows out of bounds; scatter mode="drop" discards them
    gx = jnp.where(valid, gx, gw).astype(jnp.int32)
    gy = jnp.where(valid, gy, gh).astype(jnp.int32)
    if values.ndim == 1:
        grid = jnp.full((gh, gw), fill, dtype=values.dtype)
        return grid.at[gy, gx].set(values, mode="drop")
    grid = jnp.full((gh, gw, values.shape[1]), fill, dtype=values.dtype)
    return grid.at[gy, gx].set(values, mode="drop")


@partial(jax.jit, static_argnames=("gw", "gh", "tile_size"))
def grid_lookup(
    coords: jnp.ndarray,
    grid: jnp.ndarray,
    gw: int,
    gh: int,
    x_min: int,
    y_min: int,
    tile_size: int,
) -> jnp.ndarray:
    """Gather grid values back to per-tile order (inverse of rasterize)."""
    gx = jnp.clip((coords[:, 0] - x_min) // tile_size, 0, gw - 1).astype(jnp.int32)
    gy = jnp.clip((coords[:, 1] - y_min) // tile_size, 0, gh - 1).astype(jnp.int32)
    return grid[gy, gx]

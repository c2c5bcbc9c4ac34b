"""Scatter ops: probability-map splatting.

Replaces the reference's per-tile Python splat loop
(``molecular_feature_extraction.py:156-190`` ``make_prob_map_for_task``):
each tile's probability is accumulated over its thumbnail-space footprint
with a count map, then averaged and clipped to [0, 1]. Here the whole splat
is one scatter-add pair on device, batched over all tasks at once.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("out_h", "out_w", "box"))
def splat_prob_map(
    tile_xy_thumb: jnp.ndarray,
    probs: jnp.ndarray,
    out_h: int,
    out_w: int,
    box: int,
) -> jnp.ndarray:
    """tile_xy_thumb: (N, 2) tile top-left in thumbnail px (int32).
    probs: (T, N) per-task tile probabilities. box: tile footprint size in
    thumbnail px (static). → (T, out_h, out_w) float32 mean-prob maps,
    clipped to [0, 1], 0 where no tile lands."""
    n = tile_xy_thumb.shape[0]
    t = probs.shape[0]
    dy = jnp.arange(box, dtype=jnp.int32)
    dx = jnp.arange(box, dtype=jnp.int32)
    ys = tile_xy_thumb[:, 1:2, None] + dy[None, :, None]        # (N, box, 1)
    xs = tile_xy_thumb[:, 0:1, None] + dx[None, None, :]        # (N, 1, box)
    ys = jnp.broadcast_to(ys, (n, box, box)).reshape(-1)
    xs = jnp.broadcast_to(xs, (n, box, box)).reshape(-1)
    oob = (ys < 0) | (ys >= out_h) | (xs < 0) | (xs >= out_w)
    ys = jnp.where(oob, out_h, ys)  # routed out of bounds → dropped
    xs = jnp.where(oob, out_w, xs)

    counts = jnp.zeros((out_h, out_w), jnp.float32).at[ys, xs].add(1.0, mode="drop")
    pvals = jnp.repeat(probs, box * box, axis=1)                # (T, N*box*box)
    accum = jnp.zeros((t, out_h, out_w), jnp.float32).at[:, ys, xs].add(
        pvals, mode="drop"
    )
    return jnp.clip(accum / jnp.maximum(counts[None], 1.0), 0.0, 1.0)

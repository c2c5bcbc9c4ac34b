"""Halo exchange for spatially-sharded segmentation maps.

Whole-slide segmentation shards the slide's row bands across the mesh; any
stencil op at a band boundary (morphology, watershed neighbor-min, Sobel)
needs its neighbors' edge rows. ``exchange_halo`` runs under ``shard_map``
and swaps ``halo`` rows with both mesh neighbors via ``lax.ppermute`` over
ICI — the TPU-native analog of HoverNeXt's overlapped window stitching
(``pp_overlap``, reference hovernet_inference.py:201).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def exchange_halo(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Inside shard_map: (rows, cols[, c]) local band → band extended with
    ``halo`` rows from the previous/next device (edge-replicated at the
    mesh ends)."""
    if halo == 0:
        return x  # no neighborhood → nothing to exchange (x[-0:] would
        # grab the WHOLE band and corrupt the concatenation)
    n = jax.lax.axis_size(axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    top_rows = x[:halo]
    bot_rows = x[-halo:]
    # from previous device: its bottom rows travel forward (+1)
    from_prev = jax.lax.ppermute(bot_rows, axis_name, fwd)
    # from next device: its top rows travel backward (-1)
    from_next = jax.lax.ppermute(top_rows, axis_name, bwd)
    idx = jax.lax.axis_index(axis_name)
    # wrap-around neighbors are invalid at the ends → replicate own edge
    from_prev = jnp.where(idx == 0, jnp.broadcast_to(x[:1], from_prev.shape), from_prev)
    from_next = jnp.where(
        idx == n - 1, jnp.broadcast_to(x[-1:], from_next.shape), from_next
    )
    return jnp.concatenate([from_prev, x, from_next], axis=0)


def sharded_stencil(
    fn, mesh: Mesh, halo: int, axis: str = "tiles"
):
    """Wrap a stencil ``fn(local_band_with_halo) -> band`` into a
    row-sharded whole-map op: shard rows, exchange halos, apply, crop."""

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=P(axis),
        out_specs=P(axis),
        check_vma=False,
    )
    def _run(x):
        ext = exchange_halo(x, halo, axis)
        out = fn(ext)
        return out[halo:-halo] if halo else out  # out[0:-0] would be empty

    return _run

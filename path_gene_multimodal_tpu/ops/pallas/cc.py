"""Pallas kernel: connected-component labeling, fully VMEM-resident.

Same algorithm as ``ops.components.label_components`` (alternating
row/column segmented min-scans + optional diagonal relax, iterated to a
fixpoint) but executed entirely on-chip: the segmented scans are
Hillis-Steele doubling passes (log₂W shift-min steps per direction) over
VMEM arrays, so one tile's labeling issues zero intermediate HBM traffic.
The XLA formulation vmapped over a 32-tile batch costs ~300 ms on v5e;
this kernel does the same work in a few ms.

Labels are pixel linear indices (component minima), INF background —
bit-identical to ``label_components`` (asserted in tests via interpret
mode).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from path_gene_multimodal_tpu.ops.components import INF
from path_gene_multimodal_tpu.ops.pallas.convnext_block import VMEM_LIMIT, _vma_of
from path_gene_multimodal_tpu.ops.pallas.flood import _roll_axis

_INF32 = 2**30


def _shifted(x: jnp.ndarray, dist: int, axis: int, fill):
    """Value ``dist`` steps earlier along ``axis`` (fill at the border)."""
    h, w = x.shape
    out = _roll_axis(x, dist, axis)
    n = x.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, (h, w), axis)
    if dist > 0:
        return jnp.where(idx < dist, fill, out)
    return jnp.where(idx >= n + dist, fill, out)


def _segmented_min_scan(lbl: jnp.ndarray, mask: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Min over each contiguous foreground run along ``axis`` via two
    (fwd/bwd) Hillis-Steele segmented scans."""
    n = lbl.shape[axis]
    log_n = max(1, (n - 1).bit_length())

    def one_dir(sign: int) -> jnp.ndarray:
        prev_mask = _shifted(mask.astype(jnp.int32), sign, axis, 0) > 0
        flags = (~mask) | (mask & ~prev_mask)  # run starts (this direction)
        v, f = lbl, flags
        for k in range(log_n):
            d = sign * (1 << k)
            pv = _shifted(v, d, axis, _INF32)
            pf = _shifted(f.astype(jnp.int32), d, axis, 1) > 0
            v = jnp.where(f, v, jnp.minimum(v, pv))
            f = f | pf
        return jnp.where(mask, v, _INF32)

    return jnp.minimum(one_dir(1), one_dir(-1))


def _relax_fixpoint(
    mask: jnp.ndarray, lbl0: jnp.ndarray, connectivity: int, max_iters: int
) -> jnp.ndarray:
    """In-kernel fixpoint: propagate each component's min label via the
    alternating row/column segmented scans (+ diagonal relax for 8-conn)."""

    def relax(lbl):
        lbl = _segmented_min_scan(lbl, mask, axis=1)
        lbl = _segmented_min_scan(lbl, mask, axis=0)
        if connectivity == 2:
            for dy in (1, -1):
                for dx in (1, -1):
                    sh = _shifted(_shifted(lbl, dy, 0, _INF32), dx, 1, _INF32)
                    lbl = jnp.where(mask, jnp.minimum(lbl, sh), _INF32)
        return lbl

    def cond(state):
        i, lbl, changed = state
        return changed & (i < max_iters)

    def body(state):
        i, lbl, _ = state
        new = relax(lbl)
        return i + 1, new, jnp.any(new != lbl)

    # seed `changed` from data, not a literal True: a literal carry is
    # unvarying under shard_map's varying-axes tracking while the body's
    # jnp.any(...) is varying — check_vma=True would reject the loop
    # (same pattern as ops/components.py)
    first = relax(lbl0)
    _, lbl, _ = jax.lax.while_loop(
        cond, body, (0, first, jnp.any(first != lbl0))
    )
    return lbl


def _cc_kernel(connectivity: int, max_iters: int):
    def kernel(mask_ref, out_ref):
        mask = mask_ref[0] > 0
        h, w = mask.shape
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        lbl0 = jnp.where(mask, rows * w + cols, _INF32)
        out_ref[0] = _relax_fixpoint(mask, lbl0, connectivity, max_iters)

    return kernel


@partial(jax.jit, static_argnames=("connectivity", "max_iters", "interpret"))
def pallas_label_components(
    mask: jnp.ndarray,
    connectivity: int = 1,
    max_iters: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched CC: mask (B, H, W) bool → labels (B, H, W) int32 (linear-
    index minima, INF background — ``label_components`` contract)."""
    b, h, w = mask.shape
    block = lambda: pl.BlockSpec((1, h, w), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        _cc_kernel(connectivity, max_iters),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32, vma=_vma_of(mask)),
        grid=(b,),
        in_specs=[block()],
        out_specs=block(),
        compiler_params=VMEM_LIMIT,
        interpret=interpret,
    )(mask.astype(jnp.int32))
    return jnp.where(out >= _INF32, INF, out)


def _seeded_cc_kernel(connectivity: int, max_iters: int):
    def kernel(mask_ref, seed_ref, out_ref):
        mask = mask_ref[...] > 0
        out_ref[...] = _relax_fixpoint(mask, seed_ref[...], connectivity, max_iters)

    return kernel


@partial(
    jax.jit,
    static_argnames=("connectivity", "tile", "max_iters", "max_outer", "interpret"),
)
def pallas_label_components_tiled(
    mask: jnp.ndarray,
    connectivity: int = 1,
    tile: int = 512,
    max_iters: int = 128,
    max_outer: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Large-mask CC: one 2-D mask (H, W) of any size → labels (H, W).

    The mask is split into VMEM-sized ``tile×tile`` blocks; each block's
    components are min-labeled on-chip by the seeded fixpoint kernel, then
    labels are merged ACROSS tile borders by alternating a global one-pixel
    neighbor-min exchange (cheap XLA elementwise) with another in-tile
    propagation pass, iterated to a global fixpoint. All state stays on
    device for the whole loop — this replaces the host-CPU-backend routing
    that ``pipeline.morphology`` used for thumbnail-scale masks (reference
    workload: ``polygon_morphology.py:100-153`` island labeling).

    Output contract is bit-identical to ``ops.components.label_components``:
    per-component minimum ORIGINAL-width linear index, INF on background.
    """
    h, w = mask.shape
    ph = ((h + tile - 1) // tile) * tile
    pw = ((w + tile - 1) // tile) * tile
    maskp = jnp.pad(mask.astype(bool), ((0, ph - h), (0, pw - w)))
    rows = jax.lax.broadcasted_iota(jnp.int32, (ph, pw), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (ph, pw), 1)
    # original-width linear indices so in-bounds labels match
    # label_components() exactly; padded cells are background (never read)
    seeds0 = jnp.where(maskp, rows * w + cols, _INF32)
    mask_i = maskp.astype(jnp.int32)

    block = lambda: pl.BlockSpec((tile, tile), lambda i, j: (i, j))
    propagate = lambda seeds: pl.pallas_call(
        _seeded_cc_kernel(connectivity, max_iters),
        out_shape=jax.ShapeDtypeStruct((ph, pw), jnp.int32, vma=_vma_of(mask)),
        grid=(ph // tile, pw // tile),
        in_specs=[block(), block()],
        out_specs=block(),
        compiler_params=VMEM_LIMIT,
        interpret=interpret,
    )(mask_i, seeds)

    if connectivity == 2:
        dirs = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1) if dy or dx]
    else:
        dirs = [(-1, 0), (1, 0), (0, -1), (0, 1)]

    def border_min(lbl: jnp.ndarray) -> jnp.ndarray:
        from path_gene_multimodal_tpu.ops.components import _shift

        best = lbl
        for dy, dx in dirs:
            best = jnp.minimum(best, _shift(lbl, dy, dx, _INF32))
        return jnp.where(maskp, best, _INF32)

    def cond(state):
        i, lbl, changed = state
        return changed & (i < max_outer)

    def body(state):
        i, lbl, _ = state
        new = propagate(border_min(lbl))
        return i + 1, new, jnp.any(new != lbl)

    # data-derived carry seed (shard_map varying-axes safe; see
    # ops.components.label_components)
    first = propagate(seeds0)
    second = propagate(border_min(first))
    _, lbl, _ = jax.lax.while_loop(
        cond, body, (1, second, jnp.any(second != first))
    )
    return jnp.where(lbl >= _INF32, INF, lbl)[:h, :w]

"""Pallas kernel: marker watershed flood, fully VMEM-resident.

The XLA formulation (``ops.watershed.marker_watershed``) lowers to
~``levels × rounds`` separate neighbor-min kernels with an HBM round-trip
each. This kernel runs the ENTIRE flood for one tile inside one Pallas
program: labels, quantized energy and mask live in VMEM (a 256² tile is
~0.75 MB of state), the level loop and the per-level convergence loop are
``lax`` control flow on-chip, and HBM is touched exactly twice (load
inputs, store labels).

Semantics are identical to ``ops.watershed.marker_watershed`` (serial-heap
parity rules: a labeled pixel seeds growth only once the flood level has
reached its own energy; 8-neighborhood; min-label tie-break) — asserted
equal in tests via interpret mode.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from path_gene_multimodal_tpu.ops.components import INF
from path_gene_multimodal_tpu.ops.pallas.convnext_block import VMEM_LIMIT, _vma_of

_INF32 = 2**30  # python int: jnp constants would be captured tracers in the kernel


def pallas_supported() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _roll_axis(x: jnp.ndarray, s: int, axis: int) -> jnp.ndarray:
    """Single-axis roll via concat of two slices; skips s == 0 (jnp.roll
    would emit a zero-sized slice, which Mosaic rejects)."""
    if s == 0:
        return x
    n = x.shape[axis]
    s = s % n
    if s == 0:
        return x
    a = jax.lax.slice_in_dim(x, n - s, n, axis=axis)
    b = jax.lax.slice_in_dim(x, 0, n - s, axis=axis)
    return jax.lax.concatenate([a, b], dimension=axis)


def _shift_with_fill(x: jnp.ndarray, dy: int, dx: int, fill: jnp.ndarray) -> jnp.ndarray:
    """Roll + mask the wrapped-in border with ``fill`` (VPU-friendly)."""
    h, w = x.shape
    out = _roll_axis(_roll_axis(x, dy, 0), dx, 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    if dy > 0:
        out = jnp.where(rows < dy, fill, out)
    elif dy < 0:
        out = jnp.where(rows >= h + dy, fill, out)
    if dx > 0:
        out = jnp.where(cols < dx, fill, out)
    elif dx < 0:
        out = jnp.where(cols >= w + dx, fill, out)
    return out


def _flood_kernel(levels: int, max_rounds: int):
    def kernel(q_ref, marker_ref, mask_ref, out_ref):
        q = q_ref[0]
        mask = mask_ref[0] > 0
        lbl0 = marker_ref[0]

        def neighbor_min(a):
            best = jnp.full_like(a, _INF32)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dy == 0 and dx == 0:
                        continue
                    best = jnp.minimum(best, _shift_with_fill(a, dy, dx, _INF32))
            return best

        is_marker = lbl0 < _INF32

        def level_body(i, lbl):
            level = levels - 1 - i
            eligible = mask & (q >= level)
            # two-phase arrival-order parity (see ops.watershed
            # marker_watershed): markers activating AT this level wait for
            # phase 2 so established fronts drain the contour first
            fresh = is_marker & (q == level)

            def run(lbl, allow_fresh: bool):
                def step(l):
                    act = (l < _INF32) & (q >= level)
                    if not allow_fresh:
                        act = act & ~fresh
                    active = jnp.where(act, l, _INF32)
                    nb = neighbor_min(active)
                    grow = eligible & (l == _INF32) & (nb < _INF32)
                    return jnp.where(grow, nb, l)

                def cond(state):
                    it, l, changed = state
                    return changed & (it < max_rounds)

                def body(state):
                    it, l, _ = state
                    new = step(l)
                    return it + 1, new, jnp.any(new != l)

                # data-derived carry seed (not a literal True): keeps the
                # loop traceable under shard_map varying-axes tracking (see
                # ops/components.py) and exits immediately at a fixpoint
                first = step(lbl)
                _, lbl, _ = jax.lax.while_loop(
                    cond, body, (0, first, jnp.any(first != lbl))
                )
                return lbl

            lbl = run(lbl, allow_fresh=False)
            return run(lbl, allow_fresh=True)

        out_ref[0] = jax.lax.fori_loop(0, levels, level_body, lbl0)

    return kernel


@partial(jax.jit, static_argnames=("levels", "max_rounds", "interpret"))
def pallas_marker_watershed(
    dist: jnp.ndarray,
    markers: jnp.ndarray,
    mask: jnp.ndarray,
    levels: int = 64,
    max_rounds: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched flood: dist (B, H, W) float in [0,1], markers (B, H, W)
    int32 (INF = unlabeled), mask (B, H, W) bool → labels (B, H, W) int32."""
    b, h, w = dist.shape
    q = jnp.clip((dist * (levels - 1)).astype(jnp.int32), 0, levels - 1)
    markers = jnp.where(markers >= _INF32, _INF32, markers).astype(jnp.int32)
    mask_i = mask.astype(jnp.int32)

    block = lambda: pl.BlockSpec((1, h, w), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        _flood_kernel(levels, max_rounds),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32, vma=_vma_of(markers)),
        grid=(b,),
        in_specs=[block(), block(), block()],
        out_specs=block(),
        compiler_params=VMEM_LIMIT,
        interpret=interpret,
    )(q, markers, mask_i)
    return jnp.where(out >= _INF32, INF, out)

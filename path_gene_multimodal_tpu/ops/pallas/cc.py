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


def _cc_kernel(connectivity: int, max_iters: int):
    def kernel(mask_ref, out_ref):
        mask = mask_ref[0] > 0
        h, w = mask.shape
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        lbl0 = jnp.where(mask, rows * w + cols, _INF32)

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

        _, lbl, _ = jax.lax.while_loop(cond, body, (0, relax(lbl0), jnp.bool_(True)))
        out_ref[0] = lbl

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
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        grid=(b,),
        in_specs=[block()],
        out_specs=block(),
        interpret=interpret,
    )(mask.astype(jnp.int32))
    return jnp.where(out >= _INF32, INF, out)

"""Pallas kernel: connected components + per-pixel component sizes.

``hover_instances_batch`` needs CC labels AND a per-pixel component-size
map twice per batch (object filter, marker filter). The XLA
``component_sizes`` is a segment scatter + gather over 65k slots that the
TPU serializes (~70 ms at batch 32 even flat-batched). This kernel
computes both VMEM-resident, scatter- and gather-free:

1. the CC min-label fixpoint (same segmented-scan relax as ``cc.py``);
2. root ranks: ``is_root = lbl == pixel_index`` (root-pixel identity) and
   a row-major inclusive cumsum built from lane- then sublane-shift adds
   (Hillis-Steele, log₂W + log₂H steps);
3. ``roots_vec[s]`` = pixel index of the s-th root — accumulated by a
   chunked one-hot against the rank values (no gather: at most one root
   matches each slot, so a masked sum IS the lookup);
4. per-slot counts = Σ pixels whose label equals ``roots_vec[s]`` —
   chunked broadcast compare + lane-preserving reduce;
5. per-pixel sizes = Σₛ (lbl == roots_vec[s]) · counts[s] — the same
   compare re-used as a mask against the counts row.

Components beyond ``s_slots`` (default 4096 per 256² tile — reachable
only by pathological speckle masks) match no slot and get size 0, i.e.
they are dropped by any ≥1 size threshold; documented failure mode.

Reference workload: the size filters of HoVer-Net post-processing
(``hovernet_inference.py:188-206`` post-proc chain).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from path_gene_multimodal_tpu.ops.components import INF
from path_gene_multimodal_tpu.ops.pallas.cc import _INF32, _relax_fixpoint, _shifted
from path_gene_multimodal_tpu.ops.pallas.convnext_block import (
    VMEM_LIMIT,
    _vma_of,
)
from path_gene_multimodal_tpu.ops.pallas.flood import _roll_axis


def _shift_fill0(x: jnp.ndarray, dist: int, axis: int) -> jnp.ndarray:
    """x shifted so out[i] = x[i - dist] (0-fill) — Hillis-Steele step.
    Thin wrapper over cc._shifted so the Mosaic shift idiom has ONE
    implementation across the pallas package."""
    return _shifted(x, dist, axis, jnp.zeros((), x.dtype))


def _cumsum_rowmajor(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive row-major cumsum of an (H, W) f32 array via shift-adds."""
    h, w = x.shape
    for k in range((w - 1).bit_length()):
        x = x + _shift_fill0(x, 1 << k, axis=1)
    # row offsets: exclusive cumsum (over sublanes) of the row totals
    tot = jax.lax.slice(x, (0, w - 1), (h, w))  # (h, 1) inclusive row sums
    run = tot
    for k in range((h - 1).bit_length()):
        run = run + _shift_fill0(run, 1 << k, axis=0)
    return x + (run - tot)  # broadcast (h, 1) over lanes


def _cumsum_lane3(v: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum along axis 2 of a (1, 1, S) f32 vector
    (Hillis-Steele lane shift-adds)."""
    s = v.shape[2]
    for k in range((s - 1).bit_length()):
        d = 1 << k
        sh = _roll_axis(v, d, 2)
        idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, 2)
        v = v + jnp.where(idx < d, 0.0, sh)
    return v


def _cc_sizes_kernel(
    h: int, w: int, s_slots: int, connectivity: int, max_iters: int,
    chunk: int, min_size: int,
):
    n_chunks = h // chunk

    def kernel(mask_ref, lbl_ref, sizes_ref, dense_ref, slot_s, lblf_s):
        mask = mask_ref[0] > 0
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        pix = rows * w + cols
        lbl0 = jnp.where(mask, pix, _INF32)
        lbl = _relax_fixpoint(mask, lbl0, connectivity, max_iters)
        lbl_ref[0] = lbl

        is_root = mask & (lbl == pix)
        ranks = _cumsum_rowmajor(is_root.astype(jnp.float32))  # inclusive
        # 0-based slot of each root; -1 elsewhere (and for overflow ranks).
        # Stashed in VMEM scratch so the chunk loops can pl.ds-slice them
        # (fori_loop bodies keep the program small; Mosaic has no
        # value-level dynamic_slice and a 3×n_chunks static unroll blows
        # Mosaic compile time up past 15 minutes).
        slot_s[...] = jnp.where(is_root, ranks - 1.0, -1.0)
        lblf_s[...] = lbl.astype(jnp.float32)  # exact: labels < 2^24

        iota_s = jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, s_slots), 2
        ).astype(jnp.float32)  # Mosaic iota must be integer; cast after

        def pix_chunk(i):
            base = (
                jax.lax.broadcasted_iota(jnp.int32, (chunk, w), 0) * w
                + jax.lax.broadcasted_iota(jnp.int32, (chunk, w), 1)
            )
            return (base + i * chunk * w).astype(jnp.float32)

        # pass 1: roots_vec[s] = pixel index of root with rank s (+ presence)
        zero_s = jnp.zeros((1, 1, s_slots), jnp.float32)

        def body_roots(i, carry):
            rv_sum, rv_cnt = carry
            oh = (
                slot_s[pl.ds(i * chunk, chunk), :][:, :, None] == iota_s
            ).astype(jnp.float32)
            rv_sum = rv_sum + jnp.sum(
                oh * pix_chunk(i)[:, :, None], axis=(0, 1), keepdims=True
            )
            rv_cnt = rv_cnt + jnp.sum(oh, axis=(0, 1), keepdims=True)
            return rv_sum, rv_cnt

        rv_sum, rv_cnt = jax.lax.fori_loop(
            0, n_chunks, body_roots, (zero_s, zero_s)
        )
        roots_vec = jnp.where(rv_cnt > 0, rv_sum, -1.0)  # (1, 1, S)

        # pass 2: counts[s] = #pixels labeled roots_vec[s]
        def body_counts(i, counts):
            member = (
                lblf_s[pl.ds(i * chunk, chunk), :][:, :, None] == roots_vec
            ).astype(jnp.float32)
            return counts + jnp.sum(member, axis=(0, 1), keepdims=True)

        counts = jax.lax.fori_loop(0, n_chunks, body_counts, zero_s)

        # dense re-ranking of the components that PASS the size filter:
        # newrank[s] = cumsum of keep over slots (1-based); feeding these
        # to the flood makes the watershed output already-compact, so the
        # downstream gather-based label compaction disappears
        keep = jnp.where(
            (counts >= float(min_size)) & (rv_cnt > 0), 1.0, 0.0
        )
        newrank = _cumsum_lane3(keep) * keep  # 0 for dropped slots

        # pass 3: per-pixel size + dense id via the same membership mask
        def body_sizes(i, _):
            member = (
                lblf_s[pl.ds(i * chunk, chunk), :][:, :, None] == roots_vec
            ).astype(jnp.float32)
            sz = jnp.sum(member * counts, axis=2)  # (chunk, w)
            sizes_ref[0, pl.ds(i * chunk, chunk), :] = sz.astype(jnp.int32)
            dn = jnp.sum(member * newrank, axis=2)
            dense_ref[0, pl.ds(i * chunk, chunk), :] = dn.astype(jnp.int32)
            return 0

        jax.lax.fori_loop(0, n_chunks, body_sizes, 0)

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "connectivity", "s_slots", "max_iters", "chunk", "min_size", "interpret",
    ),
)
def pallas_cc_sizes(
    mask: jnp.ndarray,
    connectivity: int = 1,
    s_slots: int = 4096,
    max_iters: int = 256,  # match label_components/pallas_label_components —
    # a lower cap could stop the relax early and split spiral components
    chunk: int = 8,
    min_size: int = 0,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched (B, H, W) bool mask → (labels (B, H, W) int32 [INF bg,
    ``label_components`` contract], sizes (B, H, W) int32 [0 bg,
    ``component_sizes`` contract — up to ``s_slots`` components/tile],
    dense (B, H, W) int32 [1..N ids of the components with size ≥
    ``min_size``, ordered by root pixel index — exactly
    ``compact_labels_device``'s ordering; 0 elsewhere])."""
    b, h, w = mask.shape
    assert h % chunk == 0, (h, chunk)
    # labels/ranks/counts live in f32 inside the kernel — exact only below
    # 2^24; enforce the documented limit instead of returning rounded junk
    assert h * w < 2**24, (h, w, "tile too large for exact f32 label math")
    vma = _vma_of(mask)
    blk = lambda: pl.BlockSpec((1, h, w), lambda i: (i, 0, 0))
    lbl, sizes, dense = pl.pallas_call(
        _cc_sizes_kernel(h, w, s_slots, connectivity, max_iters, chunk, min_size),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w), jnp.int32, vma=vma),
            jax.ShapeDtypeStruct((b, h, w), jnp.int32, vma=vma),
            jax.ShapeDtypeStruct((b, h, w), jnp.int32, vma=vma),
        ),
        grid=(b,),
        in_specs=[blk()],
        out_specs=(blk(), blk(), blk()),
        scratch_shapes=[
            pltpu.VMEM((h, w), jnp.float32),
            pltpu.VMEM((h, w), jnp.float32),
        ],
        compiler_params=VMEM_LIMIT,
        interpret=interpret,
    )(mask.astype(jnp.int32))
    return jnp.where(lbl >= _INF32, INF, lbl), sizes, dense


@partial(
    jax.jit,
    static_argnames=(
        "connectivity", "min_size", "small", "big", "interpret", "count_overflow",
    ),
)
def pallas_cc_sizes_adaptive(
    mask: jnp.ndarray,
    connectivity: int = 1,
    min_size: int = 0,
    small: int = 512,
    big: int = 4096,
    interpret: bool = False,
    count_overflow: bool = False,
):
    """``pallas_cc_sizes`` with an adaptive slot budget: the chunked
    membership passes cost P·S compares (77% of postproc time at S=4096,
    profiled), but real tiles rarely exceed a few hundred components.
    Run at ``small`` slots, count roots from the label map (root-pixel
    identity — cheap XLA), and only re-run the ``big`` variant under
    ``lax.cond`` when any tile overflows. Same outputs as
    ``pallas_cc_sizes(s_slots=big)`` up to the ``big`` overflow limit.

    ``count_overflow``: also return a (B,) bool device array marking the
    tiles whose component count exceeds even ``big`` (those components
    silently get size 0 — the no-silent-caps counter; surface it in the
    stage report). Per-tile so callers running several CC passes over the
    same batch can OR the masks and count each tile once."""
    b, h, w = mask.shape
    lbl, sizes, dense = pallas_cc_sizes(
        mask, connectivity, s_slots=small, min_size=min_size, interpret=interpret
    )
    pix = jnp.arange(h * w, dtype=jnp.int32).reshape(1, h, w)
    n_roots = jnp.sum((lbl == pix).astype(jnp.int32), axis=(1, 2))
    overflow = jnp.any(n_roots > small)

    def big_path(m):
        _, s2, d2 = pallas_cc_sizes(
            m, connectivity, s_slots=big, min_size=min_size, interpret=interpret
        )
        return s2, d2

    sizes, dense = jax.lax.cond(
        overflow, big_path, lambda m: (sizes, dense), mask
    )
    if count_overflow:
        return lbl, sizes, dense, n_roots > big
    return lbl, sizes, dense

"""Pallas kernels for the HoverNeXt decoder hot path.

Round-1 profiling put ~55% of the seg forward in the U-Net decoder + final
full-resolution stage (reference workload ``hovernet_inference.py:188-206``).
Two kernels cover it:

- ``fused_decoder_conv``: one decoder conv step — optional skip
  connection (concat is never materialized: the weight matrix is split by
  channel range and both inputs matmul into one f32 accumulator), 3×3
  conv as 9 shifted MXU matmuls, bias, optional LayerNorm, exact GELU.
  Whole images per grid step (decoder resolutions ≤128² fit VMEM),
  several images folded per step at the small-spatial levels to fill the
  MXU. The 2× nearest upsample stays an XLA broadcast outside the kernel
  (Mosaic cannot lower the row-interleave reshape).

- ``fused_final_conv_gelu``: the 256² final conv + GELU, strip-pipelined:
  the input stays in HBM (ANY memory space) and each grid step DMAs a
  34-row halo strip into VMEM scratch — zero-filled at the image border,
  which IS the conv's zero padding — so the full-res activation never
  occupies VMEM at once.

``upsample2x_bilinear`` is the matching XLA-level 2× bilinear (exact
``jax.image.resize`` semantics, half-pixel centers, edge clamp) expressed
as interleaved FMAs instead of the general gather formulation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from path_gene_multimodal_tpu.ops.pallas.convnext_block import (
    VMEM_LIMIT,
    _args_to_vma,
    _gelu_exact,
    _gelu_fn,
    _vma_of,
)


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) → (B, 2H, 2W, C), nearest (≡ jax.image.resize for an
    exact 2× factor) as a broadcast instead of a gather."""
    b, h, w, c = x.shape
    return jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, 2, w, 2, c)
    ).reshape(b, h * 2, w * 2, c)


def _interleave(a: jnp.ndarray, b: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Interleave two equal arrays along ``axis`` (a first)."""
    stacked = jnp.stack([a, b], axis=axis + 1)
    shape = list(a.shape)
    shape[axis] *= 2
    return stacked.reshape(shape)


def upsample2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) → (B, 2H, 2W, C), bilinear with half-pixel centers and
    edge clamp — element-exact vs ``jax.image.resize(method='bilinear')``
    at a 2× factor (asserted in tests): out[2i] = ¼·in[i-1] + ¾·in[i],
    out[2i+1] = ¾·in[i] + ¼·in[i+1]."""

    def up_axis(v: jnp.ndarray, axis: int) -> jnp.ndarray:
        prev = jnp.concatenate(
            [jax.lax.slice_in_dim(v, 0, 1, axis=axis),
             jax.lax.slice_in_dim(v, 0, v.shape[axis] - 1, axis=axis)],
            axis=axis,
        )
        nxt = jnp.concatenate(
            [jax.lax.slice_in_dim(v, 1, v.shape[axis], axis=axis),
             jax.lax.slice_in_dim(v, v.shape[axis] - 1, v.shape[axis], axis=axis)],
            axis=axis,
        )
        even = 0.25 * prev + 0.75 * v
        odd = 0.75 * v + 0.25 * nxt
        return _interleave(even, odd, axis)

    xf = x.astype(jnp.float32)
    return up_axis(up_axis(xf, 1), 2).astype(x.dtype)


def _conv3_matmuls(xp: jnp.ndarray, w: jnp.ndarray, g: int, h: int, wd: int,
                   acc: jnp.ndarray) -> jnp.ndarray:
    """Accumulate the 9 shifted-tap matmuls of a 3×3 conv.

    xp: (g, h+2, wd+2, cin) padded input (bf16); w: (3, 3, cin, cout).
    When cin under-fills the 128-lane contraction dim, taps are K-packed
    in pairs (same trick as ``_chunk_conv_gelu``) so the MXU runs at full
    K instead of half-empty."""
    cin = xp.shape[-1]

    def tap_of(dy, dx):
        return jax.lax.slice(
            xp, (0, dy, dx, 0), (g, dy + h, dx + wd, cin)
        ).reshape(g * h * wd, cin)

    groups = _TAP_PAIRS if cin < 128 else [(t,) for t in _TAPS]
    for group in groups:
        if len(group) == 1:
            (dy, dx), = group
            acc = acc + jnp.dot(
                tap_of(dy, dx), w[dy, dx], preferred_element_type=jnp.float32
            )
        else:
            t = jnp.concatenate([tap_of(dy, dx) for dy, dx in group], axis=1)
            wg = jnp.concatenate([w[dy, dx] for dy, dx in group], axis=0)
            acc = acc + jnp.dot(t, wg, preferred_element_type=jnp.float32)
    return acc


def _decoder_kernel(g: int, h: int, w: int, cx: int, cs: int, cout: int,
                    use_ln: bool, exact_gelu: bool = False):
    oh, ow = h, w

    def kernel(*refs):
        if cs:
            x_ref, s_ref, wx_ref, ws_ref, b_ref = refs[:5]
            rest = refs[5:]
        else:
            x_ref, wx_ref, b_ref = refs[:3]
            s_ref = ws_ref = None
            rest = refs[3:]
        if use_ln:
            lng_ref, lnb_ref, out_ref = rest
        else:
            (out_ref,) = rest

        xp = jnp.pad(x_ref[...], ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((g * oh * ow, cout), jnp.float32)
        acc = _conv3_matmuls(xp, wx_ref[...], g, oh, ow, acc)
        if cs:
            sp = jnp.pad(s_ref[...], ((0, 0), (1, 1), (1, 1), (0, 0)))
            acc = _conv3_matmuls(sp, ws_ref[...], g, oh, ow, acc)
        acc = acc + b_ref[...].astype(jnp.float32)
        if use_ln:
            mu = jnp.mean(acc, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(acc - mu), axis=-1, keepdims=True)
            acc = (acc - mu) * jax.lax.rsqrt(var + 1e-6)
            acc = acc * lng_ref[...].astype(jnp.float32) + lnb_ref[...].astype(
                jnp.float32
            )
        acc = _gelu_fn(exact_gelu)(acc)
        out_ref[...] = acc.reshape(g, oh, ow, cout).astype(out_ref.dtype)

    return kernel


def _images_per_step(oh: int, ow: int, cin: int, cout: int) -> int:
    """Budget: f32 accumulator (4·cout B/px) + padded bf16 inputs
    (2·cin B/px) + Pallas double-buffered in/out blocks (2·2·(cin+cout)
    B/px) under 32 MB (needs the raised scoped-VMEM cap), weights
    (9·cin·cout bf16) resident."""
    weights = 18 * cin * cout
    budget = 32 * 1024 * 1024 - weights
    per_img = oh * ow * 6 * (cin + cout)
    g = max(1, budget // max(per_img, 1))
    while g > 1 and (g & (g - 1)):
        g -= 1
    return min(g, 8)


@partial(jax.jit, static_argnames=("exact_gelu", "interpret"))
def fused_decoder_conv(
    x: jnp.ndarray,
    skip: jnp.ndarray | None,
    w: jnp.ndarray,
    b: jnp.ndarray,
    ln_scale: jnp.ndarray | None = None,
    ln_bias: jnp.ndarray | None = None,
    exact_gelu: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """One fused decoder conv step (see module docstring).

    x (B, H, W, cx) — already at the output resolution (the 2× nearest
    upsample stays an XLA broadcast: Mosaic cannot lower the row-interleave
    reshape); skip (B, H, W, cs) or None; w (3, 3, cx+cs, cout).
    Returns (B, H, W, cout) bf16."""
    bsz, h, wd, cx = x.shape
    cs = 0 if skip is None else skip.shape[-1]
    cout = w.shape[-1]
    oh, ow = h, wd
    use_ln = ln_scale is not None
    g = _images_per_step(oh, ow, cx + cs, cout)
    pad_b = (-bsz) % g
    if pad_b:
        zpad = lambda t: jnp.concatenate(
            [t, jnp.zeros((pad_b,) + t.shape[1:], t.dtype)], axis=0
        )
        x = zpad(x)
        skip = zpad(skip) if cs else None
    nb = x.shape[0]

    bf = jnp.bfloat16
    wx = w[:, :, :cx].astype(bf)
    vec = lambda t: t.reshape(1, -1).astype(bf)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))

    in_specs = [pl.BlockSpec((g, oh, ow, cx), lambda i: (i, 0, 0, 0))]
    args = [x.astype(bf)]
    if cs:
        in_specs.append(pl.BlockSpec((g, oh, ow, cs), lambda i: (i, 0, 0, 0)))
        args.append(skip.astype(bf))
    in_specs.append(const((3, 3, cx, cout)))
    args.append(wx)
    if cs:
        in_specs.append(const((3, 3, cs, cout)))
        args.append(w[:, :, cx:].astype(bf))
    in_specs.append(const((1, cout)))
    args.append(vec(b))
    if use_ln:
        in_specs += [const((1, cout)), const((1, cout))]
        args += [vec(ln_scale), vec(ln_bias)]

    out = pl.pallas_call(
        _decoder_kernel(g, oh, ow, cx, cs, cout, use_ln, exact_gelu),
        out_shape=jax.ShapeDtypeStruct((nb, oh, ow, cout), bf, vma=_vma_of(x)),
        grid=(nb // g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, oh, ow, cout), lambda i: (i, 0, 0, 0)),
        compiler_params=VMEM_LIMIT,
        interpret=interpret,
    )(*_args_to_vma(_vma_of(x), args))
    return out[:bsz]


def _up_axis_mosaic(v, axis):
    """In-kernel 2× bilinear along ``axis`` (half-pixel centers, edge
    clamp), Mosaic-safe: lax.concatenate + stack-reshape interleave. ONE
    implementation shared by both fused upsample kernels."""
    n = v.shape[axis]
    first = jax.lax.slice_in_dim(v, 0, 1, axis=axis)
    last = jax.lax.slice_in_dim(v, n - 1, n, axis=axis)
    prev = jax.lax.concatenate(
        [first, jax.lax.slice_in_dim(v, 0, n - 1, axis=axis)], axis
    )
    nxt = jax.lax.concatenate(
        [jax.lax.slice_in_dim(v, 1, n, axis=axis), last], axis
    )
    even = 0.25 * prev + 0.75 * v
    odd = 0.75 * v + 0.25 * nxt
    st = jnp.stack([even, odd], axis=axis + 1)
    shape = list(v.shape)
    shape[axis] *= 2
    return st.reshape(shape)


#: 3×3 conv taps K-packed in pairs: single-tap matmuls have K=cin (64 for
#: HoverNeXt) and run the 128-lane MXU half-empty — pairing restores full K
_TAPS = [(dy, dx) for dy in range(3) for dx in range(3)]
_TAP_PAIRS = [(_TAPS[i], _TAPS[i + 1]) for i in range(0, 8, 2)] + [(_TAPS[8],)]


def _chunk_conv_gelu(xp, w_ref, bias, c, rc, ow, cin, cout,
                     exact_gelu=False):
    """One row-chunk of the padded-upsample 3×3 conv + bias + exact GELU
    (f32 accumulate) — the shared inner loop of both fused kernels."""
    acc = jnp.zeros((rc * ow, cout), jnp.float32)

    def tap_of(dy, dx):
        return jax.lax.slice(
            xp, (c * rc + dy, dx, 0), (c * rc + dy + rc, dx + ow, cin)
        ).reshape(rc * ow, cin)

    for group in _TAP_PAIRS:
        t = jnp.concatenate([tap_of(*g) for g in group], axis=1)
        wg = jnp.concatenate([w_ref[dy, dx] for dy, dx in group], axis=0)
        acc = acc + jnp.dot(t, wg, preferred_element_type=jnp.float32)
    return _gelu_fn(exact_gelu)(acc + bias)


def _upsample_final_kernel(h: int, w: int, cin: int, cout: int,
                           exact_gelu: bool = False):
    """Whole-image 2× bilinear upsample + 3×3 conv + GELU, VMEM-resident.

    The XLA lowering of ``jax.image.resize`` + final conv materializes the
    2× activation in HBM THREE times (resize dot_generals → layout copy →
    conv read in a batch-minor layout) — profiled at ~54 ms of a 180 ms
    seg forward at batch 256. Here the 2× tensor exists only in VMEM.
    """

    def kernel(x_ref, w_ref, b_ref, out_ref):
        x = x_ref[0].astype(jnp.float32)  # (h, w, cin)
        up = _up_axis_mosaic(_up_axis_mosaic(x, 0), 1).astype(jnp.bfloat16)
        xp = jnp.pad(up, ((1, 1), (1, 1), (0, 0)))
        # conv in 4 row-chunks: a whole-image f32 accumulator is ~34 MB
        # after lane padding and tips total VMEM past the 128 MB chip limit
        oh, ow = 2 * h, 2 * w
        rc = oh // 4
        bias = b_ref[...].astype(jnp.float32)
        for c in range(4):
            acc = _chunk_conv_gelu(xp, w_ref, bias, c, rc, ow, cin, cout,
                                   exact_gelu)
            out_ref[0, c * rc : (c + 1) * rc, :, :] = acc.reshape(
                rc, ow, cout
            ).astype(out_ref.dtype)

    return kernel


@partial(jax.jit, static_argnames=("exact_gelu", "interpret"))
def fused_upsample_final(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    exact_gelu: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """x (B, H, W, cin) → 2× bilinear upsample → 3×3 conv(w, b) → exact
    GELU, (B, 2H, 2W, cout) bf16. Matches ``jax.image.resize(bilinear)``
    + conv + gelu element-wise (asserted in tests)."""
    bsz, h, wd, cin = x.shape
    if (2 * h) % 4:
        # the kernel writes the output in 4 row chunks of (2H)//4 rows:
        # a non-multiple would leave the tail rows UNINITIALIZED (Pallas
        # outputs are not zeroed) — same guard as fused_final_heads
        raise ValueError(f"2*H must be a multiple of 4, got H={h}")
    cout = w.shape[-1]
    vma = _vma_of(x)
    out = pl.pallas_call(
        _upsample_final_kernel(h, wd, cin, cout, exact_gelu),
        out_shape=jax.ShapeDtypeStruct(
            (bsz, 2 * h, 2 * wd, cout), jnp.bfloat16, vma=vma
        ),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, h, wd, cin), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((3, 3, cin, cout), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((1, cout), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2 * h, 2 * wd, cout), lambda i: (i, 0, 0, 0)),
        compiler_params=VMEM_LIMIT,
        interpret=interpret,
    )(*_args_to_vma(
        vma, [x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
              b.reshape(1, -1).astype(jnp.bfloat16)]
    ))
    return out


def _upsample_final_heads_kernel(h: int, w: int, cin: int, cout: int,
                                 n_out: int, exact_gelu: bool = False):
    """2× bilinear upsample + 3×3 conv + GELU + the three head matmuls
    folded, per image, VMEM-resident.

    The only HBM traffic is x in (2 MB/img) and the packed logits out
    (B, n_out, 2H, 2W) bf16 (1.3 MB/img at HoverNeXt widths) — the
    full-res cout activation never leaves VMEM. NCHW output: the logits'
    channel dim (10) would waste a 128-lane tile in NHWC; as (n_out, 2h,
    2w) the last two dims tile perfectly and the head matmul writes it
    via one small transposed dot_general per row chunk.

    Measured on v5e at HoverNeXt-tiny widths this LOSES in situ to the
    XLA composite-weight path (230 vs 199 ms/b256 seg forward): the
    per-image grid serializes the VPU upsample + M=32k/N=64 matmuls that
    XLA batches across all images, and the final stage is only ~20 ms of
    the forward to begin with (its 75 ms standalone reading was a jit-
    boundary artifact). Kept as a tested opt-in for models with wider
    final stages/heads where the full-res activation dominates HBM."""

    def kernel(x_ref, w_ref, b_ref, wh_ref, bh_ref, out_ref):
        x = x_ref[0].astype(jnp.float32)  # (h, w, cin)
        up = _up_axis_mosaic(_up_axis_mosaic(x, 0), 1).astype(jnp.bfloat16)
        xp = jnp.pad(up, ((1, 1), (1, 1), (0, 0)))
        oh, ow = 2 * h, 2 * w
        rc = oh // 4
        bias = b_ref[...].astype(jnp.float32)
        bh = bh_ref[...].astype(jnp.float32)  # (1, n_out)
        for c in range(4):
            acc = _chunk_conv_gelu(
                xp, w_ref, bias, c, rc, ow, cin, cout
            ).astype(jnp.bfloat16)
            # transposed head matmul: (cout, n_out)ᵀ·(rc·ow, cout)ᵀ →
            # (n_out, rc·ow) lands directly in the NCHW output layout
            z = jax.lax.dot_general(
                wh_ref[...], acc, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bh.reshape(n_out, 1)
            out_ref[0, :, c * rc : (c + 1) * rc, :] = z.reshape(
                n_out, rc, ow
            ).astype(out_ref.dtype)

    return kernel


@partial(jax.jit, static_argnames=("exact_gelu", "interpret"))
def fused_final_heads(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    wh: jnp.ndarray,
    bh: jnp.ndarray,
    exact_gelu: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """x (B, H, W, cin) → 2× bilinear upsample → 3×3 conv(w, b) →
    GELU (``exact_gelu`` selects erf vs tanh) → head matmul (wh (cout, n_out), bh) → logits (B, n_out, 2H, 2W)
    bf16 (NCHW — see kernel docstring). Element-exact vs
    ``jax.image.resize(bilinear)`` + conv + gelu + dot at bf16 precision."""
    bsz, h, wd, cin = x.shape
    cout = w.shape[-1]
    n_out = wh.shape[-1]
    if (2 * h) % 4:
        raise ValueError(
            f"fused_final_heads needs 2*H divisible by 4 (got H={h}): the "
            "kernel writes the output in 4 row chunks"
        )
    bf = jnp.bfloat16
    vma = _vma_of(x)
    out = pl.pallas_call(
        _upsample_final_heads_kernel(h, wd, cin, cout, exact_gelu=exact_gelu,
                                     n_out=n_out),
        out_shape=jax.ShapeDtypeStruct(
            (bsz, n_out, 2 * h, 2 * wd), bf, vma=vma
        ),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, h, wd, cin), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((3, 3, cin, cout), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((1, cout), lambda i: (0, 0)),
            pl.BlockSpec((cout, n_out), lambda i: (0, 0)),
            pl.BlockSpec((1, n_out), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, n_out, 2 * h, 2 * wd), lambda i: (i, 0, 0, 0)
        ),
        compiler_params=VMEM_LIMIT,
        interpret=interpret,
    )(*_args_to_vma(
        vma,
        [x.astype(bf), w.astype(bf), b.reshape(1, -1).astype(bf),
         wh.astype(bf), bh.reshape(1, -1).astype(bf)],
    ))
    return out


def _composite_heads_kernel(g: int, h: int, w: int, cin: int, c4: int,
                            n4: int, exact_gelu: bool = False):
    """Low-res composite final conv + GELU + block-diag head matmul, whole
    views per grid step. See ``composite_final_heads``."""

    def kernel(x_ref, wc_ref, b_ref, wh_ref, bh_ref, out_ref):
        xp = jnp.pad(x_ref[...], ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((g * h * w, c4), jnp.float32)
        acc = _conv3_matmuls(xp, wc_ref[...], g, h, w, acc)
        acc = acc + b_ref[...].astype(jnp.float32)
        y = _gelu_fn(exact_gelu)(acc).astype(jnp.bfloat16)
        z = jnp.dot(
            y, wh_ref[...], preferred_element_type=jnp.float32
        ) + bh_ref[...].astype(jnp.float32)
        out_ref[...] = z.reshape(g, h, w, n4).astype(out_ref.dtype)

    return kernel


@partial(jax.jit, static_argnames=("exact_gelu", "interpret"))
def composite_final_heads(
    x: jnp.ndarray,
    wc: jnp.ndarray,
    bias4: jnp.ndarray,
    wh_bd: jnp.ndarray,
    bh4: jnp.ndarray,
    exact_gelu: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Final stage in the LOW-RES parity domain, one Pallas kernel:
    3×3 composite conv (cin → 4·cout) + bias + exact GELU + block-diagonal
    head matmul (4·cout → 4·n_out), per low-res pixel.

    x (B, H, W, cin) — the last decoder output at half resolution (B
    includes the folded TTA views); wc (3, 3, cin, 4·cout) — the
    parity-folded resize∘conv weights (``models.hovernext_fn.
    _composite_final_weights``); bias4 (4·cout,); wh_bd (4·cout, 4·n_out)
    — the concatenated head weights repeated block-diagonally so all four
    parity phases map through ONE matmul; bh4 (4·n_out,).
    Returns (B, H, W, 4·n_out) bf16 parity logits (phase-major channel
    order (a, b) = 00, 01, 10, 11 — the caller depth-to-spaces them).

    Why it improves on both prior final-stage attempts: vs
    ``fused_final_heads`` there is no per-image VPU upsample to serialize
    (the composite weights absorb the bilinear 2×) and N is 4·cout=256,
    not 64; vs the XLA composite path the low-res GELU activation never
    touches HBM and the conv is 9 K-packed MXU matmuls. HBM per view:
    read 2.1 MB, write 1.3 MB.

    Measured on v5e (tools/seg_profile.py, b128 TTA×4): ISOLATED it wins
    — 1248 vs 1141 t/s (102.6 vs 112.2 ms) over the XLA composite path —
    but IN-SITU the full ``_infer`` is 340 t/s vs 366 with XLA: the
    custom-call boundary blocks XLA from fusing the stage with the
    surrounding decoder/TTA epilogue. Both formulations sit at ~12% MFU:
    the stage is VPU-bound on its 4.2M exact-erf GELUs per view, not
    MXU-bound. Kept as a tested opt-in (``fused_final="pallas"``); the
    XLA composite path stays the default."""
    bsz, h, w, cin = x.shape
    c4 = wc.shape[-1]
    n4 = wh_bd.shape[-1]
    bf = jnp.bfloat16
    g = 1  # whole views per step; M = h·w is already MXU-saturating
    vma = _vma_of(x)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    out = pl.pallas_call(
        _composite_heads_kernel(g, h, w, cin, c4, n4, exact_gelu),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, n4), bf, vma=vma),
        grid=(bsz // g,),
        in_specs=[
            pl.BlockSpec((g, h, w, cin), lambda i: (i, 0, 0, 0)),
            const((3, 3, cin, c4)),
            const((1, c4)),
            const((c4, n4)),
            const((1, n4)),
        ],
        out_specs=pl.BlockSpec((g, h, w, n4), lambda i: (i, 0, 0, 0)),
        compiler_params=VMEM_LIMIT,
        interpret=interpret,
    )(*_args_to_vma(
        vma,
        [x.astype(bf), wc.astype(bf), bias4.reshape(1, -1).astype(bf),
         wh_bd.astype(bf), bh4.reshape(1, -1).astype(bf)],
    ))
    return out


def _final_kernel(rows: int, w_: int, cin: int, cout: int, n_strips: int,
                  exact_gelu: bool = False):
    def kernel(x_hbm, w_ref, b_ref, out_ref, xs, sem):
        i = pl.program_id(0)
        s = pl.program_id(1)
        h_total = rows * n_strips

        # halo DMA: rows [s*rows - 1, s*rows + rows + 1) clamped; the
        # out-of-image halo rows stay zero — exactly the conv's zero pad
        if n_strips == 1:
            xs[...] = jnp.zeros_like(xs)
            cp = pltpu.make_async_copy(
                x_hbm.at[i, pl.ds(0, rows), :, :],
                xs.at[pl.ds(1, rows), :, :],
                sem,
            )
            cp.start()
            cp.wait()
        else:
            @pl.when(jnp.logical_or(s == 0, s == n_strips - 1))
            def _():
                xs[...] = jnp.zeros_like(xs)

            start = jnp.maximum(s * rows - 1, 0)
            stop = jnp.minimum(s * rows + rows + 1, h_total)
            dst0 = jnp.where(s == 0, 1, 0)
            cp = pltpu.make_async_copy(
                x_hbm.at[i, pl.ds(start, rows + 1), :, :],
                xs.at[pl.ds(dst0, rows + 1), :, :],
                sem,
            )
            # when neither edge: rows+2 are needed; a second 1-row copy
            # brings the trailing halo (DMA sizes must be static)
            cp.start()
            cp.wait()

            @pl.when(jnp.logical_and(s > 0, s < n_strips - 1))
            def _():
                cp2 = pltpu.make_async_copy(
                    x_hbm.at[i, pl.ds(stop - 1, 1), :, :],
                    xs.at[pl.ds(rows + 1, 1), :, :],
                    sem,
                )
                cp2.start()
                cp2.wait()

        xp = jnp.pad(xs[...], ((0, 0), (1, 1), (0, 0)))
        acc = jnp.zeros((rows * w_, cout), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                tap = jax.lax.slice(
                    xp, (dy, dx, 0), (dy + rows, dx + w_, cin)
                ).reshape(rows * w_, cin)
                acc = acc + jnp.dot(
                    tap, w_ref[dy, dx], preferred_element_type=jnp.float32
                )
        acc = _gelu_fn(exact_gelu)(acc + b_ref[...].astype(jnp.float32))
        out_ref[...] = acc.reshape(1, rows, w_, cout).astype(out_ref.dtype)

    return kernel


@partial(jax.jit, static_argnames=("rows", "exact_gelu", "interpret"))
def fused_final_conv_gelu(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    rows: int = 32,
    exact_gelu: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full-resolution 3×3 conv + bias + GELU (``exact_gelu`` selects erf
    vs tanh), strip-pipelined with halo DMA from HBM (module docstring).
    x (B, H, W, cin), H % rows == 0."""
    bsz, h, wd, cin = x.shape
    cout = w.shape[-1]
    if h % rows:
        # assert would vanish under -O, leaving the last rows of the strip
        # grid UNWRITTEN (Pallas outputs are not zeroed)
        raise ValueError(f"H={h} must be a multiple of rows={rows}")
    n_strips = h // rows
    bf = jnp.bfloat16

    # manual HBM→VMEM DMA slices (x stays in ANY memory space) require the
    # lane dim to be tiling-aligned — pad cin to 128; the zero channels
    # multiply zero weight rows, so the conv result is unchanged
    pad_c = (-cin) % 128
    if pad_c:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad_c)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, pad_c), (0, 0)))
        cin += pad_c

    out = pl.pallas_call(
        _final_kernel(rows, wd, cin, cout, n_strips, exact_gelu),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wd, cout), bf, vma=_vma_of(x)),
        grid=(bsz, n_strips),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, 3, cin, cout), lambda i, s: (0, 0, 0, 0)),
            pl.BlockSpec((1, cout), lambda i, s: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, wd, cout), lambda i, s: (i, s, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((rows + 2, wd, cin), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=VMEM_LIMIT,
        interpret=interpret,
    )(*_args_to_vma(
        _vma_of(x), [x.astype(bf), w.astype(bf), b.reshape(1, -1).astype(bf)]
    ))
    return out

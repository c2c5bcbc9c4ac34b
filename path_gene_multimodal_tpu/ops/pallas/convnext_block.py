"""Pallas kernel: fused ConvNeXtV2 block (dw7×7 + LN + pw1 + GELU + GRN + pw2).

The ConvNeXtV2 block (``models.convnext.ConvNeXtBlock``, the HoverNeXt
encoder's repeated unit — reference workload ``hovernet_inference.py:188-206``)
is the nuclei-stage hot loop: 18 blocks per forward, each a chain of
seven ops that XLA schedules as several HBM round-trips over the (H, W, C)
and (H, W, 4C) activations. This kernel runs ONE image's whole block
VMEM-resident per grid step (later stages fold several images per step to
fill the MXU):

- depthwise 7×7: 49 shifted fused multiply-adds on the VPU, f32 accum;
- LayerNorm over C: lane-dim reduction, f32;
- pwconv1 (C → 4C) and pwconv2 (4C → C): bf16 MXU matmuls with f32
  accumulation (``preferred_element_type``);
- exact GELU + GRN (global spatial L2 per channel — the reason the whole
  image must be resident) in f32;
- residual add, bf16 output.

HBM traffic per block: read x once, write out once (plus weights, which
Pallas keeps VMEM-resident across grid steps via constant index maps).
Numerics: f32 accumulation everywhere with bf16 tensor storage — at least
as precise as the unfused bf16 Flax path (parity asserted in tests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KERNEL_SIZE = 7
PAD = KERNEL_SIZE // 2

# Mosaic's default scoped-VMEM limit is 16 MB — a compiler default, not the
# hardware: v5e has 128 MB VMEM. The fused kernels keep whole images plus
# f32 accumulators resident, so raise the cap (leaving headroom for Pallas's
# double-buffered block DMA).
VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

def _vma_of(x):
    """Varying-mesh-axes of ``x`` (non-empty only when traced inside
    ``jax.shard_map`` with check_vma) — must be forwarded to the
    ``out_shape`` structs so Pallas calls compose with shard_map."""
    return getattr(jax.typeof(x), "vma", frozenset())


def _args_to_vma(vma, args):
    """pcast every operand missing any of ``vma``'s axes to varying on
    them: inside shard_map all pallas operands must share the sharded
    block input's varying axes (replicated weights otherwise trip the
    vma checker when the kernel is interpreted)."""
    if not vma:
        return args
    out = []
    for a in args:
        missing = tuple(sorted(vma - _vma_of(a)))
        out.append(jax.lax.pcast(a, missing, to="varying") if missing else a)
    return out



def _erf(x: jnp.ndarray) -> jnp.ndarray:
    """erf via Abramowitz–Stegun 7.1.26 (max abs err 1.5e-7 — far below
    bf16 resolution). Mosaic lowers exp but not the erf/erfc primitives."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429,
    )
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """tanh-approximation GELU (torch ``approximate='tanh'`` / jax
    ``approximate=True``). The production default: on v5e the erf
    polynomial is VPU-compute-bound while tanh hides under the HBM pass
    (tools/gelu_probe.py: 65.7 vs 44.0 ms on a 2.1G-element map)."""
    c3 = 0.044715
    k = 0.7978845608028654  # sqrt(2/pi)
    return 0.5 * x * (1.0 + jnp.tanh(k * (x + c3 * x * x * x)))


def _gelu_fn(exact: bool):
    return _gelu_exact if exact else _gelu_tanh


def _block_kernel(h: int, w: int, c: int, g: int, exact_gelu: bool = False):
    """g = images per grid step (folds small late-stage images into one
    MXU-friendly matmul; GRN reductions stay per-image)."""

    def kernel(
        x_ref, dw_ref, dwb_ref, lng_ref, lnb_ref, w1_ref, b1_ref,
        gg_ref, gb_ref, w2_ref, b2_ref, out_ref,
    ):
        x = x_ref[...]  # (g, h, w, c) bf16
        xf = x.astype(jnp.float32)

        # depthwise 7x7, zero padding (nn.Conv padding=3 semantics).
        # One sublane shift per dx column (w is the sublane dim), then the
        # 7 dy taps are cheap h-dim slices of that shifted copy — 7 lane
        # shuffles total instead of 49.
        xp = jnp.pad(xf, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
        acc = jnp.zeros_like(xf)
        for dx in range(KERNEL_SIZE):
            xdx = jax.lax.slice(
                xp, (0, 0, dx, 0), (g, h + 2 * PAD, dx + w, c)
            )
            for dy in range(KERNEL_SIZE):
                tap = jax.lax.slice(xdx, (0, dy, 0, 0), (g, dy + h, w, c))
                acc = acc + tap * dw_ref[dy, dx, :].astype(jnp.float32)
        acc = acc + dwb_ref[...].astype(jnp.float32)

        # LayerNorm over the channel (lane) axis
        mu = jnp.mean(acc, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(acc - mu), axis=-1, keepdims=True)
        y = (acc - mu) * jax.lax.rsqrt(var + 1e-6)
        y = y * lng_ref[...].astype(jnp.float32) + lnb_ref[...].astype(jnp.float32)

        # pwconv1: (g*h*w, c) @ (c, 4c) on the MXU
        y2 = jnp.dot(
            y.reshape(g * h * w, c).astype(jnp.bfloat16),
            w1_ref[...],
            preferred_element_type=jnp.float32,
        ) + b1_ref[...].astype(jnp.float32)
        y2 = _gelu_fn(exact_gelu)(y2)

        # GRN: global spatial L2 per channel, PER IMAGE. Algebraically
        # y3 = y2*(gamma*nx + 1) + beta — one broadcast FMA over the big
        # tensor instead of three.
        y2i = y2.reshape(g, h * w, 4 * c)
        gx = jnp.sqrt(jnp.sum(jnp.square(y2i), axis=1, keepdims=True) + 1e-12)
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        scale = gg_ref[...].astype(jnp.float32) * nx + 1.0  # (g, 1, 4c)
        y3 = y2i * scale + gb_ref[...].astype(jnp.float32)

        # pwconv2: (g*h*w, 4c) @ (4c, c) on the MXU + residual
        y4 = jnp.dot(
            y3.reshape(g * h * w, 4 * c).astype(jnp.bfloat16),
            w2_ref[...],
            preferred_element_type=jnp.float32,
        ) + b2_ref[...].astype(jnp.float32)
        out_ref[...] = (xf + y4.reshape(g, h, w, c)).astype(out_ref.dtype)

    return kernel


def _images_per_step(h: int, w: int, c: int) -> int:
    """Fold images per grid step under the VMEM budget: the pw1/pw2
    weights (16c² bytes bf16) are resident across all grid steps, and the
    live f32 activations are ~2 buffers of g*h*w*4c (pw1 output + GRN
    result) plus ~3 of g*h*w*c (x/xp/dwconv accum)."""
    weights = 16 * c * c
    # measured on v5e: an 11 MB activation budget beat 40 MB (smaller g →
    # better overlap of block DMA with compute); don't chase bigger folds
    budget = 11 * 1024 * 1024 - weights
    per_img = h * w * 4 * (2 * 4 * c + 3 * c)
    g = max(1, budget // max(per_img, 1))
    while g > 1 and (g & (g - 1)):  # power of two for clean batch padding
        g -= 1
    return min(g, 8)


@partial(jax.jit, static_argnames=("exact_gelu", "interpret"))
def fused_convnext_block(
    x: jnp.ndarray,
    dw: jnp.ndarray,
    dwb: jnp.ndarray,
    ln_gamma: jnp.ndarray,
    ln_beta: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    grn_gamma: jnp.ndarray,
    grn_beta: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    exact_gelu: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """x (B, H, W, C) → ConvNeXtV2 block output, same shape/dtype.

    Weight shapes follow the Flax module: dw (7, 7, C) [HWIO with I=1
    squeezed], dwb/ln_*/b2 (C,), w1 (C, 4C), b1/grn_* (4C,), w2 (4C, C).
    """
    b, h, w_, c = x.shape
    g = _images_per_step(h, w_, c)
    pad_b = (-b) % g
    if pad_b:
        x = jnp.concatenate([x, jnp.zeros((pad_b, h, w_, c), x.dtype)], axis=0)
    nb = x.shape[0]

    bf = jnp.bfloat16
    dw = dw.astype(bf)
    w1 = w1.astype(bf)
    w2 = w2.astype(bf)
    vec = lambda t: t.reshape(1, -1).astype(bf)

    img_spec = pl.BlockSpec((g, h, w_, c), lambda i: (i, 0, 0, 0))
    const2 = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))

    out = pl.pallas_call(
        _block_kernel(h, w_, c, g, exact_gelu),
        out_shape=jax.ShapeDtypeStruct((nb, h, w_, c), x.dtype, vma=_vma_of(x)),
        grid=(nb // g,),
        in_specs=[
            img_spec,
            const2((KERNEL_SIZE, KERNEL_SIZE, c)),
            const2((1, c)), const2((1, c)), const2((1, c)),
            const2((c, 4 * c)), const2((1, 4 * c)),
            const2((1, 4 * c)), const2((1, 4 * c)),
            const2((4 * c, c)), const2((1, c)),
        ],
        out_specs=img_spec,
        compiler_params=VMEM_LIMIT,
        interpret=interpret,
    )(
        *_args_to_vma(
            _vma_of(x),
            [
                x.astype(bf), dw, vec(dwb), vec(ln_gamma), vec(ln_beta),
                w1, vec(b1), vec(grn_gamma), vec(grn_beta), w2, vec(b2),
            ],
        )
    )
    return out[:b]


def block_params_from_flax(p: dict) -> tuple:
    """Extract the kernel's weight tuple from a Flax ConvNeXtBlock param
    subtree ({dwconv, norm, pwconv1, grn, pwconv2})."""
    dw = p["dwconv"]["kernel"]  # (7, 7, 1, C) HWIO depthwise
    return (
        dw.reshape(KERNEL_SIZE, KERNEL_SIZE, dw.shape[-1]),
        p["dwconv"]["bias"],
        p["norm"]["scale"],
        p["norm"]["bias"],
        p["pwconv1"]["kernel"],
        p["pwconv1"]["bias"],
        p["grn"]["gamma"],
        p["grn"]["beta"],
        p["pwconv2"]["kernel"],
        p["pwconv2"]["bias"],
    )

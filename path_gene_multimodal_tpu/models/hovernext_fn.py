"""Functional HoverNeXt forward over the Flax param pytree.

Mirrors ``models.hovernext.HoverNeXt`` / ``models.convnext.ConvNeXtV2``
op-for-op (parity asserted in tests) while exposing the compute graph for
kernel substitution: with ``fused_blocks=True`` every ConvNeXtV2 encoder
block runs as the single VMEM-resident Pallas kernel
(``ops.pallas.convnext_block``) instead of the seven-op XLA chain — the
nuclei-stage hot loop identified in round 1's bench (seg forward 245
tiles/s vs embed 1748; reference workload ``hovernet_inference.py:188-206``).

Consumes the exact param tree produced by ``HoverNeXt.init`` (and the
``pannuke_convnextv2_tiny_3`` converter in ``models.weights_hovernext``),
so checkpoints, sharding, and the unfused path all share one set of
weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from path_gene_multimodal_tpu.models.hovernext import HoverNeXtConfig
from path_gene_multimodal_tpu.ops.pallas.convnext_block import (
    block_params_from_flax,
    fused_convnext_block,
)
from path_gene_multimodal_tpu.ops.pallas.decoder import (
    upsample2x_nearest as _upsample2x_nearest,
)


def _conv(p, x, *, stride=1, pad=0, groups=1, dtype=jnp.float32):
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        p["kernel"].astype(dtype),
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return y + p["bias"].astype(dtype)


def _dense(p, x, dtype):
    return (
        jnp.dot(x.astype(dtype), p["kernel"].astype(dtype)) + p["bias"].astype(dtype)
    )


def _gelu(x, exact: bool):
    """GELU in the flavor ``cfg.exact_gelu`` selects — tanh by default
    (measured +20.6% seg-forward throughput on v5e, drift below bf16
    rounding; ``ConvNeXtConfig.exact_gelu`` docstring has the numbers)."""
    return jax.nn.gelu(x, approximate=not exact)


def _ln(p, x, dtype, eps=1e-6):
    # flax LayerNorm: statistics in f32 (fast variance), normalize, then
    # scale/shift in the module dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu), 0.0
    )
    mul = jax.lax.rsqrt(var + eps) * p["scale"].astype(jnp.float32)
    return ((xf - mu) * mul + p["bias"].astype(jnp.float32)).astype(dtype)


def _grn(p, x, dtype):
    x = x.astype(dtype)  # honor the requested dtype like _conv/_dense/_ln
    gamma, beta = p["gamma"], p["beta"]
    gx = jnp.sqrt(
        jnp.sum(x.astype(jnp.float32) ** 2, axis=(1, 2), keepdims=True) + 1e-12
    )
    nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
    nx = nx.astype(x.dtype)
    return (gamma.astype(x.dtype) * (x * nx) + beta.astype(x.dtype)) + x


def _block_unfused(p, x, dtype, exact_gelu=False):
    inp = x
    x = _conv(p["dwconv"], x, stride=1, pad=3, groups=x.shape[-1], dtype=dtype)
    x = _ln(p["norm"], x, dtype)
    x = _dense(p["pwconv1"], x, dtype)
    x = _gelu(x, exact_gelu)
    x = _grn(p["grn"], x, dtype)
    x = _dense(p["pwconv2"], x, dtype)
    return inp + x


# stages whose blocks run in the Pallas kernel by default: measured on
# v5e, the fused block wins at stages 0-2 but loses at stage 3, where the
# 768→3072 pw weights (9.4 MB bf16) crowd VMEM down to 1 image/step
DEFAULT_FUSED_STAGES = (0, 1, 2)


def encoder_features(
    enc_params,
    x: jnp.ndarray,
    cfg: HoverNeXtConfig,
    dtype=jnp.bfloat16,
    fused_blocks: bool | tuple[int, ...] = False,
    interpret: bool = False,
) -> list[jnp.ndarray]:
    """ConvNeXtV2 feature pyramid [/4, /8, /16, /32] (convnext.py parity).

    ``fused_blocks``: False = pure XLA; True = Pallas blocks on
    ``DEFAULT_FUSED_STAGES``; a tuple names the stages explicitly.

    PRECISION NOTE: the fused kernels compute in bf16 internally regardless
    of ``dtype`` (they exist to fill the MXU); requesting ``dtype=f32``
    with fused blocks gives bf16-rounded activations cast back to f32.
    For exact f32 numerics keep ``fused_blocks=False`` (what
    ``NucleiModel.build`` does for non-bf16 dtypes)."""
    if fused_blocks is True:
        fused_blocks = DEFAULT_FUSED_STAGES
    elif fused_blocks is False:
        fused_blocks = ()
    c = cfg.encoder
    x = _conv(enc_params["stem_conv"], x, stride=4, dtype=dtype)
    x = _ln(enc_params["stem_norm"], x, dtype)
    feats = []
    for s in range(c.num_stages):
        if s > 0:
            x = _ln(enc_params[f"down{s}_norm"], x, dtype)
            x = _conv(enc_params[f"down{s}_conv"], x, stride=2, dtype=dtype)
        for b in range(c.depths[s]):
            p = enc_params[f"stage{s}_block{b}"]
            if s in fused_blocks:
                x = fused_convnext_block(
                    x.astype(jnp.bfloat16),
                    *block_params_from_flax(p),
                    exact_gelu=c.exact_gelu,
                    interpret=interpret,
                ).astype(dtype)
            else:
                x = _block_unfused(p, x, dtype, c.exact_gelu)
        feats.append(x)
    return feats




def _dec_conv0_lowres(dp, x, skip, dtype):
    """``conv0(concat(nearest_up2x(x), skip))`` with the upsampled tensor
    NEVER materialized: nearest ×2 + zero-pad SAME compose exactly, so the
    x-path of conv0 collapses to ONE VALID 2×2 conv in the low-res parity
    domain (4 phase outputs stacked on the channel axis, 4/9 of the
    hi-res FLOPs), followed by depth-to-space; the skip-path is the
    kernel's skip-channel slice as a plain hi-res conv (conv over a
    concat == sum of per-slice convs). Exact — no border fixups needed:
    hi-res pad row -1 maps to low-res pad row -1 under floor division.
    Returns the pre-LN conv0 output at (B, 2H, 2W, cout)."""
    w = dp["kernel"].astype(jnp.float32)  # (3, 3, cin_total, cout)
    bias = dp["bias"]
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    w_up = w[:, :, :cin]
    # per-axis fold (nearest): phase 0 2-tap = [w(-1), w(0)+w(1)],
    #                          phase 1 2-tap = [w(-1)+w(0), w(1)]
    a0 = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 1.0]])
    a1 = jnp.asarray([[1.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    mats = (a0, a1)
    wc = jnp.concatenate(
        [
            jnp.einsum("yxio,ty,sx->tsio", w_up, mats[a], mats[bb])
            for a in (0, 1)
            for bb in (0, 1)
        ],
        axis=-1,
    )  # (2, 2, cin, 4·cout), phase order (a, b) = 00, 01, 10, 11
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    z = jax.lax.conv_general_dilated(
        xp.astype(dtype), wc.astype(dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, H+1, W+1, 4·cout); phase (a, b) lives at rows a..a+H-1
    phases = [
        z[:, a : a + h, bb : bb + wd, p * cout : (p + 1) * cout]
        for p, (a, bb) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1)))
    ]
    y = (
        jnp.stack(phases, axis=3)
        .reshape(b, h, wd, 2, 2, cout)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, 2 * h, 2 * wd, cout)
    )
    if skip is not None:
        y = y + jax.lax.conv_general_dilated(
            skip.astype(dtype), w[:, :, cin:].astype(dtype), (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    return y + bias.astype(dtype)


def _head_cat(p, ch, dtype):
    """Concatenated (np, hv, tp) head weights: one (ch, n_out) matmul
    instead of three 1×1 convs (each output channel is the same dot
    product either way)."""
    heads = ["head_np", "head_hv", "head_tp"]
    wcat = jnp.concatenate(
        [p[n]["kernel"].reshape(ch, -1).astype(dtype) for n in heads], axis=-1
    )
    bcat = jnp.concatenate([p[n]["bias"].astype(dtype) for n in heads])
    return wcat, bcat


def _composite_final_weights(w):
    """Parity-fold resize(2×, bilinear)∘conv3×3 into low-res composite
    weights (3, 3, cin, 4·cout), parity order (a, b) = 00, 01, 10, 11."""
    m0 = jnp.asarray([[0.75, 0.25, 0.0], [0.25, 0.75, 0.0], [0.0, 0.75, 0.25]])
    m1 = jnp.asarray([[0.25, 0.75, 0.0], [0.0, 0.75, 0.25], [0.0, 0.25, 0.75]])
    mats = (m0, m1)
    return jnp.concatenate(
        [
            jnp.einsum("yxio,yY,xX->YXio", w, mats[a], mats[bb])
            for a in (0, 1)
            for bb in (0, 1)
        ],
        axis=-1,
    )


def _exact_border_heads(out, p_final, x, wcat, bcat, dtype, exact_gelu=False):
    """Overwrite ``out``'s outer 2-px ring with the exact resize-clamp
    computation (the composite weights assume interior interpolation).
    ``wcat``/``bcat`` apply the folded head matmul after the GELU."""
    cin = x.shape[-1]

    def exact(xs):
        bb_, hh, ww, _ = xs.shape
        us = jax.image.resize(xs, (bb_, hh * 2, ww * 2, cin), method="bilinear")
        ys = _conv(p_final, us, stride=1, pad=1, dtype=dtype)
        ys = _gelu(ys, exact_gelu)
        return jnp.dot(ys.astype(dtype), wcat) + bcat

    out = out.at[:, :2].set(exact(x[:, :4])[:, :2])
    out = out.at[:, -2:].set(exact(x[:, -4:])[:, -2:])
    out = out.at[:, :, :2].set(exact(x[:, :, :4])[:, :, :2])
    out = out.at[:, :, -2:].set(exact(x[:, :, -4:])[:, :, -2:])
    return out


def _lowres_head_weights(p, p_final, dtype):
    """Shared weight folding for the low-res final variants: composite
    conv weights, 4×-tiled bias, concatenated head matrix (and its
    block-diagonal form for the Pallas kernel, where all four parity
    phases ride ONE matmul)."""
    w = p_final["kernel"].astype(jnp.float32)
    cout = w.shape[-1]
    wcat, bcat = _head_cat(p, cout, dtype)
    wc = _composite_final_weights(w)
    bias4 = jnp.tile(p_final["bias"], 4)
    return wc, bias4, wcat, bcat


def _parity_to_fullres(z, n_out):
    """(B, H, W, 4·n_out) phase-major parity logits → (B, 2H, 2W, n_out)."""
    b, h, wd = z.shape[:3]
    return (
        z.reshape(b, h, wd, 2, 2, n_out)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, 2 * h, 2 * wd, n_out)
    )


def _final_heads_lowres_pallas(p, x, dtype, exact_gelu=False, interpret=False):
    """``_final_heads_lowres`` computed by the ``ops.pallas.decoder.
    composite_final_heads`` kernel: the GELU activation never reaches HBM
    and the conv runs as K-packed MXU matmuls (the XLA emitter for the
    cin=64 composite conv measured ~28% MXU — kernel docstring)."""
    from path_gene_multimodal_tpu.ops.pallas.decoder import (
        composite_final_heads,
    )

    p_final = p["final_conv"]
    wc, bias4, wcat, bcat = _lowres_head_weights(p, p_final, dtype)
    cout = p_final["kernel"].shape[-1]
    n_out = wcat.shape[-1]
    eye = jnp.eye(4, dtype=wcat.dtype)
    wh_bd = jnp.einsum("pq,cn->pcqn", eye, wcat).reshape(4 * cout, 4 * n_out)
    bh4 = jnp.tile(bcat, 4)
    z = composite_final_heads(
        x, wc, bias4, wh_bd, bh4, exact_gelu=exact_gelu, interpret=interpret
    )
    # f32 BEFORE the border fix: the kernel emits bf16 and the exact border
    # strips come out in ``dtype`` — scattering wider values into a bf16
    # tensor would silently round them (and trips the dtype-promotion
    # FutureWarning)
    out = _parity_to_fullres(z, n_out).astype(jnp.float32)
    return _exact_border_heads(out, p_final, x, wcat, bcat, dtype, exact_gelu)


def _final_heads_lowres(p, x, dtype, exact_gelu=False):
    """_final_conv_lowres ∘ fused-head-matmul with the head applied in the
    LOW-RES parity domain: the (2H, 2W, cout) activation never
    materializes — only the (2H, 2W, heads) logits do (cout→10 for
    HoverNeXt: 6.4× less full-res HBM traffic)."""
    p_final = p["final_conv"]
    wc, bias4, wcat, bcat = _lowres_head_weights(p, p_final, dtype)
    cout = p_final["kernel"].shape[-1]
    b, h, wd, cin = x.shape
    n_out = wcat.shape[-1]

    y = _conv({"kernel": wc, "bias": bias4}, x, stride=1, pad=1, dtype=dtype)
    y = _gelu(y, exact_gelu)
    # heads per parity block, still at low res
    y = y.reshape(b, h, wd, 4, cout)
    z = jnp.einsum("bhwpc,cn->bhwpn", y.astype(dtype), wcat) + bcat
    out = _parity_to_fullres(z.reshape(b, h, wd, 4 * n_out), n_out)
    return _exact_border_heads(
        out, p_final, x, wcat, bcat, dtype, exact_gelu
    ).astype(jnp.float32)


def hovernext_forward(
    params,
    pixels: jnp.ndarray,
    cfg: HoverNeXtConfig,
    dtype=jnp.bfloat16,
    fused_blocks: bool = False,
    fused_decoder: bool | None = None,
    fused_final: bool | None = None,
    lowres_decoder: bool = False,
    interpret: bool = False,
    return_features: bool = False,
) -> dict[str, jnp.ndarray]:
    """Full HoverNeXt forward (hovernext.py:74-96 parity): pixels
    (B, H, W, 3) in [0, 1] → {"np", "hv", "tp"} logits at input res, f32.

    ``fused_decoder`` (default OFF): run each decoder conv step and the
    full-res final conv as the Pallas kernels in ``ops.pallas.decoder``
    (split-weight skip concat + conv + LN + GELU in one VMEM residency).
    Measured on v5e at HoverNeXt-tiny scale this LOSES to XLA's implicit-
    GEMM convs (604 vs 1020 im/s) — XLA tiles the 3×3 convs over the full
    128-image batch while the kernel serializes per grid step. Kept as a
    tested opt-in for decoder widths where weights no longer fit XLA's
    fusion headroom."""
    if fused_decoder is None:
        fused_decoder = False
    if fused_decoder and (fused_final is not None or lowres_decoder):
        raise ValueError(
            "fused_decoder=True runs the whole decoder + final stage as "
            "its own Pallas kernels; fused_final="
            f"{fused_final!r} / lowres_decoder={lowres_decoder} would be "
            "silently ignored — leave both at their defaults"
        )
    if fused_final is None:
        # "lowres" default: the composite-weight XLA reformulation
        # (_final_heads_lowres) avoids the 2× HBM intermediate and beats
        # every Pallas variant measured on v5e. "heads" = the fused
        # upsample+conv+GELU+head kernel (ops.pallas.decoder.
        # fused_final_heads) — in-situ it LOSES (230 vs 199 ms/b256
        # _infer: the per-image grid serializes the VPU upsample and
        # undersized matmuls that XLA batches across images; kept as a
        # tested opt-in for wider heads). "pallas" = the composite-weight
        # kernel (ops.pallas.decoder.composite_final_heads) — wins
        # ISOLATED (1248 vs 1141 t/s) but loses in-situ (340 vs 366 t/s
        # b128 _infer: the custom-call boundary blocks fusion with the
        # decoder/TTA epilogue), opt-in. True = the older Pallas
        # upsample+conv kernel without the head fold (285 vs 303 t/s,
        # opt-in); False = the plain resize path.
        fused_final = "lowres"
    if return_features:
        # feature-extraction mode (e.g. utils.headfit's closed-form head
        # fit): return the shared post-GELU pre-head map — the head-folded
        # final variants never materialize it, so force the plain path
        if fused_decoder:
            raise ValueError("return_features is not supported with fused_decoder")
        fused_final = False
    p = params["params"] if "params" in params else params
    feats = encoder_features(
        p["encoder"], pixels.astype(dtype), cfg, dtype, fused_blocks, interpret
    )
    x = feats[-1]
    skips = [feats[2], feats[1], feats[0], None]
    if fused_decoder:
        from path_gene_multimodal_tpu.ops.pallas.decoder import (
            fused_decoder_conv,
            fused_final_conv_gelu,
            upsample2x_bilinear,
        )

        for i in range(len(cfg.decoder_dims)):
            dp = p[f"dec{i}"]
            x = fused_decoder_conv(
                _upsample2x_nearest(x), skips[i],
                dp["conv0"]["kernel"], dp["conv0"]["bias"],
                dp["norm0"]["scale"], dp["norm0"]["bias"],
                exact_gelu=cfg.exact_gelu, interpret=interpret,
            )
            x = fused_decoder_conv(
                x, None, dp["conv1"]["kernel"], dp["conv1"]["bias"],
                dp["norm1"]["scale"], dp["norm1"]["bias"],
                exact_gelu=cfg.exact_gelu, interpret=interpret,
            )
        x = upsample2x_bilinear(x)
        x = fused_final_conv_gelu(
            x, p["final_conv"]["kernel"], p["final_conv"]["bias"],
            exact_gelu=cfg.exact_gelu, interpret=interpret,
        ).astype(dtype)
    else:
        for i in range(len(cfg.decoder_dims)):
            dp = p[f"dec{i}"]
            if lowres_decoder:
                # conv0∘upsample collapsed into the low-res parity domain
                # (exact; the 2× concat tensor never hits HBM). Measured on
                # v5e at tiny widths this LOSES to the hi-res XLA conv
                # (86 vs 75 ms/b256 decoder-only: the 4·cout phase concat
                # defeats XLA's implicit-GEMM tiling) — kept opt-in for
                # wider decoders where the 2× concat dominates HBM
                x = _dec_conv0_lowres(dp["conv0"], x, skips[i], dtype)
                x = _ln(dp["norm0"], x, dtype)
                x = _gelu(x, cfg.exact_gelu)
                x = _conv(dp["conv1"], x, stride=1, pad=1, dtype=dtype)
                x = _ln(dp["norm1"], x, dtype)
                x = _gelu(x, cfg.exact_gelu)
                continue
            x = _upsample2x_nearest(x)
            if skips[i] is not None:
                x = jnp.concatenate([x, skips[i]], axis=-1)
            for j in range(2):
                x = _conv(dp[f"conv{j}"], x, stride=1, pad=1, dtype=dtype)
                x = _ln(dp[f"norm{j}"], x, dtype)
                x = _gelu(x, cfg.exact_gelu)
        if fused_final == "heads":
            from path_gene_multimodal_tpu.ops.pallas.decoder import (
                fused_final_heads,
            )

            p_final = p["final_conv"]
            wcat, bcat = _head_cat(p, p_final["kernel"].shape[-1], dtype)
            z = fused_final_heads(
                x, p_final["kernel"], p_final["bias"], wcat, bcat,
                exact_gelu=cfg.exact_gelu, interpret=interpret,
            )  # (B, n_out, 2H, 2W) bf16
            out = jnp.transpose(z, (0, 2, 3, 1)).astype(jnp.float32)
            t = out.shape[-1] - 4
            return {
                "np": out[..., :2],
                "hv": out[..., 2:4],
                "tp": out[..., 4 : 4 + t],
            }
        if fused_final in ("lowres", "pallas"):
            # heads folded into the low-res parity domain: the full-res
            # cout activation never materializes. "pallas" further keeps
            # the low-res GELU activation VMEM-resident
            # (ops.pallas.decoder.composite_final_heads)
            if fused_final == "pallas":
                out = _final_heads_lowres_pallas(
                    p, x, dtype, cfg.exact_gelu, interpret
                )
            else:
                out = _final_heads_lowres(p, x, dtype, cfg.exact_gelu)
            t = out.shape[-1] - 4
            return {
                "np": out[..., :2],
                "hv": out[..., 2:4],
                "tp": out[..., 4 : 4 + t],
            }
        elif fused_final:
            from path_gene_multimodal_tpu.ops.pallas.decoder import (
                fused_upsample_final,
            )

            x = fused_upsample_final(
                x, p["final_conv"]["kernel"], p["final_conv"]["bias"],
                exact_gelu=cfg.exact_gelu, interpret=interpret,
            ).astype(dtype)
        else:
            b, h, w, ch = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, ch), method="bilinear")
            x = _conv(p["final_conv"], x, stride=1, pad=1, dtype=dtype)
            x = _gelu(x, cfg.exact_gelu)
    if return_features:
        return x
    # fused head matmul: the full-res activation map is read from HBM once
    # instead of three times
    wcat, bcat = _head_cat(p, x.shape[-1], dtype)
    out = (jnp.dot(x, wcat) + bcat).astype(jnp.float32)
    t = out.shape[-1] - 4
    return {"np": out[..., :2], "hv": out[..., 2:4], "tp": out[..., 4 : 4 + t]}

"""Real-layout HoverNeXt: shared ConvNeXtV2 encoder + per-branch
SMP-style U-Net decoders + segmentation heads (Flax, NHWC).

The reference's nuclei stage loads ``pannuke_convnextv2_tiny_3`` through
the public ``hover_next_inference`` repo (``/root/reference/
hovernet_inference.py:82-131``). That repo builds its model with
segmentation-models-pytorch (smp) on a timm ConvNeXtV2 encoder — a
"multi-head U-Net": one shared encoder, one U-Net decoder *per output
branch*, one 3×3-conv segmentation head per branch. This module is a
from-scratch Flax reconstruction of that architecture family (the
environment is zero-egress, so the layout was reconstructed from
knowledge of the public smp/timm code rather than the fetched source —
every structural assumption is parity-tested against a hand-built torch
mirror with the exact smp/timm module naming in
``tests/test_hovernext_real_parity.py``):

- **encoder**: timm ConvNeXtV2 (``features_only``) — identical math to
  ``models.convnext.ConvNeXtV2``, different checkpoint naming
  (``stem.0/1``, ``stages.S.blocks.B.{conv_dw,norm,mlp.fc1,mlp.grn,
  mlp.fc2}``, ``stages.S.downsample.{0,1}``) handled by
  ``models.weights_hovernext_real``.
- **decoder block** (smp ``DecoderBlock``): nearest 2× upsample → concat
  skip → [Conv3×3 (no bias) → BatchNorm → ReLU] × 2.
- **decoder** (smp ``UnetDecoder``, encoder_depth=4 for the stride-4
  ConvNeXt stem): start at /32, skips [/16, /8, /4], final block skipless
  → output at /2 of input.
- **head** (smp ``SegmentationHead``): Conv3×3 → ``UpsamplingBilinear2d``
  ×2 (align_corners=True — NOT jax.image.resize's half-pixel bilinear).

BatchNorm runs in inference mode with converted running statistics
(exactly the eval-mode torch math); XLA fuses the affine into the
surrounding elementwise chain.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax.numpy as jnp

from path_gene_multimodal_tpu.models.convnext import (
    CONVNEXTV2_TINY,
    ConvNeXtConfig,
    ConvNeXtV2,
)


@dataclass(frozen=True)
class RealHoverNeXtConfig:
    """Architecture config inferred from a real checkpoint's shapes by
    ``weights_hovernext_real.infer_real_config``."""

    encoder: ConvNeXtConfig = field(default_factory=lambda: CONVNEXTV2_TINY)
    decoder_channels: tuple[int, ...] = (256, 128, 64, 32)
    # ordered (decoder_name, head_name, out_channels) per branch; names are
    # the sanitized torch prefixes so converted params self-describe
    branches: tuple[tuple[str, str, int], ...] = (
        ("decoder_inst", "head_inst", 5),
        ("decoder_ct", "head_ct", 6),
    )
    head_upsampling: int = 2
    input_size: int = 256


REAL_HOVERNEXT_PANNUKE = RealHoverNeXtConfig()


def upsample_bilinear_align_corners(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """torch ``nn.UpsamplingBilinear2d`` parity (align_corners=True) for
    NHWC inputs — jax.image.resize implements only the half-pixel
    convention, which differs at every non-center pixel."""
    b, h, w, c = x.shape

    def axis_up(t: jnp.ndarray, size: int, axis: int) -> jnp.ndarray:
        out = size * factor
        src = jnp.arange(out, dtype=jnp.float32) * ((size - 1) / max(out - 1, 1))
        i0 = jnp.floor(src).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, size - 1)
        frac = (src - i0.astype(jnp.float32)).astype(t.dtype)
        shape = [1, 1, 1, 1]
        shape[axis] = out
        frac = frac.reshape(shape)
        return jnp.take(t, i0, axis=axis) * (1 - frac) + jnp.take(t, i1, axis=axis) * frac

    x = axis_up(x, h, 1)
    return axis_up(x, w, 2)


class BatchNormInference(nn.Module):
    """Eval-mode BatchNorm with converted running stats stored as params
    (inference-only model — no stat updates, no mutable collections)."""

    dim: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        mean = self.param("mean", nn.initializers.zeros, (self.dim,))
        var = self.param("var", nn.initializers.ones, (self.dim,))
        inv = (scale / jnp.sqrt(var + self.eps)).astype(self.dtype)
        return x * inv + (bias - mean * scale / jnp.sqrt(var + self.eps)).astype(
            self.dtype
        )


class SMPConvBNReLU(nn.Module):
    """smp ``Conv2dReLU`` with use_batchnorm=True: Conv3×3 (no bias) →
    BN → ReLU. Torch keys ``<name>.0`` (conv) / ``<name>.1`` (bn)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.dim, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
            name="conv",
        )(x)
        x = BatchNormInference(self.dim, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class SMPDecoderBlock(nn.Module):
    """smp ``DecoderBlock`` (attention_type=None): nearest 2× → concat
    skip → conv1 → conv2."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray | None) -> jnp.ndarray:
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # exact nearest 2×
        if skip is not None:
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        x = SMPConvBNReLU(self.dim, dtype=self.dtype, name="conv1")(x)
        x = SMPConvBNReLU(self.dim, dtype=self.dtype, name="conv2")(x)
        return x


class SMPUnetDecoder(nn.Module):
    """smp ``UnetDecoder`` over a stride-4-stem encoder (encoder_depth=4):
    blocks consume skips [/16, /8, /4] then run skipless to /2."""

    channels: tuple[int, ...]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: list[jnp.ndarray]) -> jnp.ndarray:
        # feats: [/4, /8, /16, /32] from the encoder
        x = feats[-1]
        skips = list(feats[-2::-1]) + [None] * (len(self.channels) - len(feats) + 1)
        for i, dim in enumerate(self.channels):
            x = SMPDecoderBlock(dim, dtype=self.dtype, name=f"block{i}")(
                x, skips[i]
            )
        return x


class SMPSegmentationHead(nn.Module):
    """smp ``SegmentationHead``: Conv3×3 → bilinear(align_corners) ×N."""

    out_channels: int
    upsampling: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv"
        )(x)
        if self.upsampling > 1:
            x = upsample_bilinear_align_corners(x, self.upsampling)
        return x


class RealHoverNeXt(nn.Module):
    """Shared encoder, one (decoder, head) pair per branch. Returns
    {head_name: (B, H, W, C) float32 logits} at input resolution."""

    cfg: RealHoverNeXtConfig = REAL_HOVERNEXT_PANNUKE
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> dict[str, jnp.ndarray]:
        c = self.cfg
        feats = ConvNeXtV2(c.encoder, dtype=self.dtype, name="encoder")(
            pixels.astype(self.dtype)
        )
        out: dict[str, jnp.ndarray] = {}
        decoded: dict[str, jnp.ndarray] = {}
        for dec_name, head_name, channels in c.branches:
            if dec_name not in decoded:  # branches may share one decoder
                decoded[dec_name] = SMPUnetDecoder(
                    c.decoder_channels, dtype=self.dtype, name=dec_name
                )(feats)
            out[head_name] = SMPSegmentationHead(
                channels, upsampling=c.head_upsampling, dtype=self.dtype,
                name=head_name,
            )(decoded[dec_name]).astype(jnp.float32)
        return out

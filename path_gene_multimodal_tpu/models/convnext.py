"""ConvNeXtV2 encoder (Flax) — backbone of the HoverNeXt nuclei model.

The reference runs nuclei segmentation with the torch
``pannuke_convnextv2_tiny_3`` checkpoint through the HoverNeXt repo
(``hovernet_inference.py:82-170``). This is the TPU-native encoder:
ConvNeXtV2 (stem 4×4/4, stages of [depthwise 7×7 → LN → pw 4× → GELU →
GRN → pw], downsample LN+2×2/2 between stages), returning the feature
pyramid for the U-Net-style decoder in ``models.hovernext``.

Channels-last throughout (NHWC — the TPU-native layout); weight converter
for torch NCHW checkpoints in ``models.weights_hovernext``.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp


@dataclass(frozen=True)
class ConvNeXtConfig:
    depths: tuple[int, ...] = (3, 3, 9, 3)
    dims: tuple[int, ...] = (96, 192, 384, 768)
    # GELU flavor for every block (and, via ``HoverNeXtConfig.exact_gelu``,
    # the HoverNeXt decoder/final stages). False = tanh approximation — on
    # v5e the exact-erf GELU is VPU-compute-bound (1.42× the cost of a pure
    # HBM pass; tools/gelu_probe.py) and switching the seg forward to tanh
    # measured +20.6% throughput (365→440 t/s, tools/gelu_ab.py) with
    # sub-bf16-rounding drift (max |Δ| ≤ 1.4% of range on np/hv).
    # True = the reference's torch ``nn.GELU()`` erf semantics
    # (hover_next model code; timm ConvNeXtV2) for exact-parity runs.
    exact_gelu: bool = False

    @property
    def num_stages(self) -> int:
        return len(self.depths)


CONVNEXTV2_TINY = ConvNeXtConfig()
CONVNEXTV2_NANO = ConvNeXtConfig(depths=(2, 2, 8, 2), dims=(80, 160, 320, 640))
CONVNEXTV2_SMALL = ConvNeXtConfig(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768))


class GRN(nn.Module):
    """Global Response Normalization (the V2 addition)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param("gamma", nn.initializers.zeros, (self.dim,))
        beta = self.param("beta", nn.initializers.zeros, (self.dim,))
        # L2 norm over spatial dims per channel
        gx = jnp.sqrt(jnp.sum(x.astype(jnp.float32) ** 2, axis=(1, 2), keepdims=True) + 1e-12)
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        nx = nx.astype(x.dtype)
        return (gamma.astype(x.dtype) * (x * nx) + beta.astype(x.dtype)) + x


class ConvNeXtBlock(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32
    exact_gelu: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inp = x
        x = nn.Conv(
            self.dim, (7, 7), padding=3, feature_group_count=self.dim,
            dtype=self.dtype, name="dwconv",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(x)
        x = nn.gelu(x, approximate=not self.exact_gelu)
        x = GRN(4 * self.dim, dtype=self.dtype, name="grn")(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        return inp + x


class ConvNeXtV2(nn.Module):
    """Returns per-stage features [C1(/4), C2(/8), C3(/16), C4(/32)]."""

    cfg: ConvNeXtConfig = CONVNEXTV2_TINY
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        c = self.cfg
        feats = []
        x = nn.Conv(c.dims[0], (4, 4), strides=(4, 4), dtype=self.dtype, name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)
        for s in range(c.num_stages):
            if s > 0:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"down{s}_norm")(x)
                x = nn.Conv(
                    c.dims[s], (2, 2), strides=(2, 2), dtype=self.dtype, name=f"down{s}_conv"
                )(x)
            for b in range(c.depths[s]):
                x = ConvNeXtBlock(
                    c.dims[s], dtype=self.dtype, exact_gelu=c.exact_gelu,
                    name=f"stage{s}_block{b}",
                )(x)
            feats.append(x)
        return feats

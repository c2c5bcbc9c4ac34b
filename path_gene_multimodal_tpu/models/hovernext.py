"""HoverNeXt nuclei segmentation model (Flax): ConvNeXtV2 encoder +
U-Net decoder + NP/HV/TP heads.

TPU-native rebuild of the model the reference drives through the
HoverNeXt repo (``hovernet_inference.py:82-170``, checkpoint
``pannuke_convnextv2_tiny_3``). Three output branches (HoVer-Net family):

- **NP** (2 ch): nuclei-pixel softmax (background / nucleus)
- **HV** (2 ch): horizontal/vertical distance-to-centroid regression
- **TP** (1 + num_types ch): per-pixel type softmax (PanNuke: 5 types +
  background, ``aggregated_hovernet_run.py:76-82`` TYPE_NAMES)

Decoder: top-down FPN/U-Net — upsample 2×, concat skip, two 3×3
conv+LN+GELU blocks per level, then one shared 2× upsample to input
resolution feeding the three 1×1 heads.

The full forward (encode → decode → heads) runs as one jitted bf16
program; sliding-window WSI inference + TTA lives in
``pipeline.nuclei``; the watershed post-processing in ``ops.watershed``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from path_gene_multimodal_tpu.models.convnext import (
    CONVNEXTV2_TINY,
    ConvNeXtConfig,
    ConvNeXtV2,
)


@dataclass(frozen=True)
class HoverNeXtConfig:
    encoder: ConvNeXtConfig = field(default_factory=lambda: CONVNEXTV2_TINY)
    decoder_dims: tuple[int, ...] = (384, 192, 96, 64)
    num_types: int = 5  # PanNuke nucleus types (ids 1..5)
    input_size: int = 256

    @property
    def tp_channels(self) -> int:
        return self.num_types + 1

    @property
    def exact_gelu(self) -> bool:
        """GELU flavor for the WHOLE network (encoder blocks, decoder
        convs, final conv) — single source of truth on the encoder config
        (``ConvNeXtConfig.exact_gelu``; see its docstring for the measured
        tanh-vs-erf numbers). Default False = tanh (TPU-fast)."""
        return self.encoder.exact_gelu


HOVERNEXT_TINY = HoverNeXtConfig()


class DecoderBlock(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32
    exact_gelu: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray | None) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        for i in range(2):
            x = nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"norm{i}")(x)
            x = nn.gelu(x, approximate=not self.exact_gelu)
        return x


class HoverNeXt(nn.Module):
    cfg: HoverNeXtConfig = HOVERNEXT_TINY
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> dict[str, jnp.ndarray]:
        """pixels: (B, H, W, 3) float in [0, 1] (HoverNeXt's normalization).
        Returns {"np": (B,H,W,2), "hv": (B,H,W,2), "tp": (B,H,W,T+1)} —
        logits for np/tp, raw regression for hv, all at input resolution."""
        c = self.cfg
        feats = ConvNeXtV2(c.encoder, dtype=self.dtype, name="encoder")(
            pixels.astype(self.dtype)
        )
        # feats: [/4, /8, /16, /32]
        x = feats[-1]
        skips = [feats[2], feats[1], feats[0], None]
        for i, dim in enumerate(c.decoder_dims):
            x = DecoderBlock(
                dim, dtype=self.dtype, exact_gelu=c.exact_gelu, name=f"dec{i}"
            )(x, skips[i])
        # x is now at /2 resolution (three skip merges + one plain upsample)
        b, h, w, ch = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, ch), method="bilinear")
        x = nn.Conv(c.decoder_dims[-1], (3, 3), padding=1, dtype=self.dtype, name="final_conv")(x)
        x = nn.gelu(x, approximate=not c.exact_gelu)
        out_np = nn.Conv(2, (1, 1), dtype=self.dtype, name="head_np")(x)
        out_hv = nn.Conv(2, (1, 1), dtype=self.dtype, name="head_hv")(x)
        out_tp = nn.Conv(c.tp_channels, (1, 1), dtype=self.dtype, name="head_tp")(x)
        f32 = lambda t: t.astype(jnp.float32)
        return {"np": f32(out_np), "hv": f32(out_hv), "tp": f32(out_tp)}


def hv_rot_invert(h: jnp.ndarray, v: jnp.ndarray, k: int):
    """Swap/negate HV vector components back into the slide frame after the
    spatial rot90-by-(-k) that undoes a rot90-by-k augmentation. The sign
    table is hand-derived once here — every TTA path (canonical NucleiModel
    and the real-checkpoint RealNucleiModel) must share it."""
    k = k % 4
    if k == 1:
        return -v, h
    if k == 2:
        return -h, -v
    if k == 3:
        return v, -h
    return h, v


def _tta_invert(out: dict[str, jnp.ndarray], k: int) -> dict[str, jnp.ndarray]:
    """Undo a rot90-by-k augmentation on model outputs; HV channels are
    rotated AND swapped/negated to stay in the slide frame."""
    np_b = jnp.rot90(out["np"], k=-k, axes=(1, 2))
    tp_b = jnp.rot90(out["tp"], k=-k, axes=(1, 2))
    hv_b = jnp.rot90(out["hv"], k=-k, axes=(1, 2))
    h, v = hv_rot_invert(hv_b[..., 0], hv_b[..., 1], k)
    return {"np": np_b, "hv": jnp.stack([h, v], axis=-1), "tp": tp_b}


def tta_forward(
    apply_fn, params, pixels: jnp.ndarray, tta: int = 4, fold_batch: bool = False
) -> dict[str, jnp.ndarray]:
    """Test-time augmentation over {id, rot90, rot180, rot270} (the
    reference's ``tta=4``, hovernet_inference.py:195), inverse-transformed
    and averaged. ``fold_batch`` stacks the rotations into ONE forward of
    batch ``tta×B`` (better MXU utilization at small batch) instead of
    ``tta`` sequential forwards."""
    if fold_batch and tta > 1:
        b = pixels.shape[0]
        stacked = jnp.concatenate(
            [jnp.rot90(pixels, k=k, axes=(1, 2)) for k in range(tta)], axis=0
        )
        out = apply_fn(params, stacked)
        parts = [
            _tta_invert({n: t[k * b : (k + 1) * b] for n, t in out.items()}, k)
            for k in range(tta)
        ]
        return {
            n: sum(p[n] for p in parts) / tta for n in parts[0]
        }
    accum: dict[str, jnp.ndarray] | None = None
    for k in range(tta):
        rot = jnp.rot90(pixels, k=k, axes=(1, 2))
        out_b = _tta_invert(apply_fn(params, rot), k)
        accum = out_b if accum is None else {k2: accum[k2] + out_b[k2] for k2 in accum}
    return {k2: v / tta for k2, v in accum.items()}

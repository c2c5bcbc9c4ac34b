"""timm-style Vision Transformer (Flax) — the REAL Virchow2 architecture.

The reference's ``MODEL_TYPE="Virchow2"`` path
(``/root/reference/extract_embedding_from_tiles.py:14``,
``tnbc_config.py:41``) loads ``paige-ai/Virchow2``, which is a timm
``VisionTransformer`` — NOT the CLIP tower: ViT-H/14 with 4 register
tokens, **SwiGLU (packed GluMlp, SiLU, gate-first)** MLPs at ratio
5.3375, **LayerScale** (init 1e-5), fused-qkv attention, no pre-LN, and
the tile embedding = concat(cls token, mean of patch tokens) after the
final norm. This module implements that block family natively (NHWC,
bf16-friendly, MXU einsum attention with f32 accumulation); the weight
converter for the timm checkpoint naming lives in ``models.weights``
(``convert_timm_vit``), parity-tested against a torch mirror in
``tests/test_virchow2_parity.py``.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

# head counts for standard ViT widths (not derivable from weight shapes)
_HEADS_BY_WIDTH = {384: 6, 768: 12, 1024: 16, 1280: 16, 1408: 16, 1536: 24}


@dataclass(frozen=True)
class TimmViTConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1280
    layers: int = 32
    heads: int = 16
    num_registers: int = 4
    mlp_hidden: int = 6832      # fc1 output features (SwiGLU: 2× the gate width)
    mlp_type: str = "swiglu"    # "swiglu" (GluMlp gate-first SiLU) | "gelu"
    use_layerscale: bool = True
    # "prefix": pos_embed covers cls+reg+patches (timm no_embed_class=False)
    # "patches_only": pos_embed covers patches; prefix tokens unposed
    pos_embed_mode: str = "patches_only"
    pool: str = "cls+mean"      # Virchow2 embedding = concat(cls, patch mean)

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def seq_len(self) -> int:
        return 1 + self.num_registers + self.grid * self.grid

    @property
    def pos_len(self) -> int:
        return (
            self.grid * self.grid
            if self.pos_embed_mode == "patches_only"
            else self.seq_len
        )

    @property
    def out_width(self) -> int:
        return 2 * self.width if self.pool == "cls+mean" else self.width


# paige-ai/Virchow2: ViT-H/14, 4 registers, SwiGLU ratio 5.3375,
# LayerScale 1e-5, embedding 2560 = concat(cls, patch-mean)
VIRCHOW2_TIMM = TimmViTConfig()


class TimmAttention(nn.Module):
    """timm ``Attention``: fused qkv Linear, per-head softmax, out proj."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, n, d = x.shape
        h = self.num_heads
        hd = d // h
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, h, hd)
        k = k.reshape(b, n, h, hd)
        v = v.reshape(b, n, h, hd)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q * (hd ** -0.5), k,
            preferred_element_type=jnp.float32,
        )
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, n, d)
        return nn.Dense(d, dtype=self.dtype, name="proj")(out)


class SwiGLUPacked(nn.Module):
    """timm ``GluMlp`` with ``gate_last=False`` + SiLU (= SwiGLUPacked):
    fc1 → chunk in half → silu(first) * second → fc2."""

    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        gate, val = jnp.split(x, 2, axis=-1)
        x = jax.nn.silu(gate) * val
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class GeluMlp(nn.Module):
    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class LayerScale(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param("gamma", nn.initializers.constant(1e-5), (self.dim,))
        return x * gamma.astype(x.dtype)


class TimmBlock(nn.Module):
    cfg: TimmViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        d = c.width
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = TimmAttention(c.heads, dtype=self.dtype, name="attn")(y)
        if c.use_layerscale:
            y = LayerScale(d, dtype=self.dtype, name="ls1")(y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        mlp_cls = SwiGLUPacked if c.mlp_type == "swiglu" else GeluMlp
        y = mlp_cls(c.mlp_hidden, d, dtype=self.dtype, name="mlp")(y)
        if c.use_layerscale:
            y = LayerScale(d, dtype=self.dtype, name="ls2")(y)
        return x + y


class TimmViT(nn.Module):
    """Returns the pooled embedding: concat(cls, patch-mean) for
    ``pool="cls+mean"`` (Virchow2's 2560-d tile embedding), else cls."""

    cfg: TimmViTConfig = VIRCHOW2_TIMM
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        b = pixels.shape[0]
        x = nn.Conv(
            c.width, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), dtype=self.dtype,
            name="patch_embed",
        )(pixels.astype(self.dtype))
        x = x.reshape(b, c.grid * c.grid, c.width)
        cls = self.param("cls_token", nn.initializers.normal(1e-6), (c.width,))
        prefix = [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, c.width))]
        if c.num_registers:
            reg = self.param(
                "reg_token", nn.initializers.normal(1e-6),
                (c.num_registers, c.width),
            )
            prefix.append(
                jnp.broadcast_to(reg.astype(self.dtype), (b, c.num_registers, c.width))
            )
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (c.pos_len, c.width)
        )
        if c.pos_embed_mode == "patches_only":
            x = x + pos.astype(self.dtype)[None]
            x = jnp.concatenate(prefix + [x], axis=1)
        else:
            x = jnp.concatenate(prefix + [x], axis=1)
            x = x + pos.astype(self.dtype)[None]
        for i in range(c.layers):
            x = TimmBlock(c, dtype=self.dtype, name=f"block{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        if c.pool == "cls+mean":
            return jnp.concatenate(
                [x[:, 0], x[:, 1 + c.num_registers :].mean(axis=1)], axis=-1
            )
        return x[:, 0]

"""CLIP image + text towers (Flax) — the tile/class embedding models.

TPU-native rebuild of the encoders the reference drives through Mussel
(``extract_embedding_from_tiles.py:9-70`` CLIP/Virchow2 image tower,
``create_embedding.py:13-69`` CLIP text tower). Architecture matches
OpenAI CLIP ViT-B/16 by default (the transformers ``CLIPModel`` layout, so
published checkpoints convert 1:1 via ``models.weights``); a Virchow2-style
ViT-H/14 config (register tokens, no text tower) is provided for the
``MODEL_TYPE="Virchow2"`` path.

Embedding parity requirement: ≥0.999 cosine vs the torch reference
(BASELINE.md) — enforced in tests by round-tripping transformers weights.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from path_gene_multimodal_tpu.models.layers import Transformer, quick_gelu

# CLIP preprocessing constants (OpenAI; used by Mussel's feature extractor)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
# ImageNet constants (Virchow2 path)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclass(frozen=True)
class VisionConfig:
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    out_dim: int | None = 512      # projection dim (None = return pooled width)
    num_registers: int = 0          # Virchow2-style register tokens
    mlp_ratio: float = 4.0
    use_quick_gelu: bool = True
    pool: str = "cls"               # "cls" | "cls+mean" (Virchow2 concat)

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def seq_len(self) -> int:
        return 1 + self.num_registers + self.grid * self.grid


@dataclass(frozen=True)
class TextConfig:
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    mlp_ratio: float = 4.0
    out_dim: int = 512


# Named presets for the reference's MODEL_TYPE values.
CLIP_VIT_B16 = VisionConfig()
CLIP_VIT_B32 = VisionConfig(patch_size=32)
CLIP_VIT_L14 = VisionConfig(patch_size=14, width=1024, layers=24, heads=16, out_dim=768)
VIRCHOW2 = VisionConfig(
    patch_size=14, width=1280, layers=32, heads=16, out_dim=None,
    num_registers=4, use_quick_gelu=False, pool="cls+mean",
)
CLIP_TEXT = TextConfig()


class VisionTower(nn.Module):
    """ViT image encoder (CLIP layout: conv patchify, cls token, learned pos
    embed, ln_pre, pre-LN transformer, ln_post, linear projection)."""

    cfg: VisionConfig = CLIP_VIT_B16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """pixels: (B, H, W, 3) float, already normalized. Returns (B, D)."""
        c = self.cfg
        b = pixels.shape[0]
        x = nn.Conv(
            c.width,
            (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            use_bias=False,
            dtype=self.dtype,
            name="patch_embed",
        )(pixels.astype(self.dtype))
        x = x.reshape(b, c.grid * c.grid, c.width)
        cls = self.param("cls_token", nn.initializers.normal(0.02), (c.width,))
        tokens = [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, c.width))]
        if c.num_registers:
            reg = self.param(
                "register_tokens", nn.initializers.normal(0.02), (c.num_registers, c.width)
            )
            tokens.append(jnp.broadcast_to(reg.astype(self.dtype), (b, c.num_registers, c.width)))
        x = jnp.concatenate(tokens + [x], axis=1)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.01), (c.seq_len, c.width)
        )
        x = x + pos.astype(self.dtype)[None]
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(x)
        x = Transformer(
            layers=c.layers,
            num_heads=c.heads,
            mlp_ratio=c.mlp_ratio,
            act=quick_gelu if c.use_quick_gelu else nn.gelu,
            dtype=self.dtype,
            name="transformer",
        )(x)
        if c.pool == "cls+mean":
            # Virchow2 embedding: concat(cls, mean of patch tokens)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(x)
            cls_tok = x[:, 0]
            patch_mean = x[:, 1 + c.num_registers :].mean(axis=1)
            pooled = jnp.concatenate([cls_tok, patch_mean], axis=-1)
        else:
            pooled = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(x[:, 0])
        if c.out_dim is not None:
            pooled = nn.Dense(
                c.out_dim, use_bias=False, dtype=self.dtype, name="proj"
            )(pooled)
        return pooled


class TextTower(nn.Module):
    """CLIP text encoder: token+pos embeddings, causal pre-LN transformer,
    final LN, features taken at the EOT token (highest token id)."""

    cfg: TextConfig = CLIP_TEXT
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        """ids: (B, L) int32 padded to context_length. Returns (B, out_dim)."""
        c = self.cfg
        b, n = ids.shape
        tok = nn.Embed(c.vocab_size, c.width, dtype=self.dtype, name="token_embed")(ids)
        pos = self.param("pos_embed", nn.initializers.normal(0.01), (c.context_length, c.width))
        x = tok + pos.astype(self.dtype)[None, :n]
        causal = jnp.triu(jnp.full((n, n), -jnp.inf, jnp.float32), k=1)[None, None]
        x = Transformer(
            layers=c.layers, num_heads=c.heads, mlp_ratio=c.mlp_ratio,
            act=quick_gelu, dtype=self.dtype, name="transformer",
        )(x, mask=causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)
        eot = jnp.argmax(ids, axis=-1)  # EOT has the highest id in CLIP's vocab
        pooled = x[jnp.arange(b), eot]
        return nn.Dense(c.out_dim, use_bias=False, dtype=self.dtype, name="proj")(pooled)


# ---------------------------------------------------------------------------
# Preprocessing + jitted encode entry points
# ---------------------------------------------------------------------------


def preprocess_tiles(
    tiles_u8: jnp.ndarray, mean: np.ndarray = CLIP_MEAN, std: np.ndarray = CLIP_STD
) -> jnp.ndarray:
    """uint8 (B, H, W, 3) RGB → normalized float32. Tiles are already the
    model's native 224 px so no resize/crop (parity with Mussel's pipeline
    feeding 224 px tiles to CLIP's 224 px input)."""
    x = tiles_u8.astype(jnp.float32) / 255.0
    return (x - mean) / std


class ImageEncoder:
    """Convenience wrapper: holds params + jitted normalize→ViT forward.

    Pass ``mesh`` (a 1-D ``jax.sharding.Mesh``) to run data-parallel over
    the tile axis: weights replicate, each batch shards across devices
    (the TPU-native replacement for the reference's single-GPU batching —
    SURVEY.md parallelism inventory). Batches must divide the mesh size;
    ``pipeline.embed`` pads them.
    """

    def __init__(
        self,
        cfg: VisionConfig = CLIP_VIT_B16,
        params=None,
        dtype=jnp.bfloat16,
        seed: int = 0,
        mean: np.ndarray = CLIP_MEAN,
        std: np.ndarray = CLIP_STD,
        mesh=None,
    ):
        self.cfg = cfg
        self.mesh = mesh
        from path_gene_multimodal_tpu.models.vit_timm import TimmViT, TimmViTConfig

        if isinstance(cfg, TimmViTConfig):
            # the REAL Virchow2 architecture (timm ViT: SwiGLU, LayerScale,
            # registers) — loaded via core.checkpoints.load_virchow2_from_torch
            self.model = TimmViT(cfg, dtype=dtype)
        else:
            self.model = VisionTower(cfg, dtype=dtype)
        if params is None:
            dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
            params = self.model.init(jax.random.PRNGKey(seed), dummy)
        if mesh is not None:
            from path_gene_multimodal_tpu.parallel.mesh import batch_sharding, shard_params

            params = shard_params(params, mesh)
            self._in_sharding = batch_sharding(mesh, 4)
        else:
            self._in_sharding = None
        self.params = params
        self._mean = jnp.asarray(mean)
        self._std = jnp.asarray(std)

        @jax.jit
        def _fwd(params, tiles_u8):
            pixels = preprocess_tiles(tiles_u8, self._mean, self._std)
            s = cfg.image_size
            if pixels.shape[1] != s or pixels.shape[2] != s:
                # tile size ≠ model input (e.g. PATCH_SIZE overridden):
                # bilinear resize on device, as Mussel's loader does before
                # feeding CLIP (extract_embedding_from_tiles.py consumer)
                pixels = jax.image.resize(
                    pixels, (pixels.shape[0], s, s, 3), method="bilinear"
                )
            return self.model.apply(params, pixels).astype(jnp.float32)

        self._fwd = _fwd

    @property
    def out_dim(self) -> int:
        """Embedding width this encoder emits — 512/768 for projected CLIP,
        width (or 2x width for cls+mean pooling, e.g. Virchow2's 2560) when
        there is no projection. Empty-slide artifacts need it to write the
        correct feature-matrix width."""
        c = self.cfg
        d = getattr(c, "out_dim", None)
        if d is not None:
            return int(d)
        two = getattr(c, "pool", "cls") == "cls+mean"
        return int(c.width) * (2 if two else 1)

    def __call__(self, tiles_u8) -> jnp.ndarray:
        if self._in_sharding is not None:
            if not isinstance(tiles_u8, jax.Array):
                # lists/sequences must become ONE array first — device_put
                # would otherwise treat them as a pytree of 3-D leaves and
                # mis-apply the 4-D batch sharding per leaf
                tiles_u8 = np.asarray(tiles_u8)
            tiles_u8 = jax.device_put(tiles_u8, self._in_sharding)
        else:
            tiles_u8 = jnp.asarray(tiles_u8)
        return self._fwd(self.params, tiles_u8)


class TextEncoder:
    def __init__(self, cfg: TextConfig = CLIP_TEXT, params=None, dtype=jnp.float32, seed: int = 0):
        self.cfg = cfg
        self.model = TextTower(cfg, dtype=dtype)
        if params is None:
            dummy = jnp.zeros((1, cfg.context_length), jnp.int32)
            params = self.model.init(jax.random.PRNGKey(seed), dummy)
        self.params = params
        self._fwd = jax.jit(lambda p, ids: self.model.apply(p, ids).astype(jnp.float32))

    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        ids = jnp.asarray(ids)
        L = self.cfg.context_length
        if ids.shape[1] != L:
            # the BPE tokenizer pads to CLIP's canonical 77: a smaller-
            # context checkpoint crops with EOT re-pinned at the end
            # (CLIP's truncation rule; features are read at the FIRST
            # max-id position, so an earlier EOT still wins), a larger one
            # right-pads with zeros
            if ids.shape[1] > L:
                eot = ids.max(axis=1)
                ids = ids[:, :L].at[:, -1].set(eot)
            else:
                ids = jnp.pad(ids, ((0, 0), (0, L - ids.shape[1])))
        # out-of-vocab ids (a tokenizer wider than the checkpoint, e.g. the
        # hash fallback against a small test tower) would hit flax Embed's
        # NaN fill; fold them into range instead (no-op for real CLIP where
        # every id < vocab_size)
        ids = ids % self.cfg.vocab_size
        return self._fwd(self.params, ids)

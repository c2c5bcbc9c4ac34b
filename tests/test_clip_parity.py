"""CLIP tower parity vs torch/transformers.

The reference's embeddings come from torch CLIP (via Mussel); our Flax
towers must reproduce them to ≥0.999 cosine from the *same weights*
(BASELINE.md target). No pretrained weights exist in this zero-egress
image, so we instantiate transformers' CLIPModel with random init, convert
its state_dict through models.weights, and compare forward passes — this
validates architecture + converter, which is exactly what checkpoint
loading exercises.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from path_gene_multimodal_tpu.models.clip import (
    TextConfig,
    TextTower,
    VisionConfig,
    VisionTower,
    preprocess_tiles,
    CLIP_MEAN,
    CLIP_STD,
)
from path_gene_multimodal_tpu.models.weights import (
    convert_clip_text,
    convert_clip_vision,
    infer_vision_config,
)


def _cosine(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-12
    )
    return float(cos.min())


def _small_clip():
    cfg = transformers.CLIPConfig(
        text_config=dict(
            vocab_size=128, hidden_size=32, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=16,
            eos_token_id=127, bos_token_id=126, pad_token_id=0, projection_dim=24,
        ),
        vision_config=dict(
            hidden_size=64, intermediate_size=256, num_hidden_layers=2,
            num_attention_heads=2, image_size=32, patch_size=16, projection_dim=24,
        ),
        projection_dim=24,
    )
    torch.manual_seed(0)
    model = transformers.CLIPModel(cfg).eval()
    return model, cfg


@pytest.fixture(scope="module")
def small_clip():
    return _small_clip()


def test_vision_parity_small(small_clip):
    model, cfg = small_clip
    sd = {k: v for k, v in model.state_dict().items()}
    vcfg = VisionConfig(
        image_size=32, patch_size=16, width=64, layers=2, heads=2, out_dim=24
    )
    params = convert_clip_vision(sd, vcfg)
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(3, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model.get_image_features(
            pixel_values=torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        ).numpy()
    ours = VisionTower(vcfg, dtype=jnp.float32).apply(params, jnp.asarray(imgs))
    assert _cosine(ours, ref) >= 0.9999
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)


def test_text_parity_small(small_clip):
    model, cfg = small_clip
    sd = {k: v for k, v in model.state_dict().items()}
    tcfg = TextConfig(vocab_size=128, context_length=16, width=32, layers=2, heads=2, out_dim=24)
    params = convert_clip_text(sd, tcfg)
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 120, size=(4, 16))
    ids[:, 0] = 126  # BOS
    ids[:, -1] = 127  # EOS = highest id → argmax pooling position matches
    ids = ids.astype(np.int64)
    with torch.no_grad():
        ref = model.get_text_features(input_ids=torch.from_numpy(ids)).numpy()
    ours = TextTower(tcfg, dtype=jnp.float32).apply(params, jnp.asarray(ids.astype(np.int32)))
    assert _cosine(ours, ref) >= 0.9999
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)


@pytest.mark.slow
def test_vision_parity_vit_b16_fullsize():
    """Full ViT-B/16 geometry (the production config) — random weights."""
    cfg = transformers.CLIPConfig()  # defaults = ViT-B/32 text+vision @ proj 512
    cfg.vision_config.patch_size = 16
    torch.manual_seed(1)
    model = transformers.CLIPModel(cfg).eval()
    sd = model.state_dict()
    vcfg = infer_vision_config(sd)
    assert vcfg.patch_size == 16 and vcfg.width == 768 and vcfg.layers == 12
    params = convert_clip_vision(sd, vcfg)
    rng = np.random.default_rng(2)
    tiles = rng.integers(0, 256, size=(2, 224, 224, 3), dtype=np.uint8)
    pixels = np.asarray(preprocess_tiles(jnp.asarray(tiles), CLIP_MEAN, CLIP_STD))
    with torch.no_grad():
        ref = model.get_image_features(
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        ).numpy()
    ours = VisionTower(vcfg, dtype=jnp.float32).apply(params, jnp.asarray(pixels))
    assert _cosine(ours, ref) >= 0.999
    rel = np.abs(np.asarray(ours) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 5e-3


def test_openai_naming_scheme():
    """Converter accepts OpenAI-original checkpoint naming (fused in_proj)."""
    vcfg = VisionConfig(image_size=32, patch_size=16, width=32, layers=1, heads=2, out_dim=16)
    rng = np.random.default_rng(3)
    d = 32

    def r(*shape):
        return rng.normal(0, 0.02, size=shape).astype(np.float32)

    sd = {
        "visual.conv1.weight": r(d, 3, 16, 16),
        "visual.class_embedding": r(d),
        "visual.positional_embedding": r(5, d),
        "visual.ln_pre.weight": np.ones(d, np.float32),
        "visual.ln_pre.bias": np.zeros(d, np.float32),
        "visual.transformer.resblocks.0.ln_1.weight": np.ones(d, np.float32),
        "visual.transformer.resblocks.0.ln_1.bias": np.zeros(d, np.float32),
        "visual.transformer.resblocks.0.attn.in_proj_weight": r(3 * d, d),
        "visual.transformer.resblocks.0.attn.in_proj_bias": r(3 * d),
        "visual.transformer.resblocks.0.attn.out_proj.weight": r(d, d),
        "visual.transformer.resblocks.0.attn.out_proj.bias": r(d),
        "visual.transformer.resblocks.0.ln_2.weight": np.ones(d, np.float32),
        "visual.transformer.resblocks.0.ln_2.bias": np.zeros(d, np.float32),
        "visual.transformer.resblocks.0.mlp.c_fc.weight": r(4 * d, d),
        "visual.transformer.resblocks.0.mlp.c_fc.bias": r(4 * d),
        "visual.transformer.resblocks.0.mlp.c_proj.weight": r(d, 4 * d),
        "visual.transformer.resblocks.0.mlp.c_proj.bias": r(d),
        "visual.ln_post.weight": np.ones(d, np.float32),
        "visual.ln_post.bias": np.zeros(d, np.float32),
        "visual.proj": r(d, 16),
    }
    params = convert_clip_vision(sd, vcfg)
    out = VisionTower(vcfg, dtype=jnp.float32).apply(
        params, jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    )
    assert out.shape == (2, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_bf16_close_to_f32(small_clip):
    model, _ = small_clip
    sd = model.state_dict()
    vcfg = VisionConfig(image_size=32, patch_size=16, width=64, layers=2, heads=2, out_dim=24)
    params = convert_clip_vision(sd, vcfg)
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    f32 = VisionTower(vcfg, dtype=jnp.float32).apply(params, imgs)
    bf16 = VisionTower(vcfg, dtype=jnp.bfloat16).apply(params, imgs).astype(jnp.float32)
    assert _cosine(np.asarray(f32), np.asarray(bf16)) >= 0.995


def test_virchow2_style_config():
    """Register tokens + cls+mean pooling + plain GELU (the Virchow2 path,
    MODEL_TYPE='Virchow2') — small geometry."""
    vcfg = VisionConfig(
        image_size=28, patch_size=14, width=32, layers=2, heads=2, out_dim=None,
        num_registers=4, use_quick_gelu=False, pool="cls+mean",
    )
    import jax

    tower = VisionTower(vcfg, dtype=jnp.float32)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 28, 28, 3)).astype(np.float32))
    params = tower.init(jax.random.PRNGKey(0), x)
    out = tower.apply(params, x)
    assert out.shape == (2, 64)  # concat(cls, patch-mean) = 2 * width
    assert "register_tokens" in params["params"]
    assert params["params"]["pos_embed"].shape == (1 + 4 + 4, 32)
    assert np.isfinite(np.asarray(out)).all()

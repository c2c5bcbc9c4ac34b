"""Tokenizer behavior + embed/annotate pipeline stages end-to-end on the
synthetic slide (small random-weight encoder — semantic plumbing, not
pretrained quality)."""

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from path_gene_multimodal_tpu.config import default_config
from path_gene_multimodal_tpu.core.artifacts import read_features_h5
from path_gene_multimodal_tpu.models.clip import (
    ImageEncoder,
    TextConfig,
    TextEncoder,
    VisionConfig,
)
from path_gene_multimodal_tpu.models.tokenizer import (
    CONTEXT_LENGTH,
    EOT_TOKEN,
    SOT_TOKEN,
    FallbackTokenizer,
    open_tokenizer,
)
from path_gene_multimodal_tpu.pipeline.embed import (
    run_annotation,
    run_create_class_embeddings,
    run_extract_features,
)
from path_gene_multimodal_tpu.pipeline.tessellate import run_tessellation

SMALL_V = VisionConfig(image_size=224, patch_size=32, width=64, layers=2, heads=2, out_dim=32)
SMALL_T = TextConfig(vocab_size=49408, context_length=77, width=32, layers=2, heads=2, out_dim=32)


def test_fallback_tokenizer_shapes():
    tok = FallbackTokenizer()
    ids = tok(["hello world", "a longer prompt about tumor epithelium"])
    assert ids.shape == (2, CONTEXT_LENGTH)
    assert (ids[:, 0] == SOT_TOKEN).all()
    assert EOT_TOKEN in ids[0]
    assert ids.dtype == np.int32
    # deterministic
    np.testing.assert_array_equal(ids, tok(["hello world", "a longer prompt about tumor epithelium"]))
    assert not tok.is_clip_compatible


def test_fallback_tokenizer_distinguishes():
    tok = FallbackTokenizer()
    a = tok(["tumor"])
    b = tok(["stroma"])
    assert not np.array_equal(a, b)


def test_open_tokenizer_fallback(monkeypatch, tmp_path):
    # neutralize any ambient vocab discovery sources
    monkeypatch.delenv("PGM_CLIP_BPE", raising=False)
    monkeypatch.delenv("PGM_CLIP_VOCAB_DIR", raising=False)
    monkeypatch.setenv("HF_HOME", str(tmp_path / "no_hub"))
    tok = open_tokenizer()
    assert isinstance(tok, FallbackTokenizer)


def test_open_tokenizer_discovers_vocab_dir(monkeypatch, tmp_path):
    """PGM_CLIP_VOCAB_DIR with HF-format files → real CLIPTokenizer."""
    import json

    from path_gene_multimodal_tpu.models.tokenizer import (
        CLIPTokenizer,
        bytes_to_unicode,
    )

    be = bytes_to_unicode()
    vocab = {}
    for t in be.values():
        vocab[t] = len(vocab)
    for t in be.values():
        vocab[t + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version\nt u\n")
    monkeypatch.delenv("PGM_CLIP_BPE", raising=False)
    monkeypatch.setenv("PGM_CLIP_VOCAB_DIR", str(tmp_path))
    tok = open_tokenizer()
    assert isinstance(tok, CLIPTokenizer)
    assert tok.encode("a")  # functional


def test_clip_bpe_with_synthetic_vocab(tmp_path):
    """Exercise the real BPE machinery with a handcrafted HF-format vocab."""
    import json

    # byte-level alphabet plus a few merges
    from path_gene_multimodal_tpu.models.tokenizer import CLIPTokenizer, bytes_to_unicode

    be = bytes_to_unicode()
    alphabet = list(be.values())
    vocab = {}
    for t in alphabet:
        vocab[t] = len(vocab)
    for t in alphabet:
        vocab[t + "</w>"] = len(vocab)
    merges = [("t", "u"), ("tu", "m"), ("tum", "or</w>"), ("o", "r</w>")]
    for m in merges:
        tok = "".join(m)
        if tok not in vocab:
            vocab[tok] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text(
        "#version\n" + "\n".join(" ".join(m) for m in merges)
    )
    tok = CLIPTokenizer(vocab_json=tmp_path / "vocab.json", merges_txt=tmp_path / "merges.txt")
    ids = tok.encode("tumor")
    # "tumor" → t u m o r</w> with merges: (t,u)->tu, (tu,m)->tum, (o,r</w>)->or</w>, (tum,or</w>)->tumor... wait merge 3 is (tum, or</w>)
    assert ids == [vocab["tumor</w>"]]
    # unknown-ish word splits into pieces but never KeyErrors
    ids2 = tok.encode("rot")
    assert all(isinstance(i, int) for i in ids2)


@pytest.fixture(scope="module")
def pipeline_run(tmp_path_factory):
    from path_gene_multimodal_tpu.io.slide import synthetic_wsi

    out = tmp_path_factory.mktemp("pipe")
    slide = synthetic_wsi(1792, 1344, seed=5, n_blobs=3, nuclei_per_blob=40)
    cfg = default_config()
    cfg = cfg.replace(embedding=cfg.embedding.__class__(batch_size=16))
    tess = run_tessellation(slide, out, cfg, stem="synth")
    enc = ImageEncoder(SMALL_V, dtype=jnp.float32, seed=0)
    feats = run_extract_features(slide, tess.coords, enc, out, "synth", cfg)
    txt = TextEncoder(SMALL_T, seed=1)
    tok = FallbackTokenizer()
    class_embs = run_create_class_embeddings(list(cfg.classes), txt, tok, out, "synth")
    ann = run_annotation(feats, class_embs, list(cfg.classes), out, "synth")
    return {"out": out, "cfg": cfg, "tess": tess, "feats": feats,
            "class_embs": class_embs, "ann": ann}


def test_virchow_clamp_keys_on_encoder_not_model_type(tmp_path, monkeypatch):
    """A real Virchow2 tower loaded via --weights with cfg.model_type left at
    the default 'CLIP' must still get the measured ViT-H batch knee AND the
    correct model_type in the features artifact (clamp keys on the encoder's
    config, like runner.py's normalization choice)."""
    import path_gene_multimodal_tpu.pipeline.embed as embed_mod
    from path_gene_multimodal_tpu.io.slide import synthetic_wsi
    from path_gene_multimodal_tpu.models.vit_timm import TimmViTConfig

    tiny = TimmViTConfig(image_size=224, patch_size=32, width=32, layers=1,
                         heads=2, num_registers=1, mlp_hidden=64)
    enc = ImageEncoder(tiny, dtype=jnp.float32, seed=0)
    cfg = default_config()  # model_type stays "CLIP"
    assert not cfg.model_type.lower().startswith("virchow")
    cfg = cfg.replace(embedding=cfg.embedding.__class__(
        batch_size=512, virchow2_batch_size=4))

    captured = {}
    orig = embed_mod.iter_tile_batches

    def spy(slide, coords, tile, batch, **kw):
        captured["batch"] = batch
        return orig(slide, coords, tile, batch, **kw)

    monkeypatch.setattr(embed_mod, "iter_tile_batches", spy)
    slide = synthetic_wsi(896, 672, seed=6, n_blobs=2, nuclei_per_blob=10)
    coords = np.array([[0, 0], [224, 0], [0, 224]], np.int64)
    run_extract_features(slide, coords, enc, tmp_path, "v", cfg)
    assert captured["batch"] == 4  # clamped to the Virchow2 knee
    h5 = read_features_h5(tmp_path / "v_features.h5")
    assert h5["attrs"]["model_type"] == "Virchow2"  # actual tower recorded


def test_features_artifact(pipeline_run):
    r = pipeline_run
    assert r["feats"].shape == (r["tess"].num_tiles, 32)
    h5 = read_features_h5(r["out"] / "synth_features.h5")
    np.testing.assert_allclose(h5["features"], r["feats"], rtol=1e-6)
    assert (r["out"] / "synth_features.npy").exists()


def test_class_embeddings_artifact(pipeline_run):
    r = pipeline_run
    assert r["class_embs"].shape == (5, 32)
    loaded = np.load(r["out"] / "synth_classes.npy")
    np.testing.assert_allclose(loaded, r["class_embs"])
    # the reference's torch .pt sidecar (create_embedding.py:65-66)
    import torch

    pt = torch.load(r["out"] / "synth_classes.pt", weights_only=True)
    np.testing.assert_allclose(pt.numpy(), r["class_embs"])


def test_annotation_frame(pipeline_run):
    r = pipeline_run
    ann = r["ann"]
    cfg = r["cfg"]
    assert list(ann.columns[:1]) == ["tile_index"]
    for c in cfg.classes:
        assert c in ann.columns
    assert "predicted_class" in ann.columns
    # scores are cosines in [-1, 1]
    scores = ann[list(cfg.classes)].to_numpy()
    assert (scores <= 1.0 + 1e-5).all() and (scores >= -1.0 - 1e-5).all()
    # argmax consistency
    pred_idx = scores.argmax(axis=1)
    expect = [list(cfg.classes)[i] for i in pred_idx]
    assert (ann["predicted_class"] == expect).all()
    # csv artifact parses
    back = pd.read_csv(r["out"] / "synth_annotations.csv")
    assert len(back) == len(ann)


def test_annotation_empty_raises():
    with pytest.raises(ValueError, match="no tile features"):
        run_annotation(
            np.zeros((0, 32), np.float32), np.zeros((5, 32), np.float32),
            ["a", "b", "c", "d", "e"], "/tmp", "x", write_artifacts=False,
        )


def test_batch_invariance(pipeline_run):
    """Embedding a batch of identical tiles gives identical rows (no
    cross-tile leakage through batching)."""
    enc = ImageEncoder(SMALL_V, dtype=jnp.float32, seed=0)
    tile = np.random.default_rng(0).integers(0, 256, (224, 224, 3), dtype=np.uint8)
    batch = jnp.asarray(np.stack([tile] * 4))
    out = np.asarray(enc(batch))
    for i in range(1, 4):
        np.testing.assert_allclose(out[0], out[i], atol=1e-5)


def test_extract_features_planar_feed(tmp_path):
    """Planar (half-bandwidth 4:2:0) feed vs RGB feed over a real JPEG
    slide: embeddings agree to the chroma-upsampler tolerance (nearest vs
    fancy differ by ≤1 chroma level on device inputs — ops/jpegcolor.py)."""
    from dataclasses import replace

    import numpy as np

    from path_gene_multimodal_tpu.config import default_config
    from path_gene_multimodal_tpu.io.tiff import TiffTileSlide
    from path_gene_multimodal_tpu.io.tiff_write import write_tiled_tiff

    rng = np.random.default_rng(9)
    base = np.kron(
        rng.integers(40, 220, size=(10, 10, 3), dtype=np.uint8),
        np.ones((64, 64, 1), np.uint8),
    )
    p = write_tiled_tiff(tmp_path / "pf.svs", [base], tile_size=256,
                         compression=7)
    slide = TiffTileSlide(p, use_native=True)
    if slide._native is None or not slide.supports_planar(0):
        pytest.skip("native planar decoder unavailable")
    cfg = default_config()
    side = np.arange(0, 640 - 224, 224)
    coords = np.stack(np.meshgrid(side, side), -1).reshape(-1, 2).astype(np.int64)
    enc = ImageEncoder(SMALL_V, dtype=jnp.float32, seed=0)
    f_planar = run_extract_features(
        slide, coords, enc, tmp_path, "pf", cfg, write_artifacts=False
    )
    cfg_rgb = replace(cfg, embedding=replace(cfg.embedding, planar_feed=False))
    f_rgb = run_extract_features(
        slide, coords, enc, tmp_path, "pf", cfg_rgb, write_artifacts=False
    )
    assert f_planar.shape == f_rgb.shape
    cos = np.sum(f_planar * f_rgb, axis=1) / (
        np.linalg.norm(f_planar, axis=1) * np.linalg.norm(f_rgb, axis=1)
    )
    assert cos.min() > 0.999


def test_special_tokens_encode_as_single_ids(tmp_path):
    """A literal <|endoftext|> in the prompt must map to the single special
    id, not decompose into byte pieces (OpenAI seeds the BPE cache)."""
    import json as _json

    from path_gene_multimodal_tpu.models.tokenizer import CLIPTokenizer

    vocab = {}
    for ch in "<|endofstarx>te":
        vocab[ch] = len(vocab)
        vocab[ch + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = 400
    vocab["<|endoftext|>"] = 401
    (tmp_path / "vocab.json").write_text(_json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version\n")
    tok = CLIPTokenizer(vocab_json=tmp_path / "vocab.json",
                        merges_txt=tmp_path / "merges.txt")
    assert tok.encode("<|endoftext|>") == [401]
    assert tok.encode("<|startoftext|>") == [400]


def test_open_tokenizer_half_pair_raises(tmp_path):
    from path_gene_multimodal_tpu.models.tokenizer import open_tokenizer

    with pytest.raises(ValueError, match="together"):
        open_tokenizer(vocab_json=tmp_path / "vocab.json")

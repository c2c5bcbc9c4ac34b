"""Checkpoint persistence round-trips + torch ingestion end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from path_gene_multimodal_tpu.core.checkpoints import (
    load_clip_from_torch,
    load_params,
    load_resnet_from_torch,
    save_params,
)


def _tree_equal(a, b):
    jax.tree.map(lambda x, y: np.testing.assert_allclose(np.asarray(x), np.asarray(y)), a, b)


def test_save_load_roundtrip(tmp_path, rng):
    params = {
        "layer1": {"kernel": rng.normal(size=(4, 8)).astype(np.float32), "bias": np.zeros(8, np.float32)},
        "head": {"w": rng.normal(size=(8, 2)).astype(np.float32)},
    }
    path = save_params(params, tmp_path / "ckpt")
    restored = load_params(path, like=params)
    _tree_equal(params, restored)


def test_npz_fallback_roundtrip(tmp_path, rng):
    from path_gene_multimodal_tpu.core import checkpoints as ck

    params = {"a": {"b": rng.normal(size=(3, 3)).astype(np.float32)}}
    # force the npz path
    flat_path = tmp_path / "fallback.npz"
    import jax as _jax

    flat = {}
    for kp, leaf in _jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        flat[key] = np.asarray(leaf)
    np.savez_compressed(flat_path, **flat)
    restored = load_params(flat_path, like=params)
    _tree_equal(params, restored)
    # structure-free load
    loose = load_params(flat_path)
    assert "a" in loose and "b" in loose["a"]


def test_torch_clip_ingestion_end_to_end(tmp_path):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    # head counts are not recoverable from a state_dict; inference assumes
    # the CLIP convention head_dim=64, so the fixture follows it
    cfg = transformers.CLIPConfig(
        text_config=dict(vocab_size=49408, hidden_size=64, intermediate_size=128,
                         num_hidden_layers=2, num_attention_heads=1,
                         max_position_embeddings=77, projection_dim=24),
        vision_config=dict(hidden_size=128, intermediate_size=256, num_hidden_layers=2,
                           num_attention_heads=2, image_size=32, patch_size=16,
                           projection_dim=24),
        projection_dim=24,
    )
    torch.manual_seed(0)
    model = transformers.CLIPModel(cfg).eval()
    ckpt = tmp_path / "clip.pt"
    torch.save(model.state_dict(), ckpt)

    vcfg, vparams, tcfg, tparams = load_clip_from_torch(ckpt)
    assert vcfg.width == 128 and vcfg.patch_size == 16 and vcfg.out_dim == 24
    assert tparams is not None
    from path_gene_multimodal_tpu.models.clip import VisionTower

    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    ours = VisionTower(vcfg, dtype=jnp.float32).apply(vparams, jnp.asarray(imgs))
    with torch.no_grad():
        ref = model.get_image_features(
            pixel_values=torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        ).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)


def test_torch_resnet_ingestion(tmp_path):
    torch = pytest.importorskip("torch")
    from tests.test_molecular import _torch_resnet34

    torch.manual_seed(1)
    tmodel = _torch_resnet34(torch).eval()
    ckpt = tmp_path / "idars.pt"
    torch.save({"state_dict": tmodel.state_dict()}, ckpt)  # nested like TIAToolbox
    variables = load_resnet_from_torch(ckpt)
    from path_gene_multimodal_tpu.models.resnet import ResNet

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 224, 224, 3)).astype(np.float32)
    ours = np.asarray(ResNet(dtype=jnp.float32).apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


def test_save_load_converted_roundtrip(tmp_path, rng):
    """save_converted/load_converted: params tree AND architecture config
    survive the torch-free artifact round-trip for every kind."""
    from path_gene_multimodal_tpu.core.checkpoints import load_converted, save_converted
    from path_gene_multimodal_tpu.models.clip import VisionConfig
    from path_gene_multimodal_tpu.models.convnext import ConvNeXtConfig
    from path_gene_multimodal_tpu.models.hovernext import HoverNeXtConfig
    from path_gene_multimodal_tpu.models.hovernext_real import RealHoverNeXtConfig

    params = {"enc": {"k": rng.normal(size=(3, 4)).astype(np.float32)},
              "head": {"b": np.arange(5, dtype=np.float32)}}
    cases = [
        ("clip", VisionConfig(width=64, layers=2, heads=2, out_dim=32)),
        ("convnext", ConvNeXtConfig(depths=(1, 1), dims=(8, 16))),
        ("hovernext", HoverNeXtConfig(
            encoder=ConvNeXtConfig(depths=(1, 1), dims=(8, 16)),
            decoder_dims=(16, 8), num_types=5, input_size=64)),
        ("hovernext", RealHoverNeXtConfig(
            encoder=ConvNeXtConfig(depths=(1, 1), dims=(8, 16)),
            decoder_channels=(16, 8),
            branches=(("decoder_inst", "head_inst", 5), ("decoder_ct", "head_ct", 6)),
            head_upsampling=2, input_size=64)),
        ("resnet34", None),
    ]
    for i, (kind, cfg) in enumerate(cases):
        p = save_converted(kind, cfg, params, tmp_path / f"art{i}")
        kind2, cfg2, params2 = load_converted(p)
        assert kind2 == kind
        assert cfg2 == cfg  # dataclass equality incl. nested tuples
        _tree_equal(params, params2)


def test_text_sidecar_path_dotted_stem():
    from pathlib import Path

    from path_gene_multimodal_tpu.core.checkpoints import text_sidecar_path

    assert text_sidecar_path("d/clip_converted.npz") == Path("d/clip_converted_text.npz")
    assert text_sidecar_path("d/clip.v2.npz") == Path("d/clip.v2_text.npz")
    assert text_sidecar_path("d/clip.v2") == Path("d/clip.v2_text.npz")


def test_save_converted_dotted_stem(tmp_path, rng):
    """Dotted artifact stems (TCGA-style names) must keep the full stem —
    '.npz' is appended, not substituted for everything past the first dot."""
    from path_gene_multimodal_tpu.core.checkpoints import load_converted, save_converted

    params = {"w": rng.normal(size=(2, 2)).astype(np.float32)}
    p = save_converted("resnet34", None, params, tmp_path / "resnet34.task1.v2")
    assert p.name == "resnet34.task1.v2.npz"
    kind, cfg, restored = load_converted(p)
    assert kind == "resnet34"
    _tree_equal(params, restored)


def test_flat_key_slash_rejected(tmp_path, rng):
    """A param name containing '/' would corrupt the flat-npz round-trip;
    it must be rejected loudly, not silently mis-nested on reload."""
    from path_gene_multimodal_tpu.core.checkpoints import save_converted

    params = {"a/b": rng.normal(size=(2,)).astype(np.float32)}
    with pytest.raises(ValueError, match="contains '/'"):
        save_converted("resnet34", None, params, tmp_path / "bad")


def test_load_converted_rejects_plain_npz(tmp_path, rng):
    from path_gene_multimodal_tpu.core.checkpoints import load_converted

    np.savez_compressed(tmp_path / "plain.npz", a=np.zeros(3))
    with pytest.raises(ValueError, match="__meta__"):
        load_converted(tmp_path / "plain.npz")


def test_convert_weights_cli_clip(tmp_path):
    """cli.convert_weights end-to-end on a small torch CLIP checkpoint:
    writes the vision artifact + the _text sidecar, both reloadable."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("transformers")
    import sys
    sys.path.insert(0, str((__import__("pathlib").Path(__file__).parent)))
    from test_clip_parity import _small_clip

    from path_gene_multimodal_tpu.cli.convert_weights import main as cw_main
    from path_gene_multimodal_tpu.core.checkpoints import load_converted
    from path_gene_multimodal_tpu.models.clip import TextConfig, VisionConfig

    model, _ = _small_clip()
    src = tmp_path / "clip.pt"
    torch.save(model.state_dict(), src)
    out = tmp_path / "clip_converted.npz"
    rc = cw_main(["clip", str(src), str(out), "--allow-pickle"])
    assert rc == 0
    kind, vcfg, vparams = load_converted(out)
    assert kind == "clip" and isinstance(vcfg, VisionConfig)
    tfile = tmp_path / "clip_converted_text.npz"
    assert tfile.exists()
    tkind, tcfg, tparams = load_converted(tfile)
    assert tkind == "clip_text" and isinstance(tcfg, TextConfig)
    # the reloaded tower must produce the SAME features as the direct
    # torch→flax conversion path (test_clip_parity covers torch parity)
    from path_gene_multimodal_tpu.models.clip import ImageEncoder

    enc = ImageEncoder(vcfg, params=vparams, dtype=jnp.float32)
    tiles = (np.random.default_rng(3).random((2, vcfg.image_size, vcfg.image_size, 3))
             * 255).astype(np.uint8)
    feats = np.asarray(enc(tiles))
    assert feats.shape == (2, enc.out_dim) and np.isfinite(feats).all()


def test_file_fingerprint(tmp_path):
    from path_gene_multimodal_tpu.core.checkpoints import file_fingerprint

    a = tmp_path / "a.npz"
    a.write_bytes(b"x" * 4096)
    f1 = file_fingerprint(a)
    assert f1 == file_fingerprint(a)  # deterministic
    a.write_bytes(b"x" * 4095 + b"y")  # same size, different content
    assert file_fingerprint(a) != f1

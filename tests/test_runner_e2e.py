"""End-to-end 8-step pipeline on the synthetic slide (small random-weight
models) — artifact parity with the reference's run_one_wsi outputs."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from path_gene_multimodal_tpu.config import default_config
from path_gene_multimodal_tpu.io.slide import synthetic_wsi
from path_gene_multimodal_tpu.models.clip import TextConfig, VisionConfig
from path_gene_multimodal_tpu.models.tokenizer import FallbackTokenizer
from path_gene_multimodal_tpu.pipeline.runner import PipelineModels, RunResult, run_one_wsi

SMALL_V = VisionConfig(image_size=224, patch_size=32, width=64, layers=2, heads=2, out_dim=32)
SMALL_T = TextConfig(vocab_size=49408, context_length=77, width=32, layers=2, heads=2, out_dim=32)


@pytest.fixture(scope="module")
def e2e(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    slide = synthetic_wsi(2240, 2016, seed=13, n_blobs=4, nuclei_per_blob=60)
    slide_path = root / "case01.npz"
    slide.save(slide_path)
    cfg = default_config()
    cfg = cfg.replace(
        embedding=cfg.embedding.__class__(batch_size=16),
        # small synthetic slide: don't area-filter every polygon away
        polygon=cfg.polygon.__class__(min_polygon_area_px=0, area_min_tiles=0),
        # random-weight encoder → arbitrary class predictions; let any class
        # seed the TME ROI so the run doesn't depend on luck
        tme_classes=cfg.classes,
    )
    models = PipelineModels.build(cfg, vision_cfg=SMALL_V, text_cfg=SMALL_T,
                                  tokenizer=FallbackTokenizer())
    result = run_one_wsi(slide_path, root / "out", cfg, models=models)
    return root, cfg, result


def test_run_completes(e2e):
    root, cfg, result = e2e
    assert result.status == "done", result.error
    assert result.num_tiles > 0
    assert result.num_features == result.num_tiles


def test_all_artifacts_exist(e2e):
    root, cfg, result = e2e
    out = result.out_dir
    stem = "case01"
    for name in [
        f"{stem}.h5",
        f"{stem}_features.h5",
        f"{stem}_classes.npy",
        f"{stem}_annotations.csv",
        f"{stem}_annotations_with_coords.csv",
        f"{stem}.geojson",
        f"{stem}_all_classes_overlay.png",  # reference name, :497
        "mask.png",
        "thumbnail.png",
    ]:
        assert (out / name).exists(), name


def test_done_flag_schema(e2e):
    root, cfg, result = e2e
    flag = result.out_dir / "case01._DONE.json"
    assert flag.exists()
    payload = json.loads(flag.read_text())
    for key in [
        "wsi_path", "out_dir", "csv_path", "geojson_path", "overlay_all_path",
        "per_class_outputs", "num_features", "num_tiles", "classes_processed",
        "patch_size", "model_type", "status", "id", "wsi_stem", "timestamp",
    ]:
        assert key in payload, key
    assert payload["status"] == "done"
    assert payload["patch_size"] == 224


def test_rerun_skips(e2e):
    root, cfg, result = e2e
    again = run_one_wsi(root / "case01.npz", root / "out", cfg)
    assert again.status == "already_done"


def test_error_path_writes_error_file(tmp_path):
    cfg = default_config()
    blank_path = tmp_path / "blank.npz"
    from path_gene_multimodal_tpu.io.slide import ArraySlide

    ArraySlide(np.full((600, 600, 3), 250, np.uint8)).save(blank_path)
    models = PipelineModels.build(cfg, vision_cfg=SMALL_V, text_cfg=SMALL_T,
                                  tokenizer=FallbackTokenizer())
    result = run_one_wsi(blank_path, tmp_path / "out", cfg, models=models)
    assert result.status == "error"
    assert "no foreground tiles" in result.error
    err = tmp_path / "out" / "blank" / "blank_ERROR.txt"
    assert err.exists()
    assert "no foreground tiles" in err.read_text()
    # lock released
    assert not (tmp_path / "out" / "blank" / ".processing.blank.lock").exists()


def test_cli_entry(tmp_path, monkeypatch):
    from path_gene_multimodal_tpu.cli import main as cli

    slide = synthetic_wsi(1344, 1120, seed=3, n_blobs=3, nuclei_per_blob=30)
    p = tmp_path / "s1.npz"
    slide.save(p)
    # random-weight predictions → let any class seed the TME ROI
    base = default_config()
    monkeypatch.setattr(
        cli, "default_config",
        lambda **kw: base.replace(
            tme_classes=base.classes,
            polygon=base.polygon.__class__(min_polygon_area_px=0, area_min_tiles=0),
        ),
    )
    # small models: monkeypatch the builder so CLI stays fast
    orig_build = PipelineModels.build.__func__
    monkeypatch.setattr(
        cli.PipelineModels,
        "build",
        classmethod(lambda klass, cfg, **kw: orig_build(
            PipelineModels, cfg, vision_cfg=SMALL_V, text_cfg=SMALL_T,
            tokenizer=FallbackTokenizer(), mesh=kw.get("mesh"))),
    )
    rc = cli.main(["--wsi", str(p), "--outroot", str(tmp_path / "out")])
    assert rc == 0
    assert (tmp_path / "out" / "s1" / "s1.geojson").exists()
    # --dp: embed tower sharded over the 8-device test mesh via the CLI flag
    rc = cli.main(["--wsi", str(p), "--outroot", str(tmp_path / "out_dp"),
                   "--dp", "--no-locks"])
    assert rc == 0
    assert (tmp_path / "out_dp" / "s1" / "s1.geojson").exists()
    # missing slide → exit 2
    assert cli.main(["--wsi", str(tmp_path / "nope.svs")]) == 2


def test_batch_run_cli(tmp_path, monkeypatch):
    from path_gene_multimodal_tpu.cli import batch_run

    data = tmp_path / "data"
    data.mkdir()
    for i, seed in enumerate((31, 32)):
        synthetic_wsi(1344, 1120, seed=seed, n_blobs=3, nuclei_per_blob=20).save(
            data / f"b{i}.npz"
        )
    base = default_config()
    monkeypatch.setattr(
        batch_run, "default_config",
        lambda **kw: base.replace(
            tme_classes=base.classes,
            polygon=base.polygon.__class__(min_polygon_area_px=0, area_min_tiles=0),
        ),
    )
    import path_gene_multimodal_tpu.pipeline.runner as runner_mod

    orig_build = PipelineModels.build.__func__
    monkeypatch.setattr(
        runner_mod.PipelineModels, "build",
        classmethod(lambda klass, cfg, **kw: orig_build(
            PipelineModels, cfg, vision_cfg=SMALL_V, text_cfg=SMALL_T,
            tokenizer=FallbackTokenizer())),
    )
    # .npz isn't a WSI_EXT; use a slide list file
    lst = tmp_path / "list.txt"
    lst.write_text(f"{data/'b0.npz'}\n{data/'b1.npz'}\n")
    rc = batch_run.main(["--slide-list", str(lst), "--outroot", str(tmp_path / "out")])
    assert rc == 0
    assert (tmp_path / "out" / "b0" / "b0.geojson").exists()
    assert (tmp_path / "out" / "b1" / "b1.geojson").exists()
    assert len((tmp_path / "out" / "success_slides.txt").read_text().split()) == 2
    # second run: everything already done
    rc2 = batch_run.main(["--slide-list", str(lst), "--outroot", str(tmp_path / "out")])
    assert rc2 == 0
    # --dp run on the 8-device test mesh (fresh outroot; builder forwards mesh)
    monkeypatch.setattr(
        runner_mod.PipelineModels, "build",
        classmethod(lambda klass, cfg, **kw: orig_build(
            PipelineModels, cfg, vision_cfg=SMALL_V, text_cfg=SMALL_T,
            tokenizer=FallbackTokenizer(), mesh=kw.get("mesh"))),
    )
    rc3 = batch_run.main(["--slide-list", str(lst), "--dp",
                          "--outroot", str(tmp_path / "out_dp")])
    assert rc3 == 0
    assert (tmp_path / "out_dp" / "b0" / "b0.geojson").exists()

"""Step-granular resume + fault injection (SURVEY.md §5: the reference has
slide-level resume only and no fault injection — both are built here)."""

import numpy as np
import pytest

import jax.numpy as jnp

from path_gene_multimodal_tpu.config import default_config
from path_gene_multimodal_tpu.io.slide import synthetic_wsi
from path_gene_multimodal_tpu.models.clip import TextConfig, VisionConfig
from path_gene_multimodal_tpu.models.tokenizer import FallbackTokenizer
from path_gene_multimodal_tpu.pipeline import runner as runner_mod
from path_gene_multimodal_tpu.pipeline.runner import PipelineModels, run_one_wsi

SMALL_V = VisionConfig(image_size=224, patch_size=32, width=64, layers=2, heads=2, out_dim=32)
SMALL_T = TextConfig(vocab_size=49408, context_length=77, width=32, layers=2, heads=2, out_dim=32)


@pytest.fixture
def env(tmp_path):
    slide = synthetic_wsi(1792, 1344, seed=21, n_blobs=3, nuclei_per_blob=30)
    slide_path = tmp_path / "caseR.npz"
    slide.save(slide_path)
    cfg = default_config().replace(
        tme_classes=default_config().classes,
        embedding=default_config().embedding.__class__(batch_size=16),
        polygon=default_config().polygon.__class__(min_polygon_area_px=0, area_min_tiles=0),
    )
    models = PipelineModels.build(cfg, vision_cfg=SMALL_V, text_cfg=SMALL_T,
                                  tokenizer=FallbackTokenizer())
    return tmp_path, slide_path, cfg, models


def test_crash_mid_pipeline_then_resume(env, monkeypatch):
    """Inject a fault at step 5; verify the error artifact, then re-run and
    verify steps 1-2 are skipped via the manifest (stages not recomputed)."""
    tmp_path, slide_path, cfg, models = env

    real_spatial = runner_mod.spatial_stage.run_spatial_join
    calls = {"tessellation": 0, "features": 0}

    real_tess = runner_mod.tess_stage.run_tessellation
    real_feats = runner_mod.embed_stage.run_extract_features

    def counting_tess(*a, **kw):
        calls["tessellation"] += 1
        return real_tess(*a, **kw)

    def counting_feats(*a, **kw):
        calls["features"] += 1
        return real_feats(*a, **kw)

    monkeypatch.setattr(runner_mod.tess_stage, "run_tessellation", counting_tess)
    monkeypatch.setattr(runner_mod.embed_stage, "run_extract_features", counting_feats)

    def boom(*a, **kw):
        raise RuntimeError("injected fault at spatial join")

    monkeypatch.setattr(runner_mod.spatial_stage, "run_spatial_join", boom)
    r1 = run_one_wsi(slide_path, tmp_path / "out", cfg, models=models)
    assert r1.status == "error"
    assert "injected fault" in r1.error
    err = tmp_path / "out" / "caseR" / "caseR_ERROR.txt"
    assert err.exists() and "injected fault" in err.read_text()
    # lock released despite the crash
    assert not (tmp_path / "out" / "caseR" / ".processing.caseR.lock").exists()
    assert calls == {"tessellation": 1, "features": 1}

    # heal the fault; rerun → steps 1-2 resumed from manifest, run completes
    monkeypatch.setattr(runner_mod.spatial_stage, "run_spatial_join", real_spatial)
    r2 = run_one_wsi(slide_path, tmp_path / "out", cfg, models=models)
    assert r2.status == "done", r2.error
    assert calls == {"tessellation": 1, "features": 1}  # NOT recomputed
    assert r2.num_tiles > 0


def test_config_change_invalidates_resume(env, monkeypatch):
    tmp_path, slide_path, cfg, models = env

    def boom(*a, **kw):
        raise RuntimeError("fault")

    monkeypatch.setattr(runner_mod.spatial_stage, "run_spatial_join", boom)
    run_one_wsi(slide_path, tmp_path / "out", cfg, models=models)
    monkeypatch.undo()

    calls = {"tessellation": 0}
    real_tess = runner_mod.tess_stage.run_tessellation

    def counting_tess(*a, **kw):
        calls["tessellation"] += 1
        return real_tess(*a, **kw)

    monkeypatch.setattr(runner_mod.tess_stage, "run_tessellation", counting_tess)
    # different tessellation config → manifest hash mismatch → recompute
    cfg2 = cfg.replace(
        tessellation=cfg.tessellation.__class__(min_foreground_frac=0.25)
    )
    r = run_one_wsi(slide_path, tmp_path / "out", cfg2, models=models)
    assert r.status == "done", r.error
    assert calls["tessellation"] == 1


def test_deleted_artifact_invalidates_resume(env, monkeypatch):
    tmp_path, slide_path, cfg, models = env

    def boom(*a, **kw):
        raise RuntimeError("fault")

    monkeypatch.setattr(runner_mod.spatial_stage, "run_spatial_join", boom)
    run_one_wsi(slide_path, tmp_path / "out", cfg, models=models)
    monkeypatch.undo()
    (tmp_path / "out" / "caseR" / "caseR.h5").unlink()  # artifact vanished
    r = run_one_wsi(slide_path, tmp_path / "out", cfg, models=models)
    assert r.status == "done", r.error
    # h5 regenerated
    assert (tmp_path / "out" / "caseR" / "caseR.h5").exists()


def test_weights_change_invalidates_feature_resume(env, monkeypatch):
    """Features computed with one set of weights must NOT be reused when the
    next run carries different weights — the models fingerprint rides in
    the manifest hash (cfg.content_hash alone cannot see the params)."""
    import dataclasses

    tmp_path, slide_path, cfg, models = env

    def boom(*a, **kw):
        raise RuntimeError("fault")

    monkeypatch.setattr(runner_mod.spatial_stage, "run_spatial_join", boom)
    run_one_wsi(slide_path, tmp_path / "out", cfg, models=models)
    monkeypatch.undo()

    calls = {"features": 0}
    real_feats = runner_mod.embed_stage.run_extract_features

    def counting_feats(*a, **kw):
        calls["features"] += 1
        return real_feats(*a, **kw)

    monkeypatch.setattr(runner_mod.embed_stage, "run_extract_features", counting_feats)
    models2 = dataclasses.replace(models, fingerprint="converted-abc123")
    r = run_one_wsi(slide_path, tmp_path / "out", cfg, models=models2)
    assert r.status == "done", r.error
    assert calls["features"] == 1  # recomputed, not resumed


def test_glob_metachar_stem_done_fallback(tmp_path, env):
    """A stem containing glob metacharacters ('case[1]') must still be
    recognized as done via the artifact-glob fallback."""
    _, slide_path, cfg, models = env
    import shutil

    weird = tmp_path / "case[1].npz"
    shutil.copy(slide_path, weird)
    out = tmp_path / "out2" / "case[1]"
    out.mkdir(parents=True)
    # pre-existing artifacts under the LEGACY overlay name, no done flag —
    # slides finished by pre-round-3 builds must still skip
    (out / "case[1]_overlay_all.png").write_bytes(b"png")
    (out / "case[1].geojson").write_text("{}")
    r = run_one_wsi(weird, tmp_path / "out2", cfg, models=models)
    assert r.status == "already_done"

"""Tessellation stage: artifacts, coord ordering, foreground selection."""

import numpy as np

from path_gene_multimodal_tpu.config import default_config
from path_gene_multimodal_tpu.core.artifacts import read_tessellation_h5
from path_gene_multimodal_tpu.pipeline.tessellate import iter_tile_batches, run_tessellation


def test_tessellation_artifacts(tmp_path, small_slide):
    cfg = default_config()
    res = run_tessellation(small_slide, tmp_path, cfg, stem="synth")
    assert res.num_tiles > 0
    assert (tmp_path / "synth.h5").exists()
    assert (tmp_path / "mask.png").exists()
    assert (tmp_path / "grid_mask.png").exists()
    assert (tmp_path / "thumbnail.png").exists()
    out = read_tessellation_h5(res.h5_path)
    np.testing.assert_array_equal(out["coords"], res.coords)
    assert out["attrs"]["slide_width"] == 2048


def test_coords_are_grid_aligned_row_major(tmp_path, small_slide):
    cfg = default_config()
    res = run_tessellation(small_slide, tmp_path, cfg, stem="synth", write_artifacts=False)
    c = res.coords
    assert (c % 224 == 0).all()
    # row-major: y non-decreasing
    assert (np.diff(c[:, 1]) >= 0).all()
    # within slide bounds
    assert c[:, 0].max() + 224 <= 2048
    assert c[:, 1].max() + 224 <= 1536


def test_foreground_only(tmp_path, small_slide):
    cfg = default_config()
    res = run_tessellation(small_slide, tmp_path, cfg, stem="synth", write_artifacts=False)
    # every kept tile must actually contain tissue (non-background pixels)
    for x, y in res.coords[:: max(1, len(res.coords) // 10)]:
        tile = small_slide.read_region((int(x), int(y)), 0, (224, 224))
        sat = tile.astype(int)
        # tissue is pink/purple: R differs from G substantially somewhere
        assert np.abs(sat[..., 0] - sat[..., 1]).max() > 20


def test_iter_tile_batches(small_slide, tmp_path):
    cfg = default_config()
    res = run_tessellation(small_slide, tmp_path, cfg, stem="synth", write_artifacts=False)
    batches = list(iter_tile_batches(small_slide, res.coords, 224, batch_size=8))
    n_valid = sum(int(v.sum()) for _, v in batches)
    assert n_valid == res.num_tiles
    for tiles, valid in batches:
        assert tiles.shape == (8, 224, 224, 3)
        assert tiles.dtype == np.uint8


def test_patch_png_writing(tmp_path, small_slide):
    cfg = default_config()
    cfg = cfg.replace(tessellation=cfg.tessellation.__class__(write_patch_pngs=True))
    res = run_tessellation(small_slide, tmp_path, cfg, stem="synth")
    pngs = list((tmp_path / "patches").glob("*.png"))
    assert len(pngs) == res.num_tiles
    # naming contract {x}_{y}.png
    x, y = res.coords[0]
    assert (tmp_path / "patches" / f"{x}_{y}.png").exists()


def test_huge_slide_grid_exceeds_canonical_thumbnail(tmp_path):
    """A slide whose tile grid is larger than the canonical thumbnail
    (ny or nx > thumbnail_size) must tile, not crash in the edge-array pad
    (np.pad with a negative width). Simulated with a small thumbnail_size
    so the grid/thumb ratio matches a >229k-px slide at the default 1024."""
    import dataclasses

    from path_gene_multimodal_tpu.io.slide import synthetic_wsi

    slide = synthetic_wsi(16384, 512, seed=7, n_blobs=6, nuclei_per_blob=20)
    cfg = default_config()
    cfg = cfg.replace(
        tessellation=dataclasses.replace(cfg.tessellation, thumbnail_size=64)
    )
    # nx = floor(64 / (224 * 64 / 16384)) = 73 > 64: the overflow case
    res = run_tessellation(slide, tmp_path, cfg, stem="huge", write_artifacts=False)
    assert res.num_tiles > 0
    assert (res.coords % 224 == 0).all()
    assert res.coords[:, 0].max() + 224 <= 16384

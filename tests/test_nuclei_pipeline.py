"""Nuclei aggregation pipeline: selection, coordinate shifts, artifacts —
driven by a deterministic fake segmenter plus a real-model smoke test."""

import json

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from path_gene_multimodal_tpu.config import TYPE_NAMES, default_config
from path_gene_multimodal_tpu.io.slide import synthetic_wsi
from path_gene_multimodal_tpu.models.hovernext import HoverNeXtConfig
from path_gene_multimodal_tpu.models.convnext import ConvNeXtConfig
from path_gene_multimodal_tpu.pipeline.nuclei import (
    NucleiModel,
    load_tile_annotations,
    run_hovernet_pipeline_on_wsi_tiles,
    select_tiles_for_hovernet,
)


class FakeNucleiModel:
    """Deterministic segmenter: one 10×10 square nucleus at a fixed offset
    per tile, type 2."""

    def __init__(self, input_size=256, max_instances=64):
        self.cfg = HoverNeXtConfig(input_size=input_size)
        self.max_instances = max_instances

    def segment(self, tiles_u8):
        b, s, _, _ = tiles_u8.shape
        inst = np.zeros((b, s, s), np.int32)
        types = np.zeros((b, s, s), np.int32)
        inst[:, 50:60, 70:80] = 1
        types[:, 50:60, 70:80] = 2
        return inst, types


@pytest.fixture
def ann_csv(tmp_path):
    cfg = default_config()
    classes = list(cfg.classes)
    rows = []
    for i, (x, y) in enumerate([(0, 0), (224, 0), (448, 224), (672, 672)]):
        scores = {c: 0.1 for c in classes}
        rows.append({"tile_index": i, "x": x, "y": y,
                     "predicted_class": classes[0],
                     "in_tme_roi": i != 3, **scores})
    df = pd.DataFrame(rows)
    p = tmp_path / "s_annotations_with_coords.csv"
    df.to_csv(p, index=False)
    return p, cfg


def test_load_and_select(ann_csv):
    p, cfg = ann_csv
    df = load_tile_annotations(p)
    sel = select_tiles_for_hovernet(df)
    assert len(sel) == 3  # in_tme_roi only
    assert (sel["y"].diff().fillna(0) >= 0).all()  # sorted


def test_load_missing_columns(tmp_path):
    p = tmp_path / "bad.csv"
    pd.DataFrame({"x": [1]}).to_csv(p, index=False)
    with pytest.raises(ValueError, match="missing required columns"):
        load_tile_annotations(p)


def test_pipeline_with_fake_model(ann_csv, tmp_path):
    p, cfg = ann_csv
    slide = synthetic_wsi(1024, 1024, seed=1, n_blobs=2, nuclei_per_blob=10)
    model = FakeNucleiModel()
    nuclei = run_hovernet_pipeline_on_wsi_tiles(
        slide, p, tmp_path, "s", model, cfg, batch_size=2, save_tile_artifacts=True,
    )
    assert len(nuclei) == 3  # one nucleus per ROI tile
    row = nuclei[nuclei["tile_x"] == 224].iloc[0]
    # fake nucleus at rows 50:60, cols 70:80 of the 256 input; tile crop
    # offset = (256-224)//2 = 16 → tile-local centroid (74.5-16, 54.5-16)
    assert row["centroid_x"] == pytest.approx(74.5 - 16)
    assert row["centroid_y"] == pytest.approx(54.5 - 16)
    assert row["wsi_centroid_x"] == pytest.approx(224 + 74.5 - 16)
    assert row["wsi_centroid_y"] == pytest.approx(0 + 54.5 - 16)
    assert row["type"] == 2 and row["type_name"] == TYPE_NAMES[2]
    # bbox shift parity
    assert row["wsi_bbox_xmin"] == pytest.approx(row["bbox_xmin"] + 224)
    # polygon in WSI frame = tile polygon + (tile_x, tile_y)
    poly = np.asarray(row["polygon"])
    wsi_poly = np.asarray(row["wsi_polygon"])
    np.testing.assert_allclose(wsi_poly, poly + np.array([224, 0.0]))
    # artifacts
    assert (tmp_path / "s_hovernet_nuclei_wsi.csv").exists()
    assert (tmp_path / "s_hovernet_nuclei_wsi.parquet").exists()
    ci = json.loads((tmp_path / "hovernet_tiles" / "224_0" / "class_inst.json").read_text())
    assert ci["1"][0] == 2  # {inst_id: [type, [0, cx, cy]]}
    assert ci["1"][1][0] == 0
    with np.load(tmp_path / "hovernet_tiles" / "224_0" / "pinst_pp.npz") as z:
        m = z["inst_map"]
        assert m.dtype == np.uint32 and m.shape == (224, 224)
        assert (m == 1).sum() == 100


def test_pipeline_empty_roi(tmp_path):
    cfg = default_config()
    classes = list(cfg.classes)
    rows = [{"tile_index": 0, "x": 0, "y": 0, "predicted_class": classes[0],
             "in_tme_roi": False}]
    p = tmp_path / "none.csv"
    pd.DataFrame(rows).to_csv(p, index=False)
    slide = synthetic_wsi(512, 512, seed=2, n_blobs=1, nuclei_per_blob=5)
    nuclei = run_hovernet_pipeline_on_wsi_tiles(
        slide, p, tmp_path, "none", FakeNucleiModel(), cfg,
    )
    assert len(nuclei) == 0
    assert (tmp_path / "none_hovernet_nuclei_wsi.csv").exists()


@pytest.mark.slow
def test_real_model_smoke(ann_csv, tmp_path):
    """Tiny real HoverNeXt end-to-end (random weights): runs, schema holds."""
    p, cfg = ann_csv
    enc = ConvNeXtConfig(depths=(1, 1, 1, 1), dims=(16, 32, 64, 128))
    mcfg = HoverNeXtConfig(encoder=enc, decoder_dims=(64, 32, 16, 16), input_size=256)
    model = NucleiModel.build(mcfg, dtype=jnp.float32, tta=1, max_instances=128)
    slide = synthetic_wsi(1024, 1024, seed=3, n_blobs=2, nuclei_per_blob=30)
    nuclei = run_hovernet_pipeline_on_wsi_tiles(
        slide, p, tmp_path, "smoke", model, cfg, batch_size=4,
    )
    # random weights: any count (incl. 0) is fine — schema must hold
    for col in ["nuc_id", "inst_id", "type", "wsi_centroid_x", "wsi_polygon"]:
        assert col in nuclei.columns


def test_pipeline_planar_feed_matches_rgb(tmp_path):
    """The planar (4:2:0 device-feed) path drives the same pipeline
    mechanics — offsets, batch padding, coordinate shifts — as the RGB
    path; with a pixel-independent fake model the tables are identical."""
    from dataclasses import replace

    from path_gene_multimodal_tpu.io.tiff import TiffTileSlide
    from path_gene_multimodal_tpu.io.tiff_write import write_tiled_tiff

    cfg = default_config()
    rng = np.random.default_rng(3)
    base = np.kron(
        rng.integers(40, 220, size=(14, 14, 3), dtype=np.uint8),
        np.ones((64, 64, 1), np.uint8),
    )
    p = write_tiled_tiff(tmp_path / "pl.svs", [base], tile_size=256,
                         compression=7)
    slide = TiffTileSlide(p, use_native=True)
    if slide._native is None or not slide.supports_planar(0):
        pytest.skip("native planar decoder unavailable")
    classes = list(cfg.classes)
    rows = [
        {"tile_index": i, "x": x, "y": y, "predicted_class": classes[0],
         "in_tme_roi": True, **{c: 0.1 for c in classes}}
        for i, (x, y) in enumerate([(0, 0), (224, 0), (448, 224)])
    ]
    ann = tmp_path / "pl_annotations_with_coords.csv"
    pd.DataFrame(rows).to_csv(ann, index=False)

    out_a, out_b = tmp_path / "a", tmp_path / "b"
    out_a.mkdir()
    out_b.mkdir()
    nuc_planar = run_hovernet_pipeline_on_wsi_tiles(
        slide, ann, out_a, "pl", FakeNucleiModel(), cfg, batch_size=2,
    )
    cfg_rgb = replace(cfg, hovernext=replace(cfg.hovernext, planar_feed=False))
    nuc_rgb = run_hovernet_pipeline_on_wsi_tiles(
        slide, ann, out_b, "pl", FakeNucleiModel(), cfg_rgb, batch_size=2,
    )
    drop = ["nuc_id", "tile_path"]  # uuids / out-dir paths differ per run
    pd.testing.assert_frame_equal(
        nuc_planar.drop(columns=drop), nuc_rgb.drop(columns=drop)
    )


def test_planar_seg_prep_matches_host_pad(tmp_path):
    """Device-side decode+reflect-pad == host nearest-RGB decode + np.pad."""
    from path_gene_multimodal_tpu.io.tiff import TiffTileSlide
    from path_gene_multimodal_tpu.io.tiff_write import write_tiled_tiff
    from path_gene_multimodal_tpu.ops.jpegcolor import ycbcr420_to_rgb
    from path_gene_multimodal_tpu.pipeline.nuclei import _planar_seg_prep

    rng = np.random.default_rng(4)
    base = np.kron(
        rng.integers(40, 220, size=(8, 8, 3), dtype=np.uint8),
        np.ones((64, 64, 1), np.uint8),
    )
    p = write_tiled_tiff(tmp_path / "pp.svs", [base], tile_size=256,
                         compression=7)
    slide = TiffTileSlide(p, use_native=True)
    if slide._native is None or not slide.supports_planar(0):
        pytest.skip("native planar decoder unavailable")
    y, cbcr = slide.read_region_planar((224, 0), 0, (224, 224))
    dev = np.asarray(_planar_seg_prep(jnp.asarray(y[None]),
                                      jnp.asarray(cbcr[None]), 16, 16))[0]
    host_rgb = np.asarray(ycbcr420_to_rgb(y, cbcr))
    host = np.pad(host_rgb, ((16, 16), (16, 16), (0, 0)), mode="reflect")
    np.testing.assert_array_equal(dev, host)


def test_overflow_accounting_bounded_and_resettable():
    """The no-silent-caps CC overflow counter: parts fold to one device
    scalar instead of growing unboundedly for callers that drive segment()
    directly, counts survive the fold exactly, and reset drains them."""
    from path_gene_multimodal_tpu.pipeline.nuclei import _SegmentedModelMixin

    class M(_SegmentedModelMixin):
        def __init__(self):
            self._overflow_parts = []

    m = M()
    for _ in range(300):
        m._note_overflow(jnp.asarray([1, 0], jnp.int32))  # 1 overflow tile/batch
    assert len(m._overflow_parts) <= 128  # folded, not 300 live buffers
    assert m.cc_overflow_tiles(reset=True) == 300  # exact across folds
    assert m.cc_overflow_tiles() == 0  # drained

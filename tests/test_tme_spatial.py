"""TME ROI geometry vs brute-force Euclidean golden + spatial-join stage
(reference load_annotation_with_coordinates.py semantics, incl. the 508-px
patch-size quirk and round-buffer corner behavior)."""

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from path_gene_multimodal_tpu.config import default_config
from path_gene_multimodal_tpu.core.artifacts import write_tessellation_h5
from path_gene_multimodal_tpu.ops.tme import min_box_distance_sq, tme_roi_flags
from path_gene_multimodal_tpu.pipeline.spatial import load_annotations_with_coords


def _golden_rect_dist(a, b, size):
    """Brute-force rect-to-rect distance (shapely box().distance semantics)."""
    dx = max(0.0, max(b[0] - (a[0] + size), a[0] - (b[0] + size)))
    dy = max(0.0, max(b[1] - (a[1] + size), a[1] - (b[1] + size)))
    return np.hypot(dx, dy)


def test_min_box_distance_matches_bruteforce(rng):
    tiles = rng.uniform(0, 5000, size=(40, 2)).astype(np.float32)
    tumors = rng.uniform(0, 5000, size=(17, 2)).astype(np.float32)
    size = 508.0
    d2 = np.asarray(min_box_distance_sq(
        jnp.asarray(tiles), jnp.asarray(tumors), size, corners="euclid"
    ))
    golden = np.array(
        [min(_golden_rect_dist(t, b, size) for b in tumors) for t in tiles]
    )
    np.testing.assert_allclose(np.sqrt(d2), golden, rtol=1e-5, atol=1e-2)


def _buffered_box_polygon(b, size, margin, quad_segs=8):
    """Vertices of shapely ``box(b, b+size).buffer(margin, quad_segs)``:
    four straight edges joined by inscribed ``quad_segs``-chord corner arcs
    (shapely's default buffer construction)."""
    corners = [
        (b[0] + size, b[1] + size, 0.0),
        (b[0], b[1] + size, np.pi / 2),
        (b[0], b[1], np.pi),
        (b[0] + size, b[1], 1.5 * np.pi),
    ]
    pts = []
    for cx, cy, a0 in corners:
        for k in range(quad_segs + 1):
            th = a0 + k * (np.pi / 2) / quad_segs
            pts.append((cx + margin * np.cos(th), cy + margin * np.sin(th)))
    return np.asarray(pts)


def _rect_poly_intersects(a, size, poly):
    """SAT between an axis-aligned ``size``-rect at ``a`` and a convex
    polygon — the brute-force reference predicate."""
    rect = np.array(
        [[a[0], a[1]], [a[0] + size, a[1]],
         [a[0] + size, a[1] + size], [a[0], a[1] + size]], float
    )
    axes = [np.array([1.0, 0.0]), np.array([0.0, 1.0])]
    for i in range(len(poly)):
        e = poly[(i + 1) % len(poly)] - poly[i]
        if np.hypot(*e) > 1e-9:
            axes.append(np.array([e[1], -e[0]]))
    for ax in axes:
        p1, p2 = rect @ ax, poly @ ax
        if p1.max() < p2.min() - 1e-7 or p2.max() < p1.min() - 1e-7:
            return False
    return True


def test_polygon8_matches_shapely_buffer_sat(rng):
    """Default corner metric == intersection with the quad_segs=8 buffer
    polygon the reference actually builds (SAT brute force), away from the
    float boundary."""
    size, margin = 508.0, 1016.0
    tumors = rng.uniform(0, 4000, size=(6, 2)).astype(np.float32)
    # tiles scattered so distances straddle the margin
    tiles = rng.uniform(-2000, 6000, size=(250, 2)).astype(np.float32)
    d2 = np.asarray(min_box_distance_sq(
        jnp.asarray(tiles), jnp.asarray(tumors), size, corners="polygon8"
    ))
    polys = [_buffered_box_polygon(b, size, margin) for b in tumors]
    golden = np.array(
        [any(_rect_poly_intersects(t, size, p) for p in polys) for t in tiles]
    )
    ours = np.sqrt(d2) <= margin
    # skip the float32-vs-float64 boundary sliver
    clear = np.abs(np.sqrt(d2) - margin) > 0.1
    np.testing.assert_array_equal(ours[clear], golden[clear])


def test_polygon8_vs_euclid_discriminating_band():
    """A tile whose diagonal approach lands mid-chord of the buffer arc:
    the true Euclidean disc includes it, the reference's inscribed polygon
    does not — the compat default must match the reference."""
    size, margin = 508.0, 1016.0
    tumor = np.array([[0.0, 0.0]], np.float32)
    ang = np.deg2rad(28.125)  # chord midpoint: max polygon inset (1/cos(pi/32))
    r = 1013.0  # r < margin < r / cos(pi/32)
    tile = np.array(
        [[size + r * np.cos(ang), size + r * np.sin(ang)]], np.float32
    )
    d_poly = np.sqrt(np.asarray(min_box_distance_sq(
        jnp.asarray(tile), jnp.asarray(tumor), size, corners="polygon8")))
    d_eucl = np.sqrt(np.asarray(min_box_distance_sq(
        jnp.asarray(tile), jnp.asarray(tumor), size, corners="euclid")))
    assert d_eucl[0] < margin < d_poly[0]
    # and the SAT golden agrees with the polygon verdict
    poly = _buffered_box_polygon(tumor[0], size, margin)
    assert not _rect_poly_intersects(tile[0], size, poly)


def test_chunking_boundary(rng):
    """Tumor count > chunk exercises the scan path."""
    tiles = rng.uniform(0, 100000, size=(64, 2)).astype(np.float32)
    tumors = rng.uniform(0, 100000, size=(1100, 2)).astype(np.float32)
    d2_scan = np.asarray(min_box_distance_sq(jnp.asarray(tiles), jnp.asarray(tumors), 224.0, chunk=512))
    d2_one = np.asarray(min_box_distance_sq(jnp.asarray(tiles), jnp.asarray(tumors), 224.0, chunk=2048))
    np.testing.assert_allclose(d2_scan, d2_one, rtol=1e-6)


def test_round_buffer_corner_semantics():
    """Diagonal corner case: Euclidean (round buffer) excludes what a square
    (Chebyshev) buffer would include — must match shapely's round buffer."""
    size, margin = 508.0, 1016.0
    tumor = np.array([[0.0, 0.0]], np.float32)
    # diagonal gap: dx = dy = 760 → hypot = 1074.8 > 1016 (excluded)
    #               dx = dy = 700 → hypot = 989.9  < 1016 (included)
    tiles = np.array(
        [[508 + 760, 508 + 760], [508 + 700, 508 + 700], [508 + 1015, 0.0]], np.float32
    )
    d2 = np.asarray(min_box_distance_sq(jnp.asarray(tiles), jnp.asarray(tumor), size))
    d = np.sqrt(d2)
    assert d[0] > margin      # round buffer excludes
    assert d[1] < margin      # included
    assert d[2] < margin      # axis-aligned within margin


def test_tme_flags_overlap_is_zero():
    tiles = np.array([[0, 0], [100, 100]], np.float32)
    d2 = np.asarray(min_box_distance_sq(jnp.asarray(tiles), jnp.asarray(tiles[:1]), 508.0))
    assert d2[0] == 0.0 and d2[1] == 0.0  # overlapping boxes → distance 0


def test_tme_no_tumor_raises():
    tiles = np.zeros((3, 2), np.float32)
    with pytest.raises(ValueError, match="No tumor tiles"):
        tme_roi_flags(tiles, np.zeros(3, bool), np.ones(3, bool), 508.0, 1016.0)


@pytest.fixture
def spatial_setup(tmp_path):
    cfg = default_config()
    classes = list(cfg.classes)
    # 6x6 grid of 224px tiles; put "tumor" top-left corner, far tile bottom-right
    coords = np.array([[x * 224, y * 224] for y in range(10) for x in range(10)], np.int64)
    n = len(coords)
    # deterministic: every tile → class 2 (TILs, not a tumor class), except
    # tile 0 → class 0 (the only tumor seed) and tile 99 → class 4 (necrosis)
    scores = np.full((n, 5), 0.05, np.float32)
    scores[:, 2] = 0.5
    scores[0] = [0.9, 0.05, 0.05, 0.05, 0.05]
    scores[99] = [0.05, 0.05, 0.05, 0.05, 0.9]
    write_tessellation_h5(tmp_path / "s.h5", coords, tile_size=224)
    df = pd.DataFrame(scores, columns=classes)
    df.insert(0, "tile_index", np.arange(n))
    df.to_csv(tmp_path / "s_annotations.csv", index=False)
    return tmp_path, cfg, classes, coords, scores


def test_spatial_join_schema(spatial_setup):
    tmp_path, cfg, classes, coords, scores = spatial_setup
    out = load_annotations_with_coords(
        tmp_path / "s_annotations.csv", tmp_path / "s.h5", classes,
        list(cfg.tme_classes), tmp_path, "s",
    )
    for col in ["tile_index", "x", "y", "predicted_class", "in_tme_roi"]:
        assert col in out.columns
    np.testing.assert_array_equal(out["x"].to_numpy(), coords[:, 0])
    np.testing.assert_array_equal(out["y"].to_numpy(), coords[:, 1])
    assert (tmp_path / "s_annotations_with_coords.csv").exists()
    # predicted_class argmax parity with pandas idxmax
    assert out.loc[0, "predicted_class"] == classes[0]
    assert out.loc[99, "predicted_class"] == classes[4]


def test_spatial_join_tme_roi_508_quirk(spatial_setup):
    """ROI must use 508-px boxes + 1016 margin (reference quirk), so the
    reach from the tumor tile at (0,0) is 508+1016 = 1524 px in each axis."""
    tmp_path, cfg, classes, coords, scores = spatial_setup
    out = load_annotations_with_coords(
        tmp_path / "s_annotations.csv", tmp_path / "s.h5", classes,
        list(cfg.tme_classes), tmp_path, "s",
    )
    poly = _buffered_box_polygon((0.0, 0.0), 508.0, 1016.0)  # ref buffer
    golden = [
        _rect_poly_intersects((float(x), float(y)), 508.0, poly)
        for x, y in coords
    ]
    np.testing.assert_array_equal(out["in_tme_roi"].to_numpy(), np.array(golden))
    # sanity: ROI is a strict subset (far corner out, neighbors in)
    assert out["in_tme_roi"].iloc[0]
    assert not out["in_tme_roi"].iloc[99]


def test_spatial_join_missing_tile_index_uses_row_order(spatial_setup):
    tmp_path, cfg, classes, coords, scores = spatial_setup
    df = pd.read_csv(tmp_path / "s_annotations.csv").drop(columns=["tile_index"])
    df.to_csv(tmp_path / "noidx.csv", index=False)
    out = load_annotations_with_coords(
        tmp_path / "noidx.csv", tmp_path / "s.h5", classes,
        list(cfg.tme_classes), tmp_path, "s", save_merged=False,
    )
    np.testing.assert_array_equal(out["tile_index"].to_numpy(), np.arange(100))


def test_spatial_join_missing_class_column(spatial_setup):
    tmp_path, cfg, classes, coords, scores = spatial_setup
    df = pd.read_csv(tmp_path / "s_annotations.csv").drop(columns=[classes[2]])
    df.to_csv(tmp_path / "short.csv", index=False)
    with pytest.raises(KeyError, match="Missing class score columns"):
        load_annotations_with_coords(
            tmp_path / "short.csv", tmp_path / "s.h5", classes,
            list(cfg.tme_classes), tmp_path, "s", save_merged=False,
        )


def test_spatial_join_unmatched_tile_index_dropped(spatial_setup):
    """Annotation rows whose tile_index has no H5 coordinate (stale index
    after re-tessellation) are dropped with a warning, not crashed on
    int(NaN) in the png-path build."""
    tmp_path, cfg, classes, coords, scores = spatial_setup
    df = pd.read_csv(tmp_path / "s_annotations.csv")
    df.loc[len(df)] = df.iloc[0]
    df.loc[len(df) - 1, "tile_index"] = 9999  # beyond the H5
    df.to_csv(tmp_path / "stale.csv", index=False)
    (tmp_path / "patches").mkdir(exist_ok=True)  # forces the int(r.x) path
    out = load_annotations_with_coords(
        tmp_path / "stale.csv", tmp_path / "s.h5", classes,
        list(cfg.tme_classes), tmp_path, "s", save_merged=False,
    )
    assert len(out) == len(coords)  # the stale row is gone
    assert not out["x"].isna().any()


def test_spatial_join_png_paths(spatial_setup):
    tmp_path, cfg, classes, coords, scores = spatial_setup
    (tmp_path / "patches").mkdir()
    out = load_annotations_with_coords(
        tmp_path / "s_annotations.csv", tmp_path / "s.h5", classes,
        list(cfg.tme_classes), tmp_path, "s", save_merged=False,
    )
    assert out.loc[7, "png_path"].endswith(f"patches/{coords[7,0]}_{coords[7,1]}.png")
